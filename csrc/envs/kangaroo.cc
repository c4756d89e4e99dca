// Kangaroo — from-scratch C++ clone with the classic mechanics: climb three
// floors of ladders to rescue the joey (ticking bonus, 2000 max), punch
// monkeys (+200), grab fruit (+100), dodge thrown apples and the monkeys
// themselves (contact kills, as in the original), against a per-life timer.
// Each rescue starts the next level with faster monkeys and denser, faster
// apples.
//
// Round-5 calibration (HNS.md wave-9 appendix): the original clone economy
// let a trained agent cycle rescue levels at a flat +2000 with no mounting
// danger (625k/episode, 20,940% HNS — a clone artifact, not ALE-comparable).
// Three rules-true mechanics from the real cabinet close that loop: the
// rescue bonus ticks down with level time (the arcade bonus counter), monkey
// contact is lethal, and per-level difficulty ramps (monkey speed, apple
// rate/speed) make deep levels unsurvivable, capping episodes near published
// strong-agent scores on the real game (~10-15k).
//
// Stands in for EnvPool's ALE Kangaroo-v5 in the reference's benchmark
// configs (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs are
// not available here, so the engine provides a rules-true clone with
// identical protocol semantics (sticky actions / frameskip / stacking are
// applied by AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave9.py and must mirror these rules exactly.

#include <cmath>
#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr int kFloors = 3;                       // climbable floors below the top
const float kStandY[kFloors + 1] = {76.0f, 54.0f, 32.0f, 14.0f};  // feet rows
const float kLadderX[kFloors] = {64.0f, 12.0f, 64.0f};            // floor f -> f+1
constexpr float kLadderW = 6.0f;
constexpr float kPlayerW = 5.0f, kPlayerH = 8.0f;
constexpr float kWalk = 1.2f;
constexpr float kClimb = 1.2f;
constexpr int kMonkeys = 3;
const float kMonkeyX0[kMonkeys] = {20.0f, 60.0f, 30.0f};
const float kMonkeyD0[kMonkeys] = {1.0f, -1.0f, 1.0f};
constexpr float kMonkeyW = 5.0f, kMonkeyH = 7.0f;
constexpr int kMonkeyHold = 100;
constexpr int kPunchCooldown = 12;
constexpr float kPunchReach = 10.0f;
constexpr float kAppleW = 3.0f, kAppleH = 2.0f, kAppleV = 1.5f;
constexpr int kFruits = 3;
const int kFruitFloor[kFruits] = {0, 1, 2};
const float kFruitX[kFruits] = {24.0f, 46.0f, 60.0f};
constexpr float kFruitW = 3.0f, kFruitH = 3.0f;
constexpr int kTimerFrames = 6000;
constexpr int kLives = 3;

class KangarooGame : public Game {
 public:
  void reset_game(PCG32&) override {
    level_ = 0;
    lives_ = kLives;
    score_ = 0;
    over_ = false;
    reset_level();
  }

  float act(const AleAction& a, PCG32&) override {
    if (over_) return 0.0f;
    float reward = 0.0f;
    float mspeed = 0.6f + 0.35f * static_cast<float>(level_);

    if (punch_cd_ > 0) --punch_cd_;

    if (climbing_) {
      // Locked to the ladder; dy continues or reverses the climb.
      y_ += static_cast<float>(a.dy) * kClimb;
      float top = kStandY[floor_ + 1], bot = kStandY[floor_];
      if (y_ <= top) {
        y_ = top;
        ++floor_;
        climbing_ = false;
        if (floor_ == kFloors) {
          // Rescue! The bonus counter ticks down with level time (arcade
          // bonus clock): 2000 at the start, -100 every 300 raw frames,
          // floor 100.
          int bonus = 2000 - 100 * (timer_ / 300);
          if (bonus < 100) bonus = 100;
          reward += static_cast<float>(bonus);
          score_ += bonus;
          ++level_;
          reset_level();
          return reward;
        }
      } else if (y_ >= bot) {
        y_ = bot;
        climbing_ = false;
      }
    } else {
      x_ += static_cast<float>(a.dx) * kWalk;
      if (x_ < 4.0f) x_ = 4.0f;
      if (x_ > 79.0f - kPlayerW) x_ = 79.0f - kPlayerW;
      // Start climbing when pressing UP at this floor's ladder (or DOWN at
      // the floor below's ladder).
      if (a.dy < 0 && floor_ < kFloors && at_ladder(floor_)) {
        climbing_ = true;
        x_ = kLadderX[floor_] + (kLadderW - kPlayerW) / 2.0f;
        y_ += static_cast<float>(a.dy) * kClimb;
      } else if (a.dy > 0 && floor_ > 0 && at_ladder(floor_ - 1)) {
        --floor_;
        climbing_ = true;
        x_ = kLadderX[floor_] + (kLadderW - kPlayerW) / 2.0f;
        y_ += static_cast<float>(a.dy) * kClimb;
      }
    }

    // Monkeys patrol their floors; punch check.
    for (int m = 0; m < kMonkeys; ++m) {
      if (monkey_hold_[m] > 0) {
        if (--monkey_hold_[m] == 0) {
          monkey_x_[m] = kMonkeyX0[m];
          monkey_dir_[m] = kMonkeyD0[m];
          apple_live_[m] = false;
          apple_timer_[m] = 0;
        }
        continue;
      }
      monkey_x_[m] += monkey_dir_[m] * mspeed;
      if (monkey_x_[m] < 6.0f) { monkey_x_[m] = 6.0f; monkey_dir_[m] = 1.0f; }
      if (monkey_x_[m] > 73.0f) { monkey_x_[m] = 73.0f; monkey_dir_[m] = -1.0f; }
    }
    // Punch resolution: hits any live monkey on the player's floor in reach.
    if (a.fire && punch_cd_ == 0 && !climbing_) {
      punch_cd_ = kPunchCooldown;
      for (int m = 0; m < kMonkeys; ++m) {
        if (monkey_hold_[m] > 0 || m != floor_) continue;
        if (std::fabs(monkey_x_[m] + kMonkeyW / 2.0f - (x_ + kPlayerW / 2.0f)) <
            kPunchReach) {
          monkey_hold_[m] = kMonkeyHold;
          reward += 200.0f;
          score_ += 200;
        }
      }
    }

    // Monkey contact is lethal (real-cabinet rule) — checked after the
    // punch so a same-frame punch saves the player; climbing is safe.
    if (!climbing_) {
      for (int m = 0; m < kMonkeys; ++m) {
        if (monkey_hold_[m] > 0 || m != floor_) continue;
        if (monkey_x_[m] + kMonkeyW > x_ && monkey_x_[m] < x_ + kPlayerW) {
          reward += lose_life();
          return reward;
        }
      }
    }

    // Apples: monkey m (on floor m) lobs one at the player when its timer
    // fires; one in flight per monkey. Level ramp: launch period shrinks
    // (floor 24) and flight speed grows with each rescue.
    for (int m = 0; m < kMonkeys; ++m) {
      if (monkey_hold_[m] > 0) continue;
      if (!apple_live_[m]) {
        int period = 140 + 37 * m - 24 * level_;
        if (period < 24) period = 24;
        if (++apple_timer_[m] >= period) {
          apple_timer_[m] = 0;
          apple_live_[m] = true;
          apple_x_[m] = monkey_x_[m] + kMonkeyW / 2.0f;
          float av = kAppleV + 0.3f * static_cast<float>(level_);
          apple_vx_[m] = (x_ >= apple_x_[m] ? 1.0f : -1.0f) * av;
        }
        continue;
      }
      apple_x_[m] += apple_vx_[m];
      if (apple_x_[m] < -kAppleW || apple_x_[m] > 84.0f) {
        apple_live_[m] = false;
        continue;
      }
      // Apple flies at head height of its floor.
      float ay = kStandY[m] - kPlayerH + 2.0f;
      float py = y_ - kPlayerH;
      bool ox = x_ + kPlayerW > apple_x_[m] && x_ < apple_x_[m] + kAppleW;
      bool oy = py + kPlayerH > ay && py < ay + kAppleH;
      if (ox && oy) {
        reward += lose_life();
        return reward;
      }
    }

    // Fruit pickup (feet-box overlap on the fruit's floor).
    for (int t = 0; t < kFruits; ++t) {
      if (!fruit_live_[t] || climbing_ || floor_ != kFruitFloor[t]) continue;
      float fy = kStandY[kFruitFloor[t]] - kPlayerH + 2.0f;
      float py = y_ - kPlayerH;
      bool ox = x_ + kPlayerW > kFruitX[t] && x_ < kFruitX[t] + kFruitW;
      bool oy = py + kPlayerH > fy && py < fy + kFruitH;
      if (ox && oy) {
        fruit_live_[t] = false;
        reward += 100.0f;
        score_ += 100;
      }
    }

    // Per-life timer.
    if (++timer_ >= kTimerFrames) {
      reward += lose_life();
      return reward;
    }
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    // Floors (3px slabs under each stand row) and the top platform.
    for (int fl = 0; fl <= kFloors; ++fl) {
      int y0 = static_cast<int>(kStandY[fl]);
      int x0 = fl == kFloors ? 30 : 2, x1 = fl == kFloors ? 54 : 82;
      for (int y = y0; y < y0 + 3 && y < kScreen; ++y)
        for (int x = x0; x < x1; ++x) f[y * kScreen + x] = 100;
    }
    // Ladders (dashed rungs between floors).
    for (int fl = 0; fl < kFloors; ++fl) {
      int ytop = static_cast<int>(kStandY[fl + 1]) + 3;
      int ybot = static_cast<int>(kStandY[fl]);
      for (int y = ytop; y < ybot; y += 2)
        for (int x = static_cast<int>(kLadderX[fl]);
             x < static_cast<int>(kLadderX[fl] + kLadderW); ++x)
          f[y * kScreen + x] = 80;
    }
    // Joey on the top platform.
    draw_rect(f, 40.0f, kStandY[kFloors] - 6.0f, 4.0f, 6.0f, 230);
    // Fruit.
    for (int t = 0; t < kFruits; ++t)
      if (fruit_live_[t])
        draw_rect(f, kFruitX[t], kStandY[kFruitFloor[t]] - kPlayerH + 2.0f,
                  kFruitW, kFruitH, 210);
    // Monkeys and apples.
    for (int m = 0; m < kMonkeys; ++m) {
      if (monkey_hold_[m] == 0)
        draw_rect(f, monkey_x_[m], kStandY[m] - kMonkeyH, kMonkeyW, kMonkeyH, 150);
      if (apple_live_[m])
        draw_rect(f, apple_x_[m], kStandY[m] - kPlayerH + 2.0f, kAppleW, kAppleH, 180);
    }
    // Player.
    draw_rect(f, x_, y_ - kPlayerH, kPlayerW, kPlayerH, 255);
    // Score ticks and lives pips.
    for (int s = 0; s < score_ / 100 && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
    for (int l = 0; l < lives_ && l < kLives; ++l)
      for (int k = 0; k < 3; ++k) f[82 * kScreen + 2 + l * 5 + k] = 160;
  }

  bool game_over() const override { return over_; }
  int lives() const override { return lives_; }
  int minimal_actions() const override { return 18; }
  int minimal_to_full(int a) const override { return a < 0 || a >= 18 ? 0 : a; }

 private:
  bool at_ladder(int fl) const {
    return std::fabs(x_ + kPlayerW / 2.0f - (kLadderX[fl] + kLadderW / 2.0f)) < 4.0f;
  }

  float lose_life() {
    --lives_;
    if (lives_ <= 0) {
      over_ = true;
      return 0.0f;
    }
    respawn();
    return 0.0f;
  }

  void respawn() {
    x_ = 8.0f;
    floor_ = 0;
    y_ = kStandY[0];
    climbing_ = false;
    punch_cd_ = 0;
    timer_ = 0;
    for (int m = 0; m < kMonkeys; ++m) {
      monkey_x_[m] = kMonkeyX0[m];
      monkey_dir_[m] = kMonkeyD0[m];
      monkey_hold_[m] = 0;
      apple_live_[m] = false;
      apple_timer_[m] = 0;
    }
  }

  void reset_level() {
    for (int t = 0; t < kFruits; ++t) fruit_live_[t] = true;
    respawn();
  }

  static void draw_rect(uint8_t* f, float fx, float fy, float fw, float fh, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + fw), y1 = static_cast<int>(fy + fh);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  float x_ = 8.0f, y_ = kStandY[0];
  int floor_ = 0;
  bool climbing_ = false;
  int punch_cd_ = 0;
  float monkey_x_[kMonkeys] = {};
  float monkey_dir_[kMonkeys] = {};
  int monkey_hold_[kMonkeys] = {};
  bool apple_live_[kMonkeys] = {};
  int apple_timer_[kMonkeys] = {};
  float apple_x_[kMonkeys] = {};
  float apple_vx_[kMonkeys] = {};
  bool fruit_live_[kFruits] = {};
  int timer_ = 0;
  int level_ = 0;
  int lives_ = kLives;
  int score_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_kangaroo_game() { return std::make_unique<KangarooGame>(); }

}  // namespace cleanba
