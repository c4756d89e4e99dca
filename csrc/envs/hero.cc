// H.E.R.O. — from-scratch C++ clone with the classic mechanics: hover-pack
// down a five-level mine shaft, laser the critters (+75), dynamite through
// the rock walls, and reach the trapped miner (+1000) before the power
// meter runs out. Each rescue re-arms a faster mine.
//
// Stands in for EnvPool's ALE Hero-v5 in the reference's benchmark configs
// (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs are not
// available here, so the engine provides a rules-true clone with identical
// protocol semantics (sticky actions / frameskip / stacking are applied by
// AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave12.py and must mirror these rules exactly.

#include <cmath>
#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr int kFloors = 5;
const float kFloorY[kFloors] = {16.0f, 31.0f, 46.0f, 61.0f, 76.0f};  // floor tops
// Each floor (except the last) has a shaft gap and, on some, a rock wall.
const float kGapX[kFloors - 1] = {60.0f, 14.0f, 60.0f, 14.0f};  // gap left edge
constexpr float kGapW = 12.0f;
const float kWallX[kFloors] = {-1.0f, 40.0f, -1.0f, 44.0f, 30.0f};  // -1 = none
constexpr float kWallW = 4.0f;
constexpr int kCritters = 4;
const int kCritFloor[kCritters] = {1, 2, 3, 4};
const float kCritX0[kCritters] = {20.0f, 60.0f, 30.0f, 55.0f};
constexpr float kCritW = 4.0f, kCritH = 3.0f;
constexpr float kPlayerW = 4.0f, kPlayerH = 6.0f;
constexpr float kMoveX = 1.0f;
constexpr float kThrust = 0.22f;
constexpr float kGravity = 0.12f;
constexpr float kMaxFall = 1.4f;
constexpr float kShotV = 2.6f;
constexpr int kDynFrames = 40;
constexpr int kPower = 6000;
constexpr int kLives = 3;
constexpr float kMinerX = 64.0f;

class HeroGame : public Game {
 public:
  void reset_game(PCG32&) override {
    level_ = 0;
    lives_ = kLives;
    score_ = 0;
    over_ = false;
    start_level();
    respawn();
  }

  float act(const AleAction& a, PCG32&) override {
    if (over_) return 0.0f;
    float reward = 0.0f;
    float cspeed = 0.45f + 0.1f * static_cast<float>(level_);

    px_ += static_cast<float>(a.dx) * kMoveX;
    if (px_ < 2.0f) px_ = 2.0f;
    if (px_ > 82.0f - kPlayerW) px_ = 82.0f - kPlayerW;
    if (a.dx != 0) facing_ = a.dx > 0 ? 1.0f : -1.0f;
    // Hover pack.
    if (a.dy < 0) vy_ -= kThrust;
    vy_ += kGravity;
    if (vy_ > kMaxFall) vy_ = kMaxFall;
    if (vy_ < -1.6f) vy_ = -1.6f;
    float ny = py_ + vy_;
    // Floors: stop on a floor top unless over its shaft gap. First landing
    // on each deeper floor per life pays a +50 descent bonus (H.E.R.O.
    // scores section progress, which keeps the reward non-degenerate).
    for (int fl = 0; fl < kFloors; ++fl) {
      float top = kFloorY[fl];
      bool over_gap = fl < kFloors - 1 &&
                      px_ + kPlayerW / 2.0f >= kGapX[fl] &&
                      px_ + kPlayerW / 2.0f < kGapX[fl] + kGapW;
      if (vy_ >= 0.0f && py_ + kPlayerH <= top && ny + kPlayerH >= top &&
          !over_gap) {
        ny = top - kPlayerH;
        vy_ = 0.0f;
        if (!visited_[fl]) {
          visited_[fl] = true;
          reward += 50.0f;
          score_ += 50;
        }
      }
      // Head bump from below.
      if (vy_ < 0.0f && py_ >= top + 2.0f && ny < top + 2.0f && !over_gap) {
        ny = top + 2.0f;
        vy_ = 0.0f;
      }
    }
    py_ = ny;
    if (py_ < 8.0f) py_ = 8.0f;
    if (py_ > 78.0f) py_ = 78.0f;

    // Rock wall blocks lateral movement on its floor band.
    int band = floor_band(py_);
    if (band >= 0 && wall_up_[band]) {
      float wx = kWallX[band];
      if (wx >= 0.0f && px_ + kPlayerW > wx && px_ < wx + kWallW) {
        // Push back out.
        px_ = px_ + kPlayerW / 2.0f < wx + kWallW / 2.0f ? wx - kPlayerW
                                                        : wx + kWallW;
      }
    }

    // Laser.
    if (a.fire && a.dy <= 0 && !shot_live_) {
      shot_live_ = true;
      shot_x_ = px_ + kPlayerW / 2.0f;
      shot_y_ = py_ + 2.0f;
      shot_vx_ = facing_ * kShotV;
    }
    if (shot_live_) {
      shot_x_ += shot_vx_;
      int sband = floor_band(shot_y_);
      bool hit_wall = sband >= 0 && wall_up_[sband] && kWallX[sband] >= 0.0f &&
                      shot_x_ >= kWallX[sband] &&
                      shot_x_ < kWallX[sband] + kWallW;
      if (shot_x_ < 0 || shot_x_ >= 84 || hit_wall) shot_live_ = false;
    }
    // Dynamite (DOWN+FIRE while grounded near a wall).
    if (a.fire && a.dy > 0 && dyn_timer_ == 0 && band >= 0 && wall_up_[band]) {
      dyn_timer_ = kDynFrames;
      dyn_band_ = band;
    }
    if (dyn_timer_ > 0) {
      if (--dyn_timer_ == 0 && dyn_band_ >= 0 && wall_up_[dyn_band_]) {
        // The blast clears the wall if the player stands clear of it.
        float wx = kWallX[dyn_band_];
        if (std::fabs(px_ - wx) > 6.0f || floor_band(py_) != dyn_band_) {
          wall_up_[dyn_band_] = false;
        } else {
          reward += lose_life();  // caught in your own blast
          return reward;
        }
      }
    }

    // Critters patrol their floor bands.
    for (int c = 0; c < kCritters; ++c) {
      if (!crit_live_[c]) continue;
      crit_x_[c] += crit_dir_[c] * cspeed;
      if (crit_x_[c] < 4.0f) { crit_x_[c] = 4.0f; crit_dir_[c] = 1.0f; }
      if (crit_x_[c] > 76.0f) { crit_x_[c] = 76.0f; crit_dir_[c] = -1.0f; }
      float cy = kFloorY[kCritFloor[c]] - kCritH;
      if (shot_live_ && shot_x_ >= crit_x_[c] && shot_x_ < crit_x_[c] + kCritW &&
          shot_y_ >= cy && shot_y_ < cy + kCritH) {
        shot_live_ = false;
        crit_live_[c] = false;
        reward += 75.0f;
        score_ += 75;
        continue;
      }
      if (px_ + kPlayerW > crit_x_[c] && px_ < crit_x_[c] + kCritW &&
          py_ + kPlayerH > cy && py_ < cy + kCritH) {
        reward += lose_life();
        return reward;
      }
    }

    // The miner waits on the lowest floor.
    float my = kFloorY[kFloors - 1] - 6.0f;
    if (px_ + kPlayerW > kMinerX && px_ < kMinerX + 4.0f &&
        py_ + kPlayerH > my && py_ < my + 6.0f) {
      reward += 1000.0f;
      score_ += 1000;
      ++level_;
      start_level();
      respawn();
      return reward;
    }

    if (++power_used_ >= kPower) {
      reward += lose_life();
      return reward;
    }
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    for (int fl = 0; fl < kFloors; ++fl) {
      int y0 = static_cast<int>(kFloorY[fl]);
      for (int y = y0; y < y0 + 2 && y < kScreen; ++y)
        for (int x = 2; x < 82; ++x) {
          bool gap = fl < kFloors - 1 && x >= kGapX[fl] && x < kGapX[fl] + kGapW;
          if (!gap) f[y * kScreen + x] = 100;
        }
      if (wall_up_[fl] && kWallX[fl] >= 0.0f)
        draw_rect(f, kWallX[fl], kFloorY[fl] - 13.0f, kWallW, 13.0f, 130);
    }
    for (int c = 0; c < kCritters; ++c)
      if (crit_live_[c])
        draw_rect(f, crit_x_[c], kFloorY[kCritFloor[c]] - kCritH, kCritW,
                  kCritH, 170);
    draw_rect(f, kMinerX, kFloorY[kFloors - 1] - 6.0f, 4.0f, 6.0f, 210);
    if (shot_live_) draw_rect(f, shot_x_ - 1.0f, shot_y_, 2.0f, 2.0f, 220);
    if (dyn_timer_ > 0 && dyn_band_ >= 0)
      draw_rect(f, kWallX[dyn_band_] - 2.0f, kFloorY[dyn_band_] - 4.0f, 2.0f,
                2.0f, 240);
    draw_rect(f, px_, py_, kPlayerW, kPlayerH, 255);
    // Power meter.
    int left = (kPower - power_used_) * 60 / kPower;
    for (int t = 0; t < left; ++t) f[3 * kScreen + 2 + t] = 160;
    for (int s = 0; s < score_ / 75 && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
    for (int l = 0; l < lives_ && l < kLives; ++l)
      for (int k = 0; k < 3; ++k) f[82 * kScreen + 2 + l * 5 + k] = 160;
  }

  bool game_over() const override { return over_; }
  int lives() const override { return lives_; }
  int minimal_actions() const override { return 18; }
  int minimal_to_full(int a) const override { return a < 0 || a >= 18 ? 0 : a; }

 private:
  // Which floor band a y belongs to (the 13 px above each floor top).
  static int floor_band(float y) {
    for (int fl = 0; fl < kFloors; ++fl)
      if (y >= kFloorY[fl] - 13.0f && y < kFloorY[fl]) return fl;
    return -1;
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
    px_ = 6.0f;
    py_ = kFloorY[0] - kPlayerH;
    vy_ = 0.0f;
    facing_ = 1.0f;
    shot_live_ = false;
    dyn_timer_ = 0;
    dyn_band_ = -1;
    power_used_ = 0;
    for (int fl = 0; fl < kFloors; ++fl) visited_[fl] = fl == 0;
  }

  void start_level() {
    for (int fl = 0; fl < kFloors; ++fl) wall_up_[fl] = kWallX[fl] >= 0.0f;
    for (int c = 0; c < kCritters; ++c) {
      crit_live_[c] = true;
      crit_x_[c] = kCritX0[c];
      crit_dir_[c] = c % 2 == 0 ? 1.0f : -1.0f;
    }
  }

  static void draw_rect(uint8_t* f, float fx, float fy, float fw, float fh, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + fw), y1 = static_cast<int>(fy + fh);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  float px_ = 6.0f, py_ = 10.0f, vy_ = 0.0f, facing_ = 1.0f;
  bool shot_live_ = false;
  float shot_x_ = 0, shot_y_ = 0, shot_vx_ = 0;
  int dyn_timer_ = 0, dyn_band_ = -1;
  bool visited_[kFloors] = {};
  bool wall_up_[kFloors] = {};
  bool crit_live_[kCritters] = {};
  float crit_x_[kCritters] = {}, crit_dir_[kCritters] = {};
  int power_used_ = 0;
  int level_ = 0;
  int lives_ = kLives;
  int score_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_hero_game() { return std::make_unique<HeroGame>(); }

}  // namespace cleanba
