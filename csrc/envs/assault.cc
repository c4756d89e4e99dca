// Assault — from-scratch C++ clone with the classic mechanics: a mothership
// patrols the top of the screen and deploys drones into three hover bands;
// drones drop bombs and eventually descend to ground level and charge the
// player, who answers with a vertical cannon (FIRE) and horizontal side
// shots (RIGHTFIRE / LEFTFIRE) — the real game's signature ground-defense
// split.
//
// Stands in for EnvPool's ALE Assault-v5 in the reference's benchmark
// configs (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs are
// not available here, so the engine provides a rules-true clone with
// identical protocol semantics (sticky actions / frameskip / stacking are
// applied by AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave5.py and must mirror these rules exactly.

#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr int kMaxDrones = 6;
constexpr int kBands = 3;
constexpr float kBandY[kBands] = {18.0f, 28.0f, 38.0f};
constexpr float kDroneW = 6.0f, kDroneH = 4.0f;
constexpr float kGroundY = 72.0f;
constexpr float kPlayerY = 76.0f, kPlayerW = 6.0f, kPlayerH = 4.0f;
constexpr float kMotherY = 4.0f, kMotherW = 12.0f, kMotherH = 5.0f;
constexpr int kMaxBombs = 4;

class AssaultGame : public Game {
 public:
  void reset_game(PCG32&) override {
    px_ = 39.0f;
    mx_ = 36.0f;
    mdir_ = 1.0f;
    for (int i = 0; i < kMaxDrones; ++i) live_[i] = false;
    for (int i = 0; i < kMaxBombs; ++i) bomb_live_[i] = false;
    vshot_live_ = hshot_live_ = false;
    spawn_timer_ = 30;
    kills_ = 0;
    lives_ = 3;
    invuln_ = 0;
    score_ = 0;
    over_ = false;
  }

  float act(const AleAction& a, PCG32& rng) override {
    if (over_) return 0.0f;
    float reward = 0.0f;

    // Player movement and firing. UP fires the vertical cannon too (the real
    // cabinet maps UP to fire).
    px_ += static_cast<float>(a.dx) * 1.5f;
    px_ = px_ < 2.0f ? 2.0f : (px_ > 84.0f - 2.0f - kPlayerW ? 84.0f - 2.0f - kPlayerW : px_);
    bool want_vfire = (a.fire && a.dx == 0) || a.dy < 0;
    bool want_hfire = a.fire && a.dx != 0;
    if (want_vfire && !vshot_live_) {
      vshot_live_ = true;
      vx_ = px_ + kPlayerW / 2.0f;
      vy_ = kPlayerY - 2.0f;
    }
    if (want_hfire && !hshot_live_) {
      hshot_live_ = true;
      hdir_ = a.dx > 0 ? 1.0f : -1.0f;
      hx_ = a.dx > 0 ? px_ + kPlayerW : px_ - 1.0f;
      hy_ = kGroundY + 1.0f;
    }

    // Shots fly.
    if (vshot_live_) {
      vy_ -= 2.5f;
      if (vy_ < 2.0f) vshot_live_ = false;
    }
    if (hshot_live_) {
      hx_ += hdir_ * 2.5f;
      if (hx_ < 0.0f || hx_ > 84.0f) hshot_live_ = false;
    }

    // Mothership patrol.
    mx_ += mdir_ * 0.4f;
    if (mx_ < 6.0f || mx_ > 84.0f - 6.0f - kMotherW) mdir_ = -mdir_;

    // Drone deployment from the mothership.
    if (--spawn_timer_ <= 0) {
      int interval = 90 - 4 * (kills_ / 5);
      spawn_timer_ = interval < 36 ? 36 : interval;
      for (int i = 0; i < kMaxDrones; ++i) {
        if (live_[i]) continue;
        live_[i] = true;
        charging_[i] = false;
        band_[i] = static_cast<int>(rng.randint(kBands));
        dx_[i] = mx_ + kMotherW / 2.0f;
        ddir_[i] = rng.uniform() < 0.5f ? 1.0f : -1.0f;
        patrol_[i] = 120 + static_cast<int>(rng.randint(180));
        break;
      }
    }

    // Drones: patrol their band, then drop to the ground and charge.
    float speed = 0.5f + 0.15f * static_cast<float>(kills_ / 10);
    for (int i = 0; i < kMaxDrones; ++i) {
      if (!live_[i]) continue;
      if (!charging_[i]) {
        dx_[i] += ddir_[i] * speed;
        if (dx_[i] < 2.0f || dx_[i] > 84.0f - 2.0f - kDroneW) ddir_[i] = -ddir_[i];
        if (--patrol_[i] <= 0) charging_[i] = true;
        // Bomb drop.
        if (rng.uniform() < 0.008f) {
          for (int b = 0; b < kMaxBombs; ++b) {
            if (bomb_live_[b]) continue;
            bomb_live_[b] = true;
            bx_[b] = dx_[i] + kDroneW / 2.0f;
            by_[b] = kBandY[band_[i]] + kDroneH;
            break;
          }
        }
      } else {
        // Charge: run along the ground toward the player.
        float want = px_ + kPlayerW / 2.0f - kDroneW / 2.0f;
        dx_[i] += dx_[i] < want ? 0.8f : -0.8f;
      }
    }

    // Bombs fall.
    for (int b = 0; b < kMaxBombs; ++b) {
      if (!bomb_live_[b]) continue;
      by_[b] += 1.2f;
      if (by_[b] > 84.0f) bomb_live_[b] = false;
    }

    // Vertical shot vs banded drones (and the mothership is armored: shots
    // stop at the top band).
    if (vshot_live_) {
      for (int i = 0; i < kMaxDrones; ++i) {
        if (!live_[i] || charging_[i]) continue;
        float ey = kBandY[band_[i]];
        if (vx_ + 1.0f > dx_[i] && vx_ < dx_[i] + kDroneW && vy_ + 2.0f > ey &&
            vy_ < ey + kDroneH) {
          live_[i] = false;
          vshot_live_ = false;
          ++kills_;
          reward += 21.0f;
          break;
        }
      }
    }
    // Horizontal shot vs ground chargers.
    if (hshot_live_) {
      for (int i = 0; i < kMaxDrones; ++i) {
        if (!live_[i] || !charging_[i]) continue;
        if (hx_ + 2.0f > dx_[i] && hx_ < dx_[i] + kDroneW) {
          live_[i] = false;
          hshot_live_ = false;
          ++kills_;
          reward += 42.0f;
          break;
        }
      }
    }

    // Player hit: bombs or chargers.
    if (invuln_ > 0) {
      --invuln_;
    } else {
      bool hit = false;
      for (int b = 0; b < kMaxBombs; ++b) {
        if (!bomb_live_[b]) continue;
        if (bx_[b] + 1.0f > px_ && bx_[b] < px_ + kPlayerW &&
            by_[b] + 2.0f > kPlayerY && by_[b] < kPlayerY + kPlayerH) {
          hit = true;
          bomb_live_[b] = false;
        }
      }
      for (int i = 0; i < kMaxDrones; ++i) {
        if (!live_[i] || !charging_[i]) continue;
        if (dx_[i] + kDroneW > px_ && dx_[i] < px_ + kPlayerW) {
          hit = true;
          live_[i] = false;
        }
      }
      if (hit) {
        --lives_;
        invuln_ = 60;
        for (int b = 0; b < kMaxBombs; ++b) bomb_live_[b] = false;
        if (lives_ <= 0) over_ = true;
      }
    }

    score_ += static_cast<int>(reward);
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    // Score ticks.
    for (int s = 0; s < score_ / 100 && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
    // Ground line.
    for (int x = 0; x < kScreen; ++x) f[81 * kScreen + x] = 60;
    // Mothership.
    draw_rect(f, mx_, kMotherY, kMotherW, kMotherH, 160);
    // Drones (banded get brighter with depth; chargers brightest).
    for (int i = 0; i < kMaxDrones; ++i) {
      if (!live_[i]) continue;
      if (charging_[i])
        draw_rect(f, dx_[i], kGroundY, kDroneW, kDroneH, 200);
      else
        draw_rect(f, dx_[i], kBandY[band_[i]], kDroneW, kDroneH,
                  static_cast<uint8_t>(140 + 20 * band_[i]));
    }
    // Bombs and shots.
    for (int b = 0; b < kMaxBombs; ++b)
      if (bomb_live_[b]) draw_rect(f, bx_[b], by_[b], 1, 2, 100);
    if (vshot_live_) draw_rect(f, vx_, vy_, 1, 2, 224);
    if (hshot_live_) draw_rect(f, hx_, hy_, 2, 1, 224);
    // Player (blinks off while invulnerable every other 4 frames).
    if (invuln_ == 0 || (invuln_ / 4) % 2 == 0)
      draw_rect(f, px_, kPlayerY, kPlayerW, kPlayerH, 210);
    // Lives pips.
    for (int l = 0; l < lives_; ++l) draw_rect(f, 2.0f + 4.0f * static_cast<float>(l), 83.0f, 3, 1, 180);
  }

  bool game_over() const override { return over_; }
  int lives() const override { return lives_; }
  int minimal_actions() const override { return 7; }
  int minimal_to_full(int a) const override {
    // NOOP FIRE UP RIGHT LEFT RIGHTFIRE LEFTFIRE
    static const int map[7] = {0, 1, 2, 3, 4, 11, 12};
    return map[a < 0 || a >= 7 ? 0 : a];
  }

 private:
  static void draw_rect(uint8_t* f, float fx, float fy, float fw, float fh, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + fw), y1 = static_cast<int>(fy + fh);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  float px_ = 39.0f, mx_ = 36.0f, mdir_ = 1.0f;
  bool live_[kMaxDrones] = {}, charging_[kMaxDrones] = {};
  int band_[kMaxDrones] = {};
  float dx_[kMaxDrones] = {}, ddir_[kMaxDrones] = {};
  int patrol_[kMaxDrones] = {};
  bool bomb_live_[kMaxBombs] = {};
  float bx_[kMaxBombs] = {}, by_[kMaxBombs] = {};
  bool vshot_live_ = false, hshot_live_ = false;
  float vx_ = 0, vy_ = 0, hx_ = 0, hy_ = 0, hdir_ = 1.0f;
  int spawn_timer_ = 30, kills_ = 0, lives_ = 3, invuln_ = 0, score_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_assault_game() { return std::make_unique<AssaultGame>(); }

}  // namespace cleanba
