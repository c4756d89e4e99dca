// Seaquest — from-scratch C++ clone of the classic submarine game: shoot
// enemy fish/subs (+20), rescue divers, manage oxygen by surfacing (cashing
// rescued divers for +50 each), 3 lives.
//
// Stands in for EnvPool's ALE Seaquest-v5 (reference make_env,
// cleanba/cleanba_ppo.py:126-146). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_extra.py and must mirror these rules exactly.

#include <cmath>
#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr float kSurfaceY = 12.0f;  // water line (player top y at surface)
constexpr int kPlayerW = 8, kPlayerH = 4;
constexpr float kPlayerSpeed = 1.25f;
constexpr float kXMin = 2.0f, kXMax = 74.0f;
constexpr float kYMin = kSurfaceY, kYMax = 76.0f;
constexpr int kNEnemies = 4;
constexpr int kNDivers = 2;
constexpr int kEnemyW = 6, kEnemyH = 3;
constexpr int kDiverW = 4, kDiverH = 3;
constexpr float kTorpedoSpeed = 3.0f;
constexpr int kMaxOxygen = 1024;
constexpr int kMaxHeld = 6;

class SeaquestGame : public Game {
 public:
  void reset_game(PCG32&) override {
    lives_ = 3;
    over_ = false;
    oxygen_ = kMaxOxygen;
    held_ = 0;
    respawn();
    for (int i = 0; i < kNEnemies; ++i) e_live_[i] = false;
    for (int i = 0; i < kNDivers; ++i) d_live_[i] = false;
    spawn_clock_ = 60;   // deterministic first-spawn delay (reset parity)
    diver_clock_ = 120;
  }

  float act(const AleAction& a, PCG32& rng) override {
    if (over_) return 0.0f;
    float reward = 0.0f;

    // Player movement; remember horizontal facing for torpedo launches.
    px_ = clampf(px_ + kPlayerSpeed * a.dx, kXMin, kXMax);
    py_ = clampf(py_ + kPlayerSpeed * a.dy, kYMin, kYMax);
    if (a.dx != 0) facing_ = a.dx;

    // Fire: one torpedo in flight.
    if (a.fire && !t_live_) {
      t_live_ = true;
      t_x_ = facing_ > 0 ? px_ + kPlayerW : px_ - 3.0f;
      t_y_ = py_ + 1.0f;
      t_dir_ = facing_;
    }
    if (t_live_) {
      t_x_ += kTorpedoSpeed * t_dir_;
      if (t_x_ < -3.0f || t_x_ > 84.0f) t_live_ = false;
    }

    // Enemy spawns: alternate sides, random lane/speed.
    if (--spawn_clock_ <= 0) {
      spawn_clock_ = 40 + static_cast<int>(rng.randint(40));
      for (int i = 0; i < kNEnemies; ++i) {
        if (e_live_[i]) continue;
        e_live_[i] = true;
        e_y_[i] = 20.0f + static_cast<float>(rng.randint(52));
        e_dir_[i] = (rng.next_uint32() & 1) ? 1.0f : -1.0f;
        e_x_[i] = e_dir_[i] > 0 ? -kEnemyW : 84.0f;
        e_speed_[i] = 0.6f + 0.1f * static_cast<float>(rng.randint(5));
        break;
      }
    }
    // Diver spawns.
    if (--diver_clock_ <= 0) {
      diver_clock_ = 80 + static_cast<int>(rng.randint(80));
      for (int i = 0; i < kNDivers; ++i) {
        if (d_live_[i]) continue;
        d_live_[i] = true;
        d_y_[i] = 24.0f + static_cast<float>(rng.randint(44));
        d_dir_[i] = (rng.next_uint32() & 1) ? 1.0f : -1.0f;
        d_x_[i] = d_dir_[i] > 0 ? -kDiverW : 84.0f;
        break;
      }
    }

    // Enemies advance; torpedo and player collisions.
    for (int i = 0; i < kNEnemies; ++i) {
      if (!e_live_[i]) continue;
      e_x_[i] += e_dir_[i] * e_speed_[i];
      if (e_x_[i] < -kEnemyW - 2 || e_x_[i] > 86.0f) e_live_[i] = false;
      if (t_live_ && overlap(t_x_, t_y_, 3, 1, e_x_[i], e_y_[i], kEnemyW, kEnemyH)) {
        e_live_[i] = false;
        t_live_ = false;
        reward += 20.0f;
      }
      if (e_live_[i] &&
          overlap(px_, py_, kPlayerW, kPlayerH, e_x_[i], e_y_[i], kEnemyW, kEnemyH)) {
        e_live_[i] = false;
        reward += lose_life();
        if (over_) return reward;
      }
    }
    // Divers drift; pickup on contact.
    for (int i = 0; i < kNDivers; ++i) {
      if (!d_live_[i]) continue;
      d_x_[i] += d_dir_[i] * 0.4f;
      if (d_x_[i] < -kDiverW - 2 || d_x_[i] > 86.0f) d_live_[i] = false;
      if (d_live_[i] && held_ < kMaxHeld &&
          overlap(px_, py_, kPlayerW, kPlayerH, d_x_[i], d_y_[i], kDiverW, kDiverH)) {
        d_live_[i] = false;
        ++held_;
      }
    }

    // Oxygen: depletes underwater, refills (and cashes divers) at the surface.
    if (py_ > kSurfaceY + 2.0f) {
      if (--oxygen_ <= 0) {
        reward += lose_life();
        return reward;
      }
    } else {
      if (held_ > 0 && oxygen_ < kMaxOxygen) {
        reward += 50.0f * held_;
        held_ = 0;
      }
      oxygen_ = oxygen_ + 8 > kMaxOxygen ? kMaxOxygen : oxygen_ + 8;
    }
    return reward;
  }

  void render(uint8_t* f) const override {
    // Sky / water split, oxygen bar, HUD ticks.
    for (int y = 0; y < kScreen; ++y) {
      uint8_t shade = y < static_cast<int>(kSurfaceY) ? 150 : 40;
      for (int x = 0; x < kScreen; ++x) f[y * kScreen + x] = shade;
    }
    for (int x = 0; x < 76 * oxygen_ / kMaxOxygen; ++x) {
      f[80 * kScreen + 4 + x] = 230;
      f[81 * kScreen + 4 + x] = 230;
    }
    for (int l = 0; l < lives_; ++l)
      for (int k = 0; k < 3; ++k) f[1 * kScreen + 2 + l * 5 + k] = 255;
    for (int d = 0; d < held_; ++d)
      for (int k = 0; k < 3; ++k) f[3 * kScreen + 2 + d * 5 + k] = 180;
    for (int i = 0; i < kNDivers; ++i)
      if (d_live_[i]) draw_rect(f, d_x_[i], d_y_[i], kDiverW, kDiverH, 180);
    for (int i = 0; i < kNEnemies; ++i)
      if (e_live_[i]) draw_rect(f, e_x_[i], e_y_[i], kEnemyW, kEnemyH, 90);
    if (t_live_) draw_rect(f, t_x_, t_y_, 3, 1, 255);
    draw_rect(f, px_, py_, kPlayerW, kPlayerH, 200);
  }

  bool game_over() const override { return over_; }
  int lives() const override { return lives_; }
  int minimal_actions() const override { return 18; }
  int minimal_to_full(int a) const override { return a < 0 || a >= 18 ? 0 : a; }

 private:
  static float clampf(float v, float lo, float hi) {
    return v < lo ? lo : (v > hi ? hi : v);
  }

  static bool overlap(float ax, float ay, float aw, float ah,
                      float bx, float by, float bw, float bh) {
    return ax < bx + bw && ax + aw > bx && ay < by + bh && ay + ah > by;
  }

  static void draw_rect(uint8_t* f, float fx, float fy, float fw, float fh, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + fw), y1 = static_cast<int>(fy + fh);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  // Returns 0.0f (reward shape kept for symmetry with callers).
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
    px_ = 38.0f;
    py_ = kSurfaceY;
    facing_ = 1;
    t_live_ = false;
    t_x_ = t_y_ = 0.0f;
    t_dir_ = 1;
    oxygen_ = kMaxOxygen;
  }

  float px_ = 0, py_ = 0;
  int facing_ = 1;
  bool t_live_ = false;
  float t_x_ = 0, t_y_ = 0;
  int t_dir_ = 1;
  bool e_live_[kNEnemies] = {};
  float e_x_[kNEnemies] = {}, e_y_[kNEnemies] = {}, e_dir_[kNEnemies] = {},
        e_speed_[kNEnemies] = {};
  bool d_live_[kNDivers] = {};
  float d_x_[kNDivers] = {}, d_y_[kNDivers] = {}, d_dir_[kNDivers] = {};
  int spawn_clock_ = 60, diver_clock_ = 120;
  int oxygen_ = kMaxOxygen;
  int held_ = 0;
  int lives_ = 3;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_seaquest_game() { return std::make_unique<SeaquestGame>(); }

}  // namespace cleanba
