// StarGunner — from-scratch C++ clone with the classic mechanics: the
// gunship flies on the left of a horizontally scrolling field, raiders
// stream in from the right (some bobbing, some homing on the ship) and fire
// homing bolts; the ship answers with rapid right-firing cannon rounds.
//
// Stands in for EnvPool's ALE StarGunner-v5 in the reference's benchmark
// configs (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs are
// not available here, so the engine provides a rules-true clone with
// identical protocol semantics (sticky actions / frameskip / stacking are
// applied by AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave6.py and must mirror these rules exactly.
//
// Enemy bobbing uses a triangle wave (not sin) so the C++ and JAX engines
// compute bit-identical float32 positions.

#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr float kShipW = 6.0f, kShipH = 4.0f;
constexpr float kXMin = 4.0f, kXMax = 40.0f, kYMin = 10.0f, kYMax = 70.0f;
constexpr int kMaxEnemies = 5;
constexpr int kMaxShots = 2;
constexpr int kMaxBolts = 3;

inline float tri(float p) {
  p = p - 4.0f * static_cast<float>(static_cast<int>(p / 4.0f));
  if (p < 0.0f) p += 4.0f;
  if (p < 1.0f) return p;
  if (p < 3.0f) return 2.0f - p;
  return p - 4.0f;
}

class StarGunnerGame : public Game {
 public:
  void reset_game(PCG32&) override {
    px_ = 10.0f;
    py_ = 40.0f;
    for (int e = 0; e < kMaxEnemies; ++e) elive_[e] = false;
    for (int s = 0; s < kMaxShots; ++s) slive_[s] = false;
    for (int b = 0; b < kMaxBolts; ++b) blive_[b] = false;
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

    px_ += static_cast<float>(a.dx) * 1.5f;
    py_ += static_cast<float>(a.dy) * 1.5f;
    px_ = px_ < kXMin ? kXMin : (px_ > kXMax ? kXMax : px_);
    py_ = py_ < kYMin ? kYMin : (py_ > kYMax ? kYMax : py_);

    if (a.fire) {
      for (int s = 0; s < kMaxShots; ++s) {
        if (slive_[s]) continue;
        slive_[s] = true;
        sx_[s] = px_ + kShipW;
        sy_[s] = py_ + kShipH / 2.0f;
        break;
      }
    }
    for (int s = 0; s < kMaxShots; ++s) {
      if (!slive_[s]) continue;
      sx_[s] += 3.0f;
      if (sx_[s] > 84.0f) slive_[s] = false;
    }

    // Raiders stream in from the right.
    if (--spawn_timer_ <= 0) {
      int interval = 50 - 2 * (kills_ / 5);
      spawn_timer_ = interval < 22 ? 22 : interval;
      for (int e = 0; e < kMaxEnemies; ++e) {
        if (elive_[e]) continue;
        elive_[e] = true;
        ex_[e] = 84.0f;
        ey_[e] = 12.0f + rng.uniform() * 56.0f;
        ey0_[e] = ey_[e];
        homing_[e] = rng.uniform() < 0.3f;
        phase_[e] = rng.uniform() * 4.0f;
        break;
      }
    }
    float speed = 1.0f + 0.1f * static_cast<float>(kills_ / 10);
    for (int e = 0; e < kMaxEnemies; ++e) {
      if (!elive_[e]) continue;
      ex_[e] -= speed;
      if (homing_[e]) {
        ey_[e] += ey_[e] < py_ ? 0.5f : -0.5f;
      } else {
        phase_[e] += 0.08f;
        ey_[e] = ey0_[e] + 6.0f * tri(phase_[e]);
      }
      // Bolt fire toward the ship.
      if (rng.uniform() < 0.004f) {
        for (int b = 0; b < kMaxBolts; ++b) {
          if (blive_[b]) continue;
          blive_[b] = true;
          bx_[b] = ex_[e];
          by_[b] = ey_[e] + 1.0f;
          bvy_[b] = by_[b] < py_ ? 0.6f : -0.6f;
          break;
        }
      }
      if (ex_[e] < -6.0f) elive_[e] = false;
    }
    for (int b = 0; b < kMaxBolts; ++b) {
      if (!blive_[b]) continue;
      bx_[b] -= 2.0f;
      by_[b] += bvy_[b];
      if (bx_[b] < 0.0f) blive_[b] = false;
    }

    // Shots vs raiders.
    for (int s = 0; s < kMaxShots; ++s) {
      if (!slive_[s]) continue;
      for (int e = 0; e < kMaxEnemies; ++e) {
        if (!elive_[e]) continue;
        if (sx_[s] + 2.0f > ex_[e] && sx_[s] < ex_[e] + 5.0f &&
            sy_[s] + 1.0f > ey_[e] && sy_[s] < ey_[e] + 3.0f) {
          elive_[e] = false;
          slive_[s] = false;
          ++kills_;
          reward += homing_[e] ? 300.0f : 100.0f;
          break;
        }
      }
    }

    // Ship hits.
    if (invuln_ > 0) {
      --invuln_;
    } else {
      bool hit = false;
      for (int e = 0; e < kMaxEnemies; ++e) {
        if (!elive_[e]) continue;
        if (ex_[e] + 5.0f > px_ && ex_[e] < px_ + kShipW &&
            ey_[e] + 3.0f > py_ && ey_[e] < py_ + kShipH) {
          hit = true;
          elive_[e] = false;
        }
      }
      for (int b = 0; b < kMaxBolts; ++b) {
        if (!blive_[b]) continue;
        if (bx_[b] + 2.0f > px_ && bx_[b] < px_ + kShipW &&
            by_[b] + 1.0f > py_ && by_[b] < py_ + kShipH) {
          hit = true;
          blive_[b] = false;
        }
      }
      if (hit) {
        --lives_;
        invuln_ = 60;
        for (int b = 0; b < kMaxBolts; ++b) blive_[b] = false;
        if (lives_ <= 0) over_ = true;
      }
    }

    score_ += static_cast<int>(reward);
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    for (int s = 0; s < score_ / 500 && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
    // Starfield rows (static texture).
    for (int y = 6; y < 80; y += 9)
      for (int x = 3; x < kScreen; x += 11) f[y * kScreen + x] = 50;
    for (int e = 0; e < kMaxEnemies; ++e)
      if (elive_[e]) draw_rect(f, ex_[e], ey_[e], 5, 3, homing_[e] ? 220 : 150);
    for (int s = 0; s < kMaxShots; ++s)
      if (slive_[s]) draw_rect(f, sx_[s], sy_[s], 2, 1, 224);
    for (int b = 0; b < kMaxBolts; ++b)
      if (blive_[b]) draw_rect(f, bx_[b], by_[b], 2, 1, 120);
    if (invuln_ == 0 || (invuln_ / 4) % 2 == 0)
      draw_rect(f, px_, py_, kShipW, kShipH, 210);
    for (int l = 0; l < lives_; ++l) draw_rect(f, 2.0f + 4.0f * static_cast<float>(l), 83.0f, 3, 1, 180);
  }

  bool game_over() const override { return over_; }
  int lives() const override { return lives_; }
  int minimal_actions() const override { return 18; }
  int minimal_to_full(int a) const override { return a < 0 || a >= 18 ? 0 : a; }

 private:
  static void draw_rect(uint8_t* f, float fx, float fy, float fw, float fh, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + fw), y1 = static_cast<int>(fy + fh);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  float px_ = 10.0f, py_ = 40.0f;
  bool elive_[kMaxEnemies] = {}, homing_[kMaxEnemies] = {};
  float ex_[kMaxEnemies] = {}, ey_[kMaxEnemies] = {}, ey0_[kMaxEnemies] = {},
        phase_[kMaxEnemies] = {};
  bool slive_[kMaxShots] = {};
  float sx_[kMaxShots] = {}, sy_[kMaxShots] = {};
  bool blive_[kMaxBolts] = {};
  float bx_[kMaxBolts] = {}, by_[kMaxBolts] = {}, bvy_[kMaxBolts] = {};
  int spawn_timer_ = 30, kills_ = 0, lives_ = 3, invuln_ = 0, score_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_star_gunner_game() {
  return std::make_unique<StarGunnerGame>();
}

}  // namespace cleanba
