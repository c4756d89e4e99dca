// Solaris — from-scratch C++ clone of the combat zones: enemy squadrons
// warp in on weaving sine paths and strafe; burn them down (+150 each,
// +500 a cleared squadron refuels) before your fuel runs dry. Running the
// tank empty costs a ship.
//
// Stands in for EnvPool's ALE Solaris-v5 in the reference's benchmark
// configs (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs
// are not available here, so the engine provides a rules-true clone with
// identical protocol semantics (sticky actions / frameskip / stacking are
// applied by AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave13.py and must mirror these rules exactly.

#include <cmath>
#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr int kSquad = 3;
constexpr float kEnemyW = 6.0f, kEnemyH = 4.0f;
constexpr float kPlayerW = 6.0f, kPlayerH = 4.0f;
constexpr float kMoveX = 1.2f, kMoveY = 0.8f;
constexpr float kShotV = 3.0f;
constexpr float kEShotV = 1.5f;
constexpr int kFuel = 6000;
constexpr int kRefuel = 1500;
constexpr int kLives = 3;
// Shared sine table (quarter-degree steps would drift between compilers;
// use the same 16-entry table both engines index by phase>>4).
const float kSine[16] = {0.0f, 0.3826834f, 0.7071068f, 0.9238795f,
                         1.0f, 0.9238795f, 0.7071068f, 0.3826834f,
                         0.0f, -0.3826834f, -0.7071068f, -0.9238795f,
                         -1.0f, -0.9238795f, -0.7071068f, -0.3826834f};

class SolarisGame : public Game {
 public:
  void reset_game(PCG32&) override {
    wave_ = 0;
    lives_ = kLives;
    score_ = 0;
    over_ = false;
    fuel_ = kFuel;
    respawn();
    warp_in();
  }

  float act(const AleAction& a, PCG32& rng) override {
    if (over_) return 0.0f;
    float reward = 0.0f;
    float espeed = 0.5f + 0.08f * static_cast<float>(wave_);
    ++frame_;

    px_ += static_cast<float>(a.dx) * kMoveX;
    py_ += static_cast<float>(a.dy) * kMoveY;
    if (px_ < 2.0f) px_ = 2.0f;
    if (px_ > 82.0f - kPlayerW) px_ = 82.0f - kPlayerW;
    if (py_ < 52.0f) py_ = 52.0f;
    if (py_ > 78.0f) py_ = 78.0f;

    if (a.fire && !shot_live_) {
      shot_live_ = true;
      shot_x_ = px_ + kPlayerW / 2.0f;
      shot_y_ = py_;
    }
    if (shot_live_) {
      shot_y_ -= kShotV;
      if (shot_y_ < 0.0f) shot_live_ = false;
    }

    int alive = 0;
    for (int e = 0; e < kSquad; ++e) {
      if (!enemy_live_[e]) continue;
      ++alive;
      // Weave: advance the phase, ride the sine horizontally, drift down.
      phase_[e] = (phase_[e] + 3) & 255;
      ex_[e] += kSine[phase_[e] >> 4] * espeed * 1.6f;
      ey_[e] += espeed * 0.12f;
      if (ex_[e] < 2.0f) ex_[e] = 2.0f;
      if (ex_[e] > 82.0f - kEnemyW) ex_[e] = 82.0f - kEnemyW;
      if (ey_[e] > 48.0f) ey_[e] = 12.0f;  // loop back to the top
      // Strafe.
      if (!eshot_live_[e] && std::fabs(ex_[e] - px_) < 6.0f &&
          rng.uniform() < 0.02f) {
        eshot_live_[e] = true;
        eshot_x_[e] = ex_[e] + kEnemyW / 2.0f;
        eshot_y_[e] = ey_[e] + kEnemyH;
      }
      if (shot_live_ && shot_x_ >= ex_[e] && shot_x_ < ex_[e] + kEnemyW &&
          shot_y_ >= ey_[e] && shot_y_ < ey_[e] + kEnemyH) {
        shot_live_ = false;
        enemy_live_[e] = false;
        reward += 150.0f;
        score_ += 150;
        --alive;
      }
    }
    for (int e = 0; e < kSquad; ++e) {
      if (!eshot_live_[e]) continue;
      eshot_y_[e] += kEShotV;
      if (eshot_y_[e] >= 84.0f) {
        eshot_live_[e] = false;
        continue;
      }
      if (px_ + kPlayerW > eshot_x_[e] - 1.0f && px_ < eshot_x_[e] + 1.0f &&
          py_ + kPlayerH > eshot_y_[e] - 1.0f && py_ < eshot_y_[e] + 1.0f) {
        reward += lose_life();
        return reward;
      }
    }

    if (alive == 0) {
      reward += 500.0f;
      score_ += 500;
      fuel_ += kRefuel;
      if (fuel_ > kFuel) fuel_ = kFuel;
      ++wave_;
      warp_in();
    }

    if (--fuel_ <= 0) {
      reward += lose_life();
      fuel_ = kFuel;
      return reward;
    }
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    // Starfield rows.
    for (int y = 6; y < 48; y += 7)
      for (int x = 3; x < 81; x += 9) f[y * kScreen + x] = 60;
    for (int e = 0; e < kSquad; ++e) {
      if (enemy_live_[e]) draw_rect(f, ex_[e], ey_[e], kEnemyW, kEnemyH, 170);
      if (eshot_live_[e])
        draw_rect(f, eshot_x_[e] - 1.0f, eshot_y_[e] - 1.0f, 2.0f, 2.0f, 210);
    }
    if (shot_live_) draw_rect(f, shot_x_ - 1.0f, shot_y_ - 2.0f, 2.0f, 3.0f, 220);
    draw_rect(f, px_, py_, kPlayerW, kPlayerH, 255);
    // Fuel gauge.
    int bars = fuel_ * 60 / kFuel;
    for (int t = 0; t < bars; ++t) f[3 * kScreen + 2 + t] = 160;
    for (int s = 0; s < score_ / 150 && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
    for (int l = 0; l < lives_ && l < kLives; ++l)
      for (int k = 0; k < 3; ++k) f[82 * kScreen + 2 + l * 5 + k] = 160;
  }

  bool game_over() const override { return over_; }
  int lives() const override { return lives_; }
  int minimal_actions() const override { return 18; }
  int minimal_to_full(int a) const override { return a < 0 || a >= 18 ? 0 : a; }

 private:
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
    px_ = 39.0f;
    py_ = 70.0f;
    shot_live_ = false;
    for (int e = 0; e < kSquad; ++e) eshot_live_[e] = false;
    frame_ = 0;
  }

  void warp_in() {
    for (int e = 0; e < kSquad; ++e) {
      enemy_live_[e] = true;
      ex_[e] = 14.0f + static_cast<float>(e) * 22.0f;
      ey_[e] = 12.0f + static_cast<float>(e) * 6.0f;
      phase_[e] = e * 85;
      eshot_live_[e] = false;
    }
  }

  static void draw_rect(uint8_t* f, float fx, float fy, float fw, float fh, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + fw), y1 = static_cast<int>(fy + fh);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  float px_ = 39.0f, py_ = 70.0f;
  bool shot_live_ = false;
  float shot_x_ = 0, shot_y_ = 0;
  bool enemy_live_[kSquad] = {};
  float ex_[kSquad] = {}, ey_[kSquad] = {};
  int phase_[kSquad] = {};
  bool eshot_live_[kSquad] = {};
  float eshot_x_[kSquad] = {}, eshot_y_[kSquad] = {};
  int fuel_ = kFuel;
  int frame_ = 0;
  int wave_ = 0;
  int lives_ = kLives;
  int score_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_solaris_game() { return std::make_unique<SolarisGame>(); }

}  // namespace cleanba
