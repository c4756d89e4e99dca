// Gravitar — from-scratch C++ clone with the classic mechanics: a thrust-
// or-die ship in a star's gravity well, rotating and firing at the gun
// bunkers ringing the planet (+250 each); drifting into the star, the
// terrain, or bunker fire costs a ship. Clearing every bunker re-arms the
// planet at higher gravity.
//
// Stands in for EnvPool's ALE Gravitar-v5 in the reference's benchmark
// configs (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs are
// not available here, so the engine provides a rules-true clone with
// identical protocol semantics (sticky actions / frameskip / stacking are
// applied by AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave11.py and must mirror these rules exactly.

#include <cmath>
#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr int kHeadings = 16;
const float kHX[kHeadings] = {
    0.0f,       0.3826834f,  0.7071068f,  0.9238795f,  1.0f,
    0.9238795f, 0.7071068f,  0.3826834f,  0.0f,        -0.3826834f,
    -0.7071068f, -0.9238795f, -1.0f,      -0.9238795f, -0.7071068f,
    -0.3826834f};
const float kHY[kHeadings] = {
    -1.0f,      -0.9238795f, -0.7071068f, -0.3826834f, 0.0f,
    0.3826834f, 0.7071068f,  0.9238795f,  1.0f,        0.9238795f,
    0.7071068f, 0.3826834f,  0.0f,        -0.3826834f, -0.7071068f,
    -0.9238795f};
constexpr float kStarX = 42.0f, kStarY = 42.0f, kStarR = 5.0f;
constexpr float kGravity = 9.0f;   // a / r^2 scale
constexpr float kThrust = 0.07f;
constexpr float kMaxV = 1.4f;
constexpr int kRotFrames = 3;
constexpr int kBunkers = 4;
const float kBunkX[kBunkers] = {20.0f, 58.0f, 20.0f, 58.0f};
const float kBunkY[kBunkers] = {22.0f, 22.0f, 58.0f, 58.0f};
constexpr float kBunkW = 6.0f, kBunkH = 4.0f;
constexpr float kShotV = 2.4f;
constexpr float kBShotV = 1.2f;
constexpr int kBFirePeriod = 150;
constexpr int kLives = 3;
constexpr int kInvuln = 50;

class GravitarGame : public Game {
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
    float grav = kGravity * (1.0f + 0.2f * static_cast<float>(level_));

    if (a.dx != 0) {
      if (++rot_cd_ >= kRotFrames) {
        rot_cd_ = 0;
        heading_ = (heading_ + (a.dx > 0 ? 1 : kHeadings - 1)) % kHeadings;
      }
    } else {
      rot_cd_ = kRotFrames - 1;
    }
    if (a.dy < 0) {  // UP thrusts
      vx_ += kHX[heading_] * kThrust;
      vy_ += kHY[heading_] * kThrust;
    }
    // The star pulls.
    float sx = kStarX - (px_ + 2.0f), sy = kStarY - (py_ + 2.0f);
    float r2 = sx * sx + sy * sy + 16.0f;
    float r = std::sqrt(r2);
    vx_ += sx / r * grav / r2;
    vy_ += sy / r * grav / r2;
    float sp = std::sqrt(vx_ * vx_ + vy_ * vy_);
    if (sp > kMaxV) {
      vx_ *= kMaxV / sp;
      vy_ *= kMaxV / sp;
    }
    px_ += vx_;
    py_ += vy_;
    if (invuln_ > 0) --invuln_;
    // Arena edges bounce softly.
    if (px_ < 2.0f || px_ > 78.0f) vx_ = -vx_;
    if (py_ < 10.0f || py_ > 78.0f) vy_ = -vy_;
    px_ = px_ < 2.0f ? 2.0f : (px_ > 78.0f ? 78.0f : px_);
    py_ = py_ < 10.0f ? 10.0f : (py_ > 78.0f ? 78.0f : py_);

    // Fell into the star.
    if (invuln_ == 0 && r < kStarR + 3.0f) {
      reward += lose_life();
      return reward;
    }

    if (a.fire && !shot_live_) {
      shot_live_ = true;
      shot_x_ = px_ + 2.0f + kHX[heading_] * 3.0f;
      shot_y_ = py_ + 2.0f + kHY[heading_] * 3.0f;
      shot_vx_ = kHX[heading_] * kShotV;
      shot_vy_ = kHY[heading_] * kShotV;
    }
    if (shot_live_) {
      shot_x_ += shot_vx_;
      shot_y_ += shot_vy_;
      if (shot_x_ < 0 || shot_x_ >= 84 || shot_y_ < 0 || shot_y_ >= 84)
        shot_live_ = false;
    }

    int alive = 0;
    for (int b = 0; b < kBunkers; ++b) {
      if (!bunk_alive_[b]) continue;
      ++alive;
      if (!bshot_live_[b] && ++bfire_[b] >= kBFirePeriod) {
        bfire_[b] = 0;
        bshot_live_[b] = true;
        float dx = px_ + 2.0f - (kBunkX[b] + kBunkW / 2.0f);
        float dy = py_ + 2.0f - (kBunkY[b] + kBunkH / 2.0f);
        float n = std::sqrt(dx * dx + dy * dy) + 1e-3f;
        bshot_x_[b] = kBunkX[b] + kBunkW / 2.0f;
        bshot_y_[b] = kBunkY[b] + kBunkH / 2.0f;
        bshot_vx_[b] = dx / n * kBShotV;
        bshot_vy_[b] = dy / n * kBShotV;
      }
      if (shot_live_ && shot_x_ >= kBunkX[b] && shot_x_ < kBunkX[b] + kBunkW &&
          shot_y_ >= kBunkY[b] && shot_y_ < kBunkY[b] + kBunkH) {
        shot_live_ = false;
        bunk_alive_[b] = false;
        reward += 250.0f;
        score_ += 250;
        --alive;
        continue;
      }
      if (invuln_ == 0 && px_ + 4.0f > kBunkX[b] && px_ < kBunkX[b] + kBunkW &&
          py_ + 4.0f > kBunkY[b] && py_ < kBunkY[b] + kBunkH) {
        reward += lose_life();
        return reward;
      }
    }

    for (int b = 0; b < kBunkers; ++b) {
      if (!bshot_live_[b]) continue;
      bshot_x_[b] += bshot_vx_[b];
      bshot_y_[b] += bshot_vy_[b];
      if (bshot_x_[b] < 0 || bshot_x_[b] >= 84 || bshot_y_[b] < 0 ||
          bshot_y_[b] >= 84) {
        bshot_live_[b] = false;
        continue;
      }
      if (invuln_ == 0 && px_ + 4.0f > bshot_x_[b] - 1.0f &&
          px_ < bshot_x_[b] + 1.0f && py_ + 4.0f > bshot_y_[b] - 1.0f &&
          py_ < bshot_y_[b] + 1.0f) {
        reward += lose_life();
        return reward;
      }
    }

    if (alive == 0) {
      ++level_;
      start_level();
      invuln_ = kInvuln;
    }
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    draw_rect(f, kStarX - kStarR, kStarY - kStarR, 2 * kStarR, 2 * kStarR, 230);
    for (int b = 0; b < kBunkers; ++b) {
      if (bunk_alive_[b])
        draw_rect(f, kBunkX[b], kBunkY[b], kBunkW, kBunkH, 140);
      if (bshot_live_[b])
        draw_rect(f, bshot_x_[b] - 1.0f, bshot_y_[b] - 1.0f, 2.0f, 2.0f, 210);
    }
    if (shot_live_) draw_rect(f, shot_x_ - 1.0f, shot_y_ - 1.0f, 2.0f, 2.0f, 220);
    if (invuln_ % 2 == 0) {
      draw_rect(f, px_, py_, 4.0f, 4.0f, 255);
      draw_rect(f, px_ + 1.0f + kHX[heading_] * 3.0f,
                py_ + 1.0f + kHY[heading_] * 3.0f, 2.0f, 2.0f, 255);
    }
    for (int s = 0; s < score_ / 250 && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
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
    px_ = 10.0f;
    py_ = 14.0f;
    vx_ = 0.6f;
    vy_ = 0.0f;
    heading_ = 4;  // facing right
    rot_cd_ = kRotFrames - 1;
    shot_live_ = false;
    invuln_ = kInvuln;
    for (int b = 0; b < kBunkers; ++b) bshot_live_[b] = false;
  }

  void start_level() {
    for (int b = 0; b < kBunkers; ++b) {
      bunk_alive_[b] = true;
      bfire_[b] = 37 * b;  // stagger the batteries
      bshot_live_[b] = false;
    }
  }

  static void draw_rect(uint8_t* f, float fx, float fy, float fw, float fh, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + fw), y1 = static_cast<int>(fy + fh);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  float px_ = 10.0f, py_ = 14.0f, vx_ = 0.6f, vy_ = 0.0f;
  int heading_ = 4, rot_cd_ = 0, invuln_ = 0;
  bool shot_live_ = false;
  float shot_x_ = 0, shot_y_ = 0, shot_vx_ = 0, shot_vy_ = 0;
  bool bunk_alive_[kBunkers] = {};
  int bfire_[kBunkers] = {};
  bool bshot_live_[kBunkers] = {};
  float bshot_x_[kBunkers] = {}, bshot_y_[kBunkers] = {};
  float bshot_vx_[kBunkers] = {}, bshot_vy_[kBunkers] = {};
  int level_ = 0;
  int lives_ = kLives;
  int score_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_gravitar_game() { return std::make_unique<GravitarGame>(); }

}  // namespace cleanba
