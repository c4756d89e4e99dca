// Asteroids — from-scratch C++ clone with the classic mechanics: rotate and
// thrust a drifting ship on a wrapping field, shoot rocks that split twice
// (large +20, medium +50, small +100), clear the wave for a faster one.
// One rock kill resolves per frame (both engines share this rule so the
// split bookkeeping stays engine-identical).
//
// Stands in for EnvPool's ALE Asteroids-v5 in the reference's benchmark
// configs (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs are
// not available here, so the engine provides a rules-true clone with
// identical protocol semantics (sticky actions / frameskip / stacking are
// applied by AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave9d.py and must mirror these rules exactly.

#include <cmath>
#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr int kHeadings = 16;
// cos/sin of k * 22.5 deg, as shared literals so both engines round alike.
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
constexpr int kRockSlots = 16;
const float kRockX0[4] = {10.0f, 70.0f, 10.0f, 70.0f};
const float kRockY0[4] = {12.0f, 12.0f, 66.0f, 66.0f};
const float kRockVX0[4] = {0.4f, -0.3f, 0.35f, -0.45f};
const float kRockVY0[4] = {0.3f, 0.45f, -0.4f, -0.3f};
const float kRockR[3] = {2.0f, 4.0f, 6.0f};  // by size index
const int kRockPts[3] = {100, 50, 20};
constexpr int kShots = 2;
constexpr float kShotV = 2.5f;
constexpr int kShotLife = 34;
constexpr int kFireCooldown = 9;
constexpr float kThrust = 0.06f;
constexpr float kDrag = 0.995f;
constexpr float kMaxV = 1.5f;
constexpr int kRotFrames = 3;
constexpr int kInvuln = 60;
constexpr int kLives = 3;
constexpr float kC45 = 0.7071068f;

class AsteroidsGame : public Game {
 public:
  void reset_game(PCG32&) override {
    wave_ = 0;
    lives_ = kLives;
    score_ = 0;
    over_ = false;
    respawn();
    start_wave();
  }

  float act(const AleAction& a, PCG32&) override {
    if (over_) return 0.0f;
    float reward = 0.0f;
    float wave_speed = 1.0f + 0.15f * static_cast<float>(wave_);

    // Rotation (held turns step every kRotFrames), thrust, drag, wrap.
    if (a.dx != 0) {
      if (++rot_cd_ >= kRotFrames) {
        rot_cd_ = 0;
        heading_ = (heading_ + (a.dx > 0 ? 1 : kHeadings - 1)) % kHeadings;
      }
    } else {
      rot_cd_ = kRotFrames - 1;  // first tap turns immediately
    }
    if (a.dy < 0) {  // UP thrusts
      vx_ += kHX[heading_] * kThrust;
      vy_ += kHY[heading_] * kThrust;
    }
    vx_ *= kDrag;
    vy_ *= kDrag;
    float sp = std::sqrt(vx_ * vx_ + vy_ * vy_);
    if (sp > kMaxV) {
      vx_ *= kMaxV / sp;
      vy_ *= kMaxV / sp;
    }
    px_ = wrap(px_ + vx_);
    py_ = wrap(py_ + vy_);
    if (invuln_ > 0) --invuln_;

    // Fire.
    if (fire_cd_ > 0) --fire_cd_;
    if (a.fire && fire_cd_ == 0) {
      for (int i = 0; i < kShots; ++i) {
        if (shot_live_[i]) continue;
        shot_live_[i] = true;
        shot_x_[i] = px_ + 2.0f + kHX[heading_] * 3.0f;
        shot_y_[i] = py_ + 2.0f + kHY[heading_] * 3.0f;
        shot_vx_[i] = kHX[heading_] * kShotV;
        shot_vy_[i] = kHY[heading_] * kShotV;
        shot_age_[i] = 0;
        fire_cd_ = kFireCooldown;
        break;
      }
    }
    for (int i = 0; i < kShots; ++i) {
      if (!shot_live_[i]) continue;
      shot_x_[i] += shot_vx_[i];
      shot_y_[i] += shot_vy_[i];
      if (++shot_age_[i] >= kShotLife || shot_x_[i] < 0 || shot_x_[i] >= 84 ||
          shot_y_[i] < 0 || shot_y_[i] >= 84)
        shot_live_[i] = false;
    }

    // Rocks drift and wrap.
    int alive = 0;
    for (int r = 0; r < kRockSlots; ++r) {
      if (!rock_live_[r]) continue;
      ++alive;
      rock_x_[r] = wrap(rock_x_[r] + rock_vx_[r] * wave_speed);
      rock_y_[r] = wrap(rock_y_[r] + rock_vy_[r] * wave_speed);
    }

    // One rock kill per frame: first (shot, rock) overlap in slot order.
    int hit_shot = -1, hit_rock = -1;
    for (int r = 0; r < kRockSlots && hit_rock < 0; ++r) {
      if (!rock_live_[r]) continue;
      float rr = kRockR[rock_size_[r]];
      for (int i = 0; i < kShots; ++i) {
        if (!shot_live_[i]) continue;
        if (shot_x_[i] >= rock_x_[r] - rr && shot_x_[i] < rock_x_[r] + rr &&
            shot_y_[i] >= rock_y_[r] - rr && shot_y_[i] < rock_y_[r] + rr) {
          hit_shot = i;
          hit_rock = r;
          break;
        }
      }
    }
    if (hit_rock >= 0) {
      shot_live_[hit_shot] = false;
      int size = rock_size_[hit_rock];
      reward += static_cast<float>(kRockPts[size]);
      score_ += kRockPts[size];
      rock_live_[hit_rock] = false;
      --alive;
      if (size > 0) {
        float pvx = rock_vx_[hit_rock], pvy = rock_vy_[hit_rock];
        float cvx1 = (pvx - pvy) * kC45 * 1.2f, cvy1 = (pvx + pvy) * kC45 * 1.2f;
        float cvx2 = (pvx + pvy) * kC45 * 1.2f, cvy2 = (pvy - pvx) * kC45 * 1.2f;
        spawn_rock(rock_x_[hit_rock], rock_y_[hit_rock], cvx1, cvy1, size - 1);
        spawn_rock(rock_x_[hit_rock], rock_y_[hit_rock], cvx2, cvy2, size - 1);
        alive += 2;
      }
    }

    // Ship-rock collisions.
    if (invuln_ == 0) {
      for (int r = 0; r < kRockSlots; ++r) {
        if (!rock_live_[r]) continue;
        float rr = kRockR[rock_size_[r]];
        if (px_ + 4.0f > rock_x_[r] - rr && px_ < rock_x_[r] + rr &&
            py_ + 4.0f > rock_y_[r] - rr && py_ < rock_y_[r] + rr) {
          reward += lose_life();
          return reward;
        }
      }
    }

    if (alive == 0) {
      ++wave_;
      start_wave();
      invuln_ = kInvuln;
    }
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    for (int r = 0; r < kRockSlots; ++r) {
      if (!rock_live_[r]) continue;
      float rr = kRockR[rock_size_[r]];
      draw_rect(f, rock_x_[r] - rr, rock_y_[r] - rr, 2 * rr, 2 * rr,
                static_cast<uint8_t>(120 + 30 * rock_size_[r]));
    }
    for (int i = 0; i < kShots; ++i)
      if (shot_live_[i])
        draw_rect(f, shot_x_[i] - 1.0f, shot_y_[i] - 1.0f, 2.0f, 2.0f, 220);
    // Ship body + nose marker showing the heading (blinks while invulnerable).
    if (invuln_ % 2 == 0) {
      draw_rect(f, px_, py_, 4.0f, 4.0f, 255);
      draw_rect(f, px_ + 1.0f + kHX[heading_] * 3.0f,
                py_ + 1.0f + kHY[heading_] * 3.0f, 2.0f, 2.0f, 255);
    }
    for (int s = 0; s < score_ / 20 && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
    for (int l = 0; l < lives_ && l < kLives; ++l)
      for (int k = 0; k < 3; ++k) f[82 * kScreen + 2 + l * 5 + k] = 160;
  }

  bool game_over() const override { return over_; }
  int lives() const override { return lives_; }
  int minimal_actions() const override { return 18; }
  int minimal_to_full(int a) const override { return a < 0 || a >= 18 ? 0 : a; }

 private:
  static float wrap(float v) {
    while (v < 0.0f) v += 84.0f;
    while (v >= 84.0f) v -= 84.0f;
    return v;
  }

  void spawn_rock(float x, float y, float vx, float vy, int size) {
    for (int r = 0; r < kRockSlots; ++r) {
      if (rock_live_[r]) continue;
      rock_live_[r] = true;
      rock_x_[r] = x;
      rock_y_[r] = y;
      rock_vx_[r] = vx;
      rock_vy_[r] = vy;
      rock_size_[r] = size;
      return;
    }
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
    px_ = 40.0f;
    py_ = 40.0f;
    vx_ = vy_ = 0.0f;
    heading_ = 0;
    rot_cd_ = kRotFrames - 1;
    fire_cd_ = 0;
    invuln_ = kInvuln;
    for (int i = 0; i < kShots; ++i) shot_live_[i] = false;
  }

  void start_wave() {
    for (int r = 0; r < kRockSlots; ++r) rock_live_[r] = false;
    for (int k = 0; k < 4; ++k)
      spawn_rock(kRockX0[k], kRockY0[k], kRockVX0[k], kRockVY0[k], 2);
  }

  static void draw_rect(uint8_t* f, float fx, float fy, float fw, float fh, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + fw), y1 = static_cast<int>(fy + fh);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  float px_ = 40.0f, py_ = 40.0f, vx_ = 0.0f, vy_ = 0.0f;
  int heading_ = 0, rot_cd_ = 0, fire_cd_ = 0, invuln_ = 0;
  bool shot_live_[kShots] = {};
  float shot_x_[kShots] = {}, shot_y_[kShots] = {};
  float shot_vx_[kShots] = {}, shot_vy_[kShots] = {};
  int shot_age_[kShots] = {};
  bool rock_live_[kRockSlots] = {};
  float rock_x_[kRockSlots] = {}, rock_y_[kRockSlots] = {};
  float rock_vx_[kRockSlots] = {}, rock_vy_[kRockSlots] = {};
  int rock_size_[kRockSlots] = {};
  int wave_ = 0;
  int lives_ = kLives;
  int score_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_asteroids_game() { return std::make_unique<AsteroidsGame>(); }

}  // namespace cleanba
