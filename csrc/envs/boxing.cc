// Boxing — from-scratch C++ clone of the classic top-down two-boxer match:
// move in the ring, punch when in range (+1 landed / -1 taken), knockback,
// 100-point KO or the round timer ends the bout.
//
// Stands in for EnvPool's ALE Boxing-v5 (reference make_env,
// cleanba/cleanba_ppo.py:126-146). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_extra.py and must mirror these rules exactly.

#include <cmath>
#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr float kRingL = 8.0f, kRingR = 76.0f;   // x range for boxer left edge
constexpr float kRingT = 12.0f, kRingB = 72.0f;  // y range for boxer top edge
constexpr int kBoxerW = 6, kBoxerH = 8;
constexpr float kPlayerSpeed = 1.2f;
constexpr float kCpuSpeed = 0.9f;
constexpr float kPunchRange = 11.0f;  // center distance for a landable punch
constexpr int kPunchCooldown = 10;    // raw frames between punches
constexpr int kKnockback = 5;
constexpr int kKO = 100;
constexpr int kGameFrames = 7200;  // ~the real 2-minute round

class BoxingGame : public Game {
 public:
  void reset_game(PCG32&) override {
    px_ = 16.0f; py_ = 38.0f;   // player left, CPU right (deterministic)
    cx_ = 62.0f; cy_ = 38.0f;
    p_score_ = c_score_ = 0;
    p_cool_ = c_cool_ = 0;
    frame_ = 0;
    over_ = false;
  }

  float act(const AleAction& a, PCG32& rng) override {
    if (over_) return 0.0f;
    float reward = 0.0f;

    // Player movement.
    px_ = clampf(px_ + kPlayerSpeed * a.dx, kRingL, kRingR);
    py_ = clampf(py_ + kPlayerSpeed * a.dy, kRingT, kRingB);

    // CPU tracks the player with a small deadzone.
    float ddx = (px_ - cx_), ddy = (py_ - cy_);
    if (std::fabs(ddx) > 2.0f) cx_ = clampf(cx_ + (ddx > 0 ? kCpuSpeed : -kCpuSpeed), kRingL, kRingR);
    if (std::fabs(ddy) > 2.0f) cy_ = clampf(cy_ + (ddy > 0 ? kCpuSpeed : -kCpuSpeed), kRingT, kRingB);

    float dist = center_dist();
    if (p_cool_ > 0) --p_cool_;
    if (c_cool_ > 0) --c_cool_;

    // Player punch.
    if (a.fire && p_cool_ == 0) {
      p_cool_ = kPunchCooldown;
      if (dist < kPunchRange) {
        ++p_score_;
        reward += 1.0f;
        knockback(cx_, cy_, px_, py_);
        if (p_score_ >= kKO) over_ = true;
      }
    }
    // CPU punch: when in range and off cooldown, with a random jitter so the
    // bout is not a fixed trade loop.
    if (!over_ && c_cool_ == 0 && dist < kPunchRange) {
      c_cool_ = kPunchCooldown + static_cast<int>(rng.randint(16));
      ++c_score_;
      reward -= 1.0f;
      knockback(px_, py_, cx_, cy_);
      if (c_score_ >= kKO) over_ = true;
    }

    if (++frame_ >= kGameFrames) over_ = true;
    return reward;
  }

  void render(uint8_t* f) const override {
    // Ring mat with rope border.
    std::memset(f, 0, kScreenPx);
    for (int y = 8; y < 78; ++y)
      for (int x = 4; x < 80; ++x)
        f[y * kScreen + x] = 70;
    for (int x = 4; x < 80; ++x) {
      f[8 * kScreen + x] = 160;
      f[77 * kScreen + x] = 160;
    }
    for (int y = 8; y < 78; ++y) {
      f[y * kScreen + 4] = 160;
      f[y * kScreen + 79] = 160;
    }
    // Score ticks: player top-left, CPU top-right.
    for (int s = 0; s < p_score_ && s < 40; ++s) f[2 * kScreen + 2 + s * 2] = 255;
    for (int s = 0; s < c_score_ && s < 40; ++s) f[2 * kScreen + 81 - s * 2] = 110;
    // Boxers (player bright, CPU dark).
    draw_rect(f, px_, py_, kBoxerW, kBoxerH, 220);
    draw_rect(f, cx_, cy_, kBoxerW, kBoxerH, 110);
    // Extended glove while punching (the visual telegraph).
    if (p_cool_ > kPunchCooldown - 3)
      draw_rect(f, px_ + (cx_ > px_ ? kBoxerW : -3.0f), py_ + 2, 3, 2, 255);
    if (c_cool_ > kPunchCooldown - 3)
      draw_rect(f, cx_ + (px_ > cx_ ? kBoxerW : -3.0f), cy_ + 2, 3, 2, 140);
  }

  bool game_over() const override { return over_; }
  int lives() const override { return 1; }
  int minimal_actions() const override { return 18; }
  int minimal_to_full(int a) const override { return a < 0 || a >= 18 ? 0 : a; }

 private:
  static float clampf(float v, float lo, float hi) {
    return v < lo ? lo : (v > hi ? hi : v);
  }

  float center_dist() const {
    float dx = (px_ - cx_), dy = (py_ - cy_);
    return std::sqrt(dx * dx + dy * dy);
  }

  // Push (tx, ty) away from (fx, fy) by kKnockback, staying in the ring.
  static void knockback(float& tx, float& ty, float fx, float fy) {
    tx = clampf(tx + (tx >= fx ? kKnockback : -kKnockback), kRingL, kRingR);
    ty = clampf(ty + (ty >= fy ? kKnockback : -kKnockback), kRingT, kRingB);
  }

  static void draw_rect(uint8_t* f, float fx, float fy, float fw, float fh, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + fw), y1 = static_cast<int>(fy + fh);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  float px_ = 0, py_ = 0, cx_ = 0, cy_ = 0;
  int p_score_ = 0, c_score_ = 0;
  int p_cool_ = 0, c_cool_ = 0;
  int frame_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_boxing_game() { return std::make_unique<BoxingGame>(); }

}  // namespace cleanba
