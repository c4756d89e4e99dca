// Fishing Derby — from-scratch C++ arcade game with the classic mechanics:
// two anglers race to 99 points over six rows of fish (deeper fish are worth
// more), reeling catches up past a shark that steals hooked fish near the
// surface. Reward is the signed score swing: +value on your catch, -value on
// the opponent's.
//
// Stands in for EnvPool's ALE FishingDerby-v5 in the reference's benchmark
// configs (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs are
// not available here, so the engine provides a rules-true clone with
// identical protocol semantics (sticky actions / frameskip / stacking are
// applied by AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave4.py and must mirror these rules exactly.

#include <cmath>
#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr int kRows = 6;
constexpr float kSurfaceY = 30.0f;
constexpr float kFishW = 5.0f, kFishH = 3.0f;
constexpr float kHookSpeed = 0.7f;
constexpr float kReelSpeed = 1.2f;
constexpr float kCpuSpeed = 0.6f;
constexpr float kCpuReel = 0.9f;
constexpr int kWinScore = 99;

const float kRowY[kRows] = {38.0f, 45.0f, 52.0f, 59.0f, 66.0f, 73.0f};
const float kRowSpeed[kRows] = {0.8f, 0.7f, 0.6f, 0.5f, 0.45f, 0.4f};
const int kRowValue[kRows] = {2, 2, 4, 4, 6, 6};

class FishingDerbyGame : public Game {
 public:
  void reset_game(PCG32&) override {
    // Deterministic layout (cross-engine reset-frame parity).
    for (int r = 0; r < kRows; ++r) {
      fish_x_[r] = static_cast<float>((r * 29 + 11) % 84);
      holder_[r] = 0;
    }
    hx_ = 20.0f; hy_ = 40.0f;
    cx_ = 64.0f; cy_ = 40.0f;
    shark_x_ = 0.0f;
    shark_dir_ = 1.0f;
    my_score_ = cpu_score_ = 0;
    over_ = false;
  }

  float act(const AleAction& a, PCG32& rng) override {
    if (over_) return 0.0f;
    float reward = 0.0f;

    // Player hook: free movement; FIRE reels straight up.
    hx_ += static_cast<float>(a.dx) * kHookSpeed;
    hy_ += static_cast<float>(a.dy) * kHookSpeed;
    if (a.fire) hy_ -= kReelSpeed;
    hx_ = clampf(hx_, 4.0f, 40.0f);
    hy_ = clampf(hy_, 34.0f, 78.0f);

    // CPU angler: head for the nearest free fish, then reel steadily.
    int held_cpu = held_by(2);
    if (held_cpu >= 0) {
      cy_ -= kCpuReel;
    } else {
      int best = -1;
      float best_d = 1e9f;
      for (int r = 0; r < kRows; ++r) {
        if (holder_[r] != 0) continue;
        float dx = fish_x_[r] - cx_, dy = kRowY[r] - cy_;
        float d = dx * dx + dy * dy;
        if (d < best_d) { best_d = d; best = r; }
      }
      if (best >= 0) {
        cx_ += kCpuSpeed * sgn(fish_x_[best] - cx_);
        cy_ += kCpuSpeed * sgn(kRowY[best] - cy_);
      }
    }
    cx_ = clampf(cx_, 44.0f, 80.0f);
    cy_ = clampf(cy_, 34.0f, 78.0f);

    // Fish swim and wrap; hooked fish ride their hook.
    for (int r = 0; r < kRows; ++r) {
      if (holder_[r] == 1) {
        fish_x_[r] = hx_ - 2.0f;
        continue;
      }
      if (holder_[r] == 2) {
        fish_x_[r] = cx_ - 2.0f;
        continue;
      }
      float dir = (r % 2 == 0) ? 1.0f : -1.0f;
      fish_x_[r] += dir * kRowSpeed[r];
      if (fish_x_[r] > 84.0f) fish_x_[r] = -kFishW;
      if (fish_x_[r] < -kFishW) fish_x_[r] = 84.0f;
      // Hooking: a free hook tip touching a fish snags it.
      if (overlap(hx_, hy_, fish_x_[r], kRowY[r]) && held_by(1) < 0) holder_[r] = 1;
      else if (overlap(cx_, cy_, fish_x_[r], kRowY[r]) && held_by(2) < 0) holder_[r] = 2;
    }

    // Shark patrols just under the surface and steals shallow hooked fish.
    shark_x_ += shark_dir_ * 0.9f;
    if (shark_x_ > 77.0f) { shark_x_ = 77.0f; shark_dir_ = -1.0f; }
    if (shark_x_ < 0.0f) { shark_x_ = 0.0f; shark_dir_ = 1.0f; }
    for (int r = 0; r < kRows; ++r) {
      if (holder_[r] == 0) continue;
      float fy = holder_[r] == 1 ? hy_ : cy_;
      float fx = fish_x_[r];
      if (fy < 40.0f && fx + kFishW > shark_x_ && fx < shark_x_ + 7.0f) {
        holder_[r] = 0;
        respawn(r, rng);
      }
    }

    // Landing: a hooked fish reaching the surface scores its row value.
    int mine = held_by(1);
    if (mine >= 0 && hy_ <= 34.5f) {
      reward += static_cast<float>(kRowValue[mine]);
      my_score_ += kRowValue[mine];
      holder_[mine] = 0;
      respawn(mine, rng);
    }
    int theirs = held_by(2);
    if (theirs >= 0 && cy_ <= 34.5f) {
      reward -= static_cast<float>(kRowValue[theirs]);
      cpu_score_ += kRowValue[theirs];
      holder_[theirs] = 0;
      respawn(theirs, rng);
    }

    if (my_score_ >= kWinScore || cpu_score_ >= kWinScore) over_ = true;
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    // Water surface.
    for (int x = 0; x < kScreen; ++x) {
      f[30 * kScreen + x] = 100;
      f[31 * kScreen + x] = 100;
    }
    // Score ticks: player row 1, CPU row 3 (one per 5 points).
    for (int s = 0; s < my_score_ / 5 && s < 20; ++s) f[1 * kScreen + 2 + s * 2] = 200;
    for (int s = 0; s < cpu_score_ / 5 && s < 20; ++s) f[3 * kScreen + 2 + s * 2] = 120;
    // Fishing lines from the rod tips to the hooks.
    draw_line_down(f, 20, 4, hy_, 60);
    draw_line_down(f, 64, 4, cy_, 60);
    // Shark.
    draw_rect(f, shark_x_, 33.0f, 7, 3, 90);
    // Fish.
    for (int r = 0; r < kRows; ++r) {
      float fy = holder_[r] == 1 ? hy_ : (holder_[r] == 2 ? cy_ : kRowY[r]);
      draw_rect(f, fish_x_[r], fy, kFishW, kFishH, 170);
    }
    // Hooks on top.
    draw_rect(f, hx_ - 1, hy_, 2, 3, 224);
    draw_rect(f, cx_ - 1, cy_, 2, 3, 150);
  }

  bool game_over() const override { return over_; }
  int lives() const override { return 1; }
  int minimal_actions() const override { return 18; }
  int minimal_to_full(int a) const override { return a < 0 || a >= 18 ? 0 : a; }

 private:
  static float clampf(float v, float lo, float hi) {
    return v < lo ? lo : (v > hi ? hi : v);
  }
  static float sgn(float v) { return v > 0.3f ? 1.0f : (v < -0.3f ? -1.0f : 0.0f); }
  static bool overlap(float hx, float hy, float fx, float fy) {
    return hx + 1 > fx && hx - 1 < fx + kFishW && hy + 3 > fy && hy < fy + kFishH;
  }
  int held_by(int who) const {
    for (int r = 0; r < kRows; ++r)
      if (holder_[r] == who) return r;
    return -1;
  }
  void respawn(int r, PCG32& rng) {
    fish_x_[r] = rng.uniform() < 0.5f ? -kFishW : 84.0f;
  }

  static void draw_rect(uint8_t* f, float fx, float fy, float fw, float fh, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + fw), y1 = static_cast<int>(fy + fh);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }
  static void draw_line_down(uint8_t* f, int x, int y0, float fy1, uint8_t v) {
    int y1 = static_cast<int>(fy1);
    for (int y = y0; y <= y1 && y < kScreen; ++y)
      if (x >= 0 && x < kScreen) f[y * kScreen + x] = v;
  }

  float fish_x_[kRows] = {};
  int holder_[kRows] = {};  // 0 free, 1 player, 2 cpu
  float hx_ = 20.0f, hy_ = 40.0f;
  float cx_ = 64.0f, cy_ = 40.0f;
  float shark_x_ = 0.0f, shark_dir_ = 1.0f;
  int my_score_ = 0, cpu_score_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_fishing_derby_game() {
  return std::make_unique<FishingDerbyGame>();
}

}  // namespace cleanba
