// Skiing — from-scratch C++ clone with the classic mechanics: a constant
// downhill run through 20 slalom gates; steering is the only control.
// Every raw frame costs -1 (the running clock) and each missed gate pays a
// -1000 penalty when its line is crossed, so the final score is the ALE-style
// negative time-plus-penalties total (random play lands near the -17k random
// anchor; a clean run beats the -4337 human anchor).
//
// Stands in for EnvPool's ALE Skiing-v5 in the reference's benchmark configs
// (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs are not
// available here, so the engine provides a rules-true clone with identical
// protocol semantics (sticky actions / frameskip / stacking are applied by
// AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave9.py and must mirror these rules exactly.

#include <cmath>
#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr int kGates = 20;
constexpr float kSkierY = 20.0f;
constexpr float kSkierW = 4.0f, kSkierH = 5.0f;
constexpr float kSteer = 1.2f;        // px per raw frame of sideways control
constexpr float kScroll = 1.0f;       // world px per raw frame downhill
constexpr float kGateHalf = 8.0f;     // flags sit at center +- 8
constexpr float kPoleW = 2.0f, kPoleH = 6.0f;
constexpr float kFirstGateY = 100.0f;
constexpr float kGateGap = 90.0f;
constexpr float kFinishPad = 40.0f;
constexpr float kMissPenalty = -1000.0f;

inline float gate_cx(int i) { return static_cast<float>(20 + (i * 37) % 45); }

class SkiingGame : public Game {
 public:
  void reset_game(PCG32&) override {
    x_ = 42.0f;
    world_y_ = 0.0f;
    next_gate_ = 0;
    passed_ = 0;
    over_ = false;
  }

  float act(const AleAction& a, PCG32&) override {
    if (over_) return 0.0f;
    x_ += static_cast<float>(a.dx) * kSteer;
    if (x_ < 4.0f) x_ = 4.0f;
    if (x_ > 78.0f) x_ = 78.0f;
    world_y_ += kScroll;

    float reward = -1.0f;  // the clock
    // Gate line crossing: the skier's world row passes the gate's row.
    if (next_gate_ < kGates &&
        world_y_ + kSkierY >= kFirstGateY + static_cast<float>(next_gate_) * kGateGap) {
      float cx = gate_cx(next_gate_);
      bool pass = std::fabs(x_ + kSkierW / 2.0f - cx) < kGateHalf;
      if (pass) {
        ++passed_;
      } else {
        reward += kMissPenalty;
      }
      ++next_gate_;
    }
    if (world_y_ + kSkierY >=
        kFirstGateY + static_cast<float>(kGates) * kGateGap + kFinishPad) {
      over_ = true;
    }
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    // Course edges.
    for (int y = 0; y < kScreen; ++y) {
      f[y * kScreen + 1] = 90;
      f[y * kScreen + 82] = 90;
    }
    // Gates within the viewport (screen y = world gate y - world scroll).
    for (int i = 0; i < kGates; ++i) {
      float gy = kFirstGateY + static_cast<float>(i) * kGateGap - world_y_;
      if (gy < -kPoleH || gy >= kScreen) continue;
      float cx = gate_cx(i);
      uint8_t shade = i < next_gate_ ? 60 : 180;  // crossed gates fade
      draw_rect(f, cx - kGateHalf - kPoleW / 2.0f, gy, kPoleW, kPoleH, shade);
      draw_rect(f, cx + kGateHalf - kPoleW / 2.0f, gy, kPoleW, kPoleH, shade);
    }
    // Finish banner.
    float fy = kFirstGateY + static_cast<float>(kGates) * kGateGap + kFinishPad - world_y_;
    if (fy >= 0.0f && fy < static_cast<float>(kScreen)) {
      int row = static_cast<int>(fy);
      for (int x = 2; x < 82; ++x) f[row * kScreen + x] = 140;
    }
    // Passed-gate ticks.
    for (int s = 0; s < passed_ && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
    // Skier.
    draw_rect(f, x_, kSkierY, kSkierW, kSkierH, 224);
  }

  bool game_over() const override { return over_; }
  int lives() const override { return 1; }
  int minimal_actions() const override { return 3; }
  int minimal_to_full(int a) const override {
    static const int map[3] = {0, 3, 4};  // NOOP, RIGHT, LEFT
    return map[a < 0 || a >= 3 ? 0 : a];
  }

 private:
  static void draw_rect(uint8_t* f, float fx, float fy, float fw, float fh, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + fw), y1 = static_cast<int>(fy + fh);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  float x_ = 42.0f;
  float world_y_ = 0.0f;
  int next_gate_ = 0;
  int passed_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_skiing_game() { return std::make_unique<SkiingGame>(); }

}  // namespace cleanba
