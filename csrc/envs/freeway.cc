// Freeway — from-scratch C++ arcade game with the classic mechanics: a
// chicken crossing ten lanes of traffic, +1 per full crossing, knocked back
// down the road on collision, against a fixed game timer.
//
// Stands in for EnvPool's ALE Freeway-v5 in the reference's benchmark
// configs (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs are
// not available here, so the engine provides a rules-true clone with
// identical protocol semantics (sticky actions / frameskip / stacking are
// applied by AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_extra.py and must mirror these rules exactly.

#include <cmath>
#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr int kLanes = 10;
constexpr int kRoadTop = 10;   // first lane's top y
constexpr int kLaneH = 6;
constexpr int kCarW = 8;
constexpr int kCarH = 4;
constexpr float kChickenX = 42.0f;  // fixed column
constexpr int kChickenW = 4;
constexpr int kChickenH = 4;
constexpr float kStartY = 76.0f;
constexpr float kGoalY = 8.0f;
// Round-5 calibration (HNS.md appendix): at 1 px/raw-frame over this 68 px
// road a crossing takes ~1.1 s vs the real cabinet's ~4 s, so on the real
// 2:16 timer raw crossing counts ran ~2.5x the ALE-anchored human score
// (75 crossings, 253.8% HNS). Slowing the chicken killed exploration (a
// crossing became ~49 consecutive UP decisions; trained return 0.0), so the
// economy is instead calibrated through the clock: the episode lasts as many
// crossing-times as the real game's (8192 x 1.13/4.0 ~= 2304 raw frames),
// capping an episode at ~33 crossings — the ALE expert ceiling — while
// keeping the 1 px/frame chicken learnable.
constexpr int kGameFrames = 2304;
constexpr float kChickenSpeed = 1.0f;

// Per-lane car speeds (px per raw frame); lanes 0-4 move left, 5-9 right.
const float kSpeed[kLanes] = {0.6f, 0.9f, 1.2f, 0.5f, 0.8f,
                              0.8f, 0.5f, 1.2f, 0.9f, 0.6f};

class FreewayGame : public Game {
 public:
  void reset_game(PCG32&) override {
    for (int l = 0; l < kLanes; ++l) car_x_[l] = static_cast<float>((l * 37) % 84);
    chicken_y_ = kStartY;
    score_ = 0;
    frame_ = 0;
    over_ = false;
  }

  float act(const AleAction& a, PCG32&) override {
    if (over_) return 0.0f;
    // Chicken: up/down only, kChickenSpeed px per raw frame.
    chicken_y_ += static_cast<float>(a.dy) * kChickenSpeed;
    if (chicken_y_ < kGoalY - 2) chicken_y_ = kGoalY - 2;
    if (chicken_y_ > kStartY) chicken_y_ = kStartY;

    // Cars advance and wrap.
    for (int l = 0; l < kLanes; ++l) {
      float dir = l < kLanes / 2 ? -1.0f : 1.0f;
      car_x_[l] += dir * kSpeed[l];
      if (car_x_[l] < -kCarW) car_x_[l] += 84.0f + kCarW;
      if (car_x_[l] > 84.0f) car_x_[l] -= 84.0f + kCarW;
    }

    // Collision: knock the chicken back down the road.
    for (int l = 0; l < kLanes; ++l) {
      float lane_y = static_cast<float>(kRoadTop + l * kLaneH + 1);
      bool overlap_y = chicken_y_ + kChickenH > lane_y && chicken_y_ < lane_y + kCarH;
      bool overlap_x = kChickenX + kChickenW > car_x_[l] && kChickenX < car_x_[l] + kCarW;
      if (overlap_y && overlap_x) {
        chicken_y_ += 12.0f;
        if (chicken_y_ > kStartY) chicken_y_ = kStartY;
        break;
      }
    }

    // Crossing complete: score and restart from the bottom.
    float reward = 0.0f;
    if (chicken_y_ <= kGoalY) {
      reward = 1.0f;
      ++score_;
      chicken_y_ = kStartY;
    }

    if (++frame_ >= kGameFrames) over_ = true;
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    // Median strips above and below the road.
    for (int x = 0; x < kScreen; ++x) {
      f[8 * kScreen + x] = 100;
      f[9 * kScreen + x] = 100;
      f[(kRoadTop + kLanes * kLaneH) * kScreen + x] = 100;
      f[(kRoadTop + kLanes * kLaneH + 1) * kScreen + x] = 100;
    }
    // Dashed lane dividers.
    for (int l = 1; l < kLanes; ++l) {
      int y = kRoadTop + l * kLaneH;
      for (int x = 0; x < kScreen; x += 6)
        for (int k = 0; k < 3 && x + k < kScreen; ++k) f[y * kScreen + x + k] = 60;
    }
    // Score ticks in the top rows.
    for (int s = 0; s < score_ && s < 40; ++s)
      for (int k = 0; k < 1; ++k) f[1 * kScreen + 2 + s * 2 + k] = 200;
    // Cars (lane-dependent shade).
    for (int l = 0; l < kLanes; ++l) {
      int lane_y = kRoadTop + l * kLaneH + 1;
      draw_rect(f, car_x_[l], static_cast<float>(lane_y), kCarW, kCarH,
                static_cast<uint8_t>(130 + 10 * (l % 5)));
    }
    // Chicken.
    draw_rect(f, kChickenX, chicken_y_, kChickenW, kChickenH, 224);
  }

  bool game_over() const override { return over_; }
  int lives() const override { return 1; }
  int minimal_actions() const override { return 3; }
  int minimal_to_full(int a) const override {
    static const int map[3] = {0, 2, 5};  // NOOP, UP, DOWN
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

  float car_x_[kLanes] = {};
  float chicken_y_ = kStartY;
  int score_ = 0;
  int frame_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_freeway_game() { return std::make_unique<FreewayGame>(); }

}  // namespace cleanba
