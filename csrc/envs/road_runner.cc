// Road Runner — from-scratch C++ chase-runner with the classic mechanics:
// sprint along a desert highway ahead of the coyote, snapping up bird seed
// and dodging oncoming trucks across three lanes; the coyote closes in the
// moment you slow down.
//
// Stands in for EnvPool's ALE RoadRunner-v5 in the reference's benchmark
// configs (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs
// are not available here, so the engine provides a rules-true clone with
// identical protocol semantics (sticky actions / frameskip / stacking are
// applied by AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave8.py and must mirror these rules exactly
// — including the lane geometry, seed spacing, and coyote closing model.

#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr int kLanes = 3;
constexpr float kLaneY[kLanes] = {40.0f, 54.0f, 68.0f};
constexpr float kPlayerX = 24.0f;
constexpr float kBirdW = 4.0f, kBirdH = 5.0f;
constexpr float kRunSpeed = 1.8f;   // world scroll while running (UP held = sprint)
constexpr float kSprint = 2.6f;
constexpr float kJog = 1.0f;        // default pace
constexpr float kSeedEvery = 90.0f; // world distance between seed piles
constexpr float kSeedReward = 100.0f;
constexpr int kTrucks = 3;
constexpr float kTruckW = 7.0f, kTruckH = 6.0f;
constexpr int kStartLives = 3;
constexpr float kCoyoteStart = -30.0f;  // x relative to player
constexpr float kCoyoteCatch = -4.0f;

class RoadRunnerGame : public Game {
 public:
  void reset_game(PCG32&) override {
    lives_ = kStartLives;
    score_ = 0;
    over_ = false;
    dist_ = 0.0f;
    next_seed_ = kSeedEvery;
    respawn();
  }

  float act(const AleAction& a, PCG32& rng) override {
    if (over_) return 0.0f;
    float reward = 0.0f;

    // ---- pace and lane ----------------------------------------------------
    float v = kJog;
    if (a.dy < 0) v = kSprint;        // UP: sprint
    else if (a.dy > 0) v = 0.4f;      // DOWN: ease off
    if (a.dx != 0 && lane_cool_ == 0) {
      lane_ += a.dx > 0 ? 1 : -1;     // RIGHT: lower lane, LEFT: upper lane
      if (lane_ < 0) lane_ = 0;
      if (lane_ >= kLanes) lane_ = kLanes - 1;
      lane_cool_ = 6;
    }
    if (lane_cool_ > 0) --lane_cool_;
    dist_ += v;

    // The coyote runs at a fixed sprint-minus pace: sprinting pulls away,
    // jogging lets him close.
    coyote_x_ += (v - 2.0f) * -0.5f;  // v>2: gap grows; v<2: gap shrinks
    if (coyote_x_ > kCoyoteCatch) {
      if (--lives_ <= 0) over_ = true;
      respawn();
      score_ += static_cast<int>(reward);
      return reward;
    }
    if (coyote_x_ < kCoyoteStart) coyote_x_ = kCoyoteStart;

    // ---- seed piles -------------------------------------------------------
    // One pile per kSeedEvery of road, placed by a deterministic lane hash.
    float pile_w = next_seed_;
    if (dist_ >= pile_w) {
      int pile_lane = static_cast<int>(pile_w / kSeedEvery) % kLanes;
      if (pile_lane == lane_) reward += kSeedReward;
      next_seed_ += kSeedEvery;
    }

    // ---- trucks -----------------------------------------------------------
    if (--spawn_clock_ <= 0) {
      spawn_clock_ = 50 + static_cast<int>(rng.randint(60));
      for (int i = 0; i < kTrucks; ++i) {
        if (truck_live_[i]) continue;
        truck_live_[i] = true;
        truck_lane_[i] = static_cast<int>(rng.randint(kLanes));
        truck_x_[i] = 90.0f;          // enter from the right, driving left
        truck_v_[i] = 1.2f + rng.uniform() * 0.8f;
        break;
      }
    }
    for (int i = 0; i < kTrucks; ++i) {
      if (!truck_live_[i]) continue;
      truck_x_[i] -= truck_v_[i] + v;  // closing speed includes our pace
      if (truck_x_[i] < -kTruckW - 6.0f) {
        truck_live_[i] = false;
        continue;
      }
      if (truck_lane_[i] == lane_ &&
          truck_x_[i] < kPlayerX + kBirdW && truck_x_[i] + kTruckW > kPlayerX) {
        if (--lives_ <= 0) over_ = true;
        respawn();
        score_ += static_cast<int>(reward);
        return reward;
      }
    }

    score_ += static_cast<int>(reward);
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    // Lane stripes.
    for (int l = 0; l < kLanes; ++l) {
      int y = static_cast<int>(kLaneY[l]) + static_cast<int>(kBirdH) + 1;
      for (int x = 0; x < kScreen; ++x)
        if (((x + static_cast<int>(dist_)) / 6) % 2 == 0) f[y * kScreen + x] = 90;
    }
    // Next seed pile, if on screen: world x maps to screen via player anchor.
    float sx = kPlayerX + (next_seed_ - dist_);
    if (sx >= 0.0f && sx < 83.0f) {
      int pile_lane = static_cast<int>(next_seed_ / kSeedEvery) % kLanes;
      fill(f, static_cast<int>(sx), static_cast<int>(kLaneY[pile_lane]) + 2, 3, 3, 200);
    }
    // Trucks.
    for (int i = 0; i < kTrucks; ++i)
      if (truck_live_[i])
        fill(f, static_cast<int>(truck_x_[i]), static_cast<int>(kLaneY[truck_lane_[i]]),
             static_cast<int>(kTruckW), static_cast<int>(kTruckH), 150);
    // The coyote, closing from the left.
    fill(f, static_cast<int>(kPlayerX + coyote_x_), static_cast<int>(kLaneY[lane_]) - 1,
         5, 6, 120);
    // The bird.
    fill(f, static_cast<int>(kPlayerX), static_cast<int>(kLaneY[lane_]),
         static_cast<int>(kBirdW), static_cast<int>(kBirdH), 230);
    for (int s = 0; s < score_ / 100 && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
    for (int l = 0; l < lives_ && l < kStartLives; ++l)
      for (int k = 0; k < 3; ++k) f[81 * kScreen + 2 + l * 5 + k] = 160;
  }

  bool game_over() const override { return over_; }
  int lives() const override { return lives_; }
  int minimal_actions() const override { return 18; }
  int minimal_to_full(int a) const override { return a < 0 || a >= 18 ? 0 : a; }

 private:
  void respawn() {
    lane_ = 1;
    lane_cool_ = 0;
    coyote_x_ = kCoyoteStart;
    for (int i = 0; i < kTrucks; ++i) truck_live_[i] = false;
    spawn_clock_ = 60;
    // dist_ and next_seed_ persist across lives (the road continues).
  }

  static void fill(uint8_t* f, int x0, int y0, int w, int h, uint8_t v) {
    for (int y = y0 < 0 ? 0 : y0; y < y0 + h && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x0 + w && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  float dist_ = 0.0f, next_seed_ = kSeedEvery;
  int lane_ = 1, lane_cool_ = 0;
  float coyote_x_ = kCoyoteStart;
  bool truck_live_[kTrucks] = {};
  int truck_lane_[kTrucks] = {};
  float truck_x_[kTrucks] = {}, truck_v_[kTrucks] = {};
  int spawn_clock_ = 60;
  int lives_ = kStartLives, score_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_road_runner_game() { return std::make_unique<RoadRunnerGame>(); }

}  // namespace cleanba
