// Up'n Down — from-scratch C++ driving game with the classic mechanics:
// a dune buggy on a one-lane winding road, throttle up or brake down, and
// a jump that both dodges oncoming traffic and scores by landing on it;
// collect the flags planted along the roadside.
//
// Stands in for EnvPool's ALE UpNDown-v5 in the reference's benchmark
// configs (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs are
// not available here, so the engine provides a rules-true clone with
// identical protocol semantics (sticky actions / frameskip / stacking are
// applied by AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave7.py and must mirror these rules exactly —
// including the segment-hash road course shared across engines.

#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr float kPlayerY = 60.0f;   // screen row of the buggy
constexpr float kCarW = 5.0f, kCarH = 4.0f;
constexpr int kSegRows = 32;        // road course segment length (world rows)
constexpr float kRoadHalf = 7.0f;   // half-width of the road
constexpr int kStartLives = 4;
constexpr int kJumpFrames = 24;
constexpr float kFlagEvery = 160.0f;  // world distance between flags
constexpr float kFlagReward = 10.0f;
constexpr float kSquashReward = 100.0f;
constexpr int kCars = 4;
constexpr float kSpeedUp = 1.6f, kSpeedCruise = 0.7f, kSpeedBrake = 0.2f;

// Deterministic per-segment hash -> [0, 1): the same avalanche both engines
// use for shared course geometry (jax_games_wave6._rr_seg_hash pattern).
inline float seg_hash(int seg, int salt) {
  uint32_t h = static_cast<uint32_t>(seg) * 2654435761u +
               static_cast<uint32_t>(salt) * 40503u;
  h ^= h >> 13;
  h *= 1274126177u;
  h ^= h >> 16;
  return static_cast<float>(h >> 8) * (1.0f / 16777216.0f);
}

// Road centre x at world row w: piecewise-linear between segment knots.
inline float road_center(float w) {
  int seg = static_cast<int>(w / kSegRows);
  float t = (w - static_cast<float>(seg) * kSegRows) / kSegRows;
  float c0 = 18.0f + seg_hash(seg, 1) * 48.0f;
  float c1 = 18.0f + seg_hash(seg + 1, 1) * 48.0f;
  return c0 + (c1 - c0) * t;
}

class UpNDownGame : public Game {
 public:
  void reset_game(PCG32&) override {
    lives_ = kStartLives;
    score_ = 0;
    over_ = false;
    dist_ = 0.0f;
    jump_ = 0;
    next_flag_ = kFlagEvery;
    for (int i = 0; i < kCars; ++i) car_live_[i] = false;
    spawn_clock_ = 90;
  }

  float act(const AleAction& a, PCG32& rng) override {
    if (over_) return 0.0f;
    float reward = 0.0f;

    // ---- throttle ---------------------------------------------------------
    float v = kSpeedCruise;
    if (a.dy < 0) v = kSpeedUp;
    else if (a.dy > 0) v = kSpeedBrake;
    dist_ += v;

    // ---- jump -------------------------------------------------------------
    if (a.fire && jump_ == 0) jump_ = kJumpFrames;
    bool landing = jump_ == 1;  // the frame the buggy touches down
    if (jump_ > 0) --jump_;

    // ---- flags ------------------------------------------------------------
    if (dist_ >= next_flag_) {
      reward += kFlagReward;
      next_flag_ += kFlagEvery;
    }

    // ---- traffic ----------------------------------------------------------
    // Enemy cars hold a world row ahead and drift back toward the buggy
    // (they drive slower), so their screen position closes in as we climb.
    if (--spawn_clock_ <= 0) {
      spawn_clock_ = 70 + static_cast<int>(rng.randint(80));
      for (int i = 0; i < kCars; ++i) {
        if (car_live_[i]) continue;
        car_live_[i] = true;
        car_w_[i] = dist_ + (84.0f - kPlayerY) + 20.0f + rng.uniform() * 40.0f;
        car_v_[i] = 0.25f + rng.uniform() * 0.25f;
        break;
      }
    }

    for (int i = 0; i < kCars; ++i) {
      if (!car_live_[i]) continue;
      car_w_[i] += car_v_[i];
      float sy = 84.0f - (car_w_[i] - dist_);  // screen row
      if (sy > 84.0f + kCarH) {  // fell off the bottom: despawn
        car_live_[i] = false;
        continue;
      }
      float dyr = sy - kPlayerY;
      if (dyr > -kCarH && dyr < kCarH) {
        if (jump_ > 0) continue;     // airborne: sail over
        if (landing) {               // touch down on top: squash it
          car_live_[i] = false;
          reward += kSquashReward;
        } else {                     // head-on crash
          if (--lives_ <= 0) over_ = true;
          // Crash knocks the traffic away and costs the pending jump.
          for (int j = 0; j < kCars; ++j) car_live_[j] = false;
          jump_ = 0;
          spawn_clock_ = 90;
          break;
        }
      }
    }

    score_ += static_cast<int>(reward);
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    // Road: per-row centre from the shared course hash.
    for (int y = 0; y < kScreen; ++y) {
      float w = dist_ + (84.0f - static_cast<float>(y));
      float c = road_center(w);
      int x0 = static_cast<int>(c - kRoadHalf), x1 = static_cast<int>(c + kRoadHalf);
      for (int x = x0 < 0 ? 0 : x0; x <= x1 && x < kScreen; ++x)
        f[y * kScreen + x] = 70;
    }
    // Flags: the next three upcoming flags, drawn at the roadside.
    for (int k = 0; k < 3; ++k) {
      float w = next_flag_ + kFlagEvery * static_cast<float>(k);
      float sy = 84.0f - (w - dist_);
      if (sy < 0.0f || sy >= 83.0f) continue;
      float c = road_center(w);
      fill(f, static_cast<int>(c + kRoadHalf) + 1, static_cast<int>(sy), 2, 3, 210);
    }
    // Traffic.
    for (int i = 0; i < kCars; ++i) {
      if (!car_live_[i]) continue;
      float sy = 84.0f - (car_w_[i] - dist_);
      if (sy < -kCarH || sy >= 84.0f) continue;
      float c = road_center(car_w_[i]);
      fill(f, static_cast<int>(c - kCarW / 2), static_cast<int>(sy),
           static_cast<int>(kCarW), static_cast<int>(kCarH), 150);
    }
    // The buggy: brighter and raised while jumping.
    float c = road_center(dist_ + (84.0f - kPlayerY));
    float py = kPlayerY - (jump_ > 0 ? 3.0f : 0.0f);
    fill(f, static_cast<int>(c - kCarW / 2), static_cast<int>(py),
         static_cast<int>(kCarW), static_cast<int>(kCarH), jump_ > 0 ? 255 : 224);
    // Score ticks and lives.
    for (int s = 0; s < score_ / 50 && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
    for (int l = 0; l < lives_ && l < kStartLives; ++l)
      for (int k = 0; k < 3; ++k) f[81 * kScreen + 2 + l * 5 + k] = 160;
  }

  bool game_over() const override { return over_; }
  int lives() const override { return lives_; }
  int minimal_actions() const override { return 6; }
  int minimal_to_full(int a) const override {
    // NOOP FIRE UP DOWN UPFIRE DOWNFIRE
    static const int map[6] = {0, 1, 2, 5, 10, 13};
    return map[a < 0 || a >= 6 ? 0 : a];
  }

 private:
  static void fill(uint8_t* f, int x0, int y0, int w, int h, uint8_t v) {
    for (int y = y0 < 0 ? 0 : y0; y < y0 + h && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x0 + w && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  float dist_ = 0.0f;
  int jump_ = 0;
  float next_flag_ = kFlagEvery;
  bool car_live_[kCars] = {};
  float car_w_[kCars] = {}, car_v_[kCars] = {};
  int spawn_clock_ = 90;
  int lives_ = kStartLives, score_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_up_n_down_game() { return std::make_unique<UpNDownGame>(); }

}  // namespace cleanba
