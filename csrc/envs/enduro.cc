// Enduro — from-scratch C++ racing game with the classic mechanics: hold the
// accelerator, weave through slower traffic, and score one point per car
// passed; collisions kill your speed and traffic gets denser over time.
//
// Stands in for EnvPool's ALE Enduro-v5 in the reference's benchmark configs
// (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs are not
// available here, so the engine provides a rules-true clone with identical
// protocol semantics (sticky actions / frameskip / stacking are applied by
// AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave3.py and must mirror these rules exactly.

#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr float kRoadL = 20.0f;
constexpr float kRoadR = 64.0f;
constexpr int kLaneCount = 4;
constexpr float kLaneW = (kRoadR - kRoadL) / kLaneCount;  // 11 px
constexpr int kCarW = 6;
constexpr int kCarH = 5;
constexpr float kPlayerY = 70.0f;
constexpr float kPXMin = kRoadL + 1.0f;
constexpr float kPXMax = kRoadR - 1.0f - kCarW;
constexpr float kVMax = 6.0f;
constexpr float kTrafficV = 2.0f;   // traffic ground speed (units)
constexpr float kYScale = 0.5f;     // px per relative speed unit per frame
constexpr int kMaxCars = 8;
constexpr int kGameFrames = 32768;  // long day; the 27000-step protocol cap
                                    // usually truncates first

class EnduroGame : public Game {
 public:
  void reset_game(PCG32&) override {
    px_ = 40.0f;
    v_ = 0.0f;
    for (int c = 0; c < kMaxCars; ++c) live_[c] = false;
    spawn_timer_ = 40;
    passed_ = 0;
    frame_ = 0;
    over_ = false;
  }

  float act(const AleAction& a, PCG32& rng) override {
    if (over_) return 0.0f;
    ++frame_;
    float reward = 0.0f;

    // Throttle (FIRE), brake (DOWN), and coasting drag.
    if (a.fire) v_ += 0.05f;
    else if (a.dy > 0) v_ -= 0.10f;
    else v_ -= 0.01f;
    v_ = v_ < 0.0f ? 0.0f : (v_ > kVMax ? kVMax : v_);

    // Steering authority scales with speed (you cannot steer a parked car).
    px_ += static_cast<float>(a.dx) * (0.4f + 0.2f * v_);
    px_ = px_ < kPXMin ? kPXMin : (px_ > kPXMax ? kPXMax : px_);

    // Traffic streams toward the player at the relative speed.
    float rel = (v_ - kTrafficV) * kYScale;
    for (int c = 0; c < kMaxCars; ++c) {
      if (!live_[c]) continue;
      cy_[c] += rel;
      if (cy_[c] > 84.0f) {  // dropped off the bottom: overtaken
        live_[c] = false;
        ++passed_;
        reward += 1.0f;
      } else if (cy_[c] < 8.0f) {  // outran the player and left ahead
        live_[c] = false;
      }
    }

    // Spawn traffic ahead on a densifying schedule (random lane).
    if (--spawn_timer_ <= 0) {
      int interval = 80 - 6 * (passed_ / 20);
      spawn_timer_ = interval < 28 ? 28 : interval;
      for (int c = 0; c < kMaxCars; ++c) {
        if (live_[c]) continue;
        int lane = static_cast<int>(rng.randint(kLaneCount));
        live_[c] = true;
        cx_[c] = kRoadL + 2.0f + static_cast<float>(lane) * kLaneW;
        cy_[c] = 10.0f;
        break;
      }
    }

    // Collision: the crash kills your speed and removes the wreck.
    for (int c = 0; c < kMaxCars; ++c) {
      if (!live_[c]) continue;
      if (px_ + kCarW > cx_[c] && px_ < cx_[c] + kCarW &&
          kPlayerY + kCarH > cy_[c] && kPlayerY < cy_[c] + kCarH) {
        v_ = 0.5f;
        live_[c] = false;
      }
    }

    if (frame_ >= kGameFrames) over_ = true;
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    // Road edges and dashed center lines (dash phase scrolls with distance
    // so standing still is visibly different from driving).
    int scroll = static_cast<int>(v_ * static_cast<float>(frame_) * kYScale) % 8;
    for (int y = 8; y < 80; ++y) {
      f[y * kScreen + static_cast<int>(kRoadL) - 1] = 110;
      f[y * kScreen + static_cast<int>(kRoadR) + kCarW] = 110;
      for (int l = 1; l < kLaneCount; ++l) {
        if ((y + scroll) % 8 < 4) continue;
        f[y * kScreen + static_cast<int>(kRoadL + static_cast<float>(l) * kLaneW)] = 60;
      }
    }
    // Speed bar along the bottom.
    for (int x = 0; x < static_cast<int>(v_ / kVMax * 80.0f); ++x)
      f[82 * kScreen + 2 + x] = 150;
    // Score ticks (one per 5 cars passed).
    for (int s = 0; s < passed_ / 5 && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
    // Traffic then the player.
    for (int c = 0; c < kMaxCars; ++c)
      if (live_[c]) draw_rect(f, cx_[c], cy_[c], kCarW, kCarH, 140);
    draw_rect(f, px_, kPlayerY, kCarW, kCarH, 224);
  }

  bool game_over() const override { return over_; }
  int lives() const override { return 1; }
  int minimal_actions() const override { return 9; }
  int minimal_to_full(int a) const override {
    // NOOP FIRE RIGHT LEFT DOWN DOWNRIGHT DOWNLEFT RIGHTFIRE LEFTFIRE
    static const int map[9] = {0, 1, 3, 4, 5, 8, 9, 11, 12};
    return map[a < 0 || a >= 9 ? 0 : a];
  }

 private:
  static void draw_rect(uint8_t* f, float fx, float fy, float fw, float fh, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + fw), y1 = static_cast<int>(fy + fh);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  float px_ = 40.0f, v_ = 0.0f;
  bool live_[kMaxCars] = {};
  float cx_[kMaxCars] = {}, cy_[kMaxCars] = {};
  int spawn_timer_ = 40, passed_ = 0, frame_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_enduro_game() { return std::make_unique<EnduroGame>(); }

}  // namespace cleanba
