// Asterix — from-scratch C++ arcade game with the classic mechanics: the
// player moves over eight horizontal lanes while objects stream across them;
// touching a good object scores, touching a bomb costs a life.
//
// Stands in for EnvPool's ALE Asterix-v5 in the reference's benchmark
// configs (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs are
// not available here, so the engine provides a rules-true clone with
// identical protocol semantics (sticky actions / frameskip / stacking are
// applied by AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave3.py and must mirror these rules exactly.

#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr int kLanes = 8;
constexpr int kLaneTop = 14;  // first lane's top y
constexpr int kLaneH = 8;
constexpr int kObjW = 6;
constexpr int kObjH = 4;
constexpr int kPlayerW = 5;
constexpr int kPlayerH = 6;
constexpr float kPlayerX0 = 40.0f;
constexpr float kPlayerY0 = static_cast<float>(kLaneTop + 3 * kLaneH + 1);
constexpr float kXMin = 2.0f;
constexpr float kXMax = 84.0f - 2.0f - kPlayerW;
constexpr float kYMin = static_cast<float>(kLaneTop + 1);
constexpr float kYMax = static_cast<float>(kLaneTop + (kLanes - 1) * kLaneH + 1);
constexpr int kStartLives = 3;
constexpr float kGoodReward = 50.0f;
constexpr int kRespawnGap = 20;  // px beyond the edge before re-entry

// Per-lane object speeds (px per raw frame); even lanes move right, odd left.
const float kSpeed[kLanes] = {0.7f, 0.5f, 0.9f, 0.6f, 0.8f, 0.5f, 1.0f, 0.7f};

class AsterixGame : public Game {
 public:
  void reset_game(PCG32&) override {
    // Deterministic layout (cross-engine reset-frame parity): objects fan out
    // from staggered columns and every lane starts with a good object.
    for (int l = 0; l < kLanes; ++l) {
      obj_x_[l] = static_cast<float>((l * 31 + 7) % 84);
      bomb_[l] = false;
    }
    px_ = kPlayerX0;
    py_ = kPlayerY0;
    lives_ = kStartLives;
    score_ = 0;
    over_ = false;
  }

  float act(const AleAction& a, PCG32& rng) override {
    if (over_) return 0.0f;
    // Player: 1 px/frame horizontally, half a lane vertically.
    px_ += static_cast<float>(a.dx);
    py_ += static_cast<float>(a.dy) * 2.0f;
    px_ = px_ < kXMin ? kXMin : (px_ > kXMax ? kXMax : px_);
    py_ = py_ < kYMin ? kYMin : (py_ > kYMax ? kYMax : py_);

    // Objects advance; off-screen objects re-enter from the other side with a
    // freshly drawn type (bombs get likelier as the score grows).
    float reward = 0.0f;
    for (int l = 0; l < kLanes; ++l) {
      float dir = (l % 2 == 0) ? 1.0f : -1.0f;
      obj_x_[l] += dir * kSpeed[l];
      bool respawn = obj_x_[l] > 84.0f + kRespawnGap || obj_x_[l] < -kObjW - kRespawnGap;
      if (respawn) {
        obj_x_[l] = dir > 0 ? -static_cast<float>(kObjW) : 84.0f;
        bomb_[l] = rng.uniform() < bomb_prob();
      }

      float lane_y = static_cast<float>(kLaneTop + l * kLaneH + 1);
      bool overlap_y = py_ + kPlayerH > lane_y && py_ < lane_y + kObjH;
      bool overlap_x = px_ + kPlayerW > obj_x_[l] && px_ < obj_x_[l] + kObjW;
      if (overlap_y && overlap_x) {
        if (bomb_[l]) {
          if (--lives_ <= 0) over_ = true;
          px_ = kPlayerX0;
          py_ = kPlayerY0;
        } else {
          reward += kGoodReward;
          score_ += static_cast<int>(kGoodReward);
        }
        // Either way the object leaves the lane and re-enters later.
        obj_x_[l] = dir > 0 ? -static_cast<float>(kObjW) - kRespawnGap
                            : 84.0f + kRespawnGap;
        bomb_[l] = rng.uniform() < bomb_prob();
      }
    }
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    // Lane divider dots.
    for (int l = 0; l <= kLanes; ++l) {
      int y = kLaneTop + l * kLaneH - 1;
      if (y < 0 || y >= kScreen) continue;
      for (int x = 0; x < kScreen; x += 4) f[y * kScreen + x] = 50;
    }
    // Score ticks (one per 500 points) in the top rows.
    for (int s = 0; s < score_ / 500 && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
    // Lives markers bottom-left.
    for (int l = 0; l < lives_ && l < kStartLives; ++l)
      for (int k = 0; k < 3; ++k) f[81 * kScreen + 2 + l * 5 + k] = 160;
    // Objects: good items bright, bombs dark.
    for (int l = 0; l < kLanes; ++l) {
      float lane_y = static_cast<float>(kLaneTop + l * kLaneH + 1);
      draw_rect(f, obj_x_[l], lane_y, kObjW, kObjH, bomb_[l] ? 90 : 180);
    }
    // Player on top.
    draw_rect(f, px_, py_, kPlayerW, kPlayerH, 224);
  }

  bool game_over() const override { return over_; }
  int lives() const override { return lives_; }
  int minimal_actions() const override { return 9; }
  int minimal_to_full(int a) const override {
    // NOOP UP RIGHT LEFT DOWN UPRIGHT UPLEFT DOWNRIGHT DOWNLEFT
    static const int map[9] = {0, 2, 3, 4, 5, 6, 7, 8, 9};
    return map[a < 0 || a >= 9 ? 0 : a];
  }

 private:
  float bomb_prob() const { return score_ >= 2000 ? 0.35f : 0.2f; }

  static void draw_rect(uint8_t* f, float fx, float fy, float fw, float fh, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + fw), y1 = static_cast<int>(fy + fh);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  float obj_x_[kLanes] = {};
  bool bomb_[kLanes] = {};
  float px_ = kPlayerX0, py_ = kPlayerY0;
  int lives_ = kStartLives;
  int score_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_asterix_game() { return std::make_unique<AsterixGame>(); }

}  // namespace cleanba
