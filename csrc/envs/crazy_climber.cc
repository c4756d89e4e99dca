// Crazy Climber — from-scratch C++ arcade game with the classic mechanics:
// scale a skyscraper window-by-window, dodge objects dropped from above,
// slip down when a window you're holding slams shut, and bank a bonus at the
// roof before the next, faster building.
//
// Stands in for EnvPool's ALE CrazyClimber-v5 in the reference's benchmark
// configs (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs are
// not available here, so the engine provides a rules-true clone with
// identical protocol semantics (sticky actions / frameskip / stacking are
// applied by AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave4.py and must mirror these rules exactly.

#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr float kBldL = 20.0f, kBldR = 64.0f;  // building face
constexpr int kWinCols = 6;
constexpr int kWinRows = 13;
constexpr int kWinW = 5, kWinH = 4;
constexpr int kPlayerW = 4, kPlayerH = 5;
constexpr float kStartX = 40.0f, kStartY = 75.0f;
constexpr float kRoofY = 6.0f;
constexpr int kObjects = 2;
constexpr int kStartLives = 5;
constexpr float kRowPoints = 100.0f;
constexpr float kRoofBonus = 2000.0f;

inline int win_x(int j) { return 22 + 7 * j; }
inline int win_y(int i) { return 6 + 6 * i; }

class CrazyClimberGame : public Game {
 public:
  void reset_game(PCG32&) override {
    px_ = kStartX;
    py_ = kStartY;
    best_y_ = kStartY;
    for (int o = 0; o < kObjects; ++o) {
      obj_live_[o] = false;
      obj_timer_[o] = 30 + 50 * o;
    }
    building_ = 0;
    lives_ = kStartLives;
    score_ = 0;
    frame_ = 0;
    over_ = false;
  }

  float act(const AleAction& a, PCG32& rng) override {
    if (over_) return 0.0f;
    float reward = 0.0f;
    ++frame_;

    // Climb: 1 px/frame each axis, clamped to the building face.
    float nx = clampf(px_ + static_cast<float>(a.dx), kBldL, kBldR - kPlayerW);
    float ny = clampf(py_ + static_cast<float>(a.dy), 4.0f, kStartY);
    // A shut window cannot be climbed into: block upward movement into it.
    if (ny < py_ && inside_closed_window(nx, ny)) ny = py_;
    px_ = nx;
    py_ = ny;
    // A window slamming shut on your handhold makes you slip down a row.
    if (inside_closed_window(px_, py_)) py_ = clampf(py_ + 6.0f, 4.0f, kStartY);

    // Falling objects.
    for (int o = 0; o < kObjects; ++o) {
      if (!obj_live_[o]) {
        if (--obj_timer_[o] <= 0) {
          obj_live_[o] = true;
          int col = static_cast<int>(rng.randint(kWinCols));
          obj_x_[o] = static_cast<float>(win_x(col));
          obj_y_[o] = 0.0f;
        }
        continue;
      }
      obj_y_[o] += 1.0f + 0.2f * static_cast<float>(building_);
      if (obj_y_[o] > 84.0f) {
        obj_live_[o] = false;
        obj_timer_[o] = 40 + static_cast<int>(rng.randint(40));
        continue;
      }
      // Hit: lose a grip (a life) and drop back to the street.
      if (obj_x_[o] + 3 > px_ && obj_x_[o] < px_ + kPlayerW &&
          obj_y_[o] + 3 > py_ && obj_y_[o] < py_ + kPlayerH) {
        obj_live_[o] = false;
        obj_timer_[o] = 40 + static_cast<int>(rng.randint(40));
        if (--lives_ <= 0) { over_ = true; return 0.0f; }
        px_ = kStartX;
        py_ = kStartY;
        best_y_ = kStartY;
      }
    }

    // Progress pay: +100 per new row of height on this building.
    while (py_ <= best_y_ - 6.0f) {
      best_y_ -= 6.0f;
      reward += kRowPoints;
      score_ += static_cast<int>(kRowPoints);
    }
    // Roof: bonus, then a faster building.
    if (py_ <= kRoofY) {
      reward += kRoofBonus;
      score_ += static_cast<int>(kRoofBonus);
      ++building_;
      px_ = kStartX;
      py_ = kStartY;
      best_y_ = kStartY;
    }
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    // Building face.
    for (int y = 4; y <= 80; ++y)
      for (int x = static_cast<int>(kBldL); x < static_cast<int>(kBldR); ++x)
        f[y * kScreen + x] = 40;
    // Windows: open bright, shut dark.
    for (int i = 0; i < kWinRows; ++i)
      for (int j = 0; j < kWinCols; ++j)
        draw_rect(f, static_cast<float>(win_x(j)), static_cast<float>(win_y(i)),
                  kWinW, kWinH, window_closed(i, j) ? 70 : 120);
    // Score ticks (one per 500 points) in the top row.
    for (int s = 0; s < score_ / 500 && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
    // Lives markers bottom-left.
    for (int l = 0; l < lives_ && l < kStartLives; ++l)
      for (int k = 0; k < 3; ++k) f[82 * kScreen + 2 + l * 5 + k] = 160;
    // Falling objects.
    for (int o = 0; o < kObjects; ++o)
      if (obj_live_[o]) draw_rect(f, obj_x_[o], obj_y_[o], 3, 3, 190);
    // Climber on top.
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
  // Window shutters cycle on a deterministic schedule.
  bool window_closed(int i, int j) const {
    return ((frame_ / 50) + i + 2 * j) % 5 == 0;
  }
  bool inside_closed_window(float x, float y) const {
    for (int i = 0; i < kWinRows; ++i) {
      for (int j = 0; j < kWinCols; ++j) {
        if (!window_closed(i, j)) continue;
        float wx = static_cast<float>(win_x(j)), wy = static_cast<float>(win_y(i));
        if (x + kPlayerW > wx && x < wx + kWinW && y + kPlayerH > wy && y < wy + kWinH)
          return true;
      }
    }
    return false;
  }
  static float clampf(float v, float lo, float hi) {
    return v < lo ? lo : (v > hi ? hi : v);
  }
  static void draw_rect(uint8_t* f, float fx, float fy, float fw, float fh, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + fw), y1 = static_cast<int>(fy + fh);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  float px_ = kStartX, py_ = kStartY, best_y_ = kStartY;
  float obj_x_[kObjects] = {}, obj_y_[kObjects] = {};
  bool obj_live_[kObjects] = {};
  int obj_timer_[kObjects] = {};
  int building_ = 0;
  int lives_ = kStartLives;
  int score_ = 0;
  int frame_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_crazy_climber_game() {
  return std::make_unique<CrazyClimberGame>();
}

}  // namespace cleanba
