// Centipede — from-scratch C++ clone with the classic mechanics: a chain of
// segments snakes down through the mushroom field (reverse + drop on every
// obstacle), worth +10 each and leaving a mushroom where shot; mushrooms
// pay +1; the bouncing spider pays +300. Clearing the chain brings a faster
// wave; the mushroom field persists across lives.
//
// Stands in for EnvPool's ALE Centipede-v5 in the reference's benchmark
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

constexpr int kCols = 19, kRows = 13;  // mushroom grid, 4-px cells
constexpr int kGridX = 4, kGridY = 8;  // field origin
constexpr int kSegments = 9;
constexpr float kSegSpeed = 1.0f;
constexpr float kSegW = 4.0f, kSegH = 4.0f;
constexpr float kPlayerW = 4.0f, kPlayerH = 4.0f;
constexpr float kWalk = 1.0f;
constexpr float kShotV = 3.0f;
constexpr float kSpiderW = 5.0f, kSpiderH = 4.0f;
constexpr int kSpiderRespawn = 200;
constexpr int kLives = 3;

class CentipedeGame : public Game {
 public:
  void reset_game(PCG32&) override {
    for (int r = 0; r < kRows; ++r)
      for (int c = 0; c < kCols; ++c)
        mush_[r][c] = ((c * 7 + r * 11) % 13) == 0;
    wave_ = 0;
    lives_ = kLives;
    score_ = 0;
    over_ = false;
    start_wave();
    respawn();
  }

  float act(const AleAction& a, PCG32&) override {
    if (over_) return 0.0f;
    float reward = 0.0f;
    float sspeed = kSegSpeed * (1.0f + 0.15f * static_cast<float>(wave_));

    // Player roams the bottom zone.
    px_ += static_cast<float>(a.dx) * kWalk;
    py_ += static_cast<float>(a.dy) * kWalk;
    if (px_ < 4.0f) px_ = 4.0f;
    if (px_ > 80.0f - kPlayerW) px_ = 80.0f - kPlayerW;
    if (py_ < 64.0f) py_ = 64.0f;
    if (py_ > 78.0f) py_ = 78.0f;

    // Shot.
    if (a.fire && !shot_live_) {
      shot_live_ = true;
      shot_x_ = px_ + kPlayerW / 2.0f;
      shot_y_ = py_;
    }
    if (shot_live_) {
      shot_y_ -= kShotV;
      if (shot_y_ < 0) shot_live_ = false;
    }

    // Shot vs mushroom (first pass: the shot stops on the first one).
    if (shot_live_) {
      int c = static_cast<int>((shot_x_ - kGridX) / 4.0f);
      int r = static_cast<int>((shot_y_ - kGridY) / 4.0f);
      if (c >= 0 && c < kCols && r >= 0 && r < kRows && shot_x_ >= kGridX &&
          shot_y_ >= kGridY && mush_[r][c]) {
        mush_[r][c] = false;
        shot_live_ = false;
        reward += 1.0f;
        score_ += 1;
      }
    }

    // Segments snake: reverse + drop a row at walls and mushrooms.
    int alive = 0;
    for (int s = 0; s < kSegments; ++s) {
      if (!seg_live_[s]) continue;
      ++alive;
      float nx = seg_x_[s] + seg_dir_[s] * sspeed;
      bool blocked = nx < 4.0f || nx + kSegW > 80.0f;
      if (!blocked) {
        float head = seg_dir_[s] > 0 ? nx + kSegW - 1.0f : nx;
        int c = static_cast<int>((head - kGridX) / 4.0f);
        int r = static_cast<int>((seg_y_[s] - kGridY) / 4.0f);
        if (c >= 0 && c < kCols && r >= 0 && r < kRows && mush_[r][c])
          blocked = true;
      }
      if (blocked) {
        seg_dir_[s] = -seg_dir_[s];
        if (seg_y_[s] < 76.0f) seg_y_[s] += 4.0f;
      } else {
        seg_x_[s] = nx;
      }
      // Shot a segment: +10, mushroom grows where it died.
      if (shot_live_ && shot_x_ >= seg_x_[s] && shot_x_ < seg_x_[s] + kSegW &&
          shot_y_ >= seg_y_[s] && shot_y_ < seg_y_[s] + kSegH) {
        shot_live_ = false;
        seg_live_[s] = false;
        reward += 10.0f;
        score_ += 10;
        --alive;
        int c = static_cast<int>((seg_x_[s] + 2.0f - kGridX) / 4.0f);
        int r = static_cast<int>((seg_y_[s] - kGridY) / 4.0f);
        if (c >= 0 && c < kCols && r >= 0 && r < kRows) mush_[r][c] = true;
        continue;
      }
      // Segment touch kills.
      if (px_ + kPlayerW > seg_x_[s] && px_ < seg_x_[s] + kSegW &&
          py_ + kPlayerH > seg_y_[s] && py_ < seg_y_[s] + kSegH) {
        reward += lose_life();
        return reward;
      }
    }

    // Spider zigzags through the lower field.
    if (spider_hold_ > 0) {
      if (--spider_hold_ == 0) {
        spider_x_ = 4.0f;
        spider_y_ = 60.0f;
        spider_vx_ = 0.8f;
        spider_vy_ = 0.6f;
      }
    } else {
      spider_x_ += spider_vx_;
      spider_y_ += spider_vy_;
      if (spider_x_ < 4.0f || spider_x_ + kSpiderW > 80.0f) spider_vx_ = -spider_vx_;
      if (spider_y_ < 56.0f || spider_y_ + kSpiderH > 78.0f) spider_vy_ = -spider_vy_;
      if (shot_live_ && shot_x_ >= spider_x_ && shot_x_ < spider_x_ + kSpiderW &&
          shot_y_ >= spider_y_ && shot_y_ < spider_y_ + kSpiderH) {
        shot_live_ = false;
        spider_hold_ = kSpiderRespawn;
        reward += 300.0f;
        score_ += 300;
      } else if (px_ + kPlayerW > spider_x_ && px_ < spider_x_ + kSpiderW &&
                 py_ + kPlayerH > spider_y_ && py_ < spider_y_ + kSpiderH) {
        reward += lose_life();
        return reward;
      }
    }

    if (alive == 0) {
      ++wave_;
      start_wave();
    }
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    for (int r = 0; r < kRows; ++r)
      for (int c = 0; c < kCols; ++c)
        if (mush_[r][c])
          draw_rect(f, static_cast<float>(kGridX + c * 4),
                    static_cast<float>(kGridY + r * 4), 3.0f, 3.0f, 140);
    for (int s = 0; s < kSegments; ++s)
      if (seg_live_[s])
        draw_rect(f, seg_x_[s], seg_y_[s], kSegW, kSegH, 200);
    if (spider_hold_ == 0)
      draw_rect(f, spider_x_, spider_y_, kSpiderW, kSpiderH, 180);
    if (shot_live_) draw_rect(f, shot_x_ - 1.0f, shot_y_ - 2.0f, 2.0f, 3.0f, 220);
    draw_rect(f, px_, py_, kPlayerW, kPlayerH, 255);
    for (int s = 0; s < score_ / 10 && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
    for (int l = 0; l < lives_ && l < kLives; ++l)
      for (int k = 0; k < 3; ++k) f[82 * kScreen + 2 + l * 5 + k] = 160;
  }

  bool game_over() const override { return over_; }
  int lives() const override { return lives_; }
  int minimal_actions() const override { return 18; }
  int minimal_to_full(int a) const override { return a < 0 || a >= 18 ? 0 : a; }

 private:
  float lose_life() {
    --lives_;
    if (lives_ <= 0) {
      over_ = true;
      return 0.0f;
    }
    start_wave();  // chain re-enters from the top; mushrooms persist
    respawn();
    return 0.0f;
  }

  void respawn() {
    px_ = 40.0f;
    py_ = 74.0f;
    shot_live_ = false;
  }

  void start_wave() {
    for (int s = 0; s < kSegments; ++s) {
      seg_live_[s] = true;
      seg_x_[s] = 20.0f + static_cast<float>(s) * 5.0f;
      seg_y_[s] = 8.0f;
      seg_dir_[s] = 1.0f;
    }
    spider_hold_ = 120;
    spider_x_ = 4.0f;
    spider_y_ = 60.0f;
    spider_vx_ = 0.8f;
    spider_vy_ = 0.6f;
  }

  static void draw_rect(uint8_t* f, float fx, float fy, float fw, float fh, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + fw), y1 = static_cast<int>(fy + fh);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  bool mush_[kRows][kCols] = {};
  bool seg_live_[kSegments] = {};
  float seg_x_[kSegments] = {}, seg_y_[kSegments] = {};
  float seg_dir_[kSegments] = {};
  float px_ = 40.0f, py_ = 74.0f;
  bool shot_live_ = false;
  float shot_x_ = 0, shot_y_ = 0;
  float spider_x_ = 4.0f, spider_y_ = 60.0f, spider_vx_ = 0.8f, spider_vy_ = 0.6f;
  int spider_hold_ = 120;
  int wave_ = 0;
  int lives_ = kLives;
  int score_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_centipede_game() { return std::make_unique<CentipedeGame>(); }

}  // namespace cleanba
