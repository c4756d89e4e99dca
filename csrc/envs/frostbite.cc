// Frostbite — from-scratch C++ clone with the classic mechanics: jump
// across four rows of drifting ice floes (+10 the first landing per row of
// each cycle, building the igloo), dodge the birds, beat the temperature
// clock, and enter the finished igloo for the level bonus.
//
// Stands in for EnvPool's ALE Frostbite-v5 in the reference's benchmark
// configs (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs are
// not available here, so the engine provides a rules-true clone with
// identical protocol semantics (sticky actions / frameskip / stacking are
// applied by AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave9.py and must mirror these rules exactly.

#include <cmath>
#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr int kRows = 4;
constexpr int kFloesPerRow = 3;
const float kRowY[kRows] = {44.0f, 54.0f, 64.0f, 74.0f};  // floe top rows
constexpr float kFloeW = 18.0f, kFloeH = 5.0f;
constexpr float kWrap = 84.0f + kFloeW;
constexpr float kShoreY = 34.0f;     // player stand y on the bank
constexpr float kPlayerW = 4.0f, kPlayerH = 6.0f;
constexpr float kWalk = 1.0f;
constexpr int kJumpCooldown = 8;
constexpr int kTempMax = 45;
constexpr int kTempFrames = 32;      // raw frames per temperature degree
constexpr int kIglooNeed = 12;       // pieces to finish the igloo
constexpr int kBirds = 2;
const int kBirdRow[kBirds] = {1, 3};
constexpr float kBirdW = 6.0f, kBirdH = 4.0f;
constexpr int kLives = 4;

class FrostbiteGame : public Game {
 public:
  void reset_game(PCG32&) override {
    level_ = 0;
    lives_ = kLives;
    score_ = 0;
    over_ = false;
    reset_level();
  }

  float act(const AleAction& a, PCG32&) override {
    if (over_) return 0.0f;
    float reward = 0.0f;
    float speed_scale = 1.0f + 0.15f * static_cast<float>(level_);

    // Floes drift (rows alternate direction) and wrap.
    for (int r = 0; r < kRows; ++r) {
      float dir = (r % 2 == 0) ? 1.0f : -1.0f;
      float v = (0.5f + 0.1f * static_cast<float>(r)) * speed_scale * dir;
      for (int j = 0; j < kFloesPerRow; ++j) {
        floe_x_[r][j] += v;
        if (floe_x_[r][j] < -kFloeW) floe_x_[r][j] += kWrap;
        if (floe_x_[r][j] > 84.0f) floe_x_[r][j] -= kWrap;
      }
    }
    // Birds fly against their row's floes.
    for (int b = 0; b < kBirds; ++b) {
      int r = kBirdRow[b];
      float dir = (r % 2 == 0) ? -1.0f : 1.0f;
      bird_x_[b] += 0.8f * speed_scale * dir;
      if (bird_x_[b] < -kBirdW) bird_x_[b] += 84.0f + kBirdW;
      if (bird_x_[b] > 84.0f) bird_x_[b] -= 84.0f + kBirdW;
    }

    // Rider: standing on a floe carries the player with it.
    if (row_ >= 0) {
      int r = row_;
      float dir = (r % 2 == 0) ? 1.0f : -1.0f;
      x_ += (0.5f + 0.1f * static_cast<float>(r)) * speed_scale * dir;
    }
    x_ += static_cast<float>(a.dx) * kWalk;
    if (x_ < 2.0f) x_ = 2.0f;
    if (x_ > 84.0f - 2.0f - kPlayerW) x_ = 84.0f - 2.0f - kPlayerW;

    if (jump_cd_ > 0) --jump_cd_;
    // Jump one row up (dy=-1) or down (dy=+1). Row -1 is the shore.
    if (jump_cd_ == 0 && a.dy != 0) {
      int target = row_ + a.dy;
      if (target >= -1 && target < kRows) {
        jump_cd_ = kJumpCooldown;
        row_ = target;
        if (row_ >= 0) {
          int j = floe_under(row_, x_);
          if (j < 0) {
            reward += lose_life();
            return reward;
          }
          if (!visited_[row_]) {
            visited_[row_] = true;
            reward += 10.0f;
            score_ += 10;
            if (visited_[0] && visited_[1] && visited_[2] && visited_[3]) {
              for (int r = 0; r < kRows; ++r) visited_[r] = false;
              igloo_ += 4;
            }
          }
        } else if (igloo_ >= kIglooNeed) {
          // Into the igloo: level bonus = 160 + remaining temperature.
          int bonus = 160 + temp_;
          reward += static_cast<float>(bonus);
          score_ += bonus;
          ++level_;
          reset_level();
          return reward;
        }
      }
    }

    // Standing on a floe that drifted away from under you.
    if (row_ >= 0 && floe_under(row_, x_) < 0) {
      reward += lose_life();
      return reward;
    }
    // Bird collision.
    for (int b = 0; b < kBirds; ++b) {
      if (kBirdRow[b] != row_) continue;
      float by = kRowY[kBirdRow[b]] - kBirdH;
      float py = kRowY[row_] - kPlayerH;
      bool ox = x_ + kPlayerW > bird_x_[b] && x_ < bird_x_[b] + kBirdW;
      bool oy = py + kPlayerH > by && py < by + kBirdH;
      if (ox && oy) {
        reward += lose_life();
        return reward;
      }
    }

    // Temperature clock.
    if (++temp_frame_ >= kTempFrames) {
      temp_frame_ = 0;
      if (--temp_ <= 0) {
        reward += lose_life();
        return reward;
      }
    }
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    // Water band behind the floe rows.
    for (int y = 40; y < 80; ++y)
      for (int x = 0; x < kScreen; ++x) f[y * kScreen + x] = 30;
    // Shore / bank.
    for (int y = 36; y < 40; ++y)
      for (int x = 0; x < kScreen; ++x) f[y * kScreen + x] = 110;
    // Igloo build state on the bank.
    for (int p = 0; p < igloo_ && p < kIglooNeed; ++p)
      f[35 * kScreen + 60 + p] = 200;
    if (igloo_ >= kIglooNeed)
      draw_rect(f, 58.0f, 28.0f, 16.0f, 7.0f, 200);
    // Floes: white when their row is unvisited this cycle, grey after.
    for (int r = 0; r < kRows; ++r) {
      uint8_t shade = visited_[r] ? 120 : 230;
      for (int j = 0; j < kFloesPerRow; ++j)
        draw_rect(f, floe_x_[r][j], kRowY[r], kFloeW, kFloeH, shade);
    }
    // Birds.
    for (int b = 0; b < kBirds; ++b)
      draw_rect(f, bird_x_[b], kRowY[kBirdRow[b]] - kBirdH, kBirdW, kBirdH, 160);
    // Player.
    float py = row_ < 0 ? kShoreY - kPlayerH : kRowY[row_] - kPlayerH;
    draw_rect(f, x_, py, kPlayerW, kPlayerH, 255);
    // Temperature bar (top) and score ticks.
    for (int t = 0; t < temp_ && t < 60; ++t) f[3 * kScreen + 2 + t] = 160;
    for (int s = 0; s < score_ / 10 && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
    // Lives pips.
    for (int l = 0; l < lives_ && l < kLives; ++l)
      for (int k = 0; k < 3; ++k) f[82 * kScreen + 2 + l * 5 + k] = 160;
  }

  bool game_over() const override { return over_; }
  int lives() const override { return lives_; }
  int minimal_actions() const override { return 5; }
  int minimal_to_full(int a) const override {
    static const int map[5] = {0, 2, 3, 4, 5};  // NOOP UP RIGHT LEFT DOWN
    return map[a < 0 || a >= 5 ? 0 : a];
  }

 private:
  // Index of the floe under the player's center on row r, or -1.
  int floe_under(int r, float px) const {
    float cx = px + kPlayerW / 2.0f;
    for (int j = 0; j < kFloesPerRow; ++j)
      if (cx >= floe_x_[r][j] && cx < floe_x_[r][j] + kFloeW) return j;
    return -1;
  }

  float lose_life() {
    --lives_;
    if (lives_ <= 0) {
      over_ = true;
      return 0.0f;
    }
    respawn();
    return 0.0f;
  }

  void respawn() {
    x_ = 40.0f;
    row_ = -1;
    jump_cd_ = 0;
    temp_ = kTempMax;
    temp_frame_ = 0;
  }

  void reset_level() {
    for (int r = 0; r < kRows; ++r) {
      visited_[r] = false;
      for (int j = 0; j < kFloesPerRow; ++j)
        floe_x_[r][j] = static_cast<float>((j * 28 + r * 13) % 84);
    }
    for (int b = 0; b < kBirds; ++b)
      bird_x_[b] = static_cast<float>(10 + b * 40);
    igloo_ = 0;
    respawn();
  }

  static void draw_rect(uint8_t* f, float fx, float fy, float fw, float fh, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + fw), y1 = static_cast<int>(fy + fh);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  float floe_x_[kRows][kFloesPerRow] = {};
  float bird_x_[kBirds] = {};
  float x_ = 40.0f;
  int row_ = -1;  // -1 = shore, 0..3 = floe rows
  bool visited_[kRows] = {};
  int igloo_ = 0;
  int temp_ = kTempMax;
  int temp_frame_ = 0;
  int jump_cd_ = 0;
  int level_ = 0;
  int lives_ = kLives;
  int score_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_frostbite_game() { return std::make_unique<FrostbiteGame>(); }

}  // namespace cleanba
