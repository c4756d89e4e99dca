// Breakout — from-scratch C++ arcade game with the classic mechanics:
// FIRE to launch, 5 lives, 6x10 brick wall with row-dependent scoring (1/4/7),
// paddle-offset bounce control, ball speedup after hit milestones, new wall
// when cleared. Renders grayscale 84x84 directly (we own the renderer, so no
// 210x160 downsample pass is needed).
//
// Stands in for EnvPool's ALE Breakout-v5 in the reference's benchmark
// configs (reference make_env, cleanba/cleanba_ppo.py:126-146); the ALE ROMs
// are not available in this environment, so the engine provides a rules-true
// clone with identical protocol semantics (sticky actions, frameskip/maxpool,
// stacking handled by AtariLikeEnv).

#include <cmath>
#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr int kRows = 6;
constexpr int kCols = 10;
constexpr int kBrickW = 8;   // kCols * kBrickW spans x in [2, 82)
constexpr int kBrickH = 2;
constexpr int kBrickTop = 14;         // y of first brick row
constexpr int kWallTop = 4;           // top wall thickness
constexpr int kSideWall = 2;          // side wall thickness
constexpr float kPaddleY = 79.0f;     // paddle top y
constexpr int kPaddleH = 2;
constexpr int kPaddleW = 12;
constexpr float kBallSize = 2.0f;
constexpr float kBottom = 84.0f;

const uint8_t kRowShade[kRows] = {200, 186, 172, 158, 144, 130};
const float kRowScore[kRows] = {7, 7, 4, 4, 1, 1};

class BreakoutGame : public Game {
 public:
  void reset_game(PCG32& rng) override {
    std::memset(bricks_, 1, sizeof(bricks_));
    lives_ = 5;
    over_ = false;
    hits_ = 0;
    speed_ = 1.2f;
    paddle_x_ = 42.0f - kPaddleW / 2.0f;
    serve(rng);
  }

  float act(const AleAction& a, PCG32& rng) override {
    if (over_) return 0.0f;
    // Paddle: 2 px per raw frame.
    paddle_x_ += 2.0f * static_cast<float>(a.dx);
    float pmin = kSideWall, pmax = 84.0f - kSideWall - kPaddleW;
    if (paddle_x_ < pmin) paddle_x_ = pmin;
    if (paddle_x_ > pmax) paddle_x_ = pmax;

    if (waiting_) {
      ball_x_ = paddle_x_ + kPaddleW / 2.0f - kBallSize / 2.0f;
      ball_y_ = kPaddleY - kBallSize;
      if (a.fire) {
        waiting_ = false;
        // Launch angle: one of 4 diagonals, chosen by the env RNG stream.
        float dir = (rng.next_uint32() & 1) ? 1.0f : -1.0f;
        float steep = (rng.next_uint32() & 1) ? 0.5f : 1.0f;
        vx_ = dir * steep * speed_;
        vy_ = -speed_;
      }
      return 0.0f;
    }

    // Substep the ball to avoid tunneling at higher speeds.
    float reward = 0.0f;
    int substeps = 2;
    for (int s = 0; s < substeps; ++s) {
      ball_x_ += vx_ / substeps;
      ball_y_ += vy_ / substeps;
      reward += collide();
      if (waiting_ || over_) break;
    }
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    // Walls.
    for (int y = 0; y < kWallTop; ++y)
      for (int x = 0; x < kScreen; ++x) f[y * kScreen + x] = 142;
    for (int y = kWallTop; y < kScreen; ++y) {
      for (int x = 0; x < kSideWall; ++x) f[y * kScreen + x] = 142;
      for (int x = kScreen - kSideWall; x < kScreen; ++x) f[y * kScreen + x] = 142;
    }
    // Lives indicator: small ticks in the top wall row (replaces the score
    // digits of the real game; gives the net the life count signal).
    for (int l = 0; l < lives_; ++l)
      for (int x = 0; x < 2; ++x) f[1 * kScreen + 4 + l * 4 + x] = 0;
    // Bricks.
    for (int r = 0; r < kRows; ++r)
      for (int c = 0; c < kCols; ++c)
        if (bricks_[r][c])
          for (int y = 0; y < kBrickH; ++y)
            for (int x = 0; x < kBrickW; ++x)
              f[(kBrickTop + r * kBrickH + y) * kScreen + kSideWall + c * kBrickW + x] =
                  kRowShade[r];
    // Paddle.
    draw_rect(f, paddle_x_, kPaddleY, kPaddleW, kPaddleH, 200);
    // Ball.
    if (!over_) draw_rect(f, ball_x_, ball_y_, kBallSize, kBallSize, 236);
  }

  bool game_over() const override { return over_; }
  int lives() const override { return lives_; }
  int minimal_actions() const override { return 4; }
  int minimal_to_full(int a) const override {
    static const int map[4] = {0, 1, 3, 4};  // NOOP, FIRE, RIGHT, LEFT
    return map[a < 0 || a >= 4 ? 0 : a];
  }

 private:
  static void draw_rect(uint8_t* f, float fx, float fy, float fw, float fh, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + fw), y1 = static_cast<int>(fy + fh);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  void serve(PCG32&) {
    waiting_ = true;
    vx_ = vy_ = 0.0f;
    ball_x_ = paddle_x_ + kPaddleW / 2.0f - kBallSize / 2.0f;
    ball_y_ = kPaddleY - kBallSize;
  }

  void speed_up() {
    // Classic Breakout speedups after the 4th and 12th hit.
    ++hits_;
    if (hits_ == 4 || hits_ == 12) {
      speed_ *= 1.18f;
      vx_ *= 1.18f;
      vy_ *= 1.18f;
    }
  }

  float collide() {
    float reward = 0.0f;
    // Side walls.
    if (ball_x_ < kSideWall) {
      ball_x_ = kSideWall;
      vx_ = std::fabs(vx_);
    } else if (ball_x_ + kBallSize > kScreen - kSideWall) {
      ball_x_ = kScreen - kSideWall - kBallSize;
      vx_ = -std::fabs(vx_);
    }
    // Top wall.
    if (ball_y_ < kWallTop) {
      ball_y_ = kWallTop;
      vy_ = std::fabs(vy_);
    }
    // Bricks: test the ball center cell.
    float cx = ball_x_ + kBallSize / 2.0f, cy = ball_y_ + kBallSize / 2.0f;
    int r = static_cast<int>((cy - kBrickTop) / kBrickH);
    int c = static_cast<int>((cx - kSideWall) / kBrickW);
    if (r >= 0 && r < kRows && c >= 0 && c < kCols && bricks_[r][c]) {
      bricks_[r][c] = 0;
      reward += kRowScore[r];
      vy_ = -vy_;
      speed_up();
      if (wall_cleared()) std::memset(bricks_, 1, sizeof(bricks_));  // next wall
    }
    // Paddle (only when moving down).
    if (vy_ > 0 && ball_y_ + kBallSize >= kPaddleY && ball_y_ < kPaddleY + kPaddleH &&
        ball_x_ + kBallSize > paddle_x_ && ball_x_ < paddle_x_ + kPaddleW) {
      ball_y_ = kPaddleY - kBallSize;
      // Bounce angle follows the hit offset — the control mechanic.
      float offset = (cx - (paddle_x_ + kPaddleW / 2.0f)) / (kPaddleW / 2.0f);
      if (offset < -1.0f) offset = -1.0f;
      if (offset > 1.0f) offset = 1.0f;
      vx_ = offset * 1.25f * speed_;
      vy_ = -speed_;
    }
    // Bottom: life lost.
    if (ball_y_ > kBottom) {
      --lives_;
      if (lives_ <= 0) {
        over_ = true;
      } else {
        waiting_ = true;
        vx_ = vy_ = 0.0f;
      }
    }
    return reward;
  }

  bool wall_cleared() const {
    for (int r = 0; r < kRows; ++r)
      for (int c = 0; c < kCols; ++c)
        if (bricks_[r][c]) return false;
    return true;
  }

  uint8_t bricks_[kRows][kCols] = {};
  int lives_ = 5;
  int hits_ = 0;
  bool over_ = false;
  bool waiting_ = true;
  float speed_ = 1.2f;
  float paddle_x_ = 0, ball_x_ = 0, ball_y_ = 0, vx_ = 0, vy_ = 0;
};

}  // namespace

std::unique_ptr<Game> make_breakout_game() { return std::make_unique<BreakoutGame>(); }

}  // namespace cleanba
