// Pong — from-scratch C++ clone: player paddle (right), tracking CPU opponent
// (left) with capped speed and reaction error, rally speedup, first to 21.
// Rewards are +1 / -1 per point (reward_clip is a no-op here, like real Pong).
// Stands in for EnvPool's ALE Pong-v5 (reference benchmark config 4,
// BASELINE.json).

#include <cmath>
#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr int kWallTop = 4;
constexpr int kWallBottom = 80;
constexpr int kPaddleH = 8;
constexpr int kPaddleW = 2;
constexpr float kPlayerX = 78.0f;  // right side
constexpr float kCpuX = 4.0f;      // left side
constexpr float kBallSize = 2.0f;

class PongGame : public Game {
 public:
  void reset_game(PCG32& rng) override {
    player_score_ = cpu_score_ = 0;
    over_ = false;
    player_y_ = cpu_y_ = 42.0f - kPaddleH / 2.0f;
    serve(rng, /*towards_player=*/true);
  }

  float act(const AleAction& a, PCG32& rng) override {
    if (over_) return 0.0f;
    // ALE Pong maps UP/DOWN; RIGHT/LEFT also act as UP/DOWN on the paddle.
    int dy = a.dy != 0 ? a.dy : (a.dx != 0 ? a.dx : 0);
    player_y_ += 2.0f * static_cast<float>(dy);
    clamp_paddle(player_y_);

    // CPU opponent: track the ball with capped speed; small deadzone makes it
    // beatable by well-angled shots.
    float target = ball_y_ + kBallSize / 2.0f - kPaddleH / 2.0f;
    float err = target - cpu_y_;
    float cpu_speed = 1.15f;
    if (std::fabs(err) > 2.0f) cpu_y_ += err > 0 ? cpu_speed : -cpu_speed;
    clamp_paddle(cpu_y_);

    float reward = 0.0f;
    int substeps = 2;
    for (int s = 0; s < substeps && !over_; ++s) {
      ball_x_ += vx_ / substeps;
      ball_y_ += vy_ / substeps;
      reward += collide(rng);
    }
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 20, kScreenPx);  // court background
    for (int y = 0; y < kWallTop; ++y)
      for (int x = 0; x < kScreen; ++x) f[y * kScreen + x] = 142;
    for (int y = kWallBottom; y < kScreen; ++y)
      for (int x = 0; x < kScreen; ++x) f[y * kScreen + x] = 142;
    // Score ticks along the top wall: player right half, cpu left half.
    for (int s = 0; s < cpu_score_ && s < 21; ++s) f[1 * kScreen + 2 + s] = 0;
    for (int s = 0; s < player_score_ && s < 21; ++s) f[1 * kScreen + 81 - s] = 0;
    draw_rect(f, kCpuX, cpu_y_, kPaddleW, kPaddleH, 120);
    draw_rect(f, kPlayerX, player_y_, kPaddleW, kPaddleH, 200);
    if (!over_) draw_rect(f, ball_x_, ball_y_, kBallSize, kBallSize, 236);
  }

  bool game_over() const override { return over_; }
  int lives() const override { return 1; }
  int minimal_actions() const override { return 6; }
  int minimal_to_full(int a) const override {
    static const int map[6] = {0, 1, 3, 4, 11, 12};  // ALE Pong minimal set
    return map[a < 0 || a >= 6 ? 0 : a];
  }

 private:
  static void draw_rect(uint8_t* f, float fx, float fy, float fw, float fh, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + fw), y1 = static_cast<int>(fy + fh);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  static void clamp_paddle(float& y) {
    if (y < kWallTop) y = kWallTop;
    if (y + kPaddleH > kWallBottom) y = kWallBottom - kPaddleH;
  }

  void serve(PCG32& rng, bool towards_player) {
    ball_x_ = 42.0f;
    ball_y_ = kWallTop + rng.randint(kWallBottom - kWallTop - 4);
    speed_ = 1.1f;
    vx_ = towards_player ? speed_ : -speed_;
    vy_ = (rng.next_uint32() & 1) ? 0.6f : -0.6f;
  }

  float collide(PCG32& rng) {
    // Walls.
    if (ball_y_ < kWallTop) {
      ball_y_ = kWallTop;
      vy_ = std::fabs(vy_);
    } else if (ball_y_ + kBallSize > kWallBottom) {
      ball_y_ = kWallBottom - kBallSize;
      vy_ = -std::fabs(vy_);
    }
    // Player paddle.
    if (vx_ > 0 && ball_x_ + kBallSize >= kPlayerX && ball_x_ < kPlayerX + kPaddleW &&
        ball_y_ + kBallSize > player_y_ && ball_y_ < player_y_ + kPaddleH) {
      ball_x_ = kPlayerX - kBallSize;
      bounce(player_y_);
      vx_ = -std::fabs(vx_);
    }
    // CPU paddle.
    if (vx_ < 0 && ball_x_ <= kCpuX + kPaddleW && ball_x_ + kBallSize > kCpuX &&
        ball_y_ + kBallSize > cpu_y_ && ball_y_ < cpu_y_ + kPaddleH) {
      ball_x_ = kCpuX + kPaddleW;
      bounce(cpu_y_);
      vx_ = std::fabs(vx_);
    }
    // Points.
    if (ball_x_ > kScreen) {  // past the player: CPU scores
      ++cpu_score_;
      if (cpu_score_ >= 21) over_ = true;
      else serve(rng, true);
      return -1.0f;
    }
    if (ball_x_ + kBallSize < 0) {  // past the CPU: player scores
      ++player_score_;
      if (player_score_ >= 21) over_ = true;
      else serve(rng, false);
      return 1.0f;
    }
    return 0.0f;
  }

  void bounce(float paddle_y) {
    float offset =
        (ball_y_ + kBallSize / 2.0f - (paddle_y + kPaddleH / 2.0f)) / (kPaddleH / 2.0f);
    if (offset < -1.0f) offset = -1.0f;
    if (offset > 1.0f) offset = 1.0f;
    speed_ *= 1.03f;
    if (speed_ > 2.0f) speed_ = 2.0f;
    vy_ = offset * 1.1f * speed_;
    float mag = std::fabs(vx_) * 1.03f;
    vx_ = vx_ > 0 ? mag : -mag;
    if (std::fabs(vx_) > 2.0f) vx_ = vx_ > 0 ? 2.0f : -2.0f;
  }

  int player_score_ = 0, cpu_score_ = 0;
  bool over_ = false;
  float player_y_ = 0, cpu_y_ = 0, ball_x_ = 0, ball_y_ = 0, vx_ = 0, vy_ = 0, speed_ = 1.1f;
};

}  // namespace

std::unique_ptr<Game> make_pong_game() { return std::make_unique<PongGame>(); }

}  // namespace cleanba
