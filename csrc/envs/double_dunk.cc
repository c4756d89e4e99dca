// Double Dunk — from-scratch C++ clone with the classic mechanics: one-on-
// one half-court basketball; dribble to the hoop, shoot with FIRE (+3 from
// beyond the arc, +2 inside), the AI guard dribbles and counter-shoots.
// Rewards are points scored minus points conceded; the clock ends the game.
//
// Stands in for EnvPool's ALE DoubleDunk-v5 in the reference's benchmark
// configs (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs are
// not available here, so the engine provides a rules-true clone with
// identical protocol semantics (sticky actions / frameskip / stacking are
// applied by AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave12.py and must mirror these rules exactly.

#include <cmath>
#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr float kCourtL = 8.0f, kCourtR = 76.0f;
constexpr float kCourtT = 14.0f, kCourtB = 76.0f;
constexpr float kHoopX = 42.0f, kHoopY = 16.0f;   // hoop center
constexpr float kArcY = 52.0f;                     // beyond = 3 points
constexpr float kPlayerS = 5.0f;
constexpr float kBall = 2.0f;
constexpr float kPSpeed = 1.1f;
constexpr float kAiSpeed = 0.85f;
constexpr float kShotV = 2.0f;
constexpr float kReach = 4.0f;
constexpr int kGameFrames = 12000;
constexpr int kAiShootDist = 22;

class DoubleDunkGame : public Game {
 public:
  void reset_game(PCG32&) override {
    frame_ = 0;
    over_ = false;
    score_diff_ = 0;
    tip_off(true);
  }

  float act(const AleAction& a, PCG32& rng) override {
    if (over_) return 0.0f;
    float reward = 0.0f;
    ++frame_;

    px_ += static_cast<float>(a.dx) * kPSpeed;
    py_ += static_cast<float>(a.dy) * kPSpeed;
    clamp(&px_, &py_);

    // AI: with the ball, drive at the hoop; otherwise shadow the player.
    float tx = holder_ == 2 ? kHoopX - kPlayerS / 2.0f : px_;
    float ty = holder_ == 2 ? kHoopY + 4.0f : py_;
    float adx = tx - ax_, ady = ty - ay_;
    float an = std::sqrt(adx * adx + ady * ady) + 1e-3f;
    ax_ += adx / an * kAiSpeed;
    ay_ += ady / an * kAiSpeed;
    clamp(&ax_, &ay_);

    if (holder_ == 0) {
      // Loose ball: straight flight; first skater close to a SLOW ball
      // takes it (a shot in flight cannot be snatched).
      ball_x_ += ball_vx_;
      ball_y_ += ball_vy_;
      ball_vx_ *= 0.97f;
      ball_vy_ *= 0.97f;
      if (ball_x_ < kCourtL || ball_x_ + kBall > kCourtR) ball_vx_ = -ball_vx_;
      if (ball_y_ < kCourtT || ball_y_ + kBall > kCourtB) ball_vy_ = -ball_vy_;
      float sp2 = ball_vx_ * ball_vx_ + ball_vy_ * ball_vy_;
      // Basket check while the ball flies.
      if (shooter_ != 0 && std::fabs(ball_x_ + kBall / 2.0f - kHoopX) < 3.0f &&
          std::fabs(ball_y_ + kBall / 2.0f - kHoopY) < 3.0f) {
        int pts = from_three_ ? 3 : 2;
        if (shooter_ == 1) {
          reward += static_cast<float>(pts);
          score_diff_ += pts;
          tip_off(false);  // conceding side takes the ball
        } else {
          reward -= static_cast<float>(pts);
          score_diff_ -= pts;
          tip_off(true);
        }
        if (frame_ >= kGameFrames) over_ = true;
        return reward;
      }
      if (sp2 < 1.0f) {
        shooter_ = 0;
        float pd = d2(px_ + kPlayerS / 2.0f, py_ + kPlayerS / 2.0f);
        float ad = d2(ax_ + kPlayerS / 2.0f, ay_ + kPlayerS / 2.0f);
        if (pd <= kReach * kReach && pd <= ad) holder_ = 1;
        else if (ad <= kReach * kReach) holder_ = 2;
      }
    } else if (holder_ == 1) {
      ball_x_ = px_ + kPlayerS / 2.0f;
      ball_y_ = py_ - 1.0f;
      if (a.fire) {
        from_three_ = py_ >= kArcY;
        shoot(1, rng);
      }
    } else {  // holder_ == 2
      ball_x_ = ax_ + kPlayerS / 2.0f;
      ball_y_ = ay_ - 1.0f;
      float hd = std::fabs(ax_ + kPlayerS / 2.0f - kHoopX) +
                 std::fabs(ay_ - kHoopY);
      if (hd < kAiShootDist) {
        from_three_ = ay_ >= kArcY;
        shoot(2, rng);
      }
    }

    if (frame_ >= kGameFrames) over_ = true;
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    // Court bounds and the three-point line.
    for (int x = static_cast<int>(kCourtL); x < static_cast<int>(kCourtR); ++x) {
      f[static_cast<int>(kCourtT) * kScreen + x] = 90;
      f[static_cast<int>(kCourtB) * kScreen + x] = 90;
      if (x % 3 == 0) f[static_cast<int>(kArcY) * kScreen + x] = 60;
    }
    for (int y = static_cast<int>(kCourtT); y < static_cast<int>(kCourtB); ++y) {
      f[y * kScreen + static_cast<int>(kCourtL)] = 90;
      f[y * kScreen + static_cast<int>(kCourtR)] = 90;
    }
    // Hoop.
    draw_rect(f, kHoopX - 3.0f, kHoopY - 1.0f, 6.0f, 2.0f, 200);
    draw_rect(f, ax_, ay_, kPlayerS, kPlayerS, 150);
    draw_rect(f, px_, py_, kPlayerS, kPlayerS, 255);
    draw_rect(f, ball_x_, ball_y_, kBall, kBall, 220);
    // Score-difference pips (center = 0).
    int sd = score_diff_;
    if (sd > 0)
      for (int s = 0; s < sd && s < 20; ++s) f[2 * kScreen + 44 + s * 2] = 200;
    if (sd < 0)
      for (int s = 0; s < -sd && s < 20; ++s) f[2 * kScreen + 40 - s * 2] = 140;
    return;
  }

  bool game_over() const override { return over_; }
  int lives() const override { return 1; }
  int minimal_actions() const override { return 18; }
  int minimal_to_full(int a) const override { return a < 0 || a >= 18 ? 0 : a; }

 private:
  float d2(float cx, float cy) const {
    float dx = ball_x_ + kBall / 2.0f - cx;
    float dy = ball_y_ + kBall / 2.0f - cy;
    return dx * dx + dy * dy;
  }

  static void clamp(float* x, float* y) {
    if (*x < kCourtL + 1.0f) *x = kCourtL + 1.0f;
    if (*x > kCourtR - 1.0f - kPlayerS) *x = kCourtR - 1.0f - kPlayerS;
    if (*y < kCourtT + 1.0f) *y = kCourtT + 1.0f;
    if (*y > kCourtB - 1.0f - kPlayerS) *y = kCourtB - 1.0f - kPlayerS;
  }

  void shoot(int who, PCG32& rng) {
    shooter_ = who;
    holder_ = 0;
    float jx = (rng.uniform() - 0.5f) * (who == 2 ? 4.0f : 2.0f);
    float dx = kHoopX + jx - ball_x_, dy = kHoopY - ball_y_;
    float n = std::sqrt(dx * dx + dy * dy) + 1e-3f;
    ball_vx_ = dx / n * kShotV;
    ball_vy_ = dy / n * kShotV;
    ball_x_ += ball_vx_;
    ball_y_ += ball_vy_;
  }

  void tip_off(bool player_ball) {
    px_ = 30.0f;
    py_ = 60.0f;
    ax_ = 50.0f;
    ay_ = 60.0f;
    holder_ = player_ball ? 1 : 2;
    shooter_ = 0;
    from_three_ = false;
    ball_x_ = 41.0f;
    ball_y_ = 60.0f;
    ball_vx_ = ball_vy_ = 0.0f;
  }

  static void draw_rect(uint8_t* f, float fx, float fy, float fw, float fh, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + fw), y1 = static_cast<int>(fy + fh);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  float px_ = 30.0f, py_ = 60.0f, ax_ = 50.0f, ay_ = 60.0f;
  float ball_x_ = 41.0f, ball_y_ = 60.0f, ball_vx_ = 0.0f, ball_vy_ = 0.0f;
  int holder_ = 1;   // 0 loose, 1 player, 2 AI
  int shooter_ = 0;  // who launched the ball in flight
  bool from_three_ = false;
  int score_diff_ = 0;
  int frame_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_double_dunk_game() { return std::make_unique<DoubleDunkGame>(); }

}  // namespace cleanba
