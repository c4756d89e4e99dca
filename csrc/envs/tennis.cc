// Tennis — from-scratch C++ clone with the classic mechanics: a top-down
// court split by a net, rallies against a ball-tracking CPU opponent,
// angled returns off the racket, ±1 per point, games to four points and the
// set decided at six games.
//
// Stands in for EnvPool's ALE Tennis-v5 in the reference's benchmark
// configs (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs are
// not available here, so the engine provides a rules-true clone with
// identical protocol semantics (sticky actions / frameskip / stacking are
// applied by AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave6.py and must mirror these rules exactly.

#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr float kCourtL = 14.0f, kCourtR = 70.0f;
constexpr float kNetY = 45.0f;
constexpr float kPTop = 48.0f, kPBot = 74.0f;   // player zone
constexpr float kCTop = 14.0f, kCBot = 40.0f;   // CPU zone
constexpr float kPadW = 6.0f, kPadH = 2.0f;
constexpr float kBaselineP = 80.0f, kBaselineC = 8.0f;
constexpr int kPointsPerGame = 4, kGamesPerSet = 6;

class TennisGame : public Game {
 public:
  void reset_game(PCG32&) override {
    px_ = 39.0f;
    py_ = 66.0f;
    cx_ = 39.0f;
    cy_ = 20.0f;
    p_points_ = c_points_ = p_games_ = c_games_ = 0;
    player_serves_ = true;
    serve_pause_ = 40;
    ball_live_ = false;
    over_ = false;
  }

  float act(const AleAction& a, PCG32& rng) override {
    if (over_) return 0.0f;
    float reward = 0.0f;

    // Player moves anywhere in the bottom half.
    px_ += static_cast<float>(a.dx) * 1.2f;
    py_ += static_cast<float>(a.dy) * 1.2f;
    px_ = px_ < kCourtL ? kCourtL : (px_ > kCourtR - kPadW ? kCourtR - kPadW : px_);
    py_ = py_ < kPTop ? kPTop : (py_ > kPBot ? kPBot : py_);

    // CPU tracks the ball (or re-centers between points).
    float want = ball_live_ && by_ < kNetY + 10.0f ? bx_ : 39.0f;
    cx_ += cx_ + kPadW / 2.0f < want ? 0.75f : -0.75f;
    cx_ = cx_ < kCourtL ? kCourtL : (cx_ > kCourtR - kPadW ? kCourtR - kPadW : cx_);

    // Serve after the inter-point pause (from the server's racket).
    if (!ball_live_) {
      if (--serve_pause_ <= 0) {
        ball_live_ = true;
        if (player_serves_) {
          bx_ = px_ + kPadW / 2.0f;
          by_ = py_ - 1.0f;
          bvy_ = -1.3f;
        } else {
          bx_ = cx_ + kPadW / 2.0f;
          by_ = cy_ + kPadH + 1.0f;
          bvy_ = 1.3f;
        }
        bvx_ = (rng.uniform() - 0.5f) * 1.2f;
      }
      return 0.0f;
    }

    // Ball flight with side-wall bounces.
    bx_ += bvx_;
    by_ += bvy_;
    if (bx_ < kCourtL + 1.0f || bx_ > kCourtR - 1.0f) bvx_ = -bvx_;

    // Rackets return the ball with placement-dependent angle.
    if (bvy_ > 0.0f && by_ + 1.0f >= py_ && by_ <= py_ + kPadH &&
        bx_ + 1.0f >= px_ && bx_ <= px_ + kPadW) {
      bvy_ = -1.3f;
      bvx_ = (bx_ - (px_ + kPadW / 2.0f)) * 0.25f;
      bvx_ = bvx_ > 1.2f ? 1.2f : (bvx_ < -1.2f ? -1.2f : bvx_);
    }
    if (bvy_ < 0.0f && by_ <= cy_ + kPadH && by_ + 1.0f >= cy_ &&
        bx_ + 1.0f >= cx_ && bx_ <= cx_ + kPadW) {
      bvy_ = 1.3f;
      bvx_ = (bx_ - (cx_ + kPadW / 2.0f)) * 0.25f;
      bvx_ = bvx_ > 1.2f ? 1.2f : (bvx_ < -1.2f ? -1.2f : bvx_);
    }

    // Baselines: a miss scores the point for the other side.
    if (by_ < kBaselineC) {
      reward = 1.0f;  // CPU failed to return
      point(true);
    } else if (by_ > kBaselineP) {
      reward = -1.0f;
      point(false);
    }

    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    // Court outline and net.
    for (int y = static_cast<int>(kBaselineC); y <= static_cast<int>(kBaselineP); ++y) {
      f[y * kScreen + static_cast<int>(kCourtL) - 1] = 90;
      f[y * kScreen + static_cast<int>(kCourtR)] = 90;
    }
    for (int x = static_cast<int>(kCourtL) - 1; x <= static_cast<int>(kCourtR); ++x) {
      f[static_cast<int>(kBaselineC) * kScreen + x] = 90;
      f[static_cast<int>(kBaselineP) * kScreen + x] = 90;
      f[static_cast<int>(kNetY) * kScreen + x] = 140;
    }
    // Game score pips: player along the bottom edge, CPU along the top.
    for (int g = 0; g < p_games_ && g < kGamesPerSet; ++g)
      draw_rect(f, 2.0f + 4.0f * static_cast<float>(g), 83.0f, 3, 1, 200);
    for (int g = 0; g < c_games_ && g < kGamesPerSet; ++g)
      draw_rect(f, 2.0f + 4.0f * static_cast<float>(g), 1.0f, 3, 1, 200);
    // Point pips inside the court margin.
    for (int p = 0; p < p_points_ && p < kPointsPerGame; ++p)
      draw_rect(f, 74.0f, 70.0f - 4.0f * static_cast<float>(p), 2, 2, 160);
    for (int p = 0; p < c_points_ && p < kPointsPerGame; ++p)
      draw_rect(f, 74.0f, 12.0f + 4.0f * static_cast<float>(p), 2, 2, 160);
    // Rackets and ball.
    draw_rect(f, cx_, cy_, kPadW, kPadH, 120);
    draw_rect(f, px_, py_, kPadW, kPadH, 200);
    if (ball_live_) draw_rect(f, bx_, by_, 2, 2, 236);
  }

  bool game_over() const override { return over_; }
  int lives() const override { return 1; }
  int minimal_actions() const override { return 18; }
  int minimal_to_full(int a) const override { return a < 0 || a >= 18 ? 0 : a; }

 private:
  void point(bool player_won) {
    if (player_won)
      ++p_points_;
    else
      ++c_points_;
    if (p_points_ >= kPointsPerGame || c_points_ >= kPointsPerGame) {
      if (p_points_ >= kPointsPerGame)
        ++p_games_;
      else
        ++c_games_;
      p_points_ = c_points_ = 0;
      if (p_games_ >= kGamesPerSet || c_games_ >= kGamesPerSet) over_ = true;
    }
    ball_live_ = false;
    serve_pause_ = 40;
    player_serves_ = !player_serves_;  // service alternates each point
  }

  static void draw_rect(uint8_t* f, float fx, float fy, float fw, float fh, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + fw), y1 = static_cast<int>(fy + fh);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  float px_ = 39.0f, py_ = 66.0f, cx_ = 39.0f, cy_ = 20.0f;
  float bx_ = 0, by_ = 0, bvx_ = 0, bvy_ = 0;
  bool ball_live_ = false, player_serves_ = true;
  int serve_pause_ = 40;
  int p_points_ = 0, c_points_ = 0, p_games_ = 0, c_games_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_tennis_game() { return std::make_unique<TennisGame>(); }

}  // namespace cleanba
