// Bowling — from-scratch C++ arcade game with the classic mechanics: aim the
// release point, roll down the lane with one mid-roll hook, knock pins, and
// score ten frames with real strike/spare bonus accounting.
//
// Stands in for EnvPool's ALE Bowling-v5 in the reference's benchmark
// configs (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs are
// not available here, so the engine provides a rules-true clone with
// identical protocol semantics (sticky actions / frameskip / stacking are
// applied by AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave4.py and must mirror these rules exactly.
//
// Scoring is awarded incrementally: each roll pays `pins * (1 + carried
// bonuses)`, where a strike banks a bonus on the next two rolls and a spare
// on the next one. Summed over a game this equals the traditional score
// (tenth-frame extra rolls also count face value — the arcade variant).

#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr int kPins = 10;
constexpr float kLaneTop = 35.0f, kLaneBot = 61.0f;
constexpr float kAimX = 8.0f;
constexpr float kBallV = 1.6f;
constexpr float kCurve = 0.22f;
constexpr int kFrames = 10;

// Pin triangle pointing at the incoming ball: column j holds j+1 pins.
struct PinPos { float x, y; };
const PinPos kPin[kPins] = {
    {66.0f, 48.0f},
    {70.0f, 44.5f}, {70.0f, 51.5f},
    {74.0f, 41.0f}, {74.0f, 48.0f}, {74.0f, 55.0f},
    {78.0f, 37.5f}, {78.0f, 44.5f}, {78.0f, 51.5f}, {78.0f, 58.5f},
};

class BowlingGame : public Game {
 public:
  void reset_game(PCG32&) override {
    for (int p = 0; p < kPins; ++p) standing_[p] = true;
    ball_x_ = kAimX;
    ball_y_ = 48.0f;
    vy_ = 0.0f;
    rolling_ = false;
    curved_ = false;
    tenth_extra_ = false;
    pins_this_roll_ = 0;
    frame_no_ = 0;
    roll_in_frame_ = 0;
    bonus1_ = bonus2_ = 0;
    score_ = 0;
    over_ = false;
  }

  float act(const AleAction& a, PCG32&) override {
    if (over_) return 0.0f;
    float reward = 0.0f;

    if (!rolling_) {
      // Aim phase: pick the release row, FIRE to bowl.
      ball_y_ += static_cast<float>(a.dy);
      if (ball_y_ < kLaneTop + 1) ball_y_ = kLaneTop + 1;
      if (ball_y_ > kLaneBot - 1) ball_y_ = kLaneBot - 1;
      if (a.fire) {
        rolling_ = true;
        curved_ = false;
        vy_ = 0.0f;
        pins_this_roll_ = 0;
      }
      return 0.0f;
    }

    // Rolling: one hook per roll, chosen by the first UP/DOWN pressed.
    if (!curved_ && a.dy != 0) {
      vy_ = kCurve * static_cast<float>(a.dy);
      curved_ = true;
    }
    ball_x_ += kBallV;
    ball_y_ += vy_;
    if (ball_y_ < kLaneTop + 1) { ball_y_ = kLaneTop + 1; vy_ = 0.0f; }
    if (ball_y_ > kLaneBot - 1) { ball_y_ = kLaneBot - 1; vy_ = 0.0f; }

    // The ball ploughs through any pin on its path.
    for (int p = 0; p < kPins; ++p) {
      if (!standing_[p]) continue;
      float dx = ball_x_ - kPin[p].x, dy = ball_y_ - kPin[p].y;
      if (dx > -3.0f && dx < 3.0f && dy > -3.5f && dy < 3.5f) {
        standing_[p] = false;
        ++pins_this_roll_;
      }
    }

    if (ball_x_ > 82.0f) reward = finish_roll();
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    // Lane borders.
    for (int x = 0; x < kScreen; ++x) {
      f[static_cast<int>(kLaneTop - 1) * kScreen + x] = 100;
      f[static_cast<int>(kLaneBot + 1) * kScreen + x] = 100;
    }
    // Score ticks (one per 10 points) in the top row.
    for (int s = 0; s < score_ / 10 && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
    // Frame markers (one per completed frame) in row 3.
    for (int s = 0; s < frame_no_ && s < kFrames; ++s) f[3 * kScreen + 2 + s * 3] = 120;
    // Standing pins.
    for (int p = 0; p < kPins; ++p)
      if (standing_[p]) draw_rect(f, kPin[p].x - 1, kPin[p].y - 1, 2, 2, 200);
    // Ball.
    draw_rect(f, ball_x_ - 1, ball_y_ - 1, 3, 3, 224);
  }

  bool game_over() const override { return over_; }
  int lives() const override { return 1; }
  int minimal_actions() const override { return 6; }
  int minimal_to_full(int a) const override {
    // NOOP FIRE UP DOWN UPFIRE DOWNFIRE
    static const int map[6] = {0, 1, 2, 5, 10, 13};
    return map[a < 0 || a >= 6 ? 0 : a];
  }

 private:
  float finish_roll() {
    // Pay this roll with carried bonuses, then bank new ones.
    float reward = static_cast<float>(pins_this_roll_) * (1.0f + bonus1_);
    score_ += static_cast<int>(reward);
    bonus1_ = bonus2_;
    bonus2_ = 0;

    int down = 0;
    for (int p = 0; p < kPins; ++p) down += standing_[p] ? 0 : 1;
    bool strike = roll_in_frame_ == 0 && down == kPins;
    bool spare = roll_in_frame_ == 1 && down == kPins;
    if (strike) { bonus1_ += 1; bonus2_ += 1; }
    if (spare) bonus1_ += 1;

    ++roll_in_frame_;
    bool frame_done;
    if (frame_no_ == kFrames - 1) {
      // Tenth frame: a strike or spare earns up to three rolls.
      bool earned_extra = strike || spare || tenth_extra_;
      if (strike || spare) tenth_extra_ = true;
      frame_done = roll_in_frame_ >= (earned_extra ? 3 : 2);
      if (down == kPins && roll_in_frame_ < 3) {
        for (int p = 0; p < kPins; ++p) standing_[p] = true;  // fresh rack
      }
    } else {
      frame_done = strike || roll_in_frame_ >= 2;
    }

    if (frame_done) {
      ++frame_no_;
      roll_in_frame_ = 0;
      for (int p = 0; p < kPins; ++p) standing_[p] = true;
      if (frame_no_ >= kFrames) over_ = true;
    }
    rolling_ = false;
    ball_x_ = kAimX;
    return reward;
  }

  static void draw_rect(uint8_t* f, float fx, float fy, float fw, float fh, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + fw), y1 = static_cast<int>(fy + fh);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  bool standing_[kPins] = {};
  float ball_x_ = kAimX, ball_y_ = 48.0f, vy_ = 0.0f;
  bool rolling_ = false, curved_ = false, tenth_extra_ = false;
  int pins_this_roll_ = 0;
  int frame_no_ = 0, roll_in_frame_ = 0;
  int bonus1_ = 0, bonus2_ = 0;
  int score_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_bowling_game() { return std::make_unique<BowlingGame>(); }

}  // namespace cleanba
