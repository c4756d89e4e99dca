// Pitfall! — from-scratch C++ clone with the classic mechanics: run through
// a looping jungle of eight screens, leap the rolling logs (touching one
// drains the score), clear the croc pits, and scoop the treasures (+2000).
// Crocs kill; logs only bruise.
//
// Stands in for EnvPool's ALE Pitfall-v5 in the reference's benchmark
// configs (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs are
// not available here, so the engine provides a rules-true clone with
// identical protocol semantics (sticky actions / frameskip / stacking are
// applied by AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave13.py and must mirror these rules exactly.

#include <cmath>
#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr int kScreens = 8;
constexpr float kGroundY = 62.0f;
constexpr float kPlayerW = 4.0f, kPlayerH = 7.0f;
constexpr float kRun = 1.1f;
constexpr float kJumpV = -2.1f;
constexpr float kGravity = 0.16f;
// Per-screen layout flags: bit0 = rolling log, bit1 = croc pit, bit2 = treasure.
const int kLayout[kScreens] = {1, 0, 2, 1, 4, 1, 2, 4};
const float kPitX0 = 34.0f, kPitX1 = 54.0f;  // croc pit span
constexpr float kLogW = 6.0f, kLogH = 4.0f;
constexpr float kTreasX = 64.0f;
constexpr int kLives = 3;

class PitfallGame : public Game {
 public:
  void reset_game(PCG32&) override {
    lives_ = kLives;
    score_ = 0;
    over_ = false;
    for (int s = 0; s < kScreens; ++s) treasure_taken_[s] = false;
    screen_ = 0;
    log_x_ = 70.0f;
    respawn();
  }

  float act(const AleAction& a, PCG32&) override {
    if (over_) return 0.0f;
    float reward = 0.0f;
    int lay = kLayout[screen_];

    px_ += static_cast<float>(a.dx) * kRun;
    // Screen transitions at the edges.
    if (px_ < 0.0f) {
      px_ = 80.0f - kPlayerW;
      screen_ = (screen_ + kScreens - 1) % kScreens;
      log_x_ = 70.0f;
    } else if (px_ > 80.0f) {
      px_ = 0.0f;
      screen_ = (screen_ + 1) % kScreens;
      log_x_ = 70.0f;
    }
    if (grounded_ && a.dy < 0) {
      vy_ = kJumpV;
      grounded_ = false;
    }
    vy_ += kGravity;
    py_ += vy_;
    if (vy_ >= 0.0f && py_ + kPlayerH >= kGroundY) {
      py_ = kGroundY - kPlayerH;
      vy_ = 0.0f;
      grounded_ = true;
    }

    // The rolling log.
    if (lay & 1) {
      log_x_ -= 0.8f;
      if (log_x_ < -kLogW) log_x_ = 84.0f;
      float ly = kGroundY - kLogH;
      if (px_ + kPlayerW > log_x_ && px_ < log_x_ + kLogW &&
          py_ + kPlayerH > ly && py_ < ly + kLogH) {
        reward -= 1.0f;  // the log bruise drains the score
        score_ -= 1;
      }
    }
    // The croc pit: standing in it (grounded) is fatal.
    if ((lay & 2) && grounded_ && px_ + kPlayerW / 2.0f >= kPitX0 &&
        px_ + kPlayerW / 2.0f < kPitX1) {
      reward += lose_life();
      return reward;
    }
    // Treasure.
    if ((lay & 4) && !treasure_taken_[screen_] &&
        px_ + kPlayerW > kTreasX && px_ < kTreasX + 4.0f && grounded_) {
      treasure_taken_[screen_] = true;
      reward += 2000.0f;
      score_ += 2000;
    }
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    int lay = kLayout[screen_];
    // Canopy band and ground.
    for (int y = 8; y < 12; ++y)
      for (int x = 0; x < kScreen; ++x) f[y * kScreen + x] = 60;
    for (int y = static_cast<int>(kGroundY); y < static_cast<int>(kGroundY) + 2; ++y)
      for (int x = 0; x < kScreen; ++x) f[y * kScreen + x] = 100;
    // Underground band (scenery).
    for (int y = 76; y < 78; ++y)
      for (int x = 0; x < kScreen; ++x) f[y * kScreen + x] = 80;
    if (lay & 2) {
      // The pit (crocs as bumps).
      draw_rect(f, kPitX0, kGroundY, kPitX1 - kPitX0, 2.0f, 30);
      draw_rect(f, kPitX0 + 3.0f, kGroundY - 2.0f, 4.0f, 2.0f, 150);
      draw_rect(f, kPitX0 + 11.0f, kGroundY - 2.0f, 4.0f, 2.0f, 150);
    }
    if (lay & 1) draw_rect(f, log_x_, kGroundY - kLogH, kLogW, kLogH, 130);
    if ((lay & 4) && !treasure_taken_[screen_])
      draw_rect(f, kTreasX, kGroundY - 4.0f, 4.0f, 4.0f, 230);
    // Screen-index pips (world position cue).
    for (int s = 0; s <= screen_; ++s) f[5 * kScreen + 2 + s * 3] = 120;
    draw_rect(f, px_, py_, kPlayerW, kPlayerH, 255);
    int st = score_ < 0 ? 0 : score_ / 100;
    for (int s = 0; s < st && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
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
    respawn();
    return 0.0f;
  }

  void respawn() {
    px_ = 6.0f;
    py_ = kGroundY - kPlayerH;
    vy_ = 0.0f;
    grounded_ = true;
  }

  static void draw_rect(uint8_t* f, float fx, float fy, float fw, float fh, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + fw), y1 = static_cast<int>(fy + fh);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  float px_ = 6.0f, py_ = 55.0f, vy_ = 0.0f;
  bool grounded_ = true;
  int screen_ = 0;
  float log_x_ = 70.0f;
  bool treasure_taken_[kScreens] = {};
  int lives_ = kLives;
  int score_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_pitfall_game() { return std::make_unique<PitfallGame>(); }

}  // namespace cleanba
