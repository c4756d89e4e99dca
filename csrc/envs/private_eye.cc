// Private Eye — from-scratch C++ clone with the classic mechanics: drive
// the Model A through a looping city beat, spring over potholes (hitting
// one stalls the car), recover the stolen goods (+100 each) and collar the
// elusive thief (+500) when he shows himself.
//
// Stands in for EnvPool's ALE PrivateEye-v5 in the reference's benchmark
// configs (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs
// are not available here, so the engine provides a rules-true clone with
// identical protocol semantics (sticky actions / frameskip / stacking are
// applied by AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave13.py and must mirror these rules exactly.

#include <cmath>
#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr int kScreens = 6;
constexpr float kRoadY = 60.0f;
constexpr float kCarW = 7.0f, kCarH = 5.0f;
constexpr float kDrive = 1.2f;
constexpr float kJumpV = -1.9f;
constexpr float kGravity = 0.15f;
// Per-screen: bit0 = pothole, bit1 = stolen item.
const int kLayout[kScreens] = {1, 2, 1, 0, 2, 1};
const float kHoleX = 40.0f, kHoleW = 8.0f;
const float kItemX = 60.0f;
constexpr int kStun = 30;
constexpr int kThiefPeriod = 800;
constexpr int kGameFrames = 14000;

class PrivateEyeGame : public Game {
 public:
  void reset_game(PCG32&) override {
    score_ = 0;
    over_ = false;
    frame_ = 0;
    screen_ = 0;
    stun_ = 0;
    thief_live_ = false;
    thief_screen_ = -1;
    for (int s = 0; s < kScreens; ++s) item_taken_[s] = false;
    respawn();
  }

  float act(const AleAction& a, PCG32& rng) override {
    if (over_) return 0.0f;
    float reward = 0.0f;
    ++frame_;
    int lay = kLayout[screen_];

    if (stun_ > 0) --stun_;
    float v = stun_ > 0 ? 0.0f : kDrive;
    px_ += static_cast<float>(a.dx) * v;
    if (px_ < 0.0f) {
      px_ = 80.0f - kCarW;
      screen_ = (screen_ + kScreens - 1) % kScreens;
    } else if (px_ > 80.0f) {
      px_ = 0.0f;
      screen_ = (screen_ + 1) % kScreens;
    }
    if (grounded_ && a.dy < 0 && stun_ == 0) {
      vy_ = kJumpV;
      grounded_ = false;
    }
    vy_ += kGravity;
    py_ += vy_;
    if (vy_ >= 0.0f && py_ + kCarH >= kRoadY) {
      py_ = kRoadY - kCarH;
      vy_ = 0.0f;
      grounded_ = true;
    }

    // Pothole: rolling through it (grounded) stalls the car.
    if ((lay & 1) && grounded_ && stun_ == 0 &&
        px_ + kCarW / 2.0f >= kHoleX && px_ + kCarW / 2.0f < kHoleX + kHoleW) {
      stun_ = kStun;
    }
    // Stolen item.
    if ((lay & 2) && !item_taken_[screen_] && grounded_ &&
        px_ + kCarW > kItemX && px_ < kItemX + 4.0f) {
      item_taken_[screen_] = true;
      reward += 100.0f;
      score_ += 100;
    }
    // The thief appears periodically on a random screen and lingers.
    if (!thief_live_ && frame_ % kThiefPeriod == 0) {
      thief_live_ = true;
      thief_screen_ = static_cast<int>(rng.randint(kScreens));
      thief_x_ = 10.0f + rng.uniform() * 60.0f;
      thief_timer_ = 500;
    }
    if (thief_live_) {
      if (--thief_timer_ <= 0) thief_live_ = false;
      else if (screen_ == thief_screen_ &&
               px_ + kCarW > thief_x_ && px_ < thief_x_ + 4.0f && grounded_) {
        thief_live_ = false;
        reward += 500.0f;
        score_ += 500;
      }
    }

    if (frame_ >= kGameFrames) over_ = true;
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    int lay = kLayout[screen_];
    // Skyline band varies per screen so the beat reads as a loop.
    for (int y = 14; y < 18; ++y)
      for (int x = 0; x < kScreen; ++x)
        if ((x / 6 + screen_) % 3 != 0) f[y * kScreen + x] = 70;
    for (int y = static_cast<int>(kRoadY); y < static_cast<int>(kRoadY) + 2; ++y)
      for (int x = 0; x < kScreen; ++x) f[y * kScreen + x] = 100;
    if (lay & 1) draw_rect(f, kHoleX, kRoadY, kHoleW, 2.0f, 20);
    if ((lay & 2) && !item_taken_[screen_])
      draw_rect(f, kItemX, kRoadY - 4.0f, 4.0f, 4.0f, 230);
    if (thief_live_ && screen_ == thief_screen_)
      draw_rect(f, thief_x_, kRoadY - 7.0f, 4.0f, 7.0f, 180);
    for (int s = 0; s <= screen_; ++s) f[5 * kScreen + 2 + s * 3] = 120;
    draw_rect(f, px_, py_, kCarW, kCarH, stun_ > 0 ? 140 : 255);
    for (int s = 0; s < score_ / 100 && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
  }

  bool game_over() const override { return over_; }
  int lives() const override { return 1; }
  int minimal_actions() const override { return 18; }
  int minimal_to_full(int a) const override { return a < 0 || a >= 18 ? 0 : a; }

 private:
  void respawn() {
    px_ = 6.0f;
    py_ = kRoadY - kCarH;
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
  int screen_ = 0, stun_ = 0;
  bool thief_live_ = false;
  int thief_screen_ = -1, thief_timer_ = 0;
  float thief_x_ = 0.0f;
  bool item_taken_[kScreens] = {};
  int frame_ = 0;
  int score_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_private_eye_game() {
  return std::make_unique<PrivateEyeGame>();
}

}  // namespace cleanba
