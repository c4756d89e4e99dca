// Ice Hockey — from-scratch C++ clone with the classic mechanics: a
// top-down rink, a puck with glide friction, possession by proximity, shots
// on goal with FIRE, an AI opponent that chases and counter-shoots, and an
// AI goalie guarding the top mouth (round-5 calibration: without it the
// player won every deterministic faceoff race and scored each ~31 frames —
// 390 net goals / 3,315% HNS, 6x any published agent on the real game; the
// goalie plus a 30-frame faceoff shot delay cap the differential near the
// published R2D2/Agent57 range). Goals score +1 / -1; the clock ends the
// game.
//
// Stands in for EnvPool's ALE IceHockey-v5 in the reference's benchmark
// configs (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs are
// not available here, so the engine provides a rules-true clone with
// identical protocol semantics (sticky actions / frameskip / stacking are
// applied by AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave10.py and must mirror these rules exactly.

#include <cmath>
#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr float kRinkL = 6.0f, kRinkR = 78.0f;
constexpr float kRinkT = 10.0f, kRinkB = 74.0f;
constexpr float kGoalL = 34.0f, kGoalR = 50.0f;  // goal mouths, top + bottom
constexpr float kSkater = 5.0f;
constexpr float kPuck = 2.0f;
constexpr float kPSpeed = 1.1f;
constexpr float kAiSpeed = 0.9f;
constexpr float kShot = 2.2f;
constexpr float kFriction = 0.985f;
constexpr float kReach = 4.0f;
constexpr float kGoalieW = 5.0f, kGoalieH = 3.0f, kGoalieSpeed = 0.7f;
constexpr int kFaceoffCool = 30;
constexpr int kGameFrames = 12000;
constexpr int kAiHold = 30;

class IceHockeyGame : public Game {
 public:
  void reset_game(PCG32&) override {
    score_us_ = score_them_ = 0;
    frame_ = 0;
    over_ = false;
    faceoff();
  }

  float act(const AleAction& a, PCG32& rng) override {
    if (over_) return 0.0f;
    float reward = 0.0f;
    ++frame_;

    // Player skater.
    px_ += static_cast<float>(a.dx) * kPSpeed;
    py_ += static_cast<float>(a.dy) * kPSpeed;
    clamp_skater(&px_, &py_);
    // AI skater chases the puck (with a slight goal-side bias).
    float tx = puck_x_ - kSkater / 2.0f, ty = puck_y_ - kSkater / 2.0f;
    float adx = tx - ax_, ady = ty - ay_;
    float n = std::sqrt(adx * adx + ady * ady) + 1e-3f;
    ax_ += adx / n * kAiSpeed;
    ay_ += ady / n * kAiSpeed;
    clamp_skater(&ax_, &ay_);
    // The goalie shadows the puck along the top mouth.
    if (shot_cool_ > 0) --shot_cool_;
    float want = puck_x_ + kPuck / 2.0f - kGoalieW / 2.0f;
    float gd = want - gx_;
    if (gd > kGoalieSpeed) gd = kGoalieSpeed;
    if (gd < -kGoalieSpeed) gd = -kGoalieSpeed;
    gx_ += gd;
    if (gx_ < kGoalL) gx_ = kGoalL;
    if (gx_ > kGoalR - kGoalieW) gx_ = kGoalR - kGoalieW;

    // Possession by proximity (the closer skater wins a contested puck) —
    // but only of a slow puck, so a shot escapes the shooter's stick
    // instead of being recaptured the next frame.
    bool slow = puck_vx_ * puck_vx_ + puck_vy_ * puck_vy_ < 1.0f;
    float pd = dist2(px_ + kSkater / 2.0f, py_ + kSkater / 2.0f);
    float ad = dist2(ax_ + kSkater / 2.0f, ay_ + kSkater / 2.0f);
    bool p_has = slow && pd <= kReach * kReach && pd <= ad;
    bool a_has = slow && !p_has && ad <= kReach * kReach;

    if (p_has) {
      ai_hold_ = 0;
      // Puck rides the stick (front of the skater, toward the top goal).
      puck_x_ = px_ + kSkater / 2.0f;
      puck_y_ = py_ - 1.5f;
      puck_vx_ = puck_vy_ = 0.0f;
      if (a.fire && shot_cool_ == 0) {
        // Aimable shot: LEFT/RIGHT+FIRE pulls the target toward a post, so
        // a post shot can beat a center-parked goalie.
        float gx = (kGoalL + kGoalR) / 2.0f + 6.0f * static_cast<float>(a.dx);
        float dx = gx - puck_x_, dy = kRinkT - puck_y_;
        float m = std::sqrt(dx * dx + dy * dy) + 1e-3f;
        puck_vx_ = dx / m * kShot;
        puck_vy_ = dy / m * kShot;
        puck_x_ += puck_vx_;  // the shot leaves the stick this frame
        puck_y_ += puck_vy_;
      }
    } else if (a_has) {
      puck_x_ = ax_ + kSkater / 2.0f;
      puck_y_ = ay_ + kSkater + 0.5f;
      puck_vx_ = puck_vy_ = 0.0f;
      // The AI shoots after winding up, with a little aim jitter.
      if (++ai_hold_ >= kAiHold && shot_cool_ == 0) {
        ai_hold_ = 0;
        float gx = (kGoalL + kGoalR) / 2.0f +
                   (rng.uniform() - 0.5f) * 10.0f;
        float dx = gx - puck_x_, dy = kRinkB - puck_y_;
        float m = std::sqrt(dx * dx + dy * dy) + 1e-3f;
        puck_vx_ = dx / m * kShot;
        puck_vy_ = dy / m * kShot;
        puck_x_ += puck_vx_;
        puck_y_ += puck_vy_;
      }
    } else {
      puck_x_ += puck_vx_;
      puck_y_ += puck_vy_;
      puck_vx_ *= kFriction;
      puck_vy_ *= kFriction;
      // Boards bounce everywhere except the goal mouths.
      if (puck_x_ < kRinkL || puck_x_ + kPuck > kRinkR) puck_vx_ = -puck_vx_;
      bool in_mouth = puck_x_ >= kGoalL && puck_x_ + kPuck <= kGoalR;
      if (!in_mouth && (puck_y_ < kRinkT || puck_y_ + kPuck > kRinkB))
        puck_vy_ = -puck_vy_;
      puck_x_ = std::max(kRinkL, std::min(puck_x_, kRinkR - kPuck));
      // The goalie blocks upward shots crossing its crease box.
      if (puck_vy_ < 0.0f && puck_y_ <= kRinkT + 2.0f &&
          puck_y_ + kPuck >= kRinkT - 2.0f &&
          puck_x_ + kPuck > gx_ && puck_x_ < gx_ + kGoalieW) {
        puck_vy_ = -puck_vy_ * 0.8f;
        puck_y_ = kRinkT + 2.5f;
      }
      // Goals.
      if (in_mouth && puck_y_ < kRinkT - 2.0f) {
        reward += 1.0f;
        ++score_us_;
        faceoff();
      } else if (in_mouth && puck_y_ + kPuck > kRinkB + 2.0f) {
        reward -= 1.0f;
        ++score_them_;
        faceoff();
      }
    }

    if (frame_ >= kGameFrames) over_ = true;
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    // Boards.
    for (int x = static_cast<int>(kRinkL); x < static_cast<int>(kRinkR); ++x) {
      if (x < kGoalL || x >= kGoalR) {
        f[static_cast<int>(kRinkT) * kScreen + x] = 100;
        f[static_cast<int>(kRinkB) * kScreen + x] = 100;
      }
    }
    for (int y = static_cast<int>(kRinkT); y < static_cast<int>(kRinkB); ++y) {
      f[y * kScreen + static_cast<int>(kRinkL)] = 100;
      f[y * kScreen + static_cast<int>(kRinkR)] = 100;
    }
    // Goal mouths.
    for (int x = static_cast<int>(kGoalL); x < static_cast<int>(kGoalR); ++x) {
      f[(static_cast<int>(kRinkT) - 2) * kScreen + x] = 60;
      f[(static_cast<int>(kRinkB) + 2) * kScreen + x] = 60;
    }
    draw_rect(f, ax_, ay_, kSkater, kSkater, 150);
    draw_rect(f, gx_, kRinkT - 1.0f, kGoalieW, kGoalieH, 170);
    draw_rect(f, px_, py_, kSkater, kSkater, 255);
    draw_rect(f, puck_x_, puck_y_, kPuck, kPuck, 220);
    // Score pips: ours on the left, theirs on the right.
    for (int s = 0; s < score_us_ && s < 20; ++s) f[1 * kScreen + 2 + s * 2] = 200;
    for (int s = 0; s < score_them_ && s < 20; ++s) f[1 * kScreen + 81 - s * 2] = 140;
  }

  bool game_over() const override { return over_; }
  int lives() const override { return 1; }
  int minimal_actions() const override { return 18; }
  int minimal_to_full(int a) const override { return a < 0 || a >= 18 ? 0 : a; }

 private:
  float dist2(float cx, float cy) const {
    float dx = puck_x_ + kPuck / 2.0f - cx;
    float dy = puck_y_ + kPuck / 2.0f - cy;
    return dx * dx + dy * dy;
  }

  static void clamp_skater(float* x, float* y) {
    if (*x < kRinkL + 1.0f) *x = kRinkL + 1.0f;
    if (*x > kRinkR - 1.0f - kSkater) *x = kRinkR - 1.0f - kSkater;
    if (*y < kRinkT + 1.0f) *y = kRinkT + 1.0f;
    if (*y > kRinkB - 1.0f - kSkater) *y = kRinkB - 1.0f - kSkater;
  }

  void faceoff() {
    px_ = 39.0f;
    py_ = 58.0f;
    ax_ = 39.0f;
    ay_ = 22.0f;
    puck_x_ = 41.0f;
    puck_y_ = 41.0f;
    puck_vx_ = puck_vy_ = 0.0f;
    ai_hold_ = 0;
    gx_ = (kGoalL + kGoalR) / 2.0f - kGoalieW / 2.0f;
    shot_cool_ = kFaceoffCool;
  }

  static void draw_rect(uint8_t* f, float fx, float fy, float fw, float fh, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + fw), y1 = static_cast<int>(fy + fh);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  float px_ = 39.0f, py_ = 58.0f, ax_ = 39.0f, ay_ = 22.0f;
  float gx_ = (kGoalL + kGoalR) / 2.0f - kGoalieW / 2.0f;
  int shot_cool_ = 0;
  float puck_x_ = 41.0f, puck_y_ = 41.0f, puck_vx_ = 0.0f, puck_vy_ = 0.0f;
  int ai_hold_ = 0;
  int score_us_ = 0, score_them_ = 0;
  int frame_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_ice_hockey_game() { return std::make_unique<IceHockeyGame>(); }

}  // namespace cleanba
