// Name This Game — from-scratch C++ clone with the classic mechanics: a
// diver defends a treasure from an octopus whose tentacles creep down the
// screen, a shark patrols ever faster, and oxygen runs out unless the diver
// refuels beneath the supply boat's air hose.
//
// Stands in for EnvPool's ALE NameThisGame-v5 in the reference's benchmark
// configs (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs are
// not available here, so the engine provides a rules-true clone with
// identical protocol semantics (sticky actions / frameskip / stacking are
// applied by AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave5.py and must mirror these rules exactly.

#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr int kTentacles = 6;
constexpr float kTentX[kTentacles] = {18.0f, 28.0f, 38.0f, 48.0f, 58.0f, 68.0f};
constexpr float kTentW = 2.0f;
constexpr float kTentTop = 18.0f;     // tentacles grow from the octopus body
constexpr float kPlayerY = 70.0f, kPlayerW = 5.0f, kPlayerH = 4.0f;
constexpr float kSharkY = 56.0f, kSharkW = 8.0f, kSharkH = 3.0f;
constexpr float kOxyMax = 600.0f;
constexpr int kHoseCycle = 400;       // hose extends for the last 200 of each cycle
constexpr int kHoseDown = 200;

class NameThisGameGame : public Game {
 public:
  void reset_game(PCG32&) override {
    px_ = 39.0f;
    for (int t = 0; t < kTentacles; ++t) tlen_[t] = 6.0f;
    shark_x_ = 2.0f;
    shark_dir_ = 1.0f;
    shark_dead_ = 0;
    shark_speed_ = 0.8f;
    shot_live_ = false;
    oxy_ = kOxyMax;
    boat_x_ = 30.0f;
    boat_dir_ = 1.0f;
    hose_timer_ = 0;
    lives_ = 3;
    invuln_ = 0;
    score_ = 0;
    over_ = false;
  }

  float act(const AleAction& a, PCG32& rng) override {
    if (over_) return 0.0f;
    float reward = 0.0f;

    px_ += static_cast<float>(a.dx) * 1.5f;
    px_ = px_ < 2.0f ? 2.0f : (px_ > 84.0f - 2.0f - kPlayerW ? 84.0f - 2.0f - kPlayerW : px_);
    if (a.fire && !shot_live_) {
      shot_live_ = true;
      sx_ = px_ + kPlayerW / 2.0f;
      sy_ = kPlayerY - 2.0f;
    }
    if (shot_live_) {
      sy_ -= 2.5f;
      if (sy_ < kTentTop - 4.0f) shot_live_ = false;
    }

    // One random tentacle creeps downward each frame.
    int grow = static_cast<int>(rng.randint(kTentacles));
    tlen_[grow] += 0.6f;

    // Shark patrols, speeding up with every kill.
    if (shark_dead_ > 0) {
      if (--shark_dead_ == 0) {
        shark_x_ = shark_dir_ > 0 ? 2.0f : 84.0f - 2.0f - kSharkW;
      }
    } else {
      shark_x_ += shark_dir_ * shark_speed_;
      if (shark_x_ < 2.0f || shark_x_ > 84.0f - 2.0f - kSharkW) shark_dir_ = -shark_dir_;
    }

    // Supply boat cruises the surface; the hose drops on a fixed cycle.
    boat_x_ += boat_dir_ * 0.5f;
    if (boat_x_ < 6.0f || boat_x_ > 84.0f - 6.0f - 8.0f) boat_dir_ = -boat_dir_;
    hose_timer_ = (hose_timer_ + 1) % kHoseCycle;
    bool hose_down = hose_timer_ >= kHoseCycle - kHoseDown;

    // Oxygen: drains always, refills under the extended hose.
    oxy_ -= 1.0f;
    float hose_x = boat_x_ + 4.0f;
    if (hose_down && px_ + kPlayerW / 2.0f > hose_x - 4.0f &&
        px_ + kPlayerW / 2.0f < hose_x + 4.0f) {
      oxy_ += 6.0f;
      if (oxy_ > kOxyMax) oxy_ = kOxyMax;
    }

    // Shot resolution: shark first (worth more), then tentacle tips.
    if (shot_live_ && shark_dead_ == 0 && sx_ + 1.0f > shark_x_ &&
        sx_ < shark_x_ + kSharkW && sy_ + 2.0f > kSharkY && sy_ < kSharkY + kSharkH) {
      shot_live_ = false;
      shark_dead_ = 60;
      shark_speed_ += 0.1f;
      reward += 150.0f;
    }
    if (shot_live_) {
      for (int t = 0; t < kTentacles; ++t) {
        float tip = kTentTop + tlen_[t];
        if (sx_ + 1.0f > kTentX[t] && sx_ < kTentX[t] + kTentW &&
            sy_ < tip && sy_ + 2.0f > tip - 6.0f) {
          tlen_[t] -= 8.0f;
          if (tlen_[t] < 0.0f) tlen_[t] = 0.0f;
          shot_live_ = false;
          reward += 10.0f;
          break;
        }
      }
    }

    // Death: oxygen out, shark contact, or a tentacle reaching the diver.
    if (invuln_ > 0) {
      --invuln_;
    } else {
      bool dead = oxy_ <= 0.0f;
      if (shark_dead_ == 0 && shark_x_ + kSharkW > px_ && shark_x_ < px_ + kPlayerW &&
          kSharkY + kSharkH > kPlayerY - 2.0f)
        dead = true;  // the shark swims just above the diver's head
      for (int t = 0; t < kTentacles; ++t) {
        if (kTentTop + tlen_[t] >= kPlayerY &&
            kTentX[t] + kTentW > px_ && kTentX[t] < px_ + kPlayerW)
          dead = true;
      }
      if (dead) {
        --lives_;
        invuln_ = 60;
        oxy_ = kOxyMax;
        for (int t = 0; t < kTentacles; ++t) tlen_[t] = 6.0f;
        if (lives_ <= 0) over_ = true;
      }
    }

    score_ += static_cast<int>(reward);
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    for (int s = 0; s < score_ / 200 && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
    // Surface line, boat, and hose.
    for (int x = 0; x < kScreen; ++x) f[5 * kScreen + x] = 70;
    draw_rect(f, boat_x_, 2.0f, 8, 3, 180);
    if (hose_timer_ >= kHoseCycle - kHoseDown)
      draw_rect(f, boat_x_ + 4.0f, 5.0f, 1, kPlayerY - 5.0f, 130);
    // Octopus body and tentacles.
    draw_rect(f, 30.0f, 8.0f, 24, 10, 160);
    for (int t = 0; t < kTentacles; ++t)
      draw_rect(f, kTentX[t], kTentTop, kTentW, tlen_[t], 140);
    // Shark.
    if (shark_dead_ == 0) draw_rect(f, shark_x_, kSharkY, kSharkW, kSharkH, 190);
    // Shot and diver.
    if (shot_live_) draw_rect(f, sx_, sy_, 1, 2, 224);
    if (invuln_ == 0 || (invuln_ / 4) % 2 == 0)
      draw_rect(f, px_, kPlayerY, kPlayerW, kPlayerH, 210);
    // Oxygen bar.
    draw_rect(f, 2.0f, 82.0f, oxy_ / kOxyMax * 80.0f, 1, 150);
    for (int l = 0; l < lives_; ++l) draw_rect(f, 2.0f + 4.0f * static_cast<float>(l), 80.0f, 3, 1, 180);
  }

  bool game_over() const override { return over_; }
  int lives() const override { return lives_; }
  int minimal_actions() const override { return 6; }
  int minimal_to_full(int a) const override {
    // NOOP FIRE RIGHT LEFT RIGHTFIRE LEFTFIRE
    static const int map[6] = {0, 1, 3, 4, 11, 12};
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

  float px_ = 39.0f;
  float tlen_[kTentacles] = {};
  float shark_x_ = 2.0f, shark_dir_ = 1.0f, shark_speed_ = 0.8f;
  int shark_dead_ = 0;
  bool shot_live_ = false;
  float sx_ = 0, sy_ = 0;
  float oxy_ = kOxyMax;
  float boat_x_ = 30.0f, boat_dir_ = 1.0f;
  int hose_timer_ = 0, lives_ = 3, invuln_ = 0, score_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_name_this_game_game() {
  return std::make_unique<NameThisGameGame>();
}

}  // namespace cleanba
