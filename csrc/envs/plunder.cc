// Plunder — procgen-style target shooter (clone of procgen's plunder task,
// part of the reference's procgen family: legacy_scripts/
// cleanba_ppo_envpool_procgen.py uses plain `envpool.make(env_id)` over the
// procgen suite). Ships stream across the sea lanes; sink the ones flying
// the target colors (+1 each) and hold fire on friendlies (hitting one
// burns clock). The timer ends the episode. Hard mode runs faster lanes.
// The pure-JAX twin lives in cleanba_tpu/envs/jax_procgen_wave14.py.

#include <cstring>

#include "procgen_like.h"

namespace cleanba {
namespace {

constexpr int kLanes = 3;
const float kLaneY[kLanes] = {12.0f, 24.0f, 36.0f};
constexpr float kShipW = 7.0f, kShipH = 4.0f;
constexpr float kPlayerW = 6.0f, kPlayerH = 4.0f;
constexpr float kPlayerY = 56.0f;
constexpr float kMove = 1.3f;
constexpr float kShotV = 2.4f;
constexpr int kTimer = 1200;
constexpr int kMissPenalty = 80;  // friendly fire burns clock

class PlunderEnv : public ProcgenLikeEnv {
 public:
  PlunderEnv(const EnvOptions& opts, bool hard) : ProcgenLikeEnv(opts), hard_(hard) {}

 protected:
  void reset_level(PCG32& rng) override {
    for (int l = 0; l < kLanes; ++l) {
      speed_[l] = (0.4f + 0.4f * rng.uniform()) * (hard_ ? 1.5f : 1.0f) *
                  (l % 2 ? -1.0f : 1.0f);
      ship_x_[l] = rng.uniform() * kPg;
      ship_target_[l] = rng.uniform() < 0.5f;
    }
    px_ = kPg / 2.0f - kPlayerW / 2.0f;
    shot_live_ = false;
    clock_ = kTimer;
  }

  StepResult act(const PgAction& a, PCG32& rng) override {
    StepResult out;
    px_ += kMove * static_cast<float>(a.dx);
    if (px_ < 0.0f) px_ = 0.0f;
    if (px_ > kPg - kPlayerW) px_ = kPg - kPlayerW;

    if ((a.special != 0 || a.dy < 0) && !shot_live_) {
      shot_live_ = true;
      shot_x_ = px_ + kPlayerW / 2.0f;
      shot_y_ = kPlayerY;
    }
    if (shot_live_) {
      shot_y_ -= kShotV;
      if (shot_y_ < 0.0f) shot_live_ = false;
    }

    for (int l = 0; l < kLanes; ++l) {
      ship_x_[l] += speed_[l];
      if (ship_x_[l] < -kShipW) {
        ship_x_[l] = static_cast<float>(kPg);
        ship_target_[l] = rng.uniform() < 0.5f;
      }
      if (ship_x_[l] > kPg) {
        ship_x_[l] = -kShipW;
        ship_target_[l] = rng.uniform() < 0.5f;
      }
      if (shot_live_ && shot_x_ >= ship_x_[l] && shot_x_ < ship_x_[l] + kShipW &&
          shot_y_ >= kLaneY[l] && shot_y_ < kLaneY[l] + kShipH) {
        shot_live_ = false;
        if (ship_target_[l]) {
          out.raw_reward += 1.0f;
        } else {
          clock_ -= kMissPenalty;  // friendly: burn the clock
        }
        ship_x_[l] = speed_[l] > 0 ? -kShipW : static_cast<float>(kPg);
        ship_target_[l] = rng.uniform() < 0.5f;
      }
    }

    if (--clock_ <= 0) out.terminated = true;
    out.reward = out.raw_reward;
    return out;
  }

  void render(uint8_t* f) const override {
    fill(f, 16, 30, 60);  // sea
    for (int l = 0; l < kLanes; ++l) {
      // Target ships red, friendlies white.
      if (ship_target_[l])
        rect(f, ship_x_[l], kLaneY[l], kShipW, kShipH, 210, 60, 60);
      else
        rect(f, ship_x_[l], kLaneY[l], kShipW, kShipH, 230, 230, 230);
    }
    if (shot_live_) rect(f, shot_x_ - 1.0f, shot_y_ - 2.0f, 2.0f, 3.0f, 240, 220, 120);
    rect(f, px_, kPlayerY, kPlayerW, kPlayerH, 160, 120, 60);
    // Clock bar.
    int bars = clock_ * (kPg - 4) / kTimer;
    if (bars > 0) rect(f, 2.0f, 61.0f, static_cast<float>(bars), 1.0f, 230, 200, 90);
  }

 private:
  bool hard_;
  float ship_x_[kLanes] = {}, speed_[kLanes] = {};
  bool ship_target_[kLanes] = {};
  float px_ = 0;
  bool shot_live_ = false;
  float shot_x_ = 0, shot_y_ = 0;
  int clock_ = kTimer;
};

}  // namespace

std::unique_ptr<Env> make_plunder_env(const EnvOptions& opts, bool hard) {
  return std::make_unique<PlunderEnv>(opts, hard);
}

}  // namespace cleanba
