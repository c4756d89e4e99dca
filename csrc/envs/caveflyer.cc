// Caveflyer — procgen-style cave navigation (clone of procgen's caveflyer
// task, part of the reference's procgen family: legacy_scripts/
// cleanba_ppo_envpool_procgen.py uses plain `envpool.make(env_id)` over the
// procgen suite). Thrust a drifting ship through a procedurally-carved
// cave to the exit beacon (+10); the walls are rock (fatal) and the turret
// pods (+3 when shot) guard the passage. Hard mode narrows the bore.
// The pure-JAX twin lives in cleanba_tpu/envs/jax_procgen_wave14.py.

#include <cmath>
#include <cstring>

#include "procgen_like.h"

namespace cleanba {
namespace {

constexpr int kCols = 16;                 // cave carved as 16 4-px columns
constexpr float kShip = 3.0f;
constexpr float kThrust = 0.16f;
constexpr float kDrag = 0.985f;
constexpr int kMaxPods = 3;

class CaveflyerEnv : public ProcgenLikeEnv {
 public:
  CaveflyerEnv(const EnvOptions& opts, bool hard) : ProcgenLikeEnv(opts), hard_(hard) {}

 protected:
  void reset_level(PCG32& rng) override {
    // Carve a wandering bore: per column a center and half-height.
    float c = 32.0f;
    for (int i = 0; i < kCols; ++i) {
      c += (rng.uniform() - 0.5f) * 14.0f;
      if (c < 14.0f) c = 14.0f;
      if (c > 50.0f) c = 50.0f;
      center_[i] = c;
      half_[i] = (hard_ ? 7.0f : 10.0f) + rng.uniform() * 4.0f;
    }
    n_pods_ = 1 + static_cast<int>(rng.randint(kMaxPods));
    for (int p = 0; p < n_pods_; ++p) {
      int col = 4 + static_cast<int>(rng.randint(kCols - 6));
      pod_x_[p] = static_cast<float>(col * 4 + 1);
      pod_y_[p] = center_[col] + (rng.uniform() < 0.5f ? -1.0f : 1.0f) *
                                     (half_[col] - 3.0f);
      pod_live_[p] = true;
    }
    px_ = 4.0f;
    py_ = center_[0];
    vx_ = vy_ = 0.0f;
    shot_live_ = false;
  }

  StepResult act(const PgAction& a, PCG32&) override {
    StepResult out;
    vx_ += kThrust * static_cast<float>(a.dx);
    vy_ += kThrust * static_cast<float>(a.dy);
    vx_ *= kDrag;
    vy_ *= kDrag;
    px_ += vx_;
    py_ += vy_;
    if (px_ < 0.0f) { px_ = 0.0f; vx_ = 0.0f; }
    if (py_ < 0.0f || py_ + kShip > kPg) {
      out.terminated = true;  // rock above/below the map
      return out;
    }
    // Rock collision: outside the bore at the ship's column.
    int col = static_cast<int>((px_ + kShip / 2.0f) / 4.0f);
    if (col >= kCols) col = kCols - 1;
    float cy = py_ + kShip / 2.0f;
    if (cy < center_[col] - half_[col] || cy > center_[col] + half_[col]) {
      out.terminated = true;
      return out;
    }

    if (a.special != 0 && !shot_live_) {
      shot_live_ = true;
      shot_x_ = px_ + kShip;
      shot_y_ = py_ + kShip / 2.0f;
    }
    if (shot_live_) {
      shot_x_ += 2.4f;
      int scol = static_cast<int>(shot_x_ / 4.0f);
      if (scol >= kCols) scol = kCols - 1;
      if (shot_x_ >= kPg ||
          shot_y_ < center_[scol] - half_[scol] ||
          shot_y_ > center_[scol] + half_[scol])
        shot_live_ = false;
    }
    for (int p = 0; p < n_pods_; ++p) {
      if (!pod_live_[p]) continue;
      if (shot_live_ && shot_x_ >= pod_x_[p] && shot_x_ < pod_x_[p] + 3.0f &&
          shot_y_ >= pod_y_[p] - 1.5f && shot_y_ < pod_y_[p] + 1.5f) {
        shot_live_ = false;
        pod_live_[p] = false;
        out.raw_reward += 3.0f;
        continue;
      }
      if (px_ + kShip > pod_x_[p] && px_ < pod_x_[p] + 3.0f &&
          py_ + kShip > pod_y_[p] - 1.5f && py_ < pod_y_[p] + 1.5f) {
        out.terminated = true;
        out.reward = out.raw_reward;
        return out;
      }
    }

    // The exit beacon at the far end of the bore.
    if (px_ + kShip >= kPg - 3.0f) {
      out.raw_reward += 10.0f;
      out.terminated = true;
    }
    out.reward = out.raw_reward;
    return out;
  }

  void render(uint8_t* f) const override {
    fill(f, 70, 52, 40);  // rock
    for (int i = 0; i < kCols; ++i) {
      float top = center_[i] - half_[i];
      rect(f, static_cast<float>(i * 4), top, 4.0f, 2.0f * half_[i], 14, 10, 20);
    }
    rect(f, static_cast<float>(kPg - 3), center_[kCols - 1] - 4.0f, 3.0f, 8.0f,
         90, 220, 110);
    for (int p = 0; p < n_pods_; ++p)
      if (pod_live_[p])
        rect(f, pod_x_[p], pod_y_[p] - 1.5f, 3.0f, 3.0f, 220, 90, 70);
    if (shot_live_) rect(f, shot_x_ - 1.0f, shot_y_ - 1.0f, 2.0f, 2.0f, 240, 240, 160);
    rect(f, px_, py_, kShip, kShip, 200, 210, 230);
  }

 private:
  bool hard_;
  float center_[kCols] = {}, half_[kCols] = {};
  int n_pods_ = 0;
  bool pod_live_[kMaxPods] = {};
  float pod_x_[kMaxPods] = {}, pod_y_[kMaxPods] = {};
  float px_ = 0, py_ = 0, vx_ = 0, vy_ = 0;
  bool shot_live_ = false;
  float shot_x_ = 0, shot_y_ = 0;
};

}  // namespace

std::unique_ptr<Env> make_caveflyer_env(const EnvOptions& opts, bool hard) {
  return std::make_unique<CaveflyerEnv>(opts, hard);
}

}  // namespace cleanba
