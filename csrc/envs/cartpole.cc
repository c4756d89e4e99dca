// CartPole-v1 — gymnasium-exact dynamics in float32, driven by the shared
// PCG32 stream so trajectories are bit-identical to the Python oracle
// (cleanba_tpu/envs/python_engine.py). Used for the exact-seed deterministic
// rollout checks (BASELINE.json config 1).

#include <cmath>

#include "env.h"

namespace cleanba {
namespace {

constexpr float kGravity = 9.8f;
constexpr float kMassCart = 1.0f;
constexpr float kMassPole = 0.1f;
constexpr float kTotalMass = kMassCart + kMassPole;
constexpr float kLength = 0.5f;
constexpr float kPoleMassLength = kMassPole * kLength;
constexpr float kForceMag = 10.0f;
constexpr float kTau = 0.02f;
constexpr float kThetaThreshold = 12.0f * 2.0f * 3.14159265358979323846f / 360.0f;
constexpr float kXThreshold = 2.4f;

class CartPoleEnv : public Env {
 public:
  explicit CartPoleEnv(const EnvOptions& opts) : rng_(opts.seed) {}

  void reset(void* obs) override {
    for (int j = 0; j < 4; ++j) state_[j] = rng_.uniform() * 0.1f - 0.05f;
    write_obs(obs);
  }

  StepResult step(int action, void* obs) override {
    float x = state_[0], x_dot = state_[1], theta = state_[2], theta_dot = state_[3];
    float force = action == 1 ? kForceMag : -kForceMag;
    float costheta = std::cos(theta);
    float sintheta = std::sin(theta);
    float temp = (force + kPoleMassLength * theta_dot * theta_dot * sintheta) / kTotalMass;
    float thetaacc = (kGravity * sintheta - costheta * temp) /
                     (kLength * (4.0f / 3.0f - kMassPole * costheta * costheta / kTotalMass));
    float xacc = temp - kPoleMassLength * thetaacc * costheta / kTotalMass;
    x = x + kTau * x_dot;
    x_dot = x_dot + kTau * xacc;
    theta = theta + kTau * theta_dot;
    theta_dot = theta_dot + kTau * thetaacc;
    state_[0] = x;
    state_[1] = x_dot;
    state_[2] = theta;
    state_[3] = theta_dot;
    StepResult out;
    out.reward = 1.0f;
    out.raw_reward = 1.0f;
    out.terminated =
        x < -kXThreshold || x > kXThreshold || theta < -kThetaThreshold || theta > kThetaThreshold;
    write_obs(obs);
    return out;
  }

 private:
  void write_obs(void* obs) const {
    float* o = static_cast<float*>(obs);
    for (int j = 0; j < 4; ++j) o[j] = state_[j];
  }

  PCG32 rng_;
  float state_[4] = {};
};

}  // namespace

std::unique_ptr<Env> make_cartpole_env(const EnvOptions& opts) {
  return std::make_unique<CartPoleEnv>(opts);
}

}  // namespace cleanba
