// Dodgeball — procgen-style arena (clone of procgen's dodgeball task, part
// of the reference's procgen family: legacy_scripts/
// cleanba_ppo_envpool_procgen.py uses plain `envpool.make(env_id)` over the
// procgen suite). Peg every roamer with a thrown ball (they throw back, and
// any hit on you ends the run), then walk out the opened exit for +10.
// Hard mode adds roamers. The pure-JAX twin lives in
// cleanba_tpu/envs/jax_procgen_wave14.py.

#include <cmath>
#include <cstring>

#include "procgen_like.h"

namespace cleanba {
namespace {

constexpr int kMaxFoes = 4;
constexpr float kActor = 4.0f;
constexpr float kMove = 1.1f;
constexpr float kBallV = 2.2f;
constexpr float kFoeBallV = 1.4f;

class DodgeballEnv : public ProcgenLikeEnv {
 public:
  DodgeballEnv(const EnvOptions& opts, bool hard) : ProcgenLikeEnv(opts), hard_(hard) {}

 protected:
  void reset_level(PCG32& rng) override {
    n_foes_ = (hard_ ? 3 : 2) + static_cast<int>(rng.randint(2));
    for (int e = 0; e < n_foes_; ++e) {
      fx_[e] = 8.0f + rng.uniform() * 48.0f;
      fy_[e] = 6.0f + rng.uniform() * 26.0f;
      fvx_[e] = (rng.uniform() - 0.5f) * 1.2f;
      fvy_[e] = (rng.uniform() - 0.5f) * 1.2f;
      foe_live_[e] = true;
      fball_live_[e] = false;
    }
    px_ = kPg / 2.0f;
    py_ = 54.0f;
    ball_live_ = false;
    last_dx_ = 0.0f;
    last_dy_ = -1.0f;
  }

  StepResult act(const PgAction& a, PCG32& rng) override {
    StepResult out;
    px_ += kMove * static_cast<float>(a.dx);
    py_ += kMove * static_cast<float>(a.dy);
    if (px_ < 2.0f) px_ = 2.0f;
    if (px_ > kPg - 2.0f - kActor) px_ = kPg - 2.0f - kActor;
    if (py_ < 2.0f) py_ = 2.0f;
    if (py_ > kPg - 4.0f - kActor) py_ = kPg - 4.0f - kActor;
    if (a.dx != 0 || a.dy != 0) {
      last_dx_ = static_cast<float>(a.dx);
      last_dy_ = static_cast<float>(a.dy);
    }

    if (a.special != 0 && !ball_live_) {
      ball_live_ = true;
      bx_ = px_ + kActor / 2.0f;
      by_ = py_ + kActor / 2.0f;
      float n = std::fabs(last_dx_) + std::fabs(last_dy_);
      bvx_ = last_dx_ / (n > 0 ? n : 1.0f) * kBallV;
      bvy_ = last_dy_ / (n > 0 ? n : 1.0f) * kBallV;
    }
    if (ball_live_) {
      bx_ += bvx_;
      by_ += bvy_;
      if (bx_ < 0.0f || bx_ >= kPg || by_ < 0.0f || by_ >= kPg) ball_live_ = false;
    }

    int alive = 0;
    for (int e = 0; e < n_foes_; ++e) {
      if (!foe_live_[e]) continue;
      ++alive;
      fx_[e] += fvx_[e];
      fy_[e] += fvy_[e];
      if (fx_[e] < 2.0f || fx_[e] + kActor > kPg - 2.0f) fvx_[e] = -fvx_[e];
      if (fy_[e] < 2.0f || fy_[e] + kActor > 40.0f) fvy_[e] = -fvy_[e];
      if (!fball_live_[e] && rng.uniform() < 0.012f) {
        fball_live_[e] = true;
        fbx_[e] = fx_[e] + kActor / 2.0f;
        fby_[e] = fy_[e] + kActor / 2.0f;
        float dx = px_ - fx_[e], dy = py_ - fy_[e];
        float n = std::sqrt(dx * dx + dy * dy) + 1e-3f;
        fbvx_[e] = dx / n * kFoeBallV;
        fbvy_[e] = dy / n * kFoeBallV;
      }
      if (ball_live_ && bx_ >= fx_[e] && bx_ < fx_[e] + kActor &&
          by_ >= fy_[e] && by_ < fy_[e] + kActor) {
        ball_live_ = false;
        foe_live_[e] = false;
        out.raw_reward += 1.0f;
        --alive;
        continue;
      }
      if (px_ + kActor > fx_[e] && px_ < fx_[e] + kActor &&
          py_ + kActor > fy_[e] && py_ < fy_[e] + kActor) {
        out.terminated = true;
        out.reward = out.raw_reward;
        return out;
      }
    }
    for (int e = 0; e < n_foes_; ++e) {
      if (!fball_live_[e]) continue;
      fbx_[e] += fbvx_[e];
      fby_[e] += fbvy_[e];
      if (fbx_[e] < 0.0f || fbx_[e] >= kPg || fby_[e] < 0.0f || fby_[e] >= kPg) {
        fball_live_[e] = false;
        continue;
      }
      if (px_ + kActor > fbx_[e] - 1.0f && px_ < fbx_[e] + 1.0f &&
          py_ + kActor > fby_[e] - 1.0f && py_ < fby_[e] + 1.0f) {
        out.terminated = true;
        out.reward = out.raw_reward;
        return out;
      }
    }

    // All pegged: the bottom exit opens.
    if (alive == 0 && py_ + kActor >= kPg - 5.0f &&
        px_ + kActor / 2.0f >= kPg / 2.0f - 5.0f &&
        px_ + kActor / 2.0f < kPg / 2.0f + 5.0f) {
      out.raw_reward += 10.0f;
      out.terminated = true;
    }
    out.reward = out.raw_reward;
    return out;
  }

  void render(uint8_t* f) const override {
    fill(f, 40, 40, 46);
    // Arena border; the exit gap shows once the room is clear.
    rect(f, 0.0f, 0.0f, static_cast<float>(kPg), 2.0f, 120, 120, 130);
    rect(f, 0.0f, 62.0f, static_cast<float>(kPg), 2.0f, 120, 120, 130);
    rect(f, 0.0f, 0.0f, 2.0f, static_cast<float>(kPg), 120, 120, 130);
    rect(f, 62.0f, 0.0f, 2.0f, static_cast<float>(kPg), 120, 120, 130);
    bool clear = true;
    for (int e = 0; e < n_foes_; ++e)
      if (foe_live_[e]) clear = false;
    if (clear)
      rect(f, kPg / 2.0f - 5.0f, 62.0f, 10.0f, 2.0f, 90, 220, 110);
    for (int e = 0; e < n_foes_; ++e) {
      if (foe_live_[e]) rect(f, fx_[e], fy_[e], kActor, kActor, 210, 90, 70);
      if (fball_live_[e])
        rect(f, fbx_[e] - 1.0f, fby_[e] - 1.0f, 2.0f, 2.0f, 230, 160, 120);
    }
    if (ball_live_) rect(f, bx_ - 1.0f, by_ - 1.0f, 2.0f, 2.0f, 120, 200, 230);
    rect(f, px_, py_, kActor, kActor, 90, 140, 220);
  }

 private:
  bool hard_;
  int n_foes_ = 0;
  bool foe_live_[kMaxFoes] = {};
  float fx_[kMaxFoes] = {}, fy_[kMaxFoes] = {}, fvx_[kMaxFoes] = {}, fvy_[kMaxFoes] = {};
  bool fball_live_[kMaxFoes] = {};
  float fbx_[kMaxFoes] = {}, fby_[kMaxFoes] = {}, fbvx_[kMaxFoes] = {}, fbvy_[kMaxFoes] = {};
  float px_ = 0, py_ = 0, last_dx_ = 0, last_dy_ = -1.0f;
  bool ball_live_ = false;
  float bx_ = 0, by_ = 0, bvx_ = 0, bvy_ = 0;
};

}  // namespace

std::unique_ptr<Env> make_dodgeball_env(const EnvOptions& opts, bool hard) {
  return std::make_unique<DodgeballEnv>(opts, hard);
}

}  // namespace cleanba
