// Climber — procgen-style vertical platformer (clone of procgen's climber
// task, part of the reference's procgen family: legacy_scripts/
// cleanba_ppo_envpool_procgen.py uses plain `envpool.make(env_id)` over the
// procgen suite). Spring up the ledge ladder collecting stars (+1 each);
// topping out with every star banked pays +10. Falling off the bottom ends
// the run. Hard mode spreads the ledges. The pure-JAX twin lives in
// cleanba_tpu/envs/jax_procgen_wave14.py.

#include <cstring>

#include "procgen_like.h"

namespace cleanba {
namespace {

constexpr int kMaxPlat = 9;
constexpr float kPlayer = 4.0f;
constexpr float kRun = 1.1f;
constexpr float kJumpV = -2.5f;
constexpr float kGravity = 0.17f;

class ClimberEnv : public ProcgenLikeEnv {
 public:
  ClimberEnv(const EnvOptions& opts, bool hard) : ProcgenLikeEnv(opts), hard_(hard) {}

 protected:
  void reset_level(PCG32& rng) override {
    n_plat_ = 7 + static_cast<int>(rng.randint(3));
    float y = 58.0f;
    n_stars_ = 0;
    for (int i = 0; i < n_plat_; ++i) {
      plat_w_[i] = 10.0f + static_cast<float>(rng.randint(6));
      plat_x_[i] = 2.0f + rng.uniform() * (kPg - 4.0f - plat_w_[i]);
      plat_y_[i] = y;
      star_[i] = i > 0 && rng.uniform() < 0.6f;
      if (star_[i]) ++n_stars_;
      y -= (hard_ ? 7.5f : 6.5f) + static_cast<float>(rng.randint(2));
    }
    px_ = plat_x_[0] + 2.0f;
    py_ = plat_y_[0] - kPlayer;
    vy_ = 0.0f;
    grounded_ = true;
    got_ = 0;
  }

  StepResult act(const PgAction& a, PCG32&) override {
    StepResult out;
    px_ += kRun * static_cast<float>(a.dx);
    if (px_ < 0.0f) px_ = 0.0f;
    if (px_ > kPg - kPlayer) px_ = kPg - kPlayer;
    if (a.dy < 0 && grounded_) {
      vy_ = kJumpV;
      grounded_ = false;
    }
    float prev_bottom = py_ + kPlayer;
    vy_ += kGravity;
    py_ += vy_;
    grounded_ = false;
    for (int i = 0; i < n_plat_; ++i) {
      bool over = px_ + kPlayer > plat_x_[i] && px_ < plat_x_[i] + plat_w_[i];
      if (vy_ >= 0.0f && over && prev_bottom <= plat_y_[i] &&
          py_ + kPlayer >= plat_y_[i]) {
        py_ = plat_y_[i] - kPlayer;
        vy_ = 0.0f;
        grounded_ = true;
      }
      // Stars hover over their ledge.
      if (star_[i] && px_ + kPlayer > plat_x_[i] + plat_w_[i] / 2.0f - 2.0f &&
          px_ < plat_x_[i] + plat_w_[i] / 2.0f + 2.0f &&
          py_ + kPlayer > plat_y_[i] - 5.0f && py_ < plat_y_[i] - 1.0f) {
        star_[i] = false;
        ++got_;
        out.raw_reward += 1.0f;
      }
    }
    if (py_ > kPg) {
      out.terminated = true;
      out.reward = out.raw_reward;
      return out;
    }
    // Topping out on the highest ledge.
    if (grounded_ && py_ + kPlayer <= plat_y_[n_plat_ - 1] + 0.5f) {
      if (got_ >= n_stars_) out.raw_reward += 10.0f;
      out.terminated = true;
    }
    out.reward = out.raw_reward;
    return out;
  }

  void render(uint8_t* f) const override {
    fill(f, 44, 52, 78);
    for (int i = 0; i < n_plat_; ++i) {
      rect(f, plat_x_[i], plat_y_[i], plat_w_[i], 3.0f, 100, 80, 60);
      if (star_[i])
        rect(f, plat_x_[i] + plat_w_[i] / 2.0f - 1.5f, plat_y_[i] - 4.0f, 3.0f,
             3.0f, 240, 220, 90);
    }
    rect(f, px_, py_, kPlayer, kPlayer, 220, 120, 70);
  }

 private:
  bool hard_;
  int n_plat_ = 0, n_stars_ = 0, got_ = 0;
  float plat_x_[kMaxPlat] = {}, plat_y_[kMaxPlat] = {}, plat_w_[kMaxPlat] = {};
  bool star_[kMaxPlat] = {};
  float px_ = 0, py_ = 0, vy_ = 0;
  bool grounded_ = true;
};

}  // namespace

std::unique_ptr<Env> make_climber_env(const EnvOptions& opts, bool hard) {
  return std::make_unique<ClimberEnv>(opts, hard);
}

}  // namespace cleanba
