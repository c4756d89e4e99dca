// Jumper — procgen-style open-world platformer (clone of procgen's jumper
// task, part of the reference's procgen family: legacy_scripts/
// cleanba_ppo_envpool_procgen.py uses plain `envpool.make(env_id)` over the
// procgen suite). Double-jump between floating platforms to reach the
// carrot (+10); falling off the bottom of the world ends the episode with
// nothing. Hard mode spreads the platforms wider.
// The pure-JAX twin lives in cleanba_tpu/envs/jax_procgen_wave9.py.

#include <cstring>

#include "procgen_like.h"

namespace cleanba {
namespace {

constexpr int kMaxPlat = 8;
constexpr float kPlayer = 4.0f;
constexpr float kRun = 1.1f;
constexpr float kJumpV = -2.2f;
constexpr float kGravity = 0.16f;

class JumperEnv : public ProcgenLikeEnv {
 public:
  JumperEnv(const EnvOptions& opts, bool hard) : ProcgenLikeEnv(opts), hard_(hard) {}

 protected:
  void reset_level(PCG32& rng) override {
    n_plat_ = (hard_ ? 6 : 5) + static_cast<int>(rng.randint(3));
    // A ladder of platforms, alternating sides, rising toward the carrot.
    float y = 58.0f;
    for (int i = 0; i < n_plat_; ++i) {
      plat_w_[i] = 9.0f + static_cast<float>(rng.randint(6));
      float spread = hard_ ? 34.0f : 26.0f;
      plat_x_[i] = (i % 2 == 0 ? 4.0f : kPg - 4.0f - plat_w_[i]) +
                   (i % 2 == 0 ? 1.0f : -1.0f) * static_cast<float>(rng.randint(
                       static_cast<uint32_t>(spread)));
      plat_y_[i] = y;
      y -= 7.0f + static_cast<float>(rng.randint(3));
    }
    px_ = plat_x_[0] + 2.0f;
    py_ = plat_y_[0] - kPlayer;
    vy_ = 0.0f;
    jumps_ = 2;
    jump_held_ = false;
    carrot_x_ = plat_x_[n_plat_ - 1] + plat_w_[n_plat_ - 1] / 2.0f - 2.0f;
    carrot_y_ = plat_y_[n_plat_ - 1] - 4.0f;
  }

  StepResult act(const PgAction& a, PCG32&) override {
    StepResult out;
    px_ += kRun * static_cast<float>(a.dx);
    if (px_ < 0.0f) px_ = 0.0f;
    if (px_ > kPg - kPlayer) px_ = kPg - kPlayer;
    // Double jump on UP edges (holding UP is one jump).
    if (a.dy < 0) {
      if (!jump_held_ && jumps_ > 0) {
        vy_ = kJumpV;
        --jumps_;
      }
      jump_held_ = true;
    } else {
      jump_held_ = false;
    }
    float prev_bottom = py_ + kPlayer;
    vy_ += kGravity;
    py_ += vy_;
    for (int i = 0; i < n_plat_; ++i) {
      bool over = px_ + kPlayer > plat_x_[i] && px_ < plat_x_[i] + plat_w_[i];
      if (vy_ >= 0.0f && over && prev_bottom <= plat_y_[i] &&
          py_ + kPlayer >= plat_y_[i]) {
        py_ = plat_y_[i] - kPlayer;
        vy_ = 0.0f;
        jumps_ = 2;
      }
    }
    if (py_ > kPg) {
      out.terminated = true;  // fell out of the world
      return out;
    }
    if (px_ + kPlayer > carrot_x_ && px_ < carrot_x_ + 4.0f &&
        py_ + kPlayer > carrot_y_ && py_ < carrot_y_ + 4.0f) {
      out.raw_reward = 10.0f;
      out.reward = 10.0f;
      out.terminated = true;
    }
    return out;
  }

  void render(uint8_t* f) const override {
    fill(f, 40, 44, 60);
    for (int i = 0; i < n_plat_; ++i)
      rect(f, plat_x_[i], plat_y_[i], plat_w_[i], 3.0f, 100, 140, 90);
    rect(f, carrot_x_, carrot_y_, 4.0f, 4.0f, 240, 140, 50);
    rect(f, px_, py_, kPlayer, kPlayer, 210, 210, 90);
  }

 private:
  bool hard_;
  int n_plat_ = 0;
  float plat_x_[kMaxPlat] = {}, plat_y_[kMaxPlat] = {}, plat_w_[kMaxPlat] = {};
  float px_ = 0.0f, py_ = 0.0f, vy_ = 0.0f;
  int jumps_ = 2;
  bool jump_held_ = false;
  float carrot_x_ = 0.0f, carrot_y_ = 0.0f;
};

}  // namespace

std::unique_ptr<Env> make_jumper_env(const EnvOptions& opts, bool hard) {
  return std::make_unique<JumperEnv>(opts, hard);
}

}  // namespace cleanba
