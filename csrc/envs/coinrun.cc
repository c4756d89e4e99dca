// Coinrun — procgen-style platformer (clone of procgen's coinrun task, part
// of the reference's procgen family: legacy_scripts/
// cleanba_ppo_envpool_procgen.py uses plain `envpool.make(env_id)` over the
// procgen suite). Run and jump across procedurally-placed platforms, dodge
// the patrolling saws, grab the coin on the right for +10; touching a saw
// ends the episode with nothing. Hard mode adds platforms and saws.
// The pure-JAX twin lives in cleanba_tpu/envs/jax_procgen_wave9.py.

#include <cstring>

#include "procgen_like.h"

namespace cleanba {
namespace {

constexpr int kMaxPlat = 5;
constexpr int kMaxSaws = 3;
constexpr float kGroundY = 56.0f;
constexpr float kPlayer = 4.0f;
constexpr float kRun = 1.2f;
constexpr float kJumpV = -2.4f;
constexpr float kGravity = 0.18f;
constexpr float kSawR = 2.5f;

class CoinrunEnv : public ProcgenLikeEnv {
 public:
  CoinrunEnv(const EnvOptions& opts, bool hard) : ProcgenLikeEnv(opts), hard_(hard) {}

 protected:
  void reset_level(PCG32& rng) override {
    n_plat_ = (hard_ ? 3 : 2) + static_cast<int>(rng.randint(2));
    for (int i = 0; i < n_plat_; ++i) {
      plat_w_[i] = 10.0f + static_cast<float>(rng.randint(7));
      plat_x_[i] = 8.0f + static_cast<float>(i) * (48.0f / n_plat_) +
                   static_cast<float>(rng.randint(5));
      plat_y_[i] = 30.0f + static_cast<float>(rng.randint(18));
    }
    n_saws_ = 1 + static_cast<int>(rng.randint(2)) + (hard_ ? 1 : 0);
    for (int i = 0; i < n_saws_; ++i) {
      saw_lo_[i] = 14.0f + static_cast<float>(rng.randint(20));
      saw_hi_[i] = saw_lo_[i] + 10.0f + static_cast<float>(rng.randint(10));
      saw_x_[i] = saw_lo_[i];
      saw_v_[i] = 0.4f + 0.4f * rng.uniform();
    }
    px_ = 3.0f;
    py_ = kGroundY - kPlayer;
    vy_ = 0.0f;
    grounded_ = true;
    coin_x_ = 57.0f;
    coin_y_ = kGroundY - 4.0f;
  }

  StepResult act(const PgAction& a, PCG32&) override {
    StepResult out;
    px_ += kRun * static_cast<float>(a.dx);
    if (px_ < 0.0f) px_ = 0.0f;
    if (px_ > kPg - kPlayer) px_ = kPg - kPlayer;
    if (a.dy < 0 && grounded_) {  // procgen UP = jump
      vy_ = kJumpV;
      grounded_ = false;
    }
    float prev_bottom = py_ + kPlayer;
    vy_ += kGravity;
    py_ += vy_;
    grounded_ = false;
    // Land on the ground.
    if (vy_ >= 0.0f && py_ + kPlayer >= kGroundY) {
      py_ = kGroundY - kPlayer;
      vy_ = 0.0f;
      grounded_ = true;
    }
    // Land on a platform crossed this frame.
    for (int i = 0; i < n_plat_ && !grounded_; ++i) {
      bool over = px_ + kPlayer > plat_x_[i] && px_ < plat_x_[i] + plat_w_[i];
      if (vy_ >= 0.0f && over && prev_bottom <= plat_y_[i] &&
          py_ + kPlayer >= plat_y_[i]) {
        py_ = plat_y_[i] - kPlayer;
        vy_ = 0.0f;
        grounded_ = true;
      }
    }
    // Saws patrol the ground.
    for (int i = 0; i < n_saws_; ++i) {
      saw_x_[i] += saw_v_[i];
      if (saw_x_[i] < saw_lo_[i] || saw_x_[i] > saw_hi_[i]) saw_v_[i] = -saw_v_[i];
      float sy = kGroundY - kSawR;
      if (px_ + kPlayer > saw_x_[i] - kSawR && px_ < saw_x_[i] + kSawR &&
          py_ + kPlayer > sy - kSawR && py_ < sy + kSawR) {
        out.terminated = true;  // death: nothing earned
        return out;
      }
    }
    // The coin.
    if (px_ + kPlayer > coin_x_ && px_ < coin_x_ + 4.0f &&
        py_ + kPlayer > coin_y_ && py_ < coin_y_ + 4.0f) {
      out.raw_reward = 10.0f;
      out.reward = 10.0f;
      out.terminated = true;
    }
    return out;
  }

  void render(uint8_t* f) const override {
    fill(f, 140, 180, 230);  // sky
    rect(f, 0.0f, kGroundY, static_cast<float>(kPg), 8.0f, 90, 70, 40);
    for (int i = 0; i < n_plat_; ++i)
      rect(f, plat_x_[i], plat_y_[i], plat_w_[i], 3.0f, 110, 90, 50);
    for (int i = 0; i < n_saws_; ++i)
      rect(f, saw_x_[i] - kSawR, kGroundY - 2.0f * kSawR, 2.0f * kSawR,
           2.0f * kSawR, 200, 200, 210);
    rect(f, coin_x_, coin_y_, 4.0f, 4.0f, 240, 210, 50);
    rect(f, px_, py_, kPlayer, kPlayer, 220, 60, 60);
  }

 private:
  bool hard_;
  int n_plat_ = 0, n_saws_ = 0;
  float plat_x_[kMaxPlat] = {}, plat_y_[kMaxPlat] = {}, plat_w_[kMaxPlat] = {};
  float saw_x_[kMaxSaws] = {}, saw_lo_[kMaxSaws] = {}, saw_hi_[kMaxSaws] = {}, saw_v_[kMaxSaws] = {};
  float px_ = 3.0f, py_ = 0.0f, vy_ = 0.0f;
  bool grounded_ = true;
  float coin_x_ = 57.0f, coin_y_ = 0.0f;
};

}  // namespace

std::unique_ptr<Env> make_coinrun_env(const EnvOptions& opts, bool hard) {
  return std::make_unique<CoinrunEnv>(opts, hard);
}

}  // namespace cleanba
