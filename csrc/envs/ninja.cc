// Ninja — procgen-style platformer (clone of procgen's ninja task, part of
// the reference's procgen family: legacy_scripts/
// cleanba_ppo_envpool_procgen.py uses plain `envpool.make(env_id)` over the
// procgen suite). Leap between ledges, throw stars (D button or the combo
// specials) to burst the bomb crates blocking the path, and reach the
// mushroom for +10. Hard mode spreads the ledges. The pure-JAX twin lives
// in cleanba_tpu/envs/jax_procgen_wave14.py.

#include <cstring>

#include "procgen_like.h"

namespace cleanba {
namespace {

constexpr int kMaxPlat = 6;
constexpr float kPlayer = 4.0f;
constexpr float kRun = 1.2f;
constexpr float kJumpV = -2.3f;
constexpr float kGravity = 0.17f;
constexpr float kStarV = 2.6f;
constexpr int kMaxBombs = 3;

class NinjaEnv : public ProcgenLikeEnv {
 public:
  NinjaEnv(const EnvOptions& opts, bool hard) : ProcgenLikeEnv(opts), hard_(hard) {}

 protected:
  void reset_level(PCG32& rng) override {
    n_plat_ = 4 + static_cast<int>(rng.randint(hard_ ? 3 : 2));
    float x = 2.0f;
    for (int i = 0; i < n_plat_; ++i) {
      plat_w_[i] = 10.0f + static_cast<float>(rng.randint(6));
      plat_x_[i] = x;
      plat_y_[i] = 40.0f + static_cast<float>(rng.randint(16)) -
                   static_cast<float>(i % 2) * 10.0f;
      x += plat_w_[i] + 3.0f + static_cast<float>(rng.randint(hard_ ? 7 : 4));
    }
    n_bombs_ = 1 + static_cast<int>(rng.randint(kMaxBombs));
    for (int b = 0; b < n_bombs_; ++b) {
      int p = 1 + static_cast<int>(rng.randint(
                  static_cast<uint32_t>(n_plat_ - 1)));
      bomb_x_[b] = plat_x_[p] + plat_w_[p] / 2.0f - 2.0f;
      bomb_y_[b] = plat_y_[p] - 4.0f;
      bomb_live_[b] = true;
    }
    px_ = plat_x_[0] + 2.0f;
    py_ = plat_y_[0] - kPlayer;
    vy_ = 0.0f;
    grounded_ = true;
    star_live_ = false;
    goal_x_ = plat_x_[n_plat_ - 1] + plat_w_[n_plat_ - 1] / 2.0f - 2.0f;
    goal_y_ = plat_y_[n_plat_ - 1] - 4.0f;
  }

  StepResult act(const PgAction& a, PCG32&) override {
    StepResult out;
    px_ += kRun * static_cast<float>(a.dx);
    if (px_ < 0.0f) px_ = 0.0f;
    if (px_ > kPg - kPlayer) px_ = kPg - kPlayer;
    if (a.dx != 0) facing_ = a.dx > 0 ? 1.0f : -1.0f;
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
    }
    if (py_ > kPg) {
      out.terminated = true;  // fell
      return out;
    }

    // Throwing star (any special button).
    if (a.special != 0 && !star_live_) {
      star_live_ = true;
      star_x_ = px_ + kPlayer / 2.0f;
      star_y_ = py_ + 2.0f;
      star_vx_ = facing_ * kStarV;
    }
    if (star_live_) {
      star_x_ += star_vx_;
      if (star_x_ < 0.0f || star_x_ >= kPg) star_live_ = false;
    }
    for (int b = 0; b < n_bombs_; ++b) {
      if (!bomb_live_[b]) continue;
      if (star_live_ && star_x_ >= bomb_x_[b] && star_x_ < bomb_x_[b] + 4.0f &&
          star_y_ >= bomb_y_[b] && star_y_ < bomb_y_[b] + 4.0f) {
        star_live_ = false;
        bomb_live_[b] = false;
        continue;
      }
      // Running into a live bomb is fatal.
      if (px_ + kPlayer > bomb_x_[b] && px_ < bomb_x_[b] + 4.0f &&
          py_ + kPlayer > bomb_y_[b] && py_ < bomb_y_[b] + 4.0f) {
        out.terminated = true;
        return out;
      }
    }
    // The mushroom.
    if (px_ + kPlayer > goal_x_ && px_ < goal_x_ + 4.0f &&
        py_ + kPlayer > goal_y_ && py_ < goal_y_ + 4.0f) {
      out.raw_reward = 10.0f;
      out.reward = 10.0f;
      out.terminated = true;
    }
    return out;
  }

  void render(uint8_t* f) const override {
    fill(f, 30, 34, 44);
    for (int i = 0; i < n_plat_; ++i)
      rect(f, plat_x_[i], plat_y_[i], plat_w_[i], 3.0f, 90, 120, 80);
    for (int b = 0; b < n_bombs_; ++b)
      if (bomb_live_[b])
        rect(f, bomb_x_[b], bomb_y_[b], 4.0f, 4.0f, 220, 80, 60);
    rect(f, goal_x_, goal_y_, 4.0f, 4.0f, 230, 190, 90);
    if (star_live_) rect(f, star_x_ - 1.0f, star_y_ - 1.0f, 2.0f, 2.0f, 240, 240, 240);
    rect(f, px_, py_, kPlayer, kPlayer, 70, 70, 80);
  }

 private:
  bool hard_;
  int n_plat_ = 0, n_bombs_ = 0;
  float plat_x_[kMaxPlat] = {}, plat_y_[kMaxPlat] = {}, plat_w_[kMaxPlat] = {};
  bool bomb_live_[kMaxBombs] = {};
  float bomb_x_[kMaxBombs] = {}, bomb_y_[kMaxBombs] = {};
  float px_ = 0, py_ = 0, vy_ = 0, facing_ = 1.0f;
  bool grounded_ = true, star_live_ = false;
  float star_x_ = 0, star_y_ = 0, star_vx_ = 0;
  float goal_x_ = 0, goal_y_ = 0;
};

}  // namespace

std::unique_ptr<Env> make_ninja_env(const EnvOptions& opts, bool hard) {
  return std::make_unique<NinjaEnv>(opts, hard);
}

}  // namespace cleanba
