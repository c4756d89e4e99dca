// Bigfish — procgen-style procedural game (the reference's default procgen
// task: legacy_scripts/cleanba_ppo_envpool_procgen.py `--env-id
// BigfishHard-v0`). Rules-true clone of procgen's bigfish: the player fish
// swims freely in the tank; enemy fish of random sizes stream in from the
// left/right edges; eating a strictly smaller fish gives reward +1 and grows
// the player; touching a larger one ends the episode; growing past the
// maximum size pays +10 and completes the level. Every episode draws a fresh
// procedural configuration (spawn pattern, sizes, speeds, palette) from the
// env RNG stream.

#include <cmath>
#include <cstring>

#include "procgen_like.h"

namespace cleanba {
namespace {

constexpr int kMaxFish = 14;
constexpr float kPlayerStart = 2.0f;   // starting radius (px)
constexpr float kPlayerMax = 12.0f;    // radius at which the level completes
constexpr float kGrow = 0.40f;         // radius gain per fish eaten
constexpr float kSpeed = 1.4f;         // player speed px/step

struct Fish {
  bool alive = false;
  float x = 0, y = 0, r = 0, vx = 0;
};

class BigfishEnv : public ProcgenLikeEnv {
 public:
  BigfishEnv(const EnvOptions& opts, bool hard) : ProcgenLikeEnv(opts), hard_(hard) {}

 protected:
  void reset_level(PCG32& rng) override {
    px_ = 32.0f;
    py_ = 32.0f;
    pr_ = kPlayerStart;
    for (auto& f : fish_) f.alive = false;
    // Procedural per-level parameters.
    spawn_prob_ = (hard_ ? 0.09f : 0.05f) + 0.04f * rng.uniform();
    speed_scale_ = (hard_ ? 1.0f : 0.7f) + 0.5f * rng.uniform();
    big_bias_ = rng.uniform();  // how often enemies spawn bigger than the player
    bg_ = static_cast<uint8_t>(30 + rng.randint(50));
  }

  StepResult act(const PgAction& a, PCG32& rng) override {
    StepResult out;
    px_ = clampf(px_ + kSpeed * a.dx, pr_, kPg - pr_);
    py_ = clampf(py_ + kSpeed * a.dy, pr_, kPg - pr_);

    // Spawn enemies from the side walls.
    if (rng.uniform() < spawn_prob_) spawn(rng);

    for (auto& f : fish_) {
      if (!f.alive) continue;
      f.x += f.vx;
      if (f.x < -2.0f * f.r || f.x > kPg + 2.0f * f.r) {
        f.alive = false;
        continue;
      }
      float dx = f.x - px_, dy = f.y - py_;
      float touch = f.r + pr_;
      if (dx * dx + dy * dy <= touch * touch) {
        if (f.r < pr_) {  // eat it
          f.alive = false;
          out.raw_reward += 1.0f;
          pr_ = std::min(pr_ + kGrow, kPlayerMax);
          if (pr_ >= kPlayerMax) {  // level complete
            out.raw_reward += 10.0f;
            out.terminated = true;
          }
        } else {  // eaten
          out.terminated = true;
        }
      }
    }
    out.reward = out.raw_reward;
    return out;
  }

  void render(uint8_t* f) const override {
    fill(f, 10, 40, bg_);  // water
    for (const auto& e : fish_)
      if (e.alive) {
        // Enemies shade by size: bigger = darker red, smaller = lighter green.
        uint8_t danger = e.r >= pr_ ? 200 : 60;
        uint8_t safe = e.r >= pr_ ? 40 : 190;
        rect(f, e.x - e.r, e.y - e.r, 2 * e.r, 2 * e.r, danger, safe, 40);
        // Tail marks the swim direction.
        float tx = e.vx > 0 ? e.x - e.r - 1.5f : e.x + e.r;
        rect(f, tx, e.y - 1.0f, 1.5f, 2.0f, danger, safe, 40);
      }
    rect(f, px_ - pr_, py_ - pr_, 2 * pr_, 2 * pr_, 230, 220, 60);  // player
  }

 private:
  static float clampf(float v, float lo, float hi) {
    return v < lo ? lo : (v > hi ? hi : v);
  }

  void spawn(PCG32& rng) {
    for (auto& f : fish_) {
      if (f.alive) continue;
      bool from_left = rng.next_uint32() & 1;
      bool bigger = rng.uniform() < 0.25f + 0.35f * big_bias_;
      float r = bigger ? pr_ * (1.1f + 0.8f * rng.uniform())
                       : std::max(1.0f, pr_ * (0.3f + 0.6f * rng.uniform()));
      r = std::min(r, 16.0f);
      f.alive = true;
      f.r = r;
      f.y = r + rng.uniform() * (kPg - 2 * r);
      f.x = from_left ? -r : kPg + r;
      f.vx = (from_left ? 1.0f : -1.0f) * speed_scale_ * (0.4f + 0.8f * rng.uniform());
      return;
    }
  }

  bool hard_;
  float px_ = 32, py_ = 32, pr_ = kPlayerStart;
  float spawn_prob_ = 0.05f, speed_scale_ = 1.0f, big_bias_ = 0.5f;
  uint8_t bg_ = 60;
  Fish fish_[kMaxFish];
};

}  // namespace

std::unique_ptr<Env> make_bigfish_env(const EnvOptions& opts, bool hard) {
  return std::make_unique<BigfishEnv>(opts, hard);
}

}  // namespace cleanba
