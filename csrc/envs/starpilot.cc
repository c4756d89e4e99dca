// Starpilot — procgen-style procedural side-scrolling shooter. Rules-true
// clone of procgen's starpilot: the ship flies on the left of the field,
// waves of flyers stream in from the right firing bolts; the D button
// (action 9) shoots right; each flyer destroyed pays +1 and surviving to the
// end of the level pays +10; any hit ends the episode. Every episode draws a
// fresh procedural configuration (spawn rate, flyer speeds, fire rates) from
// the env RNG stream. Hard mode spawns faster, denser waves.
//
// The pure-JAX twin lives in cleanba_tpu/envs/jax_procgen_wave5.py and must
// mirror these rules exactly.

#include <cstring>

#include "procgen_like.h"

namespace cleanba {
namespace {

constexpr int kMaxFlyers = 10;
constexpr int kMaxBolts = 8;
constexpr int kMaxShots = 3;
constexpr float kShipW = 4.0f, kShipH = 3.0f;
constexpr int kLevelFrames = 1000;  // survive this long to finish the level

struct Flyer {
  bool alive = false;
  float x = 0, y = 0, vx = 0, vy = 0;
};

class StarpilotEnv : public ProcgenLikeEnv {
 public:
  StarpilotEnv(const EnvOptions& opts, bool hard) : ProcgenLikeEnv(opts), hard_(hard) {}

 protected:
  void reset_level(PCG32& rng) override {
    px_ = 8.0f;
    py_ = 32.0f;
    for (auto& e : flyers_) e.alive = false;
    for (int b = 0; b < kMaxBolts; ++b) bolt_alive_[b] = false;
    for (int s = 0; s < kMaxShots; ++s) shot_alive_[s] = false;
    frame_ = 0;
    // Procedural per-level parameters.
    spawn_prob_ = (hard_ ? 0.08f : 0.04f) + 0.03f * rng.uniform();
    speed_scale_ = (hard_ ? 1.2f : 0.8f) + 0.4f * rng.uniform();
    fire_prob_ = (hard_ ? 0.010f : 0.005f) + 0.004f * rng.uniform();
    bg_ = static_cast<uint8_t>(10 + rng.randint(30));
  }

  StepResult act(const PgAction& a, PCG32& rng) override {
    StepResult out;
    ++frame_;
    px_ = clampf(px_ + 1.4f * static_cast<float>(a.dx), 2.0f, 30.0f);
    py_ = clampf(py_ + 1.4f * static_cast<float>(a.dy), 2.0f, kPg - 2.0f - kShipH);

    // D button fires.
    if (a.special == 1) {
      for (int s = 0; s < kMaxShots; ++s) {
        if (shot_alive_[s]) continue;
        shot_alive_[s] = true;
        shot_x_[s] = px_ + kShipW;
        shot_y_[s] = py_ + kShipH / 2.0f;
        break;
      }
    }
    for (int s = 0; s < kMaxShots; ++s) {
      if (!shot_alive_[s]) continue;
      shot_x_[s] += 2.5f;
      if (shot_x_[s] > kPg) shot_alive_[s] = false;
    }

    // Flyers stream in from the right.
    if (rng.uniform() < spawn_prob_) {
      for (auto& e : flyers_) {
        if (e.alive) continue;
        e.alive = true;
        e.x = static_cast<float>(kPg);
        e.y = 3.0f + rng.uniform() * (kPg - 9.0f);
        e.vx = -speed_scale_ * (0.6f + 0.6f * rng.uniform());
        e.vy = (rng.uniform() - 0.5f) * 0.6f;
        break;
      }
    }
    for (auto& e : flyers_) {
      if (!e.alive) continue;
      e.x += e.vx;
      e.y += e.vy;
      if (e.y < 2.0f || e.y > kPg - 5.0f) e.vy = -e.vy;
      if (e.x < -4.0f) e.alive = false;
      // Bolt fire toward the ship's row.
      if (e.alive && rng.uniform() < fire_prob_) {
        for (int b = 0; b < kMaxBolts; ++b) {
          if (bolt_alive_[b]) continue;
          bolt_alive_[b] = true;
          bolt_x_[b] = e.x;
          bolt_y_[b] = e.y + 1.0f;
          bolt_vy_[b] = bolt_y_[b] < py_ ? 0.4f : -0.4f;
          break;
        }
      }
    }
    for (int b = 0; b < kMaxBolts; ++b) {
      if (!bolt_alive_[b]) continue;
      bolt_x_[b] -= 1.8f;
      bolt_y_[b] += bolt_vy_[b];
      if (bolt_x_[b] < 0.0f) bolt_alive_[b] = false;
    }

    // Shots vs flyers.
    for (int s = 0; s < kMaxShots; ++s) {
      if (!shot_alive_[s]) continue;
      for (auto& e : flyers_) {
        if (!e.alive) continue;
        if (shot_x_[s] + 2.0f > e.x && shot_x_[s] < e.x + 4.0f &&
            shot_y_[s] + 1.0f > e.y && shot_y_[s] < e.y + 3.0f) {
          e.alive = false;
          shot_alive_[s] = false;
          out.raw_reward += 1.0f;
          break;
        }
      }
    }

    // Ship hits end the episode.
    for (const auto& e : flyers_) {
      if (!e.alive) continue;
      if (e.x + 4.0f > px_ && e.x < px_ + kShipW && e.y + 3.0f > py_ && e.y < py_ + kShipH)
        out.terminated = true;
    }
    for (int b = 0; b < kMaxBolts; ++b) {
      if (!bolt_alive_[b]) continue;
      if (bolt_x_[b] + 2.0f > px_ && bolt_x_[b] < px_ + kShipW &&
          bolt_y_[b] + 1.0f > py_ && bolt_y_[b] < py_ + kShipH)
        out.terminated = true;
    }

    if (frame_ >= kLevelFrames && !out.terminated) {
      out.raw_reward += 10.0f;  // level survived
      out.terminated = true;
    }
    out.reward = out.raw_reward;
    return out;
  }

  void render(uint8_t* f) const override {
    fill(f, bg_, bg_, static_cast<uint8_t>(bg_ + 25));  // deep space
    // Parallax star rows.
    for (int y = 4; y < kPg; y += 7)
      rect(f, static_cast<float>((y * 13 + frame_ / 2) % kPg), static_cast<float>(y), 1, 1, 200, 200, 220);
    for (const auto& e : flyers_)
      if (e.alive) rect(f, e.x, e.y, 4, 3, 220, 60, 60);
    for (int b = 0; b < kMaxBolts; ++b)
      if (bolt_alive_[b]) rect(f, bolt_x_[b], bolt_y_[b], 2, 1, 255, 180, 40);
    for (int s = 0; s < kMaxShots; ++s)
      if (shot_alive_[s]) rect(f, shot_x_[s], shot_y_[s], 2, 1, 120, 220, 255);
    rect(f, px_, py_, kShipW, kShipH, 80, 200, 120);  // ship
  }

 private:
  static float clampf(float v, float lo, float hi) {
    return v < lo ? lo : (v > hi ? hi : v);
  }

  bool hard_;
  float px_ = 8, py_ = 32;
  Flyer flyers_[kMaxFlyers];
  bool bolt_alive_[kMaxBolts] = {};
  float bolt_x_[kMaxBolts] = {}, bolt_y_[kMaxBolts] = {}, bolt_vy_[kMaxBolts] = {};
  bool shot_alive_[kMaxShots] = {};
  float shot_x_[kMaxShots] = {}, shot_y_[kMaxShots] = {};
  int frame_ = 0;
  float spawn_prob_ = 0.05f, speed_scale_ = 1.0f, fire_prob_ = 0.006f;
  uint8_t bg_ = 20;
};

}  // namespace

std::unique_ptr<Env> make_starpilot_env(const EnvOptions& opts, bool hard) {
  return std::make_unique<StarpilotEnv>(opts, hard);
}

}  // namespace cleanba
