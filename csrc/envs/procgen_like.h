// Procgen-protocol environment base: 64x64 RGB observations, the 15-action
// combo space, and per-episode procedural level generation.
//
// Stands in for EnvPool's procgen tasks used by the reference's procgen
// variant (reference legacy_scripts/cleanba_ppo_envpool_procgen.py:115-130,
// which calls plain `envpool.make(env_id)` with no Atari preprocessing and
// defaults to BigfishHard-v0). Procgen binaries are unavailable in this
// environment, so the engine provides rules-true procedural clones with the
// same observation/action contract: obs uint8 [64, 64, 3], 15 discrete
// actions, a fresh procedurally-generated level every episode.
#pragma once

#include <algorithm>
#include <cstring>

#include "env.h"

namespace cleanba {

constexpr int kPg = 64;                    // screen edge
constexpr int kPgPx = kPg * kPg;           // pixels per frame
constexpr int kPgObsBytes = kPgPx * 3;     // RGB bytes per frame

// Procgen's 15-action space: a 3x3 movement grid plus 6 special buttons
// (D, A, W, S, Q, E). Index layout follows procgen's env.py combos:
//   0 (LEFT,DOWN) 1 (LEFT) 2 (LEFT,UP) 3 (DOWN) 4 () 5 (UP)
//   6 (RIGHT,DOWN) 7 (RIGHT) 8 (RIGHT,UP) 9..14 specials
struct PgAction {
  int dx, dy;    // -1/0/+1, screen coords (dy=+1 moves down)
  int special;   // 0 = none, 1..6 = D, A, W, S, Q, E
};

inline PgAction decode_procgen_action(int a) {
  if (a < 0 || a >= 15) a = 4;
  if (a >= 9) return PgAction{0, 0, a - 8};
  // a in [0, 9): dx from the combo group, dy inverted (procgen's UP is -y here).
  static const int dxs[9] = {-1, -1, -1, 0, 0, 0, 1, 1, 1};
  static const int dys[9] = {1, 0, -1, 1, 0, -1, 1, 0, -1};
  return PgAction{dxs[a], dys[a], 0};
}

class ProcgenLikeEnv : public Env {
 public:
  explicit ProcgenLikeEnv(const EnvOptions& opts) : rng_(opts.seed) {}

  void reset(void* obs) override {
    reset_level(rng_);
    render(static_cast<uint8_t*>(obs));
  }

  StepResult step(int action, void* obs) override {
    StepResult r = act(decode_procgen_action(action), rng_);
    render(static_cast<uint8_t*>(obs));
    return r;
  }

 protected:
  virtual void reset_level(PCG32& rng) = 0;
  virtual StepResult act(const PgAction& a, PCG32& rng) = 0;
  virtual void render(uint8_t* rgb) const = 0;  // [64, 64, 3] uint8

  static void fill(uint8_t* f, uint8_t r, uint8_t g, uint8_t b) {
    for (int i = 0; i < kPgPx; ++i) {
      f[i * 3] = r;
      f[i * 3 + 1] = g;
      f[i * 3 + 2] = b;
    }
  }

  static void rect(uint8_t* f, float fx, float fy, float fw, float fh,
                   uint8_t r, uint8_t g, uint8_t b) {
    int x0 = std::max(0, static_cast<int>(fx));
    int y0 = std::max(0, static_cast<int>(fy));
    int x1 = std::min(kPg, static_cast<int>(fx + fw));
    int y1 = std::min(kPg, static_cast<int>(fy + fh));
    for (int y = y0; y < y1; ++y)
      for (int x = x0; x < x1; ++x) {
        uint8_t* p = f + (y * kPg + x) * 3;
        p[0] = r;
        p[1] = g;
        p[2] = b;
      }
  }

  PCG32 rng_;
};

}  // namespace cleanba
