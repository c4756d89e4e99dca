// Heist — procgen-style lock-and-key maze (clone of procgen's heist task,
// part of the reference's procgen family: legacy_scripts/
// cleanba_ppo_envpool_procgen.py uses plain `envpool.make(env_id)` over the
// procgen suite). A perfect maze holds three colored keys and three matching
// locked doors; collect keys to pass their doors and steal the gem for +10.
// Hard mode grows the maze. The pure-JAX twin lives in
// cleanba_tpu/envs/jax_procgen_wave9.py.

#include <cstring>

#include "procgen_like.h"

namespace cleanba {
namespace {

constexpr int kMaxDim = 17;
constexpr int kKeys = 3;

class HeistEnv : public ProcgenLikeEnv {
 public:
  HeistEnv(const EnvOptions& opts, bool hard) : ProcgenLikeEnv(opts), hard_(hard) {}

 protected:
  void reset_level(PCG32& rng) override {
    int max_dim = hard_ ? kMaxDim : 13;
    int half = 3 + rng.randint(static_cast<uint32_t>((max_dim - 5) / 2));
    dim_ = 2 * half + 1;
    carve(rng);
    px_ = 1;
    py_ = dim_ - 2;
    // Gem far corner-ish; keys and doors on random distinct open cells.
    gx_ = dim_ - 2;
    gy_ = 1;
    for (int k = 0; k < kKeys; ++k) {
      place_open(rng, &key_x_[k], &key_y_[k]);
      key_held_[k] = false;
      place_open(rng, &door_x_[k], &door_y_[k]);
      door_open_[k] = false;
    }
  }

  StepResult act(const PgAction& a, PCG32&) override {
    StepResult out;
    int nx = px_ + a.dx, ny = py_ + a.dy;
    if (a.dx != 0 && a.dy != 0) {
      if (passable(px_ + a.dx, py_)) ny = py_;
      else nx = px_;
    }
    if (passable(nx, ny)) {
      px_ = nx;
      py_ = ny;
    }
    for (int k = 0; k < kKeys; ++k) {
      if (!key_held_[k] && px_ == key_x_[k] && py_ == key_y_[k]) {
        key_held_[k] = true;
        door_open_[k] = true;  // the matching lock springs
      }
    }
    if (px_ == gx_ && py_ == gy_) {
      out.raw_reward = 10.0f;
      out.terminated = true;
    }
    out.reward = out.raw_reward;
    return out;
  }

  void render(uint8_t* f) const override {
    fill(f, 25, 25, 28);
    float cell = static_cast<float>(kPg) / dim_;
    for (int y = 0; y < dim_; ++y)
      for (int x = 0; x < dim_; ++x)
        if (!walls_[y][x])
          rect(f, x * cell, y * cell, cell + 0.5f, cell + 0.5f, 115, 115, 125);
    static const uint8_t kc[kKeys][3] = {{230, 70, 70}, {70, 200, 70}, {80, 120, 230}};
    for (int k = 0; k < kKeys; ++k) {
      if (!door_open_[k])
        rect(f, door_x_[k] * cell, door_y_[k] * cell, cell + 0.5f, cell + 0.5f,
             kc[k][0] / 2, kc[k][1] / 2, kc[k][2] / 2);
      if (!key_held_[k])
        rect(f, key_x_[k] * cell + cell * 0.25f, key_y_[k] * cell + cell * 0.25f,
             cell * 0.5f, cell * 0.5f, kc[k][0], kc[k][1], kc[k][2]);
    }
    rect(f, gx_ * cell + cell * 0.2f, gy_ * cell + cell * 0.2f,
         cell * 0.6f, cell * 0.6f, 240, 220, 60);
    rect(f, px_ * cell + cell * 0.15f, py_ * cell + cell * 0.15f,
         cell * 0.7f, cell * 0.7f, 220, 220, 230);
  }

 private:
  bool passable(int x, int y) const {
    if (x < 0 || x >= dim_ || y < 0 || y >= dim_ || walls_[y][x]) return false;
    for (int k = 0; k < kKeys; ++k)
      if (!door_open_[k] && x == door_x_[k] && y == door_y_[k]) return false;
    return true;
  }

  void place_open(PCG32& rng, int* ox, int* oy) {
    for (int tries = 0; tries < 64; ++tries) {
      int x = 1 + 2 * static_cast<int>(rng.randint(static_cast<uint32_t>((dim_ - 1) / 2)));
      int y = 1 + 2 * static_cast<int>(rng.randint(static_cast<uint32_t>((dim_ - 1) / 2)));
      if (walls_[y][x]) continue;
      if (x == px_ && y == py_) continue;
      if (x == gx_ && y == gy_) continue;
      bool clash = false;
      for (int k = 0; k < kKeys; ++k)
        if ((x == key_x_[k] && y == key_y_[k]) ||
            (x == door_x_[k] && y == door_y_[k]))
          clash = true;
      if (clash) continue;
      *ox = x;
      *oy = y;
      return;
    }
    *ox = 1;
    *oy = 1;
  }

  // Recursive backtracker, identical to maze.cc carve.
  void carve(PCG32& rng) {
    std::memset(walls_, 1, sizeof(walls_));
    int stack[kMaxDim * kMaxDim][2];
    int top = 0;
    stack[top][0] = 1;
    stack[top][1] = 1;
    walls_[1][1] = 0;
    while (top >= 0) {
      int x = stack[top][0], y = stack[top][1];
      int cand[4][2];
      int n = 0;
      static const int d[4][2] = {{2, 0}, {-2, 0}, {0, 2}, {0, -2}};
      for (const auto& dd : d) {
        int nx2 = x + dd[0], ny2 = y + dd[1];
        if (nx2 > 0 && nx2 < dim_ && ny2 > 0 && ny2 < dim_ && walls_[ny2][nx2]) {
          cand[n][0] = nx2;
          cand[n][1] = ny2;
          ++n;
        }
      }
      if (n == 0) {
        --top;
        continue;
      }
      int pick = static_cast<int>(rng.randint(static_cast<uint32_t>(n)));
      int nx2 = cand[pick][0], ny2 = cand[pick][1];
      walls_[(y + ny2) / 2][(x + nx2) / 2] = 0;
      walls_[ny2][nx2] = 0;
      ++top;
      stack[top][0] = nx2;
      stack[top][1] = ny2;
    }
  }

  bool hard_;
  uint8_t walls_[kMaxDim][kMaxDim] = {};
  int dim_ = 13;
  int px_ = 1, py_ = 1, gx_ = 1, gy_ = 1;
  int key_x_[kKeys] = {}, key_y_[kKeys] = {};
  int door_x_[kKeys] = {}, door_y_[kKeys] = {};
  bool key_held_[kKeys] = {}, door_open_[kKeys] = {};
};

}  // namespace

std::unique_ptr<Env> make_heist_env(const EnvOptions& opts, bool hard) {
  return std::make_unique<HeistEnv>(opts, hard);
}

}  // namespace cleanba
