// Chaser — procgen-style maze dot-collection with pursuers (clone of
// procgen's chaser task, part of the reference's procgen family:
// legacy_scripts/cleanba_ppo_envpool_procgen.py drives the procgen suite
// through plain `envpool.make`). Eat every orb (+10 clear bonus; the orbs
// collectively pay +3, i.e. 3/n each, so a perfect episode scores exactly
// procgen's official R_max=13 for chaser — round-5 calibration, the flat
// +1/orb economy scored 20.8 at 3.3M steps, 1.6x the real game's maximum)
// while enemies chase; contact kills. A fresh maze is carved per episode
// (same recursive backtracker as maze.cc); hard mode is bigger with more
// chasers. The pure-JAX twin lives in cleanba_tpu/envs/jax_procgen_extra.py.

#include <cstring>

#include "procgen_like.h"

namespace cleanba {
namespace {

constexpr int kMaxDim = 13;
constexpr int kMaxEnemies = 3;

class ChaserEnv : public ProcgenLikeEnv {
 public:
  ChaserEnv(const EnvOptions& opts, bool hard) : ProcgenLikeEnv(opts), hard_(hard) {}

 protected:
  void reset_level(PCG32& rng) override {
    int half = hard_ ? 5 + static_cast<int>(rng.randint(2))   // 11 or 13
                     : 4 + static_cast<int>(rng.randint(2));  // 9 or 11
    dim_ = 2 * half + 1;
    carve(rng);
    px_ = 1;
    py_ = dim_ - 2;
    // Dots on every open cell except the start.
    n_dots_ = 0;
    for (int y = 0; y < dim_; ++y)
      for (int x = 0; x < dim_; ++x) {
        dots_[y][x] = !walls_[y][x] && !(x == px_ && y == py_);
        n_dots_ += dots_[y][x];
      }
    dots0_ = n_dots_;
    n_enemies_ = hard_ ? kMaxEnemies : 1;
    const int corners[kMaxEnemies][2] = {
        {dim_ - 2, 1}, {1, 1}, {dim_ - 2, dim_ - 2}};
    for (int i = 0; i < n_enemies_; ++i) {
      ex_[i] = corners[i][0];
      ey_[i] = corners[i][1];
    }
    tick_ = 0;
  }

  StepResult act(const PgAction& a, PCG32& rng) override {
    StepResult out;
    // Player: one cell per step, diagonals horizontal-first (maze.cc:38-42).
    int nx = px_ + a.dx, ny = py_ + a.dy;
    if (a.dx != 0 && a.dy != 0) {
      if (open(px_ + a.dx, py_)) ny = py_;
      else nx = px_;
    }
    if (open(nx, ny)) {
      px_ = nx;
      py_ = ny;
    }
    if (dots_[py_][px_]) {
      dots_[py_][px_] = false;
      --n_dots_;
      out.raw_reward += 3.0f / static_cast<float>(dots0_);
      if (n_dots_ == 0) {
        out.raw_reward += 10.0f;
        out.terminated = true;
      }
    }

    // Enemies move every other step: greedy toward the player with
    // probability 0.7, otherwise a random open direction.
    ++tick_;
    if (!out.terminated && tick_ % 2 == 0) {
      static const int dirs[4][2] = {{1, 0}, {-1, 0}, {0, 1}, {0, -1}};
      for (int i = 0; i < n_enemies_; ++i) {
        bool greedy = rng.uniform() < 0.7f;
        int best = -1, best_d = 1 << 20;
        int open_dirs[4], n_open = 0;
        for (int k = 0; k < 4; ++k) {
          int tx = ex_[i] + dirs[k][0], ty = ey_[i] + dirs[k][1];
          if (!open(tx, ty)) continue;
          open_dirs[n_open++] = k;
          int dist = abs_(tx - px_) + abs_(ty - py_);
          if (dist < best_d) {
            best_d = dist;
            best = k;
          }
        }
        if (n_open == 0) continue;
        int k = (greedy && best >= 0)
                    ? best
                    : open_dirs[rng.randint(static_cast<uint32_t>(n_open))];
        ex_[i] += dirs[k][0];
        ey_[i] += dirs[k][1];
      }
    }
    for (int i = 0; i < n_enemies_ && !out.terminated; ++i)
      if (ex_[i] == px_ && ey_[i] == py_) out.terminated = true;  // caught: no bonus
    out.reward = out.raw_reward;
    return out;
  }

  void render(uint8_t* f) const override {
    fill(f, 22, 22, 26);
    float cell = static_cast<float>(kPg) / dim_;
    for (int y = 0; y < dim_; ++y)
      for (int x = 0; x < dim_; ++x)
        if (!walls_[y][x]) {
          rect(f, x * cell, y * cell, cell + 0.5f, cell + 0.5f, 95, 95, 105);
          if (dots_[y][x])
            rect(f, x * cell + cell * 0.35f, y * cell + cell * 0.35f,
                 cell * 0.3f, cell * 0.3f, 240, 220, 80);
        }
    for (int i = 0; i < n_enemies_; ++i)
      rect(f, ex_[i] * cell + cell * 0.15f, ey_[i] * cell + cell * 0.15f,
           cell * 0.7f, cell * 0.7f, 220, 60, 60);
    rect(f, px_ * cell + cell * 0.15f, py_ * cell + cell * 0.15f,
         cell * 0.7f, cell * 0.7f, 80, 210, 90);
  }

 private:
  static int abs_(int v) { return v < 0 ? -v : v; }

  bool open(int x, int y) const {
    return x >= 0 && x < dim_ && y >= 0 && y < dim_ && !walls_[y][x];
  }

  // Same recursive backtracker as maze.cc:74-107, over the smaller grid.
  void carve(PCG32& rng) {
    std::memset(walls_, 1, sizeof(walls_));
    int stack[kMaxDim * kMaxDim][2];
    int top = 0;
    stack[0][0] = 1;
    stack[0][1] = 1;
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
    // Chaser arenas are more open than mazes: knock out extra walls so loops
    // exist (procgen's chaser is not a perfect maze).
    int extra = dim_;
    for (int t = 0; t < extra; ++t) {
      int x = 1 + static_cast<int>(rng.randint(static_cast<uint32_t>(dim_ - 2)));
      int y = 1 + static_cast<int>(rng.randint(static_cast<uint32_t>(dim_ - 2)));
      if (!walls_[y][x]) continue;
      // Only remove walls that connect two open cells (keep the border).
      bool horiz = !walls_[y][x - 1] && !walls_[y][x + 1];
      bool vert = !walls_[y - 1][x] && !walls_[y + 1][x];
      if (horiz || vert) walls_[y][x] = 0;
    }
  }

  bool hard_;
  int dim_ = 9;
  int px_ = 1, py_ = 1;
  int n_enemies_ = 1;
  int ex_[kMaxEnemies] = {}, ey_[kMaxEnemies] = {};
  bool walls_[kMaxDim][kMaxDim] = {};
  bool dots_[kMaxDim][kMaxDim] = {};
  int n_dots_ = 0;
  int dots0_ = 1;
  int tick_ = 0;
};

}  // namespace

std::unique_ptr<Env> make_chaser_env(const EnvOptions& opts, bool hard) {
  return std::make_unique<ChaserEnv>(opts, hard);
}

}  // namespace cleanba
