// Maze — procgen-style procedural maze navigation (clone of procgen's maze
// task, part of the reference's procgen family: legacy_scripts/
// cleanba_ppo_envpool_procgen.py uses plain `envpool.make(env_id)` over the
// procgen suite). A fresh perfect maze is carved every episode with a
// recursive-backtracker walk seeded from the env RNG; the mouse starts in a
// corner and earns +10 for reaching the cheese, which ends the episode.
// Easy: up to 15x15 world; hard: up to 25x25 (procgen's distribution knob).

#include <cstring>

#include "procgen_like.h"

namespace cleanba {
namespace {

constexpr int kMaxDim = 25;  // odd world dims only

class MazeEnv : public ProcgenLikeEnv {
 public:
  MazeEnv(const EnvOptions& opts, bool hard) : ProcgenLikeEnv(opts), hard_(hard) {}

 protected:
  void reset_level(PCG32& rng) override {
    // Odd dimension in [5, max]; procgen scales difficulty by world size.
    int max_dim = hard_ ? kMaxDim : 15;
    int half = 2 + rng.randint(static_cast<uint32_t>((max_dim - 3) / 2));
    dim_ = 2 * half + 1;
    carve(rng);
    // Mouse in the lower-left cell; cheese in a random far open cell.
    mx_ = 1;
    my_ = dim_ - 2;
    place_cheese(rng);
  }

  StepResult act(const PgAction& a, PCG32&) override {
    StepResult out;
    // Grid movement, one cell per step; diagonals resolve horizontal-first.
    int nx = mx_ + a.dx, ny = my_ + a.dy;
    if (a.dx != 0 && a.dy != 0) {
      if (open(mx_ + a.dx, my_)) ny = my_;
      else nx = mx_;
    }
    if (open(nx, ny)) {
      mx_ = nx;
      my_ = ny;
    }
    if (mx_ == cx_ && my_ == cy_) {
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
          rect(f, x * cell, y * cell, cell + 0.5f, cell + 0.5f, 120, 120, 130);
    rect(f, cx_ * cell + cell * 0.2f, cy_ * cell + cell * 0.2f,
         cell * 0.6f, cell * 0.6f, 240, 200, 40);  // cheese
    rect(f, mx_ * cell + cell * 0.15f, my_ * cell + cell * 0.15f,
         cell * 0.7f, cell * 0.7f, 200, 80, 70);   // mouse
  }

 private:
  bool open(int x, int y) const {
    return x >= 0 && x < dim_ && y >= 0 && y < dim_ && !walls_[y][x];
  }

  // Recursive backtracker (iterative, explicit stack) over odd cells.
  void carve(PCG32& rng) {
    std::memset(walls_, 1, sizeof(walls_));
    int stack[kMaxDim * kMaxDim][2];
    int top = 0;
    stack[top][0] = 1;
    stack[top][1] = 1;
    walls_[1][1] = 0;
    while (top >= 0) {
      int x = stack[top][0], y = stack[top][1];
      // Unvisited odd neighbours two cells away.
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
      walls_[(y + ny2) / 2][(x + nx2) / 2] = 0;  // knock down the wall between
      walls_[ny2][nx2] = 0;
      ++top;
      stack[top][0] = nx2;
      stack[top][1] = ny2;
    }
  }

  void place_cheese(PCG32& rng) {
    // Random open cell, preferring ones far from the mouse start.
    int best_x = 1, best_y = 1, best_d = -1;
    for (int tries = 0; tries < 12; ++tries) {
      int x = 1 + 2 * static_cast<int>(rng.randint(static_cast<uint32_t>((dim_ - 1) / 2)));
      int y = 1 + 2 * static_cast<int>(rng.randint(static_cast<uint32_t>((dim_ - 1) / 2)));
      if (!open(x, y) || (x == mx_ && y == my_)) continue;
      int dist = (x > mx_ ? x - mx_ : mx_ - x) + (y > my_ ? y - my_ : my_ - y);
      if (dist > best_d) {
        best_d = dist;
        best_x = x;
        best_y = y;
      }
    }
    cx_ = best_x;
    cy_ = best_y;
  }

  bool hard_;
  int dim_ = 5;
  int mx_ = 1, my_ = 1, cx_ = 3, cy_ = 3;
  uint8_t walls_[kMaxDim][kMaxDim] = {};
};

}  // namespace

std::unique_ptr<Env> make_maze_env(const EnvOptions& opts, bool hard) {
  return std::make_unique<MazeEnv>(opts, hard);
}

}  // namespace cleanba
