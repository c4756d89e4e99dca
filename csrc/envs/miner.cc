// Miner — procgen-style boulder-dash digger (clone of procgen's miner task,
// part of the reference's procgen family: legacy_scripts/
// cleanba_ppo_envpool_procgen.py uses plain `envpool.make(env_id)` over the
// procgen suite). Dig through dirt, collect every diamond (the diamonds
// collectively pay +3, i.e. 3/n each — round-5 calibration so a perfect
// episode scores exactly procgen's official R_max=13), then reach the exit
// for +10. Boulders fall when unsupported and crush the digger. Hard mode
// packs in more boulders.
// The pure-JAX twin lives in cleanba_tpu/envs/jax_procgen_wave9.py.

#include <cstring>

#include "procgen_like.h"

namespace cleanba {
namespace {

constexpr int kGrid = 16;  // 4-px cells
constexpr int kEmpty = 0, kDirt = 1, kBoulder = 2, kDiamond = 3;
constexpr int kMoveFrames = 3;  // one cell per 3 engine frames

class MinerEnv : public ProcgenLikeEnv {
 public:
  MinerEnv(const EnvOptions& opts, bool hard) : ProcgenLikeEnv(opts), hard_(hard) {}

 protected:
  void reset_level(PCG32& rng) override {
    diamonds_ = 0;
    for (int y = 0; y < kGrid; ++y)
      for (int x = 0; x < kGrid; ++x) {
        uint32_t roll = rng.randint(100);
        int c = kDirt;
        if (roll < (hard_ ? 18u : 10u)) c = kBoulder;
        else if (roll < (hard_ ? 26u : 18u)) c = kDiamond;
        else if (roll < 40u) c = kEmpty;
        grid_[y][x] = static_cast<uint8_t>(c);
        if (c == kDiamond) ++diamonds_;
      }
    diamonds0_ = diamonds_ > 0 ? diamonds_ : 1;
    // Start corner and exit corner are clear; no boulder directly above the
    // start (instant crush would be unwinnable).
    px_ = 1;
    py_ = 1;
    grid_[1][1] = kEmpty;
    if (grid_[0][1] == kBoulder) grid_[0][1] = kDirt;
    ex_ = kGrid - 2;
    ey_ = kGrid - 2;
    grid_[ey_][ex_] = kEmpty;
    move_cd_ = 0;
    fall_cd_ = 0;
  }

  StepResult act(const PgAction& a, PCG32&) override {
    StepResult out;
    if (move_cd_ > 0) --move_cd_;
    if (move_cd_ == 0 && (a.dx != 0 || a.dy != 0)) {
      int nx = px_ + a.dx, ny = py_ + a.dy;
      if (a.dx != 0 && a.dy != 0) ny = py_;  // diagonals resolve horizontal
      if (nx >= 0 && nx < kGrid && ny >= 0 && ny < kGrid &&
          grid_[ny][nx] != kBoulder) {
        if (grid_[ny][nx] == kDiamond) {
          out.raw_reward += 3.0f / static_cast<float>(diamonds0_);
          --diamonds_;
        }
        grid_[ny][nx] = kEmpty;
        px_ = nx;
        py_ = ny;
        move_cd_ = kMoveFrames;
      }
    }
    // Gravity tick: snapshot-then-apply so every boulder falls at most one
    // cell per tick with no intra-tick cascade — identical to the JAX
    // twin's vectorized shift. A boulder never enters the player's cell
    // directly; instead one hovering right overhead for two consecutive
    // ticks crushes the digger (same rule in both engines).
    if (++fall_cd_ >= kMoveFrames) {
      fall_cd_ = 0;
      bool falls[kGrid][kGrid] = {};
      for (int y = 0; y < kGrid - 1; ++y)
        for (int x = 0; x < kGrid; ++x)
          falls[y][x] = grid_[y][x] == kBoulder && grid_[y + 1][x] == kEmpty &&
                        !(x == px_ && y + 1 == py_);
      for (int y = 0; y < kGrid - 1; ++y)
        for (int x = 0; x < kGrid; ++x)
          if (falls[y][x]) {
            grid_[y][x] = kEmpty;
            grid_[y + 1][x] = kBoulder;
          }
      if (py_ > 0 && grid_[py_ - 1][px_] == kBoulder) {
        if (++crush_ >= 2) out.terminated = true;  // crushed
      } else {
        crush_ = 0;
      }
    }
    if (out.terminated) {
      out.reward = out.raw_reward;
      return out;
    }
    if (px_ == ex_ && py_ == ey_ && diamonds_ == 0) {
      out.raw_reward += 10.0f;
      out.terminated = true;
    }
    out.reward = out.raw_reward;
    return out;
  }

  void render(uint8_t* f) const override {
    fill(f, 20, 16, 12);
    for (int y = 0; y < kGrid; ++y)
      for (int x = 0; x < kGrid; ++x) {
        float fx = x * 4.0f, fy = y * 4.0f;
        switch (grid_[y][x]) {
          case kDirt: rect(f, fx, fy, 4.0f, 4.0f, 120, 85, 50); break;
          case kBoulder: rect(f, fx, fy, 4.0f, 4.0f, 150, 150, 155); break;
          case kDiamond: rect(f, fx + 1.0f, fy + 1.0f, 2.0f, 2.0f, 80, 220, 230); break;
          default: break;
        }
      }
    if (diamonds_ == 0)
      rect(f, ex_ * 4.0f, ey_ * 4.0f, 4.0f, 4.0f, 90, 200, 90);  // open exit
    rect(f, px_ * 4.0f, py_ * 4.0f, 4.0f, 4.0f, 230, 180, 60);
  }

 private:
  bool hard_;
  uint8_t grid_[kGrid][kGrid] = {};
  int px_ = 1, py_ = 1, ex_ = kGrid - 2, ey_ = kGrid - 2;
  int diamonds_ = 0, diamonds0_ = 1, move_cd_ = 0, fall_cd_ = 0, crush_ = 0;
};

}  // namespace

std::unique_ptr<Env> make_miner_env(const EnvOptions& opts, bool hard) {
  return std::make_unique<MinerEnv>(opts, hard);
}

}  // namespace cleanba
