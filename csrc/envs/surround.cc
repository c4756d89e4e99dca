// Surround — from-scratch C++ clone with the classic mechanics: two light
// cycles leave solid trails on a grid arena; crashing into a wall or any
// trail loses the round (+1 to the survivor), first to ten rounds ends the
// game. The AI rider goes straight until blocked, then turns toward open
// space.
//
// Stands in for EnvPool's ALE Surround-v5 in the reference's benchmark
// configs (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs are
// not available here, so the engine provides a rules-true clone with
// identical protocol semantics (sticky actions / frameskip / stacking are
// applied by AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave11.py and must mirror these rules exactly.

#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr int kCols = 26, kRows = 20;   // 3-px cells
constexpr int kCell = 3;
constexpr int kOffX = 3, kOffY = 12;
constexpr int kWinScore = 10;
constexpr int kStepFrames = 6;          // one cell move per N raw frames
const int kDx[4] = {0, 1, 0, -1};       // 0 up 1 right 2 down 3 left
const int kDy[4] = {-1, 0, 1, 0};

class SurroundGame : public Game {
 public:
  void reset_game(PCG32&) override {
    p_score_ = a_score_ = 0;
    over_ = false;
    new_round();
  }

  float act(const AleAction& a, PCG32& rng) override {
    if (over_) return 0.0f;
    // Steering is latched between cell steps.
    if (a.dx > 0) p_dir_ = 1;
    else if (a.dx < 0) p_dir_ = 3;
    else if (a.dy < 0) p_dir_ = 0;
    else if (a.dy > 0) p_dir_ = 2;

    if (++clock_ < kStepFrames) return 0.0f;
    clock_ = 0;

    // AI: continue straight; if blocked (or a 7% whim), turn toward the
    // side with more open cells.
    int ad = a_dir_;
    bool ahead = blocked(ax_ + kDx[ad], ay_ + kDy[ad]);
    if (ahead || rng.uniform() < 0.07f) {
      int left = (ad + 3) & 3, right = (ad + 1) & 3;
      int lroom = room(ax_, ay_, left), rroom = room(ax_, ay_, right);
      int pick = lroom > rroom ? left : (rroom > lroom ? right : (rng.uniform() < 0.5f ? left : right));
      if (!blocked(ax_ + kDx[pick], ay_ + kDy[pick])) ad = pick;
      else if (!blocked(ax_ + kDx[(pick + 2) & 3], ay_ + kDy[(pick + 2) & 3]))
        ad = (pick + 2) & 3;
      // else: ride into the crash
    }
    a_dir_ = ad;

    // Both move one cell; trails fill the vacated cells.
    grid_[py_][px_] = 1;
    grid_[ay_][ax_] = 2;
    px_ += kDx[p_dir_];
    py_ += kDy[p_dir_];
    ax_ += kDx[a_dir_];
    ay_ += kDy[a_dir_];

    bool p_crash = blocked(px_, py_);
    bool a_crash = blocked(ax_, ay_) ||
                   (px_ == ax_ && py_ == ay_);  // head-on counts against both
    float reward = 0.0f;
    if (p_crash || a_crash) {
      if (a_crash && !p_crash) {
        reward = 1.0f;
        ++p_score_;
      } else if (p_crash && !a_crash) {
        reward = -1.0f;
        ++a_score_;
      }  // double crash: no score, re-rack
      if (p_score_ >= kWinScore || a_score_ >= kWinScore) over_ = true;
      else new_round();
    }
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    // Arena frame.
    for (int c = -1; c <= kCols; ++c) {
      cell_px(f, c, -1, 90);
      cell_px(f, c, kRows, 90);
    }
    for (int r = -1; r <= kRows; ++r) {
      cell_px(f, -1, r, 90);
      cell_px(f, kCols, r, 90);
    }
    for (int r = 0; r < kRows; ++r)
      for (int c = 0; c < kCols; ++c)
        if (grid_[r][c]) cell_px(f, c, r, grid_[r][c] == 1 ? 200 : 150);
    cell_px(f, px_, py_, 255);
    cell_px(f, ax_, ay_, 170);
    for (int s = 0; s < p_score_ && s < kWinScore; ++s)
      f[2 * kScreen + 4 + s * 3] = 200;
    for (int s = 0; s < a_score_ && s < kWinScore; ++s)
      f[2 * kScreen + 79 - s * 3] = 150;
  }

  bool game_over() const override { return over_; }
  int lives() const override { return 1; }
  int minimal_actions() const override { return 5; }
  int minimal_to_full(int a) const override {
    static const int map[5] = {0, 2, 3, 4, 5};  // NOOP UP RIGHT LEFT DOWN
    return map[a < 0 || a >= 5 ? 0 : a];
  }

 private:
  bool blocked(int x, int y) const {
    return x < 0 || x >= kCols || y < 0 || y >= kRows || grid_[y][x] != 0;
  }

  // Free cells straight ahead in direction d (lookahead depth 6).
  int room(int x, int y, int d) const {
    int n = 0;
    for (int k = 1; k <= 6; ++k) {
      if (blocked(x + kDx[d] * k, y + kDy[d] * k)) break;
      ++n;
    }
    return n;
  }

  void new_round() {
    std::memset(grid_, 0, sizeof(grid_));
    px_ = 4;
    py_ = kRows / 2;
    p_dir_ = 1;
    ax_ = kCols - 5;
    ay_ = kRows / 2;
    a_dir_ = 3;
    clock_ = 0;
  }

  static void cell_px(uint8_t* f, int c, int r, uint8_t v) {
    int x0 = kOffX + c * kCell, y0 = kOffY + r * kCell;
    for (int y = y0 < 0 ? 0 : y0; y < y0 + kCell && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x0 + kCell && x < kScreen; ++x)
        if (x >= 0) f[y * kScreen + x] = v;
  }

  uint8_t grid_[kRows][kCols] = {};
  int px_ = 4, py_ = kRows / 2, p_dir_ = 1;
  int ax_ = kCols - 5, ay_ = kRows / 2, a_dir_ = 3;
  int clock_ = 0;
  int p_score_ = 0, a_score_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_surround_game() { return std::make_unique<SurroundGame>(); }

}  // namespace cleanba
