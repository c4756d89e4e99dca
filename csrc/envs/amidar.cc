// Amidar — from-scratch C++ lattice-painting game with the classic
// mechanics: trace the rungs of an amidar lattice to paint every segment,
// complete box perimeters for a bonus, and dodge patrol enemies; a limited
// jump freezes the pursuit for a moment.
//
// Stands in for EnvPool's ALE Amidar-v5 in the reference's benchmark configs
// (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs are not
// available here, so the engine provides a rules-true clone with identical
// protocol semantics (sticky actions / frameskip / stacking are applied by
// AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave7.py and must mirror these rules exactly —
// including the lattice bitmap, the box table, and the patrol movement rule.

#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr int kRows = 13;
constexpr int kCols = 19;
constexpr int kCell = 4;
constexpr int kOffX = 4;
constexpr int kOffY = 14;
constexpr int kEnemies = 5;
constexpr int kStartLives = 3;
constexpr int kJumpFrames = 30;
constexpr int kJumpsPerLife = 3;
constexpr float kBoxBonus = 48.0f;

// Amidar lattice: horizontal lines at rows 0/3/6/9/12, vertical rungs at the
// columns below. '#' = not a path. Path cells are painted as the player
// crosses them (+1 each, first visit only).
const char* kLattice[kRows] = {
    "...................",
    ".##.###.###.###.##.",
    ".##.###.###.###.##.",
    "...................",
    ".#.##.###.###.##.#.",
    ".#.##.###.###.##.#.",
    "...................",
    ".###.###.#.###.###.",
    ".###.###.#.###.###.",
    "...................",
    ".##.##.#####.##.##.",
    ".##.##.#####.##.##.",
    "...................",
};

// Boxes: (r0, c0, r1, c1) — the rectangle whose perimeter path cells must
// all be painted to bank the bonus. Derived from the rung columns per band.
struct Box { int r0, c0, r1, c1; };
const Box kBoxes[] = {
    {0, 0, 3, 3},  {0, 3, 3, 7},  {0, 7, 3, 11},  {0, 11, 3, 15},  {0, 15, 3, 18},
    {3, 0, 6, 2},  {3, 2, 6, 5},  {3, 5, 6, 9},   {3, 9, 6, 13},   {3, 13, 6, 16},
    {3, 16, 6, 18},
    {6, 0, 9, 4},  {6, 4, 9, 8},  {6, 8, 9, 10},  {6, 10, 9, 14},  {6, 14, 9, 18},
    {9, 0, 12, 3}, {9, 3, 12, 6}, {9, 6, 12, 12}, {9, 12, 12, 15}, {9, 15, 12, 18},
};
constexpr int kNumBoxes = sizeof(kBoxes) / sizeof(kBoxes[0]);

const int kDy[5] = {0, -1, 0, 0, 1};
const int kDx[5] = {0, 0, 1, -1, 0};
inline int reverse_dir(int d) { return d == 0 ? 0 : 5 - d; }

class AmidarGame : public Game {
 public:
  void reset_game(PCG32&) override {
    lives_ = kStartLives;
    score_ = 0;
    level_ = 0;
    over_ = false;
    repopulate();
    place_entities();
  }

  float act(const AleAction& a, PCG32& rng) override {
    if (over_) return 0.0f;
    ++frame_;
    float reward = 0.0f;

    // Jump: freeze the patrol for kJumpFrames (limited per life/level).
    if (a.fire && jump_timer_ == 0 && jumps_left_ > 0) {
      jump_timer_ = kJumpFrames;
      --jumps_left_;
    }
    if (jump_timer_ > 0) --jump_timer_;

    // ---- player -----------------------------------------------------------
    int want = 0;
    if (a.dy < 0) want = 1;
    else if (a.dy > 0) want = 4;
    else if (a.dx > 0) want = 2;
    else if (a.dx < 0) want = 3;
    if (aligned(px_, py_)) {
      if (want != 0 && can_go(px_, py_, want)) pdir_ = want;
      if (!can_go(px_, py_, pdir_)) pdir_ = 0;
    }
    px_ += kDx[pdir_];
    py_ += kDy[pdir_];

    // Paint on cell alignment; bank any box whose perimeter just completed.
    if (aligned(px_, py_)) {
      int r = (py_ - kOffY) / kCell, c = (px_ - kOffX) / kCell;
      if (!painted_[r][c]) {
        painted_[r][c] = true;
        reward += 1.0f;
        for (int b = 0; b < kNumBoxes; ++b) {
          if (!box_done_[b] && box_complete(b)) {
            box_done_[b] = true;
            reward += kBoxBonus;
            ++boxes_done_;
          }
        }
        if (boxes_done_ == kNumBoxes) {
          ++level_;
          repopulate();
          place_entities();
        }
      }
    }

    // ---- patrol -----------------------------------------------------------
    // Enemies walk the lattice at 4/5 player speed; at a junction they pick
    // uniformly among non-reverse open directions (no chase — Amidar patrol).
    if (jump_timer_ == 0) {
      for (int e = 0; e < kEnemies; ++e) {
        if ((frame_ + e) % 5 == 0) continue;
        if (aligned(ex_[e], ey_[e])) edir_[e] = pick_dir(e, rng);
        ex_[e] += kDx[edir_[e]];
        ey_[e] += kDy[edir_[e]];
      }
      for (int e = 0; e < kEnemies; ++e) {
        int ddx = ex_[e] - px_, ddy = ey_[e] - py_;
        if (ddx > -kCell && ddx < kCell && ddy > -kCell && ddy < kCell) {
          if (--lives_ <= 0) over_ = true;
          place_entities();
          break;
        }
      }
    }

    score_ += static_cast<int>(reward);
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    // Completed boxes fill first so lattice lines draw over them.
    for (int b = 0; b < kNumBoxes; ++b) {
      if (!box_done_[b]) continue;
      fill(f, kOffX + kBoxes[b].c0 * kCell, kOffY + kBoxes[b].r0 * kCell,
           (kBoxes[b].c1 - kBoxes[b].c0 + 1) * kCell,
           (kBoxes[b].r1 - kBoxes[b].r0 + 1) * kCell, 90);
    }
    for (int r = 0; r < kRows; ++r)
      for (int c = 0; c < kCols; ++c) {
        if (kLattice[r][c] == '#') continue;
        fill(f, kOffX + c * kCell, kOffY + r * kCell, kCell, kCell,
             painted_[r][c] ? 180 : 60);
      }
    for (int e = 0; e < kEnemies; ++e)
      fill(f, ex_[e], ey_[e], kCell, kCell,
           jump_timer_ > 0 ? 110 : static_cast<uint8_t>(140 + 8 * e));
    fill(f, px_, py_, kCell, kCell, 224);
    for (int s = 0; s < score_ / 20 && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
    for (int l = 0; l < lives_ && l < kStartLives; ++l)
      for (int k = 0; k < 3; ++k) f[81 * kScreen + 2 + l * 5 + k] = 160;
  }

  bool game_over() const override { return over_; }
  int lives() const override { return lives_; }
  int minimal_actions() const override { return 10; }
  int minimal_to_full(int a) const override {
    // NOOP FIRE UP RIGHT LEFT DOWN UPFIRE RIGHTFIRE LEFTFIRE DOWNFIRE
    static const int map[10] = {0, 1, 2, 3, 4, 5, 10, 11, 12, 13};
    return map[a < 0 || a >= 10 ? 0 : a];
  }

 private:
  static bool wall(int r, int c) {
    if (r < 0 || r >= kRows || c < 0 || c >= kCols) return true;
    return kLattice[r][c] == '#';
  }
  static bool aligned(int x, int y) {
    return (x - kOffX) % kCell == 0 && (y - kOffY) % kCell == 0;
  }
  static bool can_go(int x, int y, int d) {
    if (d == 0) return false;
    int r = (y - kOffY) / kCell + kDy[d], c = (x - kOffX) / kCell + kDx[d];
    return !wall(r, c);
  }

  bool box_complete(int b) const {
    const Box& bx = kBoxes[b];
    for (int c = bx.c0; c <= bx.c1; ++c)
      if (!painted_[bx.r0][c] || !painted_[bx.r1][c]) return false;
    for (int r = bx.r0; r <= bx.r1; ++r)
      if (!painted_[r][bx.c0] || !painted_[r][bx.c1]) return false;
    return true;
  }

  int pick_dir(int e, PCG32& rng) {
    int options[4], n = 0;
    int rev = reverse_dir(edir_[e]);
    for (int d = 1; d <= 4; ++d) {
      if (d == rev) continue;
      if (can_go(ex_[e], ey_[e], d)) options[n++] = d;
    }
    if (n == 0) return rev;
    return options[static_cast<int>(rng.randint(static_cast<uint32_t>(n)))];
  }

  void repopulate() {
    for (int r = 0; r < kRows; ++r)
      for (int c = 0; c < kCols; ++c) painted_[r][c] = false;
    for (int b = 0; b < kNumBoxes; ++b) box_done_[b] = false;
    boxes_done_ = 0;
  }

  void place_entities() {
    // Player bottom-center; enemies spread along the top line.
    px_ = kOffX + 9 * kCell;
    py_ = kOffY + 12 * kCell;
    pdir_ = 0;
    for (int e = 0; e < kEnemies; ++e) {
      ex_[e] = kOffX + (2 + e * 4) * kCell;
      ey_[e] = kOffY;
      edir_[e] = (e % 2 == 0) ? 2 : 3;  // alternate right/left
    }
    jump_timer_ = 0;
    jumps_left_ = kJumpsPerLife;
    frame_ = 0;
  }

  static void fill(uint8_t* f, int x0, int y0, int w, int h, uint8_t v) {
    for (int y = y0 < 0 ? 0 : y0; y < y0 + h && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x0 + w && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  bool painted_[kRows][kCols] = {};
  bool box_done_[kNumBoxes] = {};
  int boxes_done_ = 0;
  int px_ = 0, py_ = 0, pdir_ = 0;
  int ex_[kEnemies] = {}, ey_[kEnemies] = {}, edir_[kEnemies] = {};
  int jump_timer_ = 0, jumps_left_ = kJumpsPerLife;
  int frame_ = 0;
  int lives_ = kStartLives, score_ = 0, level_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_amidar_game() { return std::make_unique<AmidarGame>(); }

}  // namespace cleanba
