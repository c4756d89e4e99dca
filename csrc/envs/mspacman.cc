// MsPacman — from-scratch C++ maze-chase game with the classic mechanics:
// eat every pellet while dodging four ghosts; power pellets reverse the
// chase for a while and eaten ghosts score a doubling bonus chain.
//
// Stands in for EnvPool's ALE MsPacman-v5 in the reference's benchmark
// configs (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs are
// not available here, so the engine provides a rules-true clone with
// identical protocol semantics (sticky actions / frameskip / stacking are
// applied by AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave3.py and must mirror these rules exactly —
// including the maze bitmap, movement/alignment rules, and ghost speed
// patterns below.

#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr int kRows = 17;
constexpr int kCols = 19;
constexpr int kCell = 4;
constexpr int kOffX = 4;   // maze top-left on the 84x84 screen
constexpr int kOffY = 8;
constexpr int kGhosts = 4;
constexpr int kStartLives = 3;
constexpr int kFrightFrames = 360;
constexpr int kEatenHold = 60;

// '#' wall, '.' pellet, 'o' power pellet, 'P' pacman spawn, 'G' ghost spawn.
// Validated: all 163 free cells are mutually reachable.
const char* kMaze[kRows] = {
    "###################",
    "#........#........#",
    "#.##.###.#.###.##.#",
    "#o...............o#",
    "#.##.#.#####.#.##.#",
    "#....#....#....#..#",
    "####.###.#.###.####",
    "#........G........#",
    "#.##.#.#####.#.##.#",
    "#....#...#...#....#",
    "#.##.###.#.###.##.#",
    "#o......P........o#",
    "##.#.#.#####.#.#.##",
    "#....#...#...#....#",
    "#.#######.#######.#",
    "#.................#",
    "###################",
};

// Directions: 0 none, 1 up, 2 right, 3 left, 4 down (dy/dx tables).
const int kDy[5] = {0, -1, 0, 0, 1};
const int kDx[5] = {0, 0, 1, -1, 0};
inline int reverse_dir(int d) { return d == 0 ? 0 : 5 - d; }

class MsPacmanGame : public Game {
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

    // ---- pacman -----------------------------------------------------------
    // Desired direction from the joystick; vertical intent wins ties.
    int want = 0;
    if (a.dy < 0) want = 1;
    else if (a.dy > 0) want = 4;
    else if (a.dx > 0) want = 2;
    else if (a.dx < 0) want = 3;
    if (aligned(pac_x_, pac_y_)) {
      if (want != 0 && can_go(pac_x_, pac_y_, want)) pac_dir_ = want;
      if (!can_go(pac_x_, pac_y_, pac_dir_)) pac_dir_ = 0;
    }
    pac_x_ += kDx[pac_dir_];
    pac_y_ += kDy[pac_dir_];

    // Eat pellets at cell alignment.
    if (aligned(pac_x_, pac_y_)) {
      int r = (pac_y_ - kOffY) / kCell, c = (pac_x_ - kOffX) / kCell;
      if (pellet_[r][c]) {
        pellet_[r][c] = false;
        --pellets_left_;
        reward += 10.0f;
      } else if (power_[r][c]) {
        power_[r][c] = false;
        --pellets_left_;
        reward += 50.0f;
        fright_ = kFrightFrames;
        chain_ = 0;
        for (int g = 0; g < kGhosts; ++g)
          if (hold_[g] == 0) gdir_[g] = reverse_dir(gdir_[g]);
      }
    }

    // ---- ghosts -----------------------------------------------------------
    if (fright_ > 0) --fright_;
    for (int g = 0; g < kGhosts; ++g) {
      if (hold_[g] > 0) {  // eaten: parked at the spawn box
        --hold_[g];
        continue;
      }
      if (!ghost_moves_now(g)) continue;
      if (aligned(gx_[g], gy_[g])) {
        int best = pick_dir(g, rng);
        gdir_[g] = best;
      }
      gx_[g] += kDx[gdir_[g]];
      gy_[g] += kDy[gdir_[g]];
    }

    // ---- collisions ---------------------------------------------------------
    for (int g = 0; g < kGhosts; ++g) {
      if (hold_[g] > 0) continue;
      int ddx = gx_[g] - pac_x_, ddy = gy_[g] - pac_y_;
      if (ddx > -kCell && ddx < kCell && ddy > -kCell && ddy < kCell) {
        if (fright_ > 0) {
          reward += 200.0f * static_cast<float>(1 << (chain_ > 3 ? 3 : chain_));
          ++chain_;
          gx_[g] = spawn_x_;
          gy_[g] = spawn_y_;
          gdir_[g] = 1 + (g % 4);
          hold_[g] = kEatenHold;
        } else {
          if (--lives_ <= 0) over_ = true;
          place_entities();
          break;
        }
      }
    }

    // ---- level clear --------------------------------------------------------
    if (pellets_left_ == 0 && !over_) {
      ++level_;
      repopulate();
      place_entities();
    }

    score_ += static_cast<int>(reward);
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    for (int r = 0; r < kRows; ++r)
      for (int c = 0; c < kCols; ++c) {
        int y0 = kOffY + r * kCell, x0 = kOffX + c * kCell;
        if (kMaze[r][c] == '#') {
          fill(f, x0, y0, kCell, kCell, 60);
        } else if (pellet_[r][c]) {
          fill(f, x0 + 1, y0 + 1, 2, 2, 140);
        } else if (power_[r][c]) {
          fill(f, x0, y0, kCell, kCell, 170);
        }
      }
    for (int g = 0; g < kGhosts; ++g) {
      uint8_t shade = fright_ > 0 ? 100 : static_cast<uint8_t>(185 + 10 * g);
      if (hold_[g] > 0) shade = 80;
      fill(f, gx_[g], gy_[g], kCell, kCell, shade);
    }
    fill(f, pac_x_, pac_y_, kCell, kCell, 224);
    // Score ticks (one per 200 points) and lives markers.
    for (int s = 0; s < score_ / 200 && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
    for (int l = 0; l < lives_ && l < kStartLives; ++l)
      for (int k = 0; k < 3; ++k) f[81 * kScreen + 2 + l * 5 + k] = 160;
  }

  bool game_over() const override { return over_; }
  int lives() const override { return lives_; }
  int minimal_actions() const override { return 9; }
  int minimal_to_full(int a) const override {
    // NOOP UP RIGHT LEFT DOWN UPRIGHT UPLEFT DOWNRIGHT DOWNLEFT
    static const int map[9] = {0, 2, 3, 4, 5, 6, 7, 8, 9};
    return map[a < 0 || a >= 9 ? 0 : a];
  }

 private:
  static bool wall(int r, int c) {
    if (r < 0 || r >= kRows || c < 0 || c >= kCols) return true;
    return kMaze[r][c] == '#';
  }
  static bool aligned(int x, int y) {
    return (x - kOffX) % kCell == 0 && (y - kOffY) % kCell == 0;
  }
  static bool can_go(int x, int y, int d) {
    if (d == 0) return false;
    int r = (y - kOffY) / kCell + kDy[d], c = (x - kOffX) / kCell + kDx[d];
    return !wall(r, c);
  }

  // Ghost speed pattern: normal skips every 5th frame (0.8 px/frame average),
  // frightened moves every other frame (0.5). Staggered by ghost index so the
  // pack spreads out. Deterministic — the JAX twin mirrors it exactly.
  bool ghost_moves_now(int g) const {
    if (fright_ > 0) return (frame_ + g) % 2 == 0;
    return (frame_ + g) % 5 != 0;
  }

  // At a cell center: choose among non-reverse open directions. With
  // probability chase_p the ghost minimizes (maximizes when frightened) the
  // Manhattan distance to pacman; otherwise it picks uniformly at random.
  int pick_dir(int g, PCG32& rng) {
    int options[4], n = 0;
    for (int d = 1; d <= 4; ++d) {
      if (d == reverse_dir(gdir_[g])) continue;
      if (can_go(gx_[g], gy_[g], d)) options[n++] = d;
    }
    if (n == 0) return reverse_dir(gdir_[g]);
    float chase_p = 0.45f + 0.1f * static_cast<float>(g);
    if (rng.uniform() < chase_p) {
      int best = options[0], best_score = 1 << 30;
      for (int i = 0; i < n; ++i) {
        int nx = gx_[g] + kDx[options[i]] * kCell;
        int ny = gy_[g] + kDy[options[i]] * kCell;
        int dist = abs_i(nx - pac_x_) + abs_i(ny - pac_y_);
        int s = fright_ > 0 ? -dist : dist;
        if (s < best_score) {
          best_score = s;
          best = options[i];
        }
      }
      return best;
    }
    return options[static_cast<int>(rng.randint(static_cast<uint32_t>(n)))];
  }

  static int abs_i(int v) { return v < 0 ? -v : v; }

  void repopulate() {
    pellets_left_ = 0;
    for (int r = 0; r < kRows; ++r)
      for (int c = 0; c < kCols; ++c) {
        pellet_[r][c] = kMaze[r][c] == '.';
        power_[r][c] = kMaze[r][c] == 'o';
        if (pellet_[r][c] || power_[r][c]) ++pellets_left_;
      }
  }

  void place_entities() {
    for (int r = 0; r < kRows; ++r)
      for (int c = 0; c < kCols; ++c) {
        if (kMaze[r][c] == 'P') {
          pac_x_ = kOffX + c * kCell;
          pac_y_ = kOffY + r * kCell;
        } else if (kMaze[r][c] == 'G') {
          spawn_x_ = kOffX + c * kCell;
          spawn_y_ = kOffY + r * kCell;
        }
      }
    pac_dir_ = 0;
    for (int g = 0; g < kGhosts; ++g) {
      gx_[g] = spawn_x_;
      gy_[g] = spawn_y_;
      gdir_[g] = 1 + g;  // up right left down
      hold_[g] = 0;
    }
    fright_ = 0;
    chain_ = 0;
    frame_ = 0;
  }

  static void fill(uint8_t* f, int x0, int y0, int w, int h, uint8_t v) {
    for (int y = y0 < 0 ? 0 : y0; y < y0 + h && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x0 + w && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  bool pellet_[kRows][kCols] = {};
  bool power_[kRows][kCols] = {};
  int pellets_left_ = 0;
  int pac_x_ = 0, pac_y_ = 0, pac_dir_ = 0;
  int spawn_x_ = 0, spawn_y_ = 0;
  int gx_[kGhosts] = {}, gy_[kGhosts] = {}, gdir_[kGhosts] = {}, hold_[kGhosts] = {};
  int fright_ = 0, chain_ = 0, frame_ = 0;
  int lives_ = kStartLives, score_ = 0, level_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_mspacman_game() { return std::make_unique<MsPacmanGame>(); }

}  // namespace cleanba
