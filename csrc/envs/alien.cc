// Alien — from-scratch C++ maze-chase game with the classic mechanics:
// crush every alien egg in the ship's corridors while three xenomorphs
// hunt you; grab a pulsar to turn the hunt around for a moment, and torch
// pursuers with the flamethrower for bonus points.
//
// Stands in for EnvPool's ALE Alien-v5 in the reference's benchmark
// configs (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs
// are not available here, so the engine provides a rules-true clone with
// identical protocol semantics (sticky actions / frameskip / stacking are
// applied by AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave8.py and must mirror these rules exactly
// — including the corridor bitmap, egg/pulsar values, and hunter speeds.

#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr int kRows = 17;
constexpr int kCols = 19;
constexpr int kCell = 4;
constexpr int kOffX = 4;
constexpr int kOffY = 8;
constexpr int kHunters = 3;
constexpr int kStartLives = 3;
constexpr int kPulsarFrames = 300;
constexpr int kEatenHold = 80;
constexpr float kEggReward = 10.0f;
constexpr float kPulsarReward = 100.0f;
constexpr float kTorchReward = 200.0f;

// '#' wall, '.' egg, 'o' pulsar, 'P' player spawn, 'G' hunter spawn.
// Ship corridors: long straight halls with cross-connects.
const char* kShip[kRows] = {
    "###################",
    "#.....#.....#.....#",
    "#.###.#.###.#.###.#",
    "#o..#...#G#...#..o#",
    "##.#.###...###.#.##",
    "#....#.......#....#",
    "#.####.#####.####.#",
    "#.........#.......#",
    "#.####.##.#.#####.#",
    "#....#.#.....#....#",
    "#.##.#.#.###.#.##.#",
    "#.#..........o..#.#",
    "#.#.####.#.####.#.#",
    "#......#.P.#......#",
    "#.####.#.#.#.####.#",
    "#o.......#.......o#",
    "###################",
};

const int kDy[5] = {0, -1, 0, 0, 1};
const int kDx[5] = {0, 0, 1, -1, 0};
inline int reverse_dir(int d) { return d == 0 ? 0 : 5 - d; }

class AlienGame : public Game {
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

    // Crush eggs / grab pulsars on cell alignment.
    if (aligned(px_, py_)) {
      int r = (py_ - kOffY) / kCell, c = (px_ - kOffX) / kCell;
      if (egg_[r][c]) {
        egg_[r][c] = false;
        --eggs_left_;
        reward += kEggReward;
      } else if (pulsar_[r][c]) {
        pulsar_[r][c] = false;
        reward += kPulsarReward;
        pulsar_timer_ = kPulsarFrames;
        chain_ = 0;
        for (int h = 0; h < kHunters; ++h)
          if (hold_[h] == 0) hdir_[h] = reverse_dir(hdir_[h]);
      }
    }

    // The flamethrower: FIRE torches the cell ahead; a frightened hunter
    // caught in it is destroyed (sent back to the nest).
    bool torching = a.fire && pulsar_timer_ > 0;

    // ---- hunters ----------------------------------------------------------
    if (pulsar_timer_ > 0) --pulsar_timer_;
    for (int h = 0; h < kHunters; ++h) {
      if (hold_[h] > 0) { --hold_[h]; continue; }
      if (!hunter_moves_now(h)) continue;
      if (aligned(hx_[h], hy_[h])) hdir_[h] = pick_dir(h, rng);
      hx_[h] += kDx[hdir_[h]];
      hy_[h] += kDy[hdir_[h]];
    }

    // ---- contacts ---------------------------------------------------------
    for (int h = 0; h < kHunters; ++h) {
      if (hold_[h] > 0) continue;
      int ddx = hx_[h] - px_, ddy = hy_[h] - py_;
      bool touching = ddx > -kCell && ddx < kCell && ddy > -kCell && ddy < kCell;
      // Torch reach: one extra cell along the facing direction.
      bool torched = false;
      if (torching && !touching) {
        int tx = px_ + kDx[pdir_] * kCell, ty = py_ + kDy[pdir_] * kCell;
        int tdx = hx_[h] - tx, tdy = hy_[h] - ty;
        torched = tdx > -kCell && tdx < kCell && tdy > -kCell && tdy < kCell;
      }
      if (touching || torched) {
        if (pulsar_timer_ > 0) {
          reward += kTorchReward * static_cast<float>(1 << (chain_ > 3 ? 3 : chain_));
          ++chain_;
          hx_[h] = nest_x_;
          hy_[h] = nest_y_;
          hdir_[h] = 1 + (h % 4);
          hold_[h] = kEatenHold;
        } else if (touching) {
          if (--lives_ <= 0) over_ = true;
          place_entities();
          break;
        }
      }
    }

    // ---- level clear -------------------------------------------------------
    if (eggs_left_ == 0 && !over_) {
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
        if (kShip[r][c] == '#') {
          fill(f, x0, y0, kCell, kCell, 70);
        } else if (egg_[r][c]) {
          fill(f, x0 + 1, y0 + 1, 2, 2, 150);
        } else if (pulsar_[r][c]) {
          fill(f, x0, y0, kCell, kCell, 180);
        }
      }
    for (int h = 0; h < kHunters; ++h) {
      uint8_t shade = pulsar_timer_ > 0 ? 100 : static_cast<uint8_t>(190 + 12 * h);
      if (hold_[h] > 0) shade = 85;
      fill(f, hx_[h], hy_[h], kCell, kCell, shade);
    }
    fill(f, px_, py_, kCell, kCell, 230);
    for (int s = 0; s < score_ / 100 && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
    for (int l = 0; l < lives_ && l < kStartLives; ++l)
      for (int k = 0; k < 3; ++k) f[81 * kScreen + 2 + l * 5 + k] = 160;
  }

  bool game_over() const override { return over_; }
  int lives() const override { return lives_; }
  int minimal_actions() const override { return 18; }
  int minimal_to_full(int a) const override { return a < 0 || a >= 18 ? 0 : a; }

 private:
  static bool wall(int r, int c) {
    if (r < 0 || r >= kRows || c < 0 || c >= kCols) return true;
    return kShip[r][c] == '#';
  }
  static bool aligned(int x, int y) {
    return (x - kOffX) % kCell == 0 && (y - kOffY) % kCell == 0;
  }
  static bool can_go(int x, int y, int d) {
    if (d == 0) return false;
    int r = (y - kOffY) / kCell + kDy[d], c = (x - kOffX) / kCell + kDx[d];
    return !wall(r, c);
  }

  // Hunters are a touch faster than MsPacman ghosts (skip every 6th frame)
  // and slow to half speed while the pulsar is live.
  bool hunter_moves_now(int h) const {
    if (pulsar_timer_ > 0) return (frame_ + h) % 2 == 0;
    return (frame_ + h) % 6 != 0;
  }

  int pick_dir(int h, PCG32& rng) {
    int options[4], n = 0;
    int rev = reverse_dir(hdir_[h]);
    for (int d = 1; d <= 4; ++d) {
      if (d == rev) continue;
      if (can_go(hx_[h], hy_[h], d)) options[n++] = d;
    }
    if (n == 0) return rev;
    float chase_p = 0.5f + 0.12f * static_cast<float>(h);
    if (rng.uniform() < chase_p) {
      int best = options[0], best_score = 1 << 30;
      for (int i = 0; i < n; ++i) {
        int nx = hx_[h] + kDx[options[i]] * kCell;
        int ny = hy_[h] + kDy[options[i]] * kCell;
        int dist = abs_i(nx - px_) + abs_i(ny - py_);
        int s = pulsar_timer_ > 0 ? -dist : dist;
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
    eggs_left_ = 0;
    for (int r = 0; r < kRows; ++r)
      for (int c = 0; c < kCols; ++c) {
        egg_[r][c] = kShip[r][c] == '.';
        pulsar_[r][c] = kShip[r][c] == 'o';
        if (egg_[r][c]) ++eggs_left_;
      }
  }

  void place_entities() {
    for (int r = 0; r < kRows; ++r)
      for (int c = 0; c < kCols; ++c) {
        if (kShip[r][c] == 'P') {
          px_ = kOffX + c * kCell;
          py_ = kOffY + r * kCell;
        } else if (kShip[r][c] == 'G') {
          nest_x_ = kOffX + c * kCell;
          nest_y_ = kOffY + r * kCell;
        }
      }
    pdir_ = 0;
    for (int h = 0; h < kHunters; ++h) {
      hx_[h] = nest_x_;
      hy_[h] = nest_y_;
      hdir_[h] = 1 + h;
      hold_[h] = 0;
    }
    pulsar_timer_ = 0;
    chain_ = 0;
    frame_ = 0;
  }

  static void fill(uint8_t* f, int x0, int y0, int w, int h, uint8_t v) {
    for (int y = y0 < 0 ? 0 : y0; y < y0 + h && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x0 + w && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  bool egg_[kRows][kCols] = {};
  bool pulsar_[kRows][kCols] = {};
  int eggs_left_ = 0;
  int px_ = 0, py_ = 0, pdir_ = 0;
  int nest_x_ = 0, nest_y_ = 0;
  int hx_[kHunters] = {}, hy_[kHunters] = {}, hdir_[kHunters] = {}, hold_[kHunters] = {};
  int pulsar_timer_ = 0, chain_ = 0, frame_ = 0;
  int lives_ = kStartLives, score_ = 0, level_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_alien_game() { return std::make_unique<AlienGame>(); }

}  // namespace cleanba
