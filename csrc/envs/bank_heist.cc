// Bank Heist — from-scratch C++ maze-driving game with the classic
// mechanics: drive through a city maze robbing banks; every robbed bank
// turns into a pursuing police car, dynamite dropped behind the car blows
// up the pursuit, and an emptied city rolls over to the next one.
//
// Stands in for EnvPool's ALE BankHeist-v5 in the reference's benchmark
// configs (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs are
// not available here, so the engine provides a rules-true clone with
// identical protocol semantics (sticky actions / frameskip / stacking are
// applied by AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave7.py and must mirror these rules exactly —
// including the city bitmap, the bank/police lifecycle, and the fuel rule.

#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr int kRows = 17;
constexpr int kCols = 19;
constexpr int kCell = 4;
constexpr int kOffX = 4;
constexpr int kOffY = 8;
constexpr int kBanks = 3;
constexpr int kStartLives = 4;
constexpr float kBankReward = 50.0f;
constexpr int kPoliceDelay = 60;   // frames between robbery and pursuit
constexpr int kFuseFrames = 40;    // dynamite fuse
constexpr int kFuelMax = 2500;     // frames of driving per tank

// '#' wall, 'B' bank sites, 'P' player spawn. Open cells are streets.
const char* kCity[kRows] = {
    "###################",
    "#B.......#.......B#",
    "#.##.###.#.###.##.#",
    "#.................#",
    "#.##.#.#####.#.##.#",
    "#....#...#...#....#",
    "####.###.#.###.####",
    "#.................#",
    "#.##.#.#####.#.##.#",
    "#....#...B...#....#",
    "#.##.###.#.###.##.#",
    "#.......P.........#",
    "##.#.#.#####.#.#.##",
    "#....#...#...#....#",
    "#.#######.#######.#",
    "#.................#",
    "###################",
};

const int kDy[5] = {0, -1, 0, 0, 1};
const int kDx[5] = {0, 0, 1, -1, 0};
inline int reverse_dir(int d) { return d == 0 ? 0 : 5 - d; }

class BankHeistGame : public Game {
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

    // ---- player car -------------------------------------------------------
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

    // Fuel burns while moving; an empty tank costs a life and refills.
    if (pdir_ != 0 && --fuel_ <= 0) {
      if (--lives_ <= 0) over_ = true;
      place_entities();
      score_ += static_cast<int>(reward);
      return reward;
    }

    // Rob a bank on cell alignment; the branch turns into a police car that
    // enters pursuit after a short head start.
    if (aligned(px_, py_)) {
      int r = (py_ - kOffY) / kCell, c = (px_ - kOffX) / kCell;
      for (int b = 0; b < kBanks; ++b) {
        if (bank_live_[b] && bank_r_[b] == r && bank_c_[b] == c) {
          bank_live_[b] = false;
          reward += kBankReward;
          cop_live_[b] = true;
          cop_x_[b] = kOffX + bank_c_[b] * kCell;
          cop_y_[b] = kOffY + bank_r_[b] * kCell;
          cop_dir_[b] = 0;
          cop_hold_[b] = kPoliceDelay;
          ++robbed_;
        }
      }
      if (robbed_ == kBanks) {
        // City cleared: next city, fresh banks, pursuit called off.
        ++level_;
        repopulate();
        fuel_ = kFuelMax;
      }
    }

    // ---- dynamite ---------------------------------------------------------
    if (a.fire && !dyn_live_) {
      dyn_live_ = true;
      dyn_x_ = px_;
      dyn_y_ = py_;
      dyn_fuse_ = kFuseFrames;
    }
    if (dyn_live_ && --dyn_fuse_ <= 0) {
      dyn_live_ = false;
      // The blast clears one cell around the charge — police and player alike.
      for (int b = 0; b < kBanks; ++b) {
        if (cop_live_[b] && near(cop_x_[b], cop_y_[b], dyn_x_, dyn_y_))
          cop_live_[b] = false;
      }
      if (near(px_, py_, dyn_x_, dyn_y_)) {
        if (--lives_ <= 0) over_ = true;
        place_entities();
        score_ += static_cast<int>(reward);
        return reward;
      }
    }

    // ---- police pursuit ---------------------------------------------------
    // Cops drive at 4/5 player speed and chase with increasing determination.
    for (int b = 0; b < kBanks; ++b) {
      if (!cop_live_[b]) continue;
      if (cop_hold_[b] > 0) { --cop_hold_[b]; continue; }
      if ((frame_ + b) % 5 == 0) continue;
      if (aligned(cop_x_[b], cop_y_[b])) cop_dir_[b] = pick_dir(b, rng);
      cop_x_[b] += kDx[cop_dir_[b]];
      cop_y_[b] += kDy[cop_dir_[b]];
    }
    for (int b = 0; b < kBanks; ++b) {
      if (!cop_live_[b] || cop_hold_[b] > 0) continue;
      int ddx = cop_x_[b] - px_, ddy = cop_y_[b] - py_;
      if (ddx > -kCell && ddx < kCell && ddy > -kCell && ddy < kCell) {
        if (--lives_ <= 0) over_ = true;
        place_entities();
        break;
      }
    }

    score_ += static_cast<int>(reward);
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    for (int r = 0; r < kRows; ++r)
      for (int c = 0; c < kCols; ++c)
        if (kCity[r][c] == '#')
          fill(f, kOffX + c * kCell, kOffY + r * kCell, kCell, kCell, 60);
    for (int b = 0; b < kBanks; ++b) {
      if (bank_live_[b])
        fill(f, kOffX + bank_c_[b] * kCell, kOffY + bank_r_[b] * kCell,
             kCell, kCell, 190);
      if (cop_live_[b])
        fill(f, cop_x_[b], cop_y_[b], kCell, kCell,
             cop_hold_[b] > 0 ? 110 : 150);
    }
    if (dyn_live_) fill(f, dyn_x_ + 1, dyn_y_ + 1, 2, 2, 255);
    fill(f, px_, py_, kCell, kCell, 224);
    // Fuel gauge along the bottom, score ticks and lives on top.
    int fuel_px = fuel_ * 80 / kFuelMax;
    for (int x = 0; x < fuel_px; ++x) f[82 * kScreen + 2 + x] = 120;
    for (int s = 0; s < score_ / 50 && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
    for (int l = 0; l < lives_ && l < kStartLives; ++l)
      for (int k = 0; k < 3; ++k) f[3 * kScreen + 2 + l * 5 + k] = 160;
  }

  bool game_over() const override { return over_; }
  int lives() const override { return lives_; }
  int minimal_actions() const override { return 18; }
  int minimal_to_full(int a) const override { return a < 0 || a >= 18 ? 0 : a; }

 private:
  static bool wall(int r, int c) {
    if (r < 0 || r >= kRows || c < 0 || c >= kCols) return true;
    return kCity[r][c] == '#';
  }
  static bool aligned(int x, int y) {
    return (x - kOffX) % kCell == 0 && (y - kOffY) % kCell == 0;
  }
  static bool can_go(int x, int y, int d) {
    if (d == 0) return false;
    int r = (y - kOffY) / kCell + kDy[d], c = (x - kOffX) / kCell + kDx[d];
    return !wall(r, c);
  }
  static bool near(int ax, int ay, int bx, int by) {
    int dx = ax - bx, dy = ay - by;
    return dx > -2 * kCell && dx < 2 * kCell && dy > -2 * kCell && dy < 2 * kCell;
  }

  // Chase with probability 0.5 + 0.15 * level (capped), else wander.
  int pick_dir(int b, PCG32& rng) {
    int options[4], n = 0;
    int rev = reverse_dir(cop_dir_[b]);
    for (int d = 1; d <= 4; ++d) {
      if (d == rev) continue;
      if (can_go(cop_x_[b], cop_y_[b], d)) options[n++] = d;
    }
    if (n == 0) return rev;
    float chase_p = 0.5f + 0.15f * static_cast<float>(level_ > 3 ? 3 : level_);
    if (rng.uniform() < chase_p) {
      int best = options[0], best_score = 1 << 30;
      for (int i = 0; i < n; ++i) {
        int nx = cop_x_[b] + kDx[options[i]] * kCell;
        int ny = cop_y_[b] + kDy[options[i]] * kCell;
        int dist = abs_i(nx - px_) + abs_i(ny - py_);
        if (dist < best_score) {
          best_score = dist;
          best = options[i];
        }
      }
      return best;
    }
    return options[static_cast<int>(rng.randint(static_cast<uint32_t>(n)))];
  }

  static int abs_i(int v) { return v < 0 ? -v : v; }

  void repopulate() {
    int b = 0;
    for (int r = 0; r < kRows; ++r)
      for (int c = 0; c < kCols; ++c)
        if (kCity[r][c] == 'B' && b < kBanks) {
          bank_r_[b] = r;
          bank_c_[b] = c;
          bank_live_[b] = true;
          cop_live_[b] = false;
          ++b;
        }
    robbed_ = 0;
  }

  void place_entities() {
    for (int r = 0; r < kRows; ++r)
      for (int c = 0; c < kCols; ++c)
        if (kCity[r][c] == 'P') {
          px_ = kOffX + c * kCell;
          py_ = kOffY + r * kCell;
        }
    pdir_ = 0;
    for (int b = 0; b < kBanks; ++b) cop_live_[b] = false;
    dyn_live_ = false;
    fuel_ = kFuelMax;
    frame_ = 0;
  }

  static void fill(uint8_t* f, int x0, int y0, int w, int h, uint8_t v) {
    for (int y = y0 < 0 ? 0 : y0; y < y0 + h && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x0 + w && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  int bank_r_[kBanks] = {}, bank_c_[kBanks] = {};
  bool bank_live_[kBanks] = {};
  bool cop_live_[kBanks] = {};
  int cop_x_[kBanks] = {}, cop_y_[kBanks] = {}, cop_dir_[kBanks] = {}, cop_hold_[kBanks] = {};
  int robbed_ = 0;
  bool dyn_live_ = false;
  int dyn_x_ = 0, dyn_y_ = 0, dyn_fuse_ = 0;
  int px_ = 0, py_ = 0, pdir_ = 0;
  int fuel_ = kFuelMax;
  int frame_ = 0;
  int lives_ = kStartLives, score_ = 0, level_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_bank_heist_game() { return std::make_unique<BankHeistGame>(); }

}  // namespace cleanba
