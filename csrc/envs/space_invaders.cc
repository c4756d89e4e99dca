// Space Invaders — from-scratch C++ clone: a marching alien grid that drops
// and speeds up, destructible bunker shields, player cannon with one in-flight
// shot, alien bombs, row-scored kills (bottom rows 5 ... top rows 30 points,
// like the arcade), 3 lives, next wave on clear. Renders grayscale 84x84.
// Stands in for EnvPool's ALE SpaceInvaders-v5 (BASELINE.json config 4).

#include <cmath>
#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr int kRows = 5;
constexpr int kCols = 9;
constexpr int kAlienW = 5;
constexpr int kAlienH = 3;
constexpr int kAlienGapX = 8;  // horizontal pitch
constexpr int kAlienGapY = 6;  // vertical pitch
constexpr int kGridSpan = kCols * kAlienGapX;           // 72 px wide pitch span
constexpr float kPlayerY = 76.0f;
constexpr int kPlayerW = 6, kPlayerH = 3;
constexpr int kShieldY = 66;
constexpr int kShieldW = 10, kShieldH = 5, kNumShields = 3;
const float kRowScore[kRows] = {30, 20, 20, 10, 10};  // top row worth most

class SpaceInvadersGame : public Game {
 public:
  void reset_game(PCG32& rng) override {
    lives_ = 3;
    over_ = false;
    new_wave(/*first=*/true);
    std::memset(shields_, 1, sizeof(shields_));
    player_x_ = 42.0f - kPlayerW / 2.0f;
    shot_live_ = false;
    bomb_live_ = false;
    bomb_cooldown_ = 40 + static_cast<int>(rng.randint(40));
  }

  float act(const AleAction& a, PCG32& rng) override {
    if (over_) return 0.0f;
    float reward = 0.0f;
    player_x_ += 1.5f * static_cast<float>(a.dx);
    if (player_x_ < 2) player_x_ = 2;
    if (player_x_ > 84 - 2 - kPlayerW) player_x_ = 84 - 2 - kPlayerW;

    // Fire: one shot in flight at a time (arcade rule).
    if (a.fire && !shot_live_) {
      shot_live_ = true;
      shot_x_ = player_x_ + kPlayerW / 2.0f;
      shot_y_ = kPlayerY - 1;
    }
    if (shot_live_) {
      shot_y_ -= 3.0f;
      reward += shot_collisions();
      if (shot_y_ < 2) shot_live_ = false;
    }

    // Grid march: moves horizontally every `step_period_` frames; drops and
    // reverses at the walls; speeds up as aliens die.
    if (++march_clock_ >= step_period_) {
      march_clock_ = 0;
      grid_x_ += 2 * dir_;
      int lo, hi;
      col_extent(&lo, &hi);
      if (grid_x_ + lo * kAlienGapX < 2 || grid_x_ + hi * kAlienGapX + kAlienW > 82) {
        dir_ = -dir_;
        grid_y_ += 3;
      }
      int alive = alive_count();
      step_period_ = 2 + alive / 6;  // fewer aliens -> faster march
      // Aliens reaching the player row: game over.
      if (grid_y_ + row_bottom() * kAlienGapY + kAlienH >= kPlayerY) over_ = true;
    }

    // Alien bombs.
    if (!bomb_live_ && --bomb_cooldown_ <= 0) {
      drop_bomb(rng);
      bomb_cooldown_ = 25 + static_cast<int>(rng.randint(50));
    }
    if (bomb_live_) {
      bomb_y_ += 1.5f;
      bomb_collisions();
    }

    if (alive_count() == 0) {
      new_wave(/*first=*/false);
      std::memset(shields_, 1, sizeof(shields_));  // fresh shields per wave
    }
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    for (int x = 0; x < kScreen; ++x) f[82 * kScreen + x] = 80;  // ground line
    // Lives ticks.
    for (int l = 0; l < lives_; ++l)
      for (int x = 0; x < 3; ++x) f[1 * kScreen + 2 + l * 5 + x] = 120;
    // Aliens.
    for (int r = 0; r < kRows; ++r)
      for (int c = 0; c < kCols; ++c)
        if (aliens_[r][c])
          rect(f, grid_x_ + c * kAlienGapX, grid_y_ + r * kAlienGapY, kAlienW, kAlienH,
               static_cast<uint8_t>(150 + 15 * r));
    // Shields (pixel-destructible).
    for (int sId = 0; sId < kNumShields; ++sId)
      for (int y = 0; y < kShieldH; ++y)
        for (int x = 0; x < kShieldW; ++x)
          if (shields_[sId][y][x])
            f[(kShieldY + y) * kScreen + shield_x(sId) + x] = 110;
    // Player, shot, bomb.
    rect(f, player_x_, kPlayerY, kPlayerW, kPlayerH, 220);
    if (shot_live_) rect(f, shot_x_, shot_y_, 1, 3, 255);
    if (bomb_live_) rect(f, bomb_x_, bomb_y_, 1, 3, 200);
  }

  bool game_over() const override { return over_; }
  int lives() const override { return lives_; }
  int minimal_actions() const override { return 6; }
  int minimal_to_full(int a) const override {
    static const int map[6] = {0, 1, 3, 4, 11, 12};  // ALE SpaceInvaders minimal set
    return map[a < 0 || a >= 6 ? 0 : a];
  }

 private:
  static void rect(uint8_t* f, float fx, float fy, int w, int h, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    for (int y = y0 < 0 ? 0 : y0; y < y0 + h && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x0 + w && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  static int shield_x(int sId) { return 10 + sId * (kShieldW + 18); }

  void new_wave(bool first) {
    std::memset(aliens_, 1, sizeof(aliens_));
    grid_x_ = 6;
    grid_y_ = first ? 10 : 14;  // later waves start lower (arcade pressure)
    dir_ = 1;
    march_clock_ = 0;
    step_period_ = 2 + (kRows * kCols) / 6;
  }

  int alive_count() const {
    int n = 0;
    for (int r = 0; r < kRows; ++r)
      for (int c = 0; c < kCols; ++c) n += aliens_[r][c];
    return n;
  }

  void col_extent(int* lo, int* hi) const {
    *lo = kCols - 1;
    *hi = 0;
    for (int c = 0; c < kCols; ++c)
      for (int r = 0; r < kRows; ++r)
        if (aliens_[r][c]) {
          if (c < *lo) *lo = c;
          if (c > *hi) *hi = c;
        }
  }

  int row_bottom() const {
    for (int r = kRows - 1; r >= 0; --r)
      for (int c = 0; c < kCols; ++c)
        if (aliens_[r][c]) return r;
    return 0;
  }

  float shot_collisions() {
    // Shields absorb shots (carve a hole).
    if (hit_shield(shot_x_, shot_y_)) {
      shot_live_ = false;
      return 0.0f;
    }
    for (int r = kRows - 1; r >= 0; --r)
      for (int c = 0; c < kCols; ++c)
        if (aliens_[r][c]) {
          float ax = grid_x_ + c * kAlienGapX, ay = grid_y_ + r * kAlienGapY;
          if (shot_x_ >= ax && shot_x_ < ax + kAlienW && shot_y_ >= ay &&
              shot_y_ < ay + kAlienH) {
            aliens_[r][c] = 0;
            shot_live_ = false;
            return kRowScore[r];
          }
        }
    return 0.0f;
  }

  void drop_bomb(PCG32& rng) {
    // Pick a random alive column; bomb drops from its lowest alien.
    int cols[kCols], n = 0;
    for (int c = 0; c < kCols; ++c)
      for (int r = 0; r < kRows; ++r)
        if (aliens_[r][c]) {
          cols[n++] = c;
          break;
        }
    if (!n) return;
    int c = cols[rng.randint(n)];
    int r = kRows - 1;
    while (r >= 0 && !aliens_[r][c]) --r;
    bomb_live_ = true;
    bomb_x_ = grid_x_ + c * kAlienGapX + kAlienW / 2.0f;
    bomb_y_ = grid_y_ + r * kAlienGapY + kAlienH;
  }

  void bomb_collisions() {
    if (hit_shield(bomb_x_, bomb_y_)) {
      bomb_live_ = false;
      return;
    }
    if (bomb_y_ + 3 >= kPlayerY && bomb_y_ < kPlayerY + kPlayerH &&
        bomb_x_ >= player_x_ && bomb_x_ < player_x_ + kPlayerW) {
      bomb_live_ = false;
      if (--lives_ <= 0) over_ = true;
      return;
    }
    if (bomb_y_ > 82) bomb_live_ = false;
  }

  bool hit_shield(float px, float py) {
    for (int sId = 0; sId < kNumShields; ++sId) {
      int lx = static_cast<int>(px) - shield_x(sId);
      int ly = static_cast<int>(py) - kShieldY;
      if (lx >= 0 && lx < kShieldW && ly >= 0 && ly < kShieldH && shields_[sId][ly][lx]) {
        // Carve a small crater.
        for (int dy = -1; dy <= 1; ++dy)
          for (int dx = -1; dx <= 1; ++dx) {
            int yy = ly + dy, xx = lx + dx;
            if (yy >= 0 && yy < kShieldH && xx >= 0 && xx < kShieldW)
              shields_[sId][yy][xx] = 0;
          }
        return true;
      }
    }
    return false;
  }

  uint8_t aliens_[kRows][kCols] = {};
  uint8_t shields_[kNumShields][kShieldH][kShieldW] = {};
  int lives_ = 3;
  bool over_ = false;
  int grid_x_ = 6, grid_y_ = 10, dir_ = 1, march_clock_ = 0, step_period_ = 8;
  float player_x_ = 0;
  bool shot_live_ = false, bomb_live_ = false;
  float shot_x_ = 0, shot_y_ = 0, bomb_x_ = 0, bomb_y_ = 0;
  int bomb_cooldown_ = 60;
};

}  // namespace

std::unique_ptr<Game> make_space_invaders_game() {
  return std::make_unique<SpaceInvadersGame>();
}

}  // namespace cleanba
