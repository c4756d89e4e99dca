// Chopper Command — from-scratch C++ clone with the classic mechanics: a
// helicopter defends a truck convoy from waves of enemy jets (+100) and
// helicopters (+200); enemies strafe the player and bomb the trucks; each
// cleared wave pays a bonus per surviving truck.
//
// Stands in for EnvPool's ALE ChopperCommand-v5 in the reference's benchmark
// configs (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs are
// not available here, so the engine provides a rules-true clone with
// identical protocol semantics (sticky actions / frameskip / stacking are
// applied by AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave9b.py and must mirror these rules exactly.

#include <cmath>
#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr int kEnemies = 4;
const float kEnemyRowY[kEnemies] = {26.0f, 40.0f, 54.0f, 33.0f};
const float kEnemyX0[kEnemies] = {10.0f, 60.0f, 30.0f, 75.0f};
const float kEnemyD0[kEnemies] = {1.0f, -1.0f, 1.0f, -1.0f};
constexpr float kEnemyW = 6.0f, kEnemyH = 4.0f;
constexpr int kTrucks = 4;
constexpr float kTruckY = 74.0f, kTruckW = 6.0f, kTruckH = 4.0f;
constexpr float kPlayerW = 7.0f, kPlayerH = 4.0f;
constexpr float kMoveX = 1.2f, kMoveY = 1.0f;
constexpr float kShotV = 3.0f;
constexpr float kEShotV = 2.0f;
constexpr float kBombV = 1.5f;
constexpr int kLives = 3;

class ChopperCommandGame : public Game {
 public:
  void reset_game(PCG32&) override {
    wave_ = 0;
    lives_ = kLives;
    score_ = 0;
    over_ = false;
    for (int t = 0; t < kTrucks; ++t) {
      truck_x_[t] = static_cast<float>(8 + t * 20);
      truck_alive_[t] = true;
    }
    start_wave();
    respawn();
  }

  float act(const AleAction& a, PCG32& rng) override {
    if (over_) return 0.0f;
    float reward = 0.0f;
    float espeed = (0.7f + 0.15f * static_cast<float>(wave_));

    // Player movement and facing.
    px_ += static_cast<float>(a.dx) * kMoveX;
    py_ += static_cast<float>(a.dy) * kMoveY;
    if (a.dx != 0) facing_ = a.dx > 0 ? 1.0f : -1.0f;
    if (px_ < 4.0f) px_ = 4.0f;
    if (px_ > 80.0f - kPlayerW) px_ = 80.0f - kPlayerW;
    if (py_ < 16.0f) py_ = 16.0f;
    if (py_ > 68.0f) py_ = 68.0f;

    // Player shot (one slot; horizontal, in the facing direction).
    if (a.fire && !shot_live_) {
      shot_live_ = true;
      shot_x_ = px_ + kPlayerW / 2.0f;
      shot_y_ = py_ + kPlayerH / 2.0f;
      shot_vx_ = facing_ * kShotV;
    }
    if (shot_live_) {
      shot_x_ += shot_vx_;
      if (shot_x_ < 0.0f || shot_x_ > 84.0f) shot_live_ = false;
    }

    // Trucks crawl left and wrap.
    for (int t = 0; t < kTrucks; ++t) {
      truck_x_[t] -= 0.3f;
      if (truck_x_[t] < -kTruckW) truck_x_[t] += 84.0f + kTruckW;
    }

    int alive_enemies = 0;
    for (int e = 0; e < kEnemies; ++e) {
      if (!enemy_alive_[e]) continue;
      ++alive_enemies;
      ex_[e] += edir_[e] * espeed;
      if (ex_[e] < -kEnemyW) ex_[e] += 84.0f + kEnemyW;
      if (ex_[e] > 84.0f) ex_[e] -= 84.0f + kEnemyW;
      float ey = kEnemyRowY[e];

      // Strafe the player when roughly level with it.
      if (!eshot_live_[e] && std::fabs(ey - py_) < 6.0f &&
          rng.uniform() < 0.008f) {
        eshot_live_[e] = true;
        eshot_x_[e] = ex_[e] + kEnemyW / 2.0f;
        eshot_y_[e] = ey + kEnemyH / 2.0f;
        eshot_vx_[e] = (px_ >= ex_[e] ? 1.0f : -1.0f) * kEShotV;
      }
      // Bomb a truck passing underneath.
      if (!bomb_live_[e] && rng.uniform() < 0.004f) {
        for (int t = 0; t < kTrucks; ++t) {
          if (truck_alive_[t] &&
              std::fabs(truck_x_[t] - ex_[e]) < 5.0f) {
            bomb_live_[e] = true;
            bomb_x_[e] = ex_[e] + kEnemyW / 2.0f;
            bomb_y_[e] = ey + kEnemyH;
            break;
          }
        }
      }
      // Player shot hit?
      if (shot_live_ && shot_x_ >= ex_[e] && shot_x_ < ex_[e] + kEnemyW &&
          shot_y_ >= ey && shot_y_ < ey + kEnemyH) {
        shot_live_ = false;
        enemy_alive_[e] = false;
        int pts = e % 2 == 0 ? 100 : 200;  // jets 100, helicopters 200
        reward += static_cast<float>(pts);
        score_ += pts;
        --alive_enemies;
        continue;
      }
      // Enemy rams the player.
      if (overlap(px_, py_, kPlayerW, kPlayerH, ex_[e], ey, kEnemyW, kEnemyH)) {
        reward += lose_life();
        return reward;
      }
    }

    // Enemy shots and bombs fly regardless of their owner's fate.
    for (int e = 0; e < kEnemies; ++e) {
      if (eshot_live_[e]) {
        eshot_x_[e] += eshot_vx_[e];
        if (eshot_x_[e] < 0.0f || eshot_x_[e] > 84.0f) {
          eshot_live_[e] = false;
        } else if (overlap(px_, py_, kPlayerW, kPlayerH, eshot_x_[e] - 1.0f,
                           eshot_y_[e] - 1.0f, 2.0f, 2.0f)) {
          reward += lose_life();
          return reward;
        }
      }
      if (bomb_live_[e]) {
        bomb_y_[e] += kBombV;
        if (bomb_y_[e] >= kTruckY) {
          bomb_live_[e] = false;
          for (int t = 0; t < kTrucks; ++t) {
            if (truck_alive_[t] && std::fabs(truck_x_[t] + kTruckW / 2.0f -
                                             bomb_x_[e]) < 5.0f) {
              truck_alive_[t] = false;
              break;
            }
          }
        }
      }
    }

    // Wave cleared: bonus per surviving truck, faster wave respawns.
    if (alive_enemies == 0) {
      int bonus = 0;
      for (int t = 0; t < kTrucks; ++t)
        if (truck_alive_[t]) bonus += 100;
      reward += static_cast<float>(bonus);
      score_ += bonus;
      ++wave_;
      start_wave();
    }
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    // Ground.
    for (int y = 78; y < 80; ++y)
      for (int x = 0; x < kScreen; ++x) f[y * kScreen + x] = 100;
    // Trucks.
    for (int t = 0; t < kTrucks; ++t)
      if (truck_alive_[t])
        draw_rect(f, truck_x_[t], kTruckY, kTruckW, kTruckH, 120);
    // Enemies (jets brighter than helicopters).
    for (int e = 0; e < kEnemies; ++e)
      if (enemy_alive_[e])
        draw_rect(f, ex_[e], kEnemyRowY[e], kEnemyW, kEnemyH,
                  e % 2 == 0 ? 170 : 150);
    // Shots and bombs.
    if (shot_live_) draw_rect(f, shot_x_ - 1.0f, shot_y_ - 1.0f, 2.0f, 2.0f, 220);
    for (int e = 0; e < kEnemies; ++e) {
      if (eshot_live_[e])
        draw_rect(f, eshot_x_[e] - 1.0f, eshot_y_[e] - 1.0f, 2.0f, 2.0f, 210);
      if (bomb_live_[e])
        draw_rect(f, bomb_x_[e] - 1.0f, bomb_y_[e], 2.0f, 3.0f, 200);
    }
    // Player.
    draw_rect(f, px_, py_, kPlayerW, kPlayerH, 255);
    // Score ticks and lives pips.
    for (int s = 0; s < score_ / 100 && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
    for (int l = 0; l < lives_ && l < kLives; ++l)
      for (int k = 0; k < 3; ++k) f[82 * kScreen + 2 + l * 5 + k] = 160;
  }

  bool game_over() const override { return over_; }
  int lives() const override { return lives_; }
  int minimal_actions() const override { return 18; }
  int minimal_to_full(int a) const override { return a < 0 || a >= 18 ? 0 : a; }

 private:
  static bool overlap(float ax, float ay, float aw, float ah,
                      float bx, float by, float bw, float bh) {
    return ax + aw > bx && ax < bx + bw && ay + ah > by && ay < by + bh;
  }

  float lose_life() {
    --lives_;
    if (lives_ <= 0) {
      over_ = true;
      return 0.0f;
    }
    respawn();
    return 0.0f;
  }

  void respawn() {
    px_ = 20.0f;
    py_ = 50.0f;
    facing_ = 1.0f;
    shot_live_ = false;
    for (int e = 0; e < kEnemies; ++e) {
      eshot_live_[e] = false;
      bomb_live_[e] = false;
    }
  }

  void start_wave() {
    for (int e = 0; e < kEnemies; ++e) {
      enemy_alive_[e] = true;
      ex_[e] = kEnemyX0[e];
      edir_[e] = kEnemyD0[e];
      eshot_live_[e] = false;
      bomb_live_[e] = false;
    }
  }

  static void draw_rect(uint8_t* f, float fx, float fy, float fw, float fh, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + fw), y1 = static_cast<int>(fy + fh);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  float px_ = 20.0f, py_ = 50.0f, facing_ = 1.0f;
  bool shot_live_ = false;
  float shot_x_ = 0.0f, shot_y_ = 0.0f, shot_vx_ = 0.0f;
  float ex_[kEnemies] = {}, edir_[kEnemies] = {};
  bool enemy_alive_[kEnemies] = {};
  bool eshot_live_[kEnemies] = {};
  float eshot_x_[kEnemies] = {}, eshot_y_[kEnemies] = {}, eshot_vx_[kEnemies] = {};
  bool bomb_live_[kEnemies] = {};
  float bomb_x_[kEnemies] = {}, bomb_y_[kEnemies] = {};
  float truck_x_[kTrucks] = {};
  bool truck_alive_[kTrucks] = {};
  int wave_ = 0;
  int lives_ = kLives;
  int score_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_chopper_command_game() {
  return std::make_unique<ChopperCommandGame>();
}

}  // namespace cleanba
