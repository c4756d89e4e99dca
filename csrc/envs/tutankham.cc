// Tutankham — from-scratch C++ clone with the classic mechanics: tomb
// corridors connected by shafts, creatures streaming from the spawn portals
// (+5 when shot — the laser fires only horizontally), treasures worth +20,
// and the next tomb once every treasure is looted.
//
// Stands in for EnvPool's ALE Tutankham-v5 in the reference's benchmark
// configs (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs are
// not available here, so the engine provides a rules-true clone with
// identical protocol semantics (sticky actions / frameskip / stacking are
// applied by AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave10.py and must mirror these rules exactly.

#include <cmath>
#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr int kRows = 5;
const int kRowY[kRows] = {12, 26, 40, 54, 68};  // corridor tops, height 6
constexpr int kCorrH = 6;
// Vertical shafts: (x0, top row index, bottom row index), width 6.
constexpr int kShafts = 7;
const int kShaftX[kShafts] = {8, 64, 28, 48, 12, 60, 38};
const int kShaftA[kShafts] = {0, 0, 1, 2, 3, 3, 1};
const int kShaftB[kShafts] = {1, 1, 2, 3, 4, 4, 3};
constexpr int kTreasures = 6;
const float kTreasX[kTreasures] = {20.0f, 70.0f, 8.0f, 55.0f, 30.0f, 74.0f};
const int kTreasRow[kTreasures] = {0, 1, 2, 2, 4, 3};
constexpr int kCreatures = 6;
constexpr int kSpawnPeriod = 200;
constexpr float kPlayerW = 4.0f, kPlayerH = 4.0f;
constexpr float kWalk = 0.9f;
constexpr float kShotV = 2.5f;
constexpr int kLives = 3;

void build_walls(uint8_t* w) {
  std::memset(w, 1, kScreenPx);  // solid rock
  auto open = [&](int x0, int x1, int y0, int y1) {
    for (int y = y0; y < y1; ++y)
      for (int x = x0; x < x1; ++x) w[y * kScreen + x] = 0;
  };
  for (int r = 0; r < kRows; ++r) open(6, 78, kRowY[r], kRowY[r] + kCorrH);
  for (int s = 0; s < kShafts; ++s)
    open(kShaftX[s], kShaftX[s] + 6, kRowY[kShaftA[s]], kRowY[kShaftB[s]] + kCorrH);
}

class TutankhamGame : public Game {
 public:
  void reset_game(PCG32&) override {
    build_walls(walls_);
    level_ = 0;
    lives_ = kLives;
    score_ = 0;
    over_ = false;
    start_level();
    respawn();
  }

  float act(const AleAction& a, PCG32& rng) override {
    if (over_) return 0.0f;
    float reward = 0.0f;
    ++frame_;
    float cspeed = 0.5f + 0.1f * static_cast<float>(level_);

    // Player: per-axis movement blocked by rock.
    float nx = px_ + static_cast<float>(a.dx) * kWalk;
    if (!box_hits_wall(nx, py_)) px_ = nx;
    float ny = py_ + static_cast<float>(a.dy) * kWalk;
    if (!box_hits_wall(px_, ny)) py_ = ny;
    if (a.dx != 0) facing_ = a.dx > 0 ? 1.0f : -1.0f;

    // Laser: horizontal only (the game's signature constraint).
    if (a.fire && !shot_live_) {
      shot_live_ = true;
      shot_x_ = px_ + kPlayerW / 2.0f;
      shot_y_ = py_ + kPlayerH / 2.0f;
      shot_vx_ = facing_ * kShotV;
    }
    if (shot_live_) {
      shot_x_ += shot_vx_;
      if (shot_x_ < 0 || shot_x_ >= 84 ||
          walls_[static_cast<int>(shot_y_) * kScreen + static_cast<int>(shot_x_)])
        shot_live_ = false;
    }

    // Spawn portals feed creatures into rows 0 and 4.
    if (++spawn_clock_ >= kSpawnPeriod) {
      spawn_clock_ = 0;
      for (int c = 0; c < kCreatures; ++c) {
        if (cre_live_[c]) continue;
        cre_live_[c] = true;
        bool topside = rng.uniform() < 0.5f;
        cre_x_[c] = topside ? 7.0f : 73.0f;
        cre_y_[c] = static_cast<float>(kRowY[topside ? 0 : 4] + 1);
        break;
      }
    }

    // Creatures wander the corridors toward the player.
    for (int c = 0; c < kCreatures; ++c) {
      if (!cre_live_[c]) continue;
      float dx = px_ - cre_x_[c], dy = py_ - cre_y_[c];
      float sx = std::fabs(dx) >= std::fabs(dy) ? (dx > 0 ? 1.0f : -1.0f) : 0.0f;
      float sy = sx == 0.0f ? (dy > 0 ? 1.0f : -1.0f) : 0.0f;
      if (rng.uniform() < 0.1f) {  // wander
        if (rng.uniform() < 0.5f) { sx = rng.uniform() < 0.5f ? 1.0f : -1.0f; sy = 0.0f; }
        else { sy = rng.uniform() < 0.5f ? 1.0f : -1.0f; sx = 0.0f; }
      }
      float cx = cre_x_[c] + sx * cspeed, cy = cre_y_[c] + sy * cspeed;
      bool moved = false;
      if (sx != 0.0f && !box_hits_wall(cx, cre_y_[c])) {
        cre_x_[c] = cx;
        moved = true;
      }
      if (!moved && sy != 0.0f && !box_hits_wall(cre_x_[c], cy)) cre_y_[c] = cy;
      // Shot?
      if (shot_live_ && shot_x_ >= cre_x_[c] && shot_x_ < cre_x_[c] + 4.0f &&
          shot_y_ >= cre_y_[c] && shot_y_ < cre_y_[c] + 4.0f) {
        shot_live_ = false;
        cre_live_[c] = false;
        reward += 5.0f;
        score_ += 5;
        continue;
      }
      // Touch kills.
      if (px_ + kPlayerW > cre_x_[c] && px_ < cre_x_[c] + 4.0f &&
          py_ + kPlayerH > cre_y_[c] && py_ < cre_y_[c] + 4.0f) {
        reward += lose_life();
        return reward;
      }
    }

    // Treasures.
    int left = 0;
    for (int t = 0; t < kTreasures; ++t) {
      if (!treas_live_[t]) continue;
      float ty = static_cast<float>(kRowY[kTreasRow[t]] + 1);
      if (px_ + kPlayerW > kTreasX[t] && px_ < kTreasX[t] + 3.0f &&
          py_ + kPlayerH > ty && py_ < ty + 3.0f) {
        treas_live_[t] = false;
        reward += 20.0f;
        score_ += 20;
      } else {
        ++left;
      }
    }
    if (left == 0) {
      ++level_;
      start_level();
    }
    return reward;
  }

  void render(uint8_t* f) const override {
    for (int i = 0; i < kScreenPx; ++i) f[i] = walls_[i] ? 90 : 0;
    for (int t = 0; t < kTreasures; ++t)
      if (treas_live_[t])
        draw_rect(f, kTreasX[t], static_cast<float>(kRowY[kTreasRow[t]] + 1),
                  3.0f, 3.0f, 210);
    for (int c = 0; c < kCreatures; ++c)
      if (cre_live_[c]) draw_rect(f, cre_x_[c], cre_y_[c], 4.0f, 4.0f, 170);
    if (shot_live_) draw_rect(f, shot_x_ - 1.0f, shot_y_ - 1.0f, 2.0f, 2.0f, 220);
    draw_rect(f, px_, py_, kPlayerW, kPlayerH, 255);
    for (int s = 0; s < score_ / 5 && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
    for (int l = 0; l < lives_ && l < kLives; ++l)
      for (int k = 0; k < 3; ++k) f[82 * kScreen + 2 + l * 5 + k] = 160;
  }

  bool game_over() const override { return over_; }
  int lives() const override { return lives_; }
  int minimal_actions() const override { return 8; }
  int minimal_to_full(int a) const override {
    // NOOP UP RIGHT LEFT DOWN RIGHTFIRE LEFTFIRE FIRE
    static const int map[8] = {0, 2, 3, 4, 5, 11, 12, 1};
    return map[a < 0 || a >= 8 ? 0 : a];
  }

 private:
  bool box_hits_wall(float fx, float fy) const {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + kPlayerW), y1 = static_cast<int>(fy + kPlayerH);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        if (walls_[y * kScreen + x]) return true;
    return false;
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
    px_ = 40.0f;
    py_ = static_cast<float>(kRowY[2] + 1);
    facing_ = 1.0f;
    shot_live_ = false;
    for (int c = 0; c < kCreatures; ++c) cre_live_[c] = false;
    spawn_clock_ = 0;
  }

  void start_level() {
    for (int t = 0; t < kTreasures; ++t) treas_live_[t] = true;
    frame_ = 0;
  }

  static void draw_rect(uint8_t* f, float fx, float fy, float fw, float fh, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + fw), y1 = static_cast<int>(fy + fh);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  uint8_t walls_[kScreenPx] = {};
  float px_ = 40.0f, py_ = 41.0f, facing_ = 1.0f;
  bool shot_live_ = false;
  float shot_x_ = 0, shot_y_ = 0, shot_vx_ = 0;
  bool cre_live_[kCreatures] = {};
  float cre_x_[kCreatures] = {}, cre_y_[kCreatures] = {};
  bool treas_live_[kTreasures] = {};
  int spawn_clock_ = 0;
  int frame_ = 0;
  int level_ = 0;
  int lives_ = kLives;
  int score_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_tutankham_game() { return std::make_unique<TutankhamGame>(); }

}  // namespace cleanba
