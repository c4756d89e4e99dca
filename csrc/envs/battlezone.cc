// Battle Zone — from-scratch C++ clone with the classic mechanics: drive a
// tank (rotate + forward/back), duel enemy tanks that stalk, aim, and fire
// (+1000 a kill), use the pyramids as cover. The 3D viewport is flattened
// to a top-down arena with the same duel dynamics.
//
// Stands in for EnvPool's ALE BattleZone-v5 in the reference's benchmark
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

constexpr int kHeadings = 16;
// Shared literals with asteroids.cc so both engines round alike.
const float kHX[kHeadings] = {
    0.0f,       0.3826834f,  0.7071068f,  0.9238795f,  1.0f,
    0.9238795f, 0.7071068f,  0.3826834f,  0.0f,        -0.3826834f,
    -0.7071068f, -0.9238795f, -1.0f,      -0.9238795f, -0.7071068f,
    -0.3826834f};
const float kHY[kHeadings] = {
    -1.0f,      -0.9238795f, -0.7071068f, -0.3826834f, 0.0f,
    0.3826834f, 0.7071068f,  0.9238795f,  1.0f,        0.9238795f,
    0.7071068f, 0.3826834f,  0.0f,        -0.3826834f, -0.7071068f,
    -0.9238795f};
constexpr int kEnemies = 2;
constexpr float kTank = 6.0f;
constexpr float kDrive = 0.8f;
constexpr float kESpeed = 0.4f;
constexpr int kRotFrames = 3;
constexpr float kShotV = 2.5f;
constexpr float kEShotV = 1.8f;
constexpr int kEFirePeriod = 140;
constexpr int kSpawnPeriod = 300;
constexpr int kPyramids = 3;
const float kPyrX[kPyramids] = {16.0f, 60.0f, 38.0f};
const float kPyrY[kPyramids] = {20.0f, 28.0f, 60.0f};
constexpr float kPyrW = 8.0f, kPyrH = 8.0f;
constexpr int kLives = 3;

class BattleZoneGame : public Game {
 public:
  void reset_game(PCG32&) override {
    lives_ = kLives;
    score_ = 0;
    over_ = false;
    respawn();
    for (int e = 0; e < kEnemies; ++e) enemy_live_[e] = false;
    spawn_clock_ = kSpawnPeriod;  // first enemy arrives immediately
  }

  float act(const AleAction& a, PCG32& rng) override {
    if (over_) return 0.0f;
    float reward = 0.0f;

    // Tank: rotate on dx, drive on dy (UP forward along the heading).
    if (a.dx != 0) {
      if (++rot_cd_ >= kRotFrames) {
        rot_cd_ = 0;
        heading_ = (heading_ + (a.dx > 0 ? 1 : kHeadings - 1)) % kHeadings;
      }
    } else {
      rot_cd_ = kRotFrames - 1;
    }
    float drive = a.dy < 0 ? kDrive : (a.dy > 0 ? -kDrive : 0.0f);
    float npx = px_ + kHX[heading_] * drive;
    float npy = py_ + kHY[heading_] * drive;
    if (!hits_pyramid(npx, npy, kTank) && npx >= 2.0f && npx <= 82.0f - kTank &&
        npy >= 2.0f && npy <= 82.0f - kTank) {
      px_ = npx;
      py_ = npy;
    }

    // Cannon.
    if (a.fire && !shot_live_) {
      shot_live_ = true;
      shot_x_ = px_ + kTank / 2.0f + kHX[heading_] * 4.0f;
      shot_y_ = py_ + kTank / 2.0f + kHY[heading_] * 4.0f;
      shot_vx_ = kHX[heading_] * kShotV;
      shot_vy_ = kHY[heading_] * kShotV;
    }
    if (shot_live_) {
      shot_x_ += shot_vx_;
      shot_y_ += shot_vy_;
      if (shot_x_ < 0 || shot_x_ >= 84 || shot_y_ < 0 || shot_y_ >= 84 ||
          hits_pyramid(shot_x_ - 1.0f, shot_y_ - 1.0f, 2.0f))
        shot_live_ = false;
    }

    // Enemy tanks spawn at a random arena edge.
    if (++spawn_clock_ >= kSpawnPeriod) {
      spawn_clock_ = 0;
      for (int e = 0; e < kEnemies; ++e) {
        if (enemy_live_[e]) continue;
        enemy_live_[e] = true;
        int edge = static_cast<int>(rng.randint(4));
        float t = 6.0f + static_cast<float>(rng.randint(66));
        ex_[e] = edge == 0 ? t : (edge == 1 ? t : (edge == 2 ? 2.0f : 76.0f));
        ey_[e] = edge == 0 ? 2.0f : (edge == 1 ? 76.0f : t);
        efire_[e] = 0;
        eshot_live_[e] = false;
        break;
      }
    }

    for (int e = 0; e < kEnemies; ++e) {
      if (!enemy_live_[e]) continue;
      // Stalk the player; pyramids block.
      float dx = px_ - ex_[e], dy = py_ - ey_[e];
      float n = std::sqrt(dx * dx + dy * dy) + 1e-3f;
      float nex = ex_[e] + dx / n * kESpeed;
      float ney = ey_[e] + dy / n * kESpeed;
      if (!hits_pyramid(nex, ney, kTank)) {
        ex_[e] = nex;
        ey_[e] = ney;
      }
      // Fire on a clock when roughly in range.
      if (!eshot_live_[e] && ++efire_[e] >= kEFirePeriod && n < 70.0f) {
        efire_[e] = 0;
        eshot_live_[e] = true;
        eshot_x_[e] = ex_[e] + kTank / 2.0f;
        eshot_y_[e] = ey_[e] + kTank / 2.0f;
        eshot_vx_[e] = dx / n * kEShotV;
        eshot_vy_[e] = dy / n * kEShotV;
      }
      // Our shell?
      if (shot_live_ && shot_x_ >= ex_[e] && shot_x_ < ex_[e] + kTank &&
          shot_y_ >= ey_[e] && shot_y_ < ey_[e] + kTank) {
        shot_live_ = false;
        enemy_live_[e] = false;
        reward += 1000.0f;
        score_ += 1000;
        continue;
      }
      // Ramming loses the duel.
      if (px_ + kTank > ex_[e] && px_ < ex_[e] + kTank &&
          py_ + kTank > ey_[e] && py_ < ey_[e] + kTank) {
        reward += lose_life();
        return reward;
      }
    }

    // Enemy shells.
    for (int e = 0; e < kEnemies; ++e) {
      if (!eshot_live_[e]) continue;
      eshot_x_[e] += eshot_vx_[e];
      eshot_y_[e] += eshot_vy_[e];
      if (eshot_x_[e] < 0 || eshot_x_[e] >= 84 || eshot_y_[e] < 0 ||
          eshot_y_[e] >= 84 ||
          hits_pyramid(eshot_x_[e] - 1.0f, eshot_y_[e] - 1.0f, 2.0f)) {
        eshot_live_[e] = false;
        continue;
      }
      if (px_ + kTank > eshot_x_[e] - 1.0f && px_ < eshot_x_[e] + 1.0f &&
          py_ + kTank > eshot_y_[e] - 1.0f && py_ < eshot_y_[e] + 1.0f) {
        reward += lose_life();
        return reward;
      }
    }
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    for (int p = 0; p < kPyramids; ++p)
      draw_rect(f, kPyrX[p], kPyrY[p], kPyrW, kPyrH, 110);
    for (int e = 0; e < kEnemies; ++e) {
      if (enemy_live_[e]) draw_rect(f, ex_[e], ey_[e], kTank, kTank, 170);
      if (eshot_live_[e])
        draw_rect(f, eshot_x_[e] - 1.0f, eshot_y_[e] - 1.0f, 2.0f, 2.0f, 210);
    }
    if (shot_live_) draw_rect(f, shot_x_ - 1.0f, shot_y_ - 1.0f, 2.0f, 2.0f, 220);
    // Hull + barrel marker for the heading.
    draw_rect(f, px_, py_, kTank, kTank, 255);
    draw_rect(f, px_ + 2.0f + kHX[heading_] * 4.0f,
              py_ + 2.0f + kHY[heading_] * 4.0f, 2.0f, 2.0f, 255);
    for (int s = 0; s < score_ / 1000 && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
    for (int l = 0; l < lives_ && l < kLives; ++l)
      for (int k = 0; k < 3; ++k) f[82 * kScreen + 2 + l * 5 + k] = 160;
  }

  bool game_over() const override { return over_; }
  int lives() const override { return lives_; }
  int minimal_actions() const override { return 18; }
  int minimal_to_full(int a) const override { return a < 0 || a >= 18 ? 0 : a; }

 private:
  static bool hits_pyramid(float fx, float fy, float size) {
    for (int p = 0; p < kPyramids; ++p)
      if (fx + size > kPyrX[p] && fx < kPyrX[p] + kPyrW &&
          fy + size > kPyrY[p] && fy < kPyrY[p] + kPyrH)
        return true;
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
    px_ = 39.0f;
    py_ = 39.0f;
    heading_ = 0;
    rot_cd_ = kRotFrames - 1;
    shot_live_ = false;
    for (int e = 0; e < kEnemies; ++e) eshot_live_[e] = false;
  }

  static void draw_rect(uint8_t* f, float fx, float fy, float fw, float fh, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + fw), y1 = static_cast<int>(fy + fh);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  float px_ = 39.0f, py_ = 39.0f;
  int heading_ = 0, rot_cd_ = 0;
  bool shot_live_ = false;
  float shot_x_ = 0, shot_y_ = 0, shot_vx_ = 0, shot_vy_ = 0;
  bool enemy_live_[kEnemies] = {};
  float ex_[kEnemies] = {}, ey_[kEnemies] = {};
  int efire_[kEnemies] = {};
  bool eshot_live_[kEnemies] = {};
  float eshot_x_[kEnemies] = {}, eshot_y_[kEnemies] = {};
  float eshot_vx_[kEnemies] = {}, eshot_vy_[kEnemies] = {};
  int spawn_clock_ = 0;
  int lives_ = kLives;
  int score_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_battlezone_game() { return std::make_unique<BattleZoneGame>(); }

}  // namespace cleanba
