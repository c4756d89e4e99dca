// Robotank — from-scratch C++ clone with the classic mechanics: squad-on-
// squad tank combat in fog; enemy tanks close in from the arena edges and
// fire aimed shells (+1 per kill — Robotank counts hulls, not points), and
// your own tank soaks hits until the squadron is gone. Flattened to the
// same top-down duel view as our Battle Zone, but with a drifting fog bank
// that hides enemies, squad-based lives, and no cover.
//
// Stands in for EnvPool's ALE Robotank-v5 in the reference's benchmark
// configs (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs are
// not available here, so the engine provides a rules-true clone with
// identical protocol semantics (sticky actions / frameskip / stacking are
// applied by AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave11.py and must mirror these rules exactly.

#include <cmath>
#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr int kHeadings = 16;
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
constexpr int kEnemies = 3;
constexpr float kTank = 5.0f;
constexpr float kDrive = 0.9f;
constexpr float kESpeed = 0.45f;
constexpr int kRotFrames = 2;
constexpr float kShotV = 2.8f;
constexpr float kEShotV = 1.6f;
constexpr int kEFirePeriod = 110;
constexpr int kSpawnPeriod = 240;
constexpr int kSquad = 4;  // our tanks (lives)
constexpr float kFogH = 14.0f;

class RobotankGame : public Game {
 public:
  void reset_game(PCG32&) override {
    squad_ = kSquad;
    score_ = 0;
    kills_ = 0;
    over_ = false;
    fog_y_ = 20.0f;
    fog_v_ = 0.2f;
    respawn();
    for (int e = 0; e < kEnemies; ++e) enemy_live_[e] = false;
    spawn_clock_ = kSpawnPeriod;
  }

  float act(const AleAction& a, PCG32& rng) override {
    if (over_) return 0.0f;
    float reward = 0.0f;

    if (a.dx != 0) {
      if (++rot_cd_ >= kRotFrames) {
        rot_cd_ = 0;
        heading_ = (heading_ + (a.dx > 0 ? 1 : kHeadings - 1)) % kHeadings;
      }
    } else {
      rot_cd_ = kRotFrames - 1;
    }
    float drive = a.dy < 0 ? kDrive : (a.dy > 0 ? -kDrive : 0.0f);
    px_ = clampf(px_ + kHX[heading_] * drive, 2.0f, 82.0f - kTank);
    py_ = clampf(py_ + kHY[heading_] * drive, 2.0f, 82.0f - kTank);

    // The fog bank drifts up and down the arena.
    fog_y_ += fog_v_;
    if (fog_y_ < 8.0f || fog_y_ + kFogH > 76.0f) fog_v_ = -fog_v_;

    if (a.fire && !shot_live_) {
      shot_live_ = true;
      shot_x_ = px_ + kTank / 2.0f + kHX[heading_] * 3.5f;
      shot_y_ = py_ + kTank / 2.0f + kHY[heading_] * 3.5f;
      shot_vx_ = kHX[heading_] * kShotV;
      shot_vy_ = kHY[heading_] * kShotV;
    }
    if (shot_live_) {
      shot_x_ += shot_vx_;
      shot_y_ += shot_vy_;
      if (shot_x_ < 0 || shot_x_ >= 84 || shot_y_ < 0 || shot_y_ >= 84)
        shot_live_ = false;
    }

    if (++spawn_clock_ >= kSpawnPeriod) {
      spawn_clock_ = 0;
      for (int e = 0; e < kEnemies; ++e) {
        if (enemy_live_[e]) continue;
        enemy_live_[e] = true;
        int edge = static_cast<int>(rng.randint(4));
        float t = 6.0f + static_cast<float>(rng.randint(66));
        ex_[e] = edge < 2 ? t : (edge == 2 ? 3.0f : 76.0f);
        ey_[e] = edge == 0 ? 3.0f : (edge == 1 ? 76.0f : t);
        efire_[e] = static_cast<int>(rng.randint(kEFirePeriod));
        eshot_live_[e] = false;
        break;
      }
    }

    for (int e = 0; e < kEnemies; ++e) {
      if (!enemy_live_[e]) continue;
      float dx = px_ - ex_[e], dy = py_ - ey_[e];
      float n = std::sqrt(dx * dx + dy * dy) + 1e-3f;
      // Enemies hold a standoff ring rather than ramming.
      if (n > 18.0f) {
        ex_[e] += dx / n * kESpeed;
        ey_[e] += dy / n * kESpeed;
      } else {
        // strafe around the ring
        ex_[e] += -dy / n * kESpeed;
        ey_[e] += dx / n * kESpeed;
      }
      if (!eshot_live_[e] && ++efire_[e] >= kEFirePeriod) {
        efire_[e] = 0;
        eshot_live_[e] = true;
        eshot_x_[e] = ex_[e] + kTank / 2.0f;
        eshot_y_[e] = ey_[e] + kTank / 2.0f;
        eshot_vx_[e] = dx / n * kEShotV;
        eshot_vy_[e] = dy / n * kEShotV;
      }
      if (shot_live_ && shot_x_ >= ex_[e] && shot_x_ < ex_[e] + kTank &&
          shot_y_ >= ey_[e] && shot_y_ < ey_[e] + kTank) {
        shot_live_ = false;
        enemy_live_[e] = false;
        reward += 1.0f;  // Robotank scores hulls
        score_ += 1;
        ++kills_;
        if (kills_ % 12 == 0 && squad_ < kSquad) ++squad_;  // bonus tank
      }
    }

    for (int e = 0; e < kEnemies; ++e) {
      if (!eshot_live_[e]) continue;
      eshot_x_[e] += eshot_vx_[e];
      eshot_y_[e] += eshot_vy_[e];
      if (eshot_x_[e] < 0 || eshot_x_[e] >= 84 || eshot_y_[e] < 0 ||
          eshot_y_[e] >= 84) {
        eshot_live_[e] = false;
        continue;
      }
      if (px_ + kTank > eshot_x_[e] - 1.0f && px_ < eshot_x_[e] + 1.0f &&
          py_ + kTank > eshot_y_[e] - 1.0f && py_ < eshot_y_[e] + 1.0f) {
        reward += lose_tank();
        return reward;
      }
    }
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    for (int e = 0; e < kEnemies; ++e) {
      if (!enemy_live_[e]) continue;
      // Fog hides enemies inside the bank.
      bool fogged = ey_[e] + kTank > fog_y_ && ey_[e] < fog_y_ + kFogH;
      if (!fogged) draw_rect(f, ex_[e], ey_[e], kTank, kTank, 170);
      if (eshot_live_[e])
        draw_rect(f, eshot_x_[e] - 1.0f, eshot_y_[e] - 1.0f, 2.0f, 2.0f, 210);
    }
    // The fog bank itself.
    for (int y = static_cast<int>(fog_y_);
         y < static_cast<int>(fog_y_ + kFogH) && y < kScreen; y += 3)
      for (int x = 2; x < 82; x += 2) f[y * kScreen + x] = 50;
    if (shot_live_) draw_rect(f, shot_x_ - 1.0f, shot_y_ - 1.0f, 2.0f, 2.0f, 220);
    draw_rect(f, px_, py_, kTank, kTank, 255);
    draw_rect(f, px_ + 1.5f + kHX[heading_] * 3.5f,
              py_ + 1.5f + kHY[heading_] * 3.5f, 2.0f, 2.0f, 255);
    for (int s = 0; s < score_ && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
    for (int l = 0; l < squad_ && l < kSquad; ++l)
      for (int k = 0; k < 3; ++k) f[82 * kScreen + 2 + l * 5 + k] = 160;
  }

  bool game_over() const override { return over_; }
  int lives() const override { return squad_; }
  int minimal_actions() const override { return 18; }
  int minimal_to_full(int a) const override { return a < 0 || a >= 18 ? 0 : a; }

 private:
  static float clampf(float v, float lo, float hi) {
    return v < lo ? lo : (v > hi ? hi : v);
  }

  float lose_tank() {
    --squad_;
    if (squad_ <= 0) {
      over_ = true;
      return 0.0f;
    }
    respawn();
    return 0.0f;
  }

  void respawn() {
    px_ = 39.5f;
    py_ = 39.5f;
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

  float px_ = 39.5f, py_ = 39.5f;
  int heading_ = 0, rot_cd_ = 0;
  bool shot_live_ = false;
  float shot_x_ = 0, shot_y_ = 0, shot_vx_ = 0, shot_vy_ = 0;
  bool enemy_live_[kEnemies] = {};
  float ex_[kEnemies] = {}, ey_[kEnemies] = {};
  int efire_[kEnemies] = {};
  bool eshot_live_[kEnemies] = {};
  float eshot_x_[kEnemies] = {}, eshot_y_[kEnemies] = {};
  float eshot_vx_[kEnemies] = {}, eshot_vy_[kEnemies] = {};
  float fog_y_ = 20.0f, fog_v_ = 0.2f;
  int spawn_clock_ = 0;
  int squad_ = kSquad;
  int kills_ = 0;
  int score_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_robotank_game() { return std::make_unique<RobotankGame>(); }

}  // namespace cleanba
