// Time Pilot — from-scratch C++ arena dogfight with the classic mechanics:
// the time ship sits at screen centre and rotates through eight headings,
// the world scrolls past underneath, and waves of enemy craft wheel in from
// every side; clear a wave to jump to the next era for a bonus.
//
// Stands in for EnvPool's ALE TimePilot-v5 in the reference's benchmark
// configs (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs are
// not available here, so the engine provides a rules-true clone with
// identical protocol semantics (sticky actions / frameskip / stacking are
// applied by AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave7.py and must mirror these rules exactly —
// including the eight-heading table and the wave/era structure.

#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr float kCx = 42.0f, kCy = 42.0f;  // ship is pinned at centre
constexpr int kEnemies = 6;
constexpr int kPlayerShots = 2;
constexpr int kEnemyShots = 3;
constexpr float kScroll = 1.1f;      // world speed along the ship heading
constexpr float kEnemySpeed = 0.8f;
constexpr float kShotSpeed = 3.0f;
constexpr int kStartLives = 3;
constexpr float kKillReward = 100.0f;
constexpr float kWaveBonus = 1000.0f;
constexpr int kWaveKills = 8;
constexpr int kRespawnHold = 50;

// Eight headings, joystick order: 0 up, 1 up-right, 2 right, ... 7 up-left.
// Components scaled so diagonals move at ~the same speed (5/7 ≈ 0.714).
const float kHx[8] = {0.0f, 0.714f, 1.0f, 0.714f, 0.0f, -0.714f, -1.0f, -0.714f};
const float kHy[8] = {-1.0f, -0.714f, 0.0f, 0.714f, 1.0f, 0.714f, 0.0f, -0.714f};

inline int heading_from(int dx, int dy, int fallback) {
  if (dx == 0 && dy == 0) return fallback;
  if (dx == 0) return dy < 0 ? 0 : 4;
  if (dy == 0) return dx > 0 ? 2 : 6;
  if (dx > 0) return dy < 0 ? 1 : 3;
  return dy < 0 ? 7 : 5;
}

class TimePilotGame : public Game {
 public:
  void reset_game(PCG32& rng) override {
    lives_ = kStartLives;
    score_ = 0;
    era_ = 0;
    over_ = false;
    heading_ = 0;
    kills_ = 0;
    hold_ = 0;
    world_x_ = 0.0f;
    world_y_ = 0.0f;
    for (int i = 0; i < kPlayerShots; ++i) pshot_live_[i] = false;
    for (int i = 0; i < kEnemyShots; ++i) eshot_live_[i] = false;
    for (int i = 0; i < kEnemies; ++i) spawn_enemy(i, rng, true);
  }

  float act(const AleAction& a, PCG32& rng) override {
    if (over_) return 0.0f;
    float reward = 0.0f;
    if (hold_ > 0) { --hold_; return 0.0f; }  // respawn pause after a hit

    // ---- steering: the joystick sets the heading directly -----------------
    heading_ = heading_from(a.dx, a.dy, heading_);
    float wx = kHx[heading_] * kScroll, wy = kHy[heading_] * kScroll;
    world_x_ += wx;
    world_y_ += wy;

    // ---- player fire ------------------------------------------------------
    if (a.fire) {
      for (int i = 0; i < kPlayerShots; ++i) {
        if (pshot_live_[i]) continue;
        pshot_live_[i] = true;
        pshot_x_[i] = kCx;
        pshot_y_[i] = kCy;
        pshot_vx_[i] = kHx[heading_] * kShotSpeed;
        pshot_vy_[i] = kHy[heading_] * kShotSpeed;
        break;
      }
    }

    // ---- enemies: drift with the world and wheel toward the ship ----------
    for (int e = 0; e < kEnemies; ++e) {
      // Blend current velocity toward the ship with a per-era agility.
      float dx = kCx - ex_[e], dy = kCy - ey_[e];
      float inv = 1.0f / (absf(dx) + absf(dy) + 1e-3f);
      float blend = 0.04f + 0.01f * static_cast<float>(era_ > 3 ? 3 : era_);
      evx_[e] += (dx * inv * kEnemySpeed - evx_[e]) * blend;
      evy_[e] += (dy * inv * kEnemySpeed - evy_[e]) * blend;
      ex_[e] += evx_[e] - wx;
      ey_[e] += evy_[e] - wy;
      // Scrolled far off-screen: re-enter on a fresh edge.
      if (ex_[e] < -20.0f || ex_[e] > 104.0f || ey_[e] < -20.0f || ey_[e] > 104.0f)
        spawn_enemy(e, rng, false);
      // Occasional aimed shot.
      if (rng.uniform() < 0.004f) {
        for (int i = 0; i < kEnemyShots; ++i) {
          if (eshot_live_[i]) continue;
          eshot_live_[i] = true;
          eshot_x_[i] = ex_[e];
          eshot_y_[i] = ey_[e];
          float d2x = kCx - ex_[e], d2y = kCy - ey_[e];
          float inv2 = 1.0f / (absf(d2x) + absf(d2y) + 1e-3f);
          eshot_vx_[i] = d2x * inv2 * 2.0f;
          eshot_vy_[i] = d2y * inv2 * 2.0f;
          break;
        }
      }
    }

    // ---- player shots: fly straight, kill on contact ----------------------
    for (int i = 0; i < kPlayerShots; ++i) {
      if (!pshot_live_[i]) continue;
      pshot_x_[i] += pshot_vx_[i] - wx;
      pshot_y_[i] += pshot_vy_[i] - wy;
      if (pshot_x_[i] < 0 || pshot_x_[i] >= 84 || pshot_y_[i] < 0 || pshot_y_[i] >= 84) {
        pshot_live_[i] = false;
        continue;
      }
      for (int e = 0; e < kEnemies; ++e) {
        float ddx = pshot_x_[i] - ex_[e], ddy = pshot_y_[i] - ey_[e];
        if (ddx > -3.5f && ddx < 3.5f && ddy > -3.0f && ddy < 3.0f) {
          pshot_live_[i] = false;
          reward += kKillReward;
          ++kills_;
          spawn_enemy(e, rng, false);
          if (kills_ >= kWaveKills) {  // era cleared
            reward += kWaveBonus;
            ++era_;
            kills_ = 0;
            for (int j = 0; j < kEnemies; ++j) spawn_enemy(j, rng, true);
            for (int j = 0; j < kEnemyShots; ++j) eshot_live_[j] = false;
          }
          break;
        }
      }
    }

    // ---- enemy shots and rammings -----------------------------------------
    bool hit = false;
    for (int i = 0; i < kEnemyShots; ++i) {
      if (!eshot_live_[i]) continue;
      eshot_x_[i] += eshot_vx_[i] - wx;
      eshot_y_[i] += eshot_vy_[i] - wy;
      if (eshot_x_[i] < 0 || eshot_x_[i] >= 84 || eshot_y_[i] < 0 || eshot_y_[i] >= 84) {
        eshot_live_[i] = false;
        continue;
      }
      float ddx = eshot_x_[i] - kCx, ddy = eshot_y_[i] - kCy;
      if (ddx > -3.0f && ddx < 3.0f && ddy > -3.0f && ddy < 3.0f) {
        eshot_live_[i] = false;
        hit = true;
      }
    }
    for (int e = 0; e < kEnemies; ++e) {
      float ddx = ex_[e] - kCx, ddy = ey_[e] - kCy;
      if (ddx > -4.0f && ddx < 4.0f && ddy > -3.5f && ddy < 3.5f) {
        spawn_enemy(e, rng, false);
        hit = true;
      }
    }
    if (hit) {
      if (--lives_ <= 0) over_ = true;
      hold_ = kRespawnHold;
      for (int i = 0; i < kEnemyShots; ++i) eshot_live_[i] = false;
    }

    score_ += static_cast<int>(reward);
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    // Cloud field: world-anchored dots give the scroll its motion parallax.
    for (int k = 0; k < 24; ++k) {
      float cx = cloud_x(k), cy = cloud_y(k);
      int x = wrap84(cx - world_x_), y = wrap84(cy - world_y_);
      fill(f, x, y, 2, 1, 50);
    }
    for (int e = 0; e < kEnemies; ++e)
      fill(f, static_cast<int>(ex_[e]) - 2, static_cast<int>(ey_[e]) - 1, 5, 3, 160);
    for (int i = 0; i < kPlayerShots; ++i)
      if (pshot_live_[i])
        fill(f, static_cast<int>(pshot_x_[i]), static_cast<int>(pshot_y_[i]), 2, 2, 255);
    for (int i = 0; i < kEnemyShots; ++i)
      if (eshot_live_[i])
        fill(f, static_cast<int>(eshot_x_[i]), static_cast<int>(eshot_y_[i]), 2, 2, 120);
    // The ship: a 5x4 block with a heading pip.
    if (hold_ % 2 == 0) {  // blink while respawning
      fill(f, static_cast<int>(kCx) - 2, static_cast<int>(kCy) - 2, 5, 4, 224);
      fill(f, static_cast<int>(kCx + kHx[heading_] * 3.0f) - 1,
           static_cast<int>(kCy + kHy[heading_] * 3.0f) - 1, 2, 2, 255);
    }
    for (int s = 0; s < score_ / 200 && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
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
  static float absf(float v) { return v < 0 ? -v : v; }
  static int wrap84(float v) {
    int i = static_cast<int>(v) % 84;
    return i < 0 ? i + 84 : i;
  }
  // Deterministic cloud positions (identical across engines).
  static float cloud_x(int k) { return static_cast<float>((k * 37 + 11) % 84); }
  static float cloud_y(int k) { return static_cast<float>((k * 53 + 29) % 84); }

  void spawn_enemy(int e, PCG32& rng, bool initial) {
    // Enter from a random edge, flying inward.
    int edge = static_cast<int>(rng.randint(4));
    float along = rng.uniform() * 84.0f;
    switch (edge) {
      case 0: ex_[e] = along; ey_[e] = -6.0f; break;
      case 1: ex_[e] = along; ey_[e] = 90.0f; break;
      case 2: ex_[e] = -6.0f; ey_[e] = along; break;
      default: ex_[e] = 90.0f; ey_[e] = along; break;
    }
    float dx = kCx - ex_[e], dy = kCy - ey_[e];
    float inv = 1.0f / (absf(dx) + absf(dy) + 1e-3f);
    evx_[e] = dx * inv * kEnemySpeed;
    evy_[e] = dy * inv * kEnemySpeed;
    if (initial) {
      // First wave starts spread around the ring, already on-screen.
      ex_[e] = kCx + kHx[(e * 3) % 8] * 28.0f;
      ey_[e] = kCy + kHy[(e * 3) % 8] * 28.0f;
    }
  }

  static void fill(uint8_t* f, int x0, int y0, int w, int h, uint8_t v) {
    for (int y = y0 < 0 ? 0 : y0; y < y0 + h && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x0 + w && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  int heading_ = 0;
  float world_x_ = 0.0f, world_y_ = 0.0f;
  float ex_[kEnemies] = {}, ey_[kEnemies] = {}, evx_[kEnemies] = {}, evy_[kEnemies] = {};
  bool pshot_live_[kPlayerShots] = {};
  float pshot_x_[kPlayerShots] = {}, pshot_y_[kPlayerShots] = {};
  float pshot_vx_[kPlayerShots] = {}, pshot_vy_[kPlayerShots] = {};
  bool eshot_live_[kEnemyShots] = {};
  float eshot_x_[kEnemyShots] = {}, eshot_y_[kEnemyShots] = {};
  float eshot_vx_[kEnemyShots] = {}, eshot_vy_[kEnemyShots] = {};
  int kills_ = 0, hold_ = 0;
  int lives_ = kStartLives, score_ = 0, era_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_time_pilot_game() { return std::make_unique<TimePilotGame>(); }

}  // namespace cleanba
