// Defender — from-scratch C++ clone with the classic mechanics: landers
// descend toward the humanoids on the planet surface (+150 when shot); one
// that grabs a humanoid climbs away and mutates into a faster hunter
// (+150). Lose a life to any contact or enemy fire; the colony survives as
// long as you do.
//
// Stands in for EnvPool's ALE Defender-v5 in the reference's benchmark
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

constexpr int kLanders = 4;
constexpr int kHumanoids = 4;
constexpr float kLanderW = 5.0f, kLanderH = 4.0f;
constexpr float kHumW = 3.0f, kHumH = 5.0f;
constexpr float kGroundY = 76.0f;
constexpr float kPlayerW = 7.0f, kPlayerH = 4.0f;
constexpr float kMoveX = 1.3f, kMoveY = 1.1f;
constexpr float kShotV = 3.2f;
constexpr float kEShotV = 1.6f;
constexpr int kSpawnPeriod = 160;
constexpr int kLives = 3;

class DefenderGame : public Game {
 public:
  void reset_game(PCG32&) override {
    wave_ = 0;
    lives_ = kLives;
    score_ = 0;
    over_ = false;
    for (int h = 0; h < kHumanoids; ++h) {
      hum_alive_[h] = true;
      hum_x_[h] = 10.0f + static_cast<float>(h) * 20.0f;
    }
    start_wave();
    respawn();
  }

  float act(const AleAction& a, PCG32& rng) override {
    if (over_) return 0.0f;
    float reward = 0.0f;
    float espeed = 0.35f + 0.06f * static_cast<float>(wave_);

    px_ += static_cast<float>(a.dx) * kMoveX;
    py_ += static_cast<float>(a.dy) * kMoveY;
    if (a.dx != 0) facing_ = a.dx > 0 ? 1.0f : -1.0f;
    if (px_ < 2.0f) px_ = 2.0f;
    if (px_ > 82.0f - kPlayerW) px_ = 82.0f - kPlayerW;
    if (py_ < 12.0f) py_ = 12.0f;
    if (py_ > kGroundY - kPlayerH) py_ = kGroundY - kPlayerH;

    if (a.fire && !shot_live_) {
      shot_live_ = true;
      shot_x_ = px_ + kPlayerW / 2.0f;
      shot_y_ = py_ + kPlayerH / 2.0f;
      shot_vx_ = facing_ * kShotV;
    }
    if (shot_live_) {
      shot_x_ += shot_vx_;
      if (shot_x_ < 0.0f || shot_x_ >= 84.0f) shot_live_ = false;
    }

    // Reinforce the wave.
    if (++spawn_clock_ >= kSpawnPeriod) {
      spawn_clock_ = 0;
      for (int e = 0; e < kLanders; ++e) {
        if (lander_alive_[e]) continue;
        lander_alive_[e] = true;
        mutant_[e] = false;
        carrying_[e] = -1;
        lx_[e] = rng.uniform() * 70.0f + 5.0f;
        ly_[e] = 12.0f;
        break;
      }
    }

    for (int e = 0; e < kLanders; ++e) {
      if (!lander_alive_[e]) continue;
      if (mutant_[e]) {
        // Mutants hunt the ship.
        float dx = px_ - lx_[e], dy = py_ - ly_[e];
        float n = std::sqrt(dx * dx + dy * dy) + 1e-3f;
        lx_[e] += dx / n * (espeed * 2.2f);
        ly_[e] += dy / n * (espeed * 2.2f);
      } else if (carrying_[e] >= 0) {
        // Abduction: climb; mutate at the top.
        ly_[e] -= espeed;
        hum_x_[carrying_[e]] = lx_[e] + 1.0f;
        if (ly_[e] <= 12.0f) {
          hum_alive_[carrying_[e]] = false;
          carrying_[e] = -1;
          mutant_[e] = true;
        }
      } else {
        // Descend toward the nearest living humanoid.
        int target = -1;
        float best = 1e9f;
        for (int h = 0; h < kHumanoids; ++h) {
          if (!hum_alive_[h]) continue;
          float d = std::fabs(hum_x_[h] - lx_[e]);
          if (d < best) {
            best = d;
            target = h;
          }
        }
        if (target >= 0) {
          lx_[e] += (hum_x_[target] > lx_[e] ? 1.0f : -1.0f) * espeed * 0.7f;
          ly_[e] += espeed;
          if (ly_[e] + kLanderH >= kGroundY - kHumH && best < 3.0f) {
            carrying_[e] = target;
          }
        } else {
          ly_[e] += espeed;  // nothing left to steal: dive at the planet
          if (ly_[e] > kGroundY) mutant_[e] = true;
        }
      }
      // Lander fire.
      if (!eshot_live_[e] && std::fabs(ly_[e] - py_) < 5.0f &&
          rng.uniform() < 0.012f) {
        eshot_live_[e] = true;
        eshot_x_[e] = lx_[e] + kLanderW / 2.0f;
        eshot_y_[e] = ly_[e] + kLanderH / 2.0f;
        eshot_vx_[e] = (px_ >= lx_[e] ? 1.0f : -1.0f) * kEShotV;
      }
      // Our shot.
      if (shot_live_ && shot_x_ >= lx_[e] && shot_x_ < lx_[e] + kLanderW &&
          shot_y_ >= ly_[e] && shot_y_ < ly_[e] + kLanderH) {
        shot_live_ = false;
        if (carrying_[e] >= 0) carrying_[e] = -1;  // the humanoid drops free
        lander_alive_[e] = false;
        reward += 150.0f;
        score_ += 150;
        continue;
      }
      // Contact.
      if (px_ + kPlayerW > lx_[e] && px_ < lx_[e] + kLanderW &&
          py_ + kPlayerH > ly_[e] && py_ < ly_[e] + kLanderH) {
        reward += lose_life();
        return reward;
      }
    }

    // Enemy shots.
    for (int e = 0; e < kLanders; ++e) {
      if (!eshot_live_[e]) continue;
      eshot_x_[e] += eshot_vx_[e];
      if (eshot_x_[e] < 0.0f || eshot_x_[e] >= 84.0f) {
        eshot_live_[e] = false;
        continue;
      }
      if (px_ + kPlayerW > eshot_x_[e] - 1.0f && px_ < eshot_x_[e] + 1.0f &&
          py_ + kPlayerH > eshot_y_[e] - 1.0f && py_ < eshot_y_[e] + 1.0f) {
        reward += lose_life();
        return reward;
      }
    }

    // Wave cleared?
    bool any = false;
    for (int e = 0; e < kLanders; ++e)
      if (lander_alive_[e]) any = true;
    if (!any && spawn_clock_ == 0) {
      // (a fresh spawn arrives on the next clock tick; waves advance when
      // the field stays clear through a full spawn period)
      ++wave_;
    }
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    for (int x = 0; x < kScreen; ++x) {
      f[static_cast<int>(kGroundY) * kScreen + x] = 100;
      f[(static_cast<int>(kGroundY) + 1) * kScreen + x] = 100;
    }
    for (int h = 0; h < kHumanoids; ++h)
      if (hum_alive_[h])
        draw_rect(f, hum_x_[h], kGroundY - kHumH, kHumW, kHumH, 130);
    for (int e = 0; e < kLanders; ++e) {
      if (lander_alive_[e])
        draw_rect(f, lx_[e], ly_[e], kLanderW, kLanderH, mutant_[e] ? 210 : 170);
      if (eshot_live_[e])
        draw_rect(f, eshot_x_[e] - 1.0f, eshot_y_[e] - 1.0f, 2.0f, 2.0f, 190);
    }
    if (shot_live_) draw_rect(f, shot_x_ - 1.0f, shot_y_ - 1.0f, 2.0f, 2.0f, 220);
    draw_rect(f, px_, py_, kPlayerW, kPlayerH, 255);
    for (int s = 0; s < score_ / 150 && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
    for (int l = 0; l < lives_ && l < kLives; ++l)
      for (int k = 0; k < 3; ++k) f[82 * kScreen + 2 + l * 5 + k] = 160;
  }

  bool game_over() const override { return over_; }
  int lives() const override { return lives_; }
  int minimal_actions() const override { return 18; }
  int minimal_to_full(int a) const override { return a < 0 || a >= 18 ? 0 : a; }

 private:
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
    px_ = 10.0f;
    py_ = 40.0f;
    facing_ = 1.0f;
    shot_live_ = false;
    for (int e = 0; e < kLanders; ++e) eshot_live_[e] = false;
  }

  void start_wave() {
    for (int e = 0; e < kLanders; ++e) {
      lander_alive_[e] = false;
      eshot_live_[e] = false;
      mutant_[e] = false;
      carrying_[e] = -1;
    }
    spawn_clock_ = kSpawnPeriod - 1;  // first lander arrives immediately
  }

  static void draw_rect(uint8_t* f, float fx, float fy, float fw, float fh, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + fw), y1 = static_cast<int>(fy + fh);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  float px_ = 10.0f, py_ = 40.0f, facing_ = 1.0f;
  bool shot_live_ = false;
  float shot_x_ = 0, shot_y_ = 0, shot_vx_ = 0;
  bool lander_alive_[kLanders] = {};
  bool mutant_[kLanders] = {};
  int carrying_[kLanders] = {};
  float lx_[kLanders] = {}, ly_[kLanders] = {};
  bool eshot_live_[kLanders] = {};
  float eshot_x_[kLanders] = {}, eshot_y_[kLanders] = {}, eshot_vx_[kLanders] = {};
  bool hum_alive_[kHumanoids] = {};
  float hum_x_[kHumanoids] = {};
  int spawn_clock_ = 0;
  int wave_ = 0;
  int lives_ = kLives;
  int score_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_defender_game() { return std::make_unique<DefenderGame>(); }

}  // namespace cleanba
