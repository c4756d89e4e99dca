// Atlantis — from-scratch C++ arcade game with the classic mechanics: three
// fixed gun emplacements defend six city installations from enemy ships that
// sweep across four altitude bands; a ship that survives its lowest pass
// zaps an installation, and the game ends when the city is gone.
//
// Stands in for EnvPool's ALE Atlantis-v5 in the reference's benchmark
// configs (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs are
// not available here, so the engine provides a rules-true clone with
// identical protocol semantics (sticky actions / frameskip / stacking are
// applied by AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave4.py and must mirror these rules exactly.

#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr int kBands = 4;
constexpr int kShips = 4;  // concurrent ship slots
constexpr int kShipW = 7;
constexpr int kShipH = 4;
constexpr int kCity = 6;
constexpr int kCityW = 8;
constexpr int kCityH = 5;
constexpr int kCityY = 76;
// Deeper passes are worth more — the ship is closer to firing range.
const float kBandY[kBands] = {12.0f, 24.0f, 36.0f, 48.0f};
const float kBandSpeed[kBands] = {0.5f, 0.65f, 0.8f, 1.0f};
const float kBandScore[kBands] = {100.0f, 200.0f, 500.0f, 1000.0f};
const float kCityX[kCity] = {4.0f, 17.0f, 30.0f, 46.0f, 59.0f, 72.0f};

// Gun muzzles: center fires straight up; the side guns fire inward diagonals.
constexpr float kGunCX = 41.0f, kGunCY = 70.0f;
constexpr float kGunLX = 6.0f, kGunLY = 74.0f;
constexpr float kGunRX = 77.0f, kGunRY = 74.0f;

class AtlantisGame : public Game {
 public:
  void reset_game(PCG32&) override {
    // Deterministic layout (cross-engine reset-frame parity): one ship enters
    // the top band from the left; the rest are staggered on spawn timers.
    for (int i = 0; i < kShips; ++i) {
      live_[i] = i == 0;
      band_[i] = 0;
      dir_[i] = 1.0f;
      x_[i] = -static_cast<float>(kShipW);
      timer_[i] = 30 + 40 * i;
    }
    for (int g = 0; g < 3; ++g) shot_live_[g] = false;
    for (int c = 0; c < kCity; ++c) city_[c] = true;
    score_ = 0;
    over_ = false;
  }

  float act(const AleAction& a, PCG32& rng) override {
    if (over_) return 0.0f;
    float reward = 0.0f;

    // Fire control: FIRE = center gun, LEFTFIRE = left gun, RIGHTFIRE = right.
    if (a.fire) {
      int g = a.dx < 0 ? 1 : (a.dx > 0 ? 2 : 0);
      if (!shot_live_[g]) {
        shot_live_[g] = true;
        if (g == 0) { sx_[g] = kGunCX; sy_[g] = kGunCY; svx_[g] = 0.0f; svy_[g] = -2.5f; }
        if (g == 1) { sx_[g] = kGunLX; sy_[g] = kGunLY; svx_[g] = 1.5f; svy_[g] = -2.2f; }
        if (g == 2) { sx_[g] = kGunRX; sy_[g] = kGunRY; svx_[g] = -1.5f; svy_[g] = -2.2f; }
      }
    }

    // Shots fly until they leave the screen.
    for (int g = 0; g < 3; ++g) {
      if (!shot_live_[g]) continue;
      sx_[g] += svx_[g];
      sy_[g] += svy_[g];
      if (sy_[g] < -2.0f || sx_[g] < -2.0f || sx_[g] > 84.0f) shot_live_[g] = false;
    }

    // Ships sweep their band; surviving a pass drops them one band deeper.
    for (int i = 0; i < kShips; ++i) {
      if (!live_[i]) {
        if (--timer_[i] <= 0) {
          live_[i] = true;
          band_[i] = 0;
          dir_[i] = rng.uniform() < 0.5f ? 1.0f : -1.0f;
          x_[i] = dir_[i] > 0 ? -static_cast<float>(kShipW) : 84.0f;
        }
        continue;
      }
      x_[i] += dir_[i] * kBandSpeed[band_[i]];
      bool crossed = dir_[i] > 0 ? x_[i] > 84.0f : x_[i] < -static_cast<float>(kShipW);
      if (crossed) {
        if (band_[i] == kBands - 1) {
          // Death ray: the leftmost surviving installation is vaporised.
          for (int c = 0; c < kCity; ++c) {
            if (city_[c]) { city_[c] = false; break; }
          }
          live_[i] = false;
          timer_[i] = 60 + static_cast<int>(rng.randint(60));
        } else {
          ++band_[i];
          dir_[i] = -dir_[i];
          x_[i] = dir_[i] > 0 ? -static_cast<float>(kShipW) : 84.0f;
        }
      }
      // Shot vs ship.
      for (int g = 0; g < 3; ++g) {
        if (!shot_live_[g] || !live_[i]) continue;
        float by = kBandY[band_[i]];
        if (sx_[g] + 1 > x_[i] && sx_[g] < x_[i] + kShipW &&
            sy_[g] + 2 > by && sy_[g] < by + kShipH) {
          reward += kBandScore[band_[i]];
          score_ += static_cast<int>(kBandScore[band_[i]]);
          live_[i] = false;
          timer_[i] = 60 + static_cast<int>(rng.randint(60));
          shot_live_[g] = false;
        }
      }
    }

    bool any_city = false;
    for (int c = 0; c < kCity; ++c) any_city |= city_[c];
    if (!any_city) over_ = true;
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    // Score ticks (one per 1000 points) in the top row.
    for (int s = 0; s < score_ / 1000 && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
    // City installations.
    for (int c = 0; c < kCity; ++c)
      if (city_[c]) draw_rect(f, kCityX[c], kCityY, kCityW, kCityH, 200);
    // Guns.
    draw_rect(f, kGunCX - 1, kGunCY, 3, 4, 180);
    draw_rect(f, kGunLX - 1, kGunLY, 3, 3, 180);
    draw_rect(f, kGunRX - 1, kGunRY, 3, 3, 180);
    // Ships (deeper bands brighter).
    for (int i = 0; i < kShips; ++i)
      if (live_[i])
        draw_rect(f, x_[i], kBandY[band_[i]], kShipW, kShipH,
                  static_cast<uint8_t>(120 + 25 * band_[i]));
    // Shots.
    for (int g = 0; g < 3; ++g)
      if (shot_live_[g]) draw_rect(f, sx_[g], sy_[g], 1, 2, 224);
  }

  bool game_over() const override { return over_; }
  int lives() const override { return 1; }
  int minimal_actions() const override { return 4; }
  int minimal_to_full(int a) const override {
    static const int map[4] = {0, 1, 11, 12};  // NOOP FIRE RIGHTFIRE LEFTFIRE
    return map[a < 0 || a >= 4 ? 0 : a];
  }

 private:
  static void draw_rect(uint8_t* f, float fx, float fy, float fw, float fh, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + fw), y1 = static_cast<int>(fy + fh);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  float x_[kShips] = {};
  float dir_[kShips] = {};
  int band_[kShips] = {};
  bool live_[kShips] = {};
  int timer_[kShips] = {};
  float sx_[3] = {}, sy_[3] = {}, svx_[3] = {}, svy_[3] = {};
  bool shot_live_[3] = {};
  bool city_[kCity] = {};
  int score_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_atlantis_game() { return std::make_unique<AtlantisGame>(); }

}  // namespace cleanba
