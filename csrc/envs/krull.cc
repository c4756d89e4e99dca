// Krull — from-scratch C++ clone of the glaive-arena scene: throw the
// five-bladed glaive (it flies out along your facing and homes back to your
// hand), cut down the Slayers closing in from the arena edges (+150 each),
// and survive; every cleared squad of eight pays +500 and quickens the next.
//
// Stands in for EnvPool's ALE Krull-v5 in the reference's benchmark configs
// (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs are not
// available here, so the engine provides a rules-true clone with identical
// protocol semantics (sticky actions / frameskip / stacking are applied by
// AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave12.py and must mirror these rules exactly.

#include <cmath>
#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr int kSlayers = 4;
constexpr float kSlayerW = 5.0f, kSlayerH = 5.0f;
constexpr float kPlayerW = 4.0f, kPlayerH = 5.0f;
constexpr float kWalk = 1.0f;
constexpr float kGlaiveV = 2.5f;
constexpr float kGlaiveRange = 26.0f;
constexpr int kSpawnPeriod = 120;
constexpr int kSquadSize = 8;
constexpr int kLives = 3;

class KrullGame : public Game {
 public:
  void reset_game(PCG32&) override {
    wave_ = 0;
    lives_ = kLives;
    score_ = 0;
    over_ = false;
    squad_kills_ = 0;
    for (int s = 0; s < kSlayers; ++s) slayer_live_[s] = false;
    spawn_clock_ = kSpawnPeriod;
    respawn();
  }

  float act(const AleAction& a, PCG32& rng) override {
    if (over_) return 0.0f;
    float reward = 0.0f;
    float sspeed = 0.5f + 0.08f * static_cast<float>(wave_);

    px_ += static_cast<float>(a.dx) * kWalk;
    py_ += static_cast<float>(a.dy) * kWalk;
    if (px_ < 4.0f) px_ = 4.0f;
    if (px_ > 80.0f - kPlayerW) px_ = 80.0f - kPlayerW;
    if (py_ < 10.0f) py_ = 10.0f;
    if (py_ > 80.0f - kPlayerH) py_ = 80.0f - kPlayerH;
    if (a.dx != 0 || a.dy != 0) {
      face_dx_ = static_cast<float>(a.dx);
      face_dy_ = static_cast<float>(a.dy);
    }

    // The glaive: out along the facing, then homing back to the hand.
    if (a.fire && glaive_state_ == 0) {
      glaive_state_ = 1;
      gx_ = px_ + kPlayerW / 2.0f;
      gy_ = py_ + kPlayerH / 2.0f;
      float n = std::fabs(face_dx_) + std::fabs(face_dy_);
      gvx_ = face_dx_ / (n > 0 ? n : 1.0f) * kGlaiveV;
      gvy_ = face_dy_ / (n > 0 ? n : 1.0f) * kGlaiveV;
      gdist_ = 0.0f;
    }
    if (glaive_state_ == 1) {
      gx_ += gvx_;
      gy_ += gvy_;
      gdist_ += kGlaiveV;
      if (gdist_ >= kGlaiveRange || gx_ < 2.0f || gx_ >= 82.0f || gy_ < 8.0f ||
          gy_ >= 82.0f)
        glaive_state_ = 2;
    } else if (glaive_state_ == 2) {
      float hdx = px_ + kPlayerW / 2.0f - gx_;
      float hdy = py_ + kPlayerH / 2.0f - gy_;
      float hn = std::sqrt(hdx * hdx + hdy * hdy);
      if (hn < kGlaiveV) {
        glaive_state_ = 0;  // caught
      } else {
        gx_ += hdx / hn * kGlaiveV;
        gy_ += hdy / hn * kGlaiveV;
      }
    }

    // Slayers close in from the edges.
    if (++spawn_clock_ >= kSpawnPeriod) {
      spawn_clock_ = 0;
      for (int s = 0; s < kSlayers; ++s) {
        if (slayer_live_[s]) continue;
        slayer_live_[s] = true;
        int edge = static_cast<int>(rng.randint(4));
        float t = 8.0f + static_cast<float>(rng.randint(64));
        sx_[s] = edge < 2 ? t : (edge == 2 ? 4.0f : 76.0f);
        sy_[s] = edge == 0 ? 10.0f : (edge == 1 ? 76.0f : t);
        break;
      }
    }
    for (int s = 0; s < kSlayers; ++s) {
      if (!slayer_live_[s]) continue;
      float dx = px_ - sx_[s], dy = py_ - sy_[s];
      float n = std::sqrt(dx * dx + dy * dy) + 1e-3f;
      sx_[s] += dx / n * sspeed;
      sy_[s] += dy / n * sspeed;
      // The glaive cuts while in flight (either leg).
      if (glaive_state_ != 0 && gx_ >= sx_[s] && gx_ < sx_[s] + kSlayerW &&
          gy_ >= sy_[s] && gy_ < sy_[s] + kSlayerH) {
        slayer_live_[s] = false;
        reward += 150.0f;
        score_ += 150;
        if (++squad_kills_ >= kSquadSize) {
          squad_kills_ = 0;
          ++wave_;
          reward += 500.0f;
          score_ += 500;
        }
        continue;
      }
      if (px_ + kPlayerW > sx_[s] && px_ < sx_[s] + kSlayerW &&
          py_ + kPlayerH > sy_[s] && py_ < sy_[s] + kSlayerH) {
        reward += lose_life();
        return reward;
      }
    }
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    // Arena floor line.
    for (int x = 0; x < kScreen; ++x) f[81 * kScreen + x] = 70;
    for (int s = 0; s < kSlayers; ++s)
      if (slayer_live_[s])
        draw_rect(f, sx_[s], sy_[s], kSlayerW, kSlayerH, 170);
    if (glaive_state_ != 0)
      draw_rect(f, gx_ - 2.0f, gy_ - 2.0f, 4.0f, 4.0f, 230);
    draw_rect(f, px_, py_, kPlayerW, kPlayerH, 255);
    for (int s = 0; s < score_ / 150 && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
    for (int l = 0; l < lives_ && l < kLives; ++l)
      for (int k = 0; k < 3; ++k) f[83 * kScreen + 2 + l * 5 + k] = 160;
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
    px_ = 40.0f;
    py_ = 45.0f;
    face_dx_ = 1.0f;
    face_dy_ = 0.0f;
    glaive_state_ = 0;
    for (int s = 0; s < kSlayers; ++s) slayer_live_[s] = false;
    spawn_clock_ = kSpawnPeriod;
  }

  static void draw_rect(uint8_t* f, float fx, float fy, float fw, float fh, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + fw), y1 = static_cast<int>(fy + fh);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  float px_ = 40.0f, py_ = 45.0f, face_dx_ = 1.0f, face_dy_ = 0.0f;
  int glaive_state_ = 0;  // 0 held, 1 outbound, 2 returning
  float gx_ = 0, gy_ = 0, gvx_ = 0, gvy_ = 0, gdist_ = 0;
  bool slayer_live_[kSlayers] = {};
  float sx_[kSlayers] = {}, sy_[kSlayers] = {};
  int spawn_clock_ = 0;
  int squad_kills_ = 0;
  int wave_ = 0;
  int lives_ = kLives;
  int score_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_krull_game() { return std::make_unique<KrullGame>(); }

}  // namespace cleanba
