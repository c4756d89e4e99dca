// Phoenix — from-scratch C++ clone with the classic mechanics: waves of
// birds oscillate in formation and peel off into homing dives; the player
// cannon fires upward and can raise a short-lived shield (DOWN) that blocks
// divers but pins the ship in place while active — the real game's defining
// trade-off.
//
// Stands in for EnvPool's ALE Phoenix-v5 in the reference's benchmark
// configs (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs are
// not available here, so the engine provides a rules-true clone with
// identical protocol semantics (sticky actions / frameskip / stacking are
// applied by AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave5.py and must mirror these rules exactly.
//
// The formation sway is a triangle wave (not sin) so the C++ and JAX engines
// compute bit-identical float32 positions.

#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr int kBirds = 8;
constexpr int kCols = 4;
constexpr float kRowY[2] = {16.0f, 26.0f};
constexpr float kBirdW = 5.0f, kBirdH = 3.0f;
constexpr float kPlayerY = 76.0f, kPlayerW = 5.0f, kPlayerH = 3.0f;
constexpr int kMaxBombs = 3;
constexpr int kShieldFrames = 40;
constexpr int kShieldCooldown = 120;

// Triangle wave with period 4, amplitude 1: 0 -> 1 -> -1 -> 0.
inline float tri(float p) {
  p = p - 4.0f * static_cast<float>(static_cast<int>(p / 4.0f));
  if (p < 0.0f) p += 4.0f;
  if (p < 1.0f) return p;
  if (p < 3.0f) return 2.0f - p;
  return p - 4.0f;
}

class PhoenixGame : public Game {
 public:
  void reset_game(PCG32&) override {
    px_ = 39.5f;
    phase_ = 0.0f;
    wave_ = 0;
    dive_prob_ = 0.004f;
    for (int i = 0; i < kBirds; ++i) {
      live_[i] = true;
      diving_[i] = false;
    }
    for (int b = 0; b < kMaxBombs; ++b) bomb_live_[b] = false;
    shot_live_ = false;
    shield_ = 0;
    shield_cd_ = 0;
    lives_ = 3;
    invuln_ = 0;
    score_ = 0;
    over_ = false;
  }

  float act(const AleAction& a, PCG32& rng) override {
    if (over_) return 0.0f;
    float reward = 0.0f;

    // Shield (DOWN): pins the ship while raised.
    if (shield_ > 0) --shield_;
    if (shield_cd_ > 0) --shield_cd_;
    if (a.dy > 0 && shield_ == 0 && shield_cd_ == 0) {
      shield_ = kShieldFrames;
      shield_cd_ = kShieldCooldown + kShieldFrames;
    }
    if (shield_ == 0) {
      px_ += static_cast<float>(a.dx) * 1.5f;
      px_ = px_ < 2.0f ? 2.0f : (px_ > 84.0f - 2.0f - kPlayerW ? 84.0f - 2.0f - kPlayerW : px_);
    }
    if (a.fire && !shot_live_) {
      shot_live_ = true;
      sx_ = px_ + kPlayerW / 2.0f;
      sy_ = kPlayerY - 2.0f;
    }
    if (shot_live_) {
      sy_ -= 2.5f;
      if (sy_ < 2.0f) shot_live_ = false;
    }

    // Formation sway (triangle wave, per-bird phase offset).
    phase_ += 0.05f + 0.01f * static_cast<float>(wave_);
    for (int i = 0; i < kBirds; ++i) {
      if (!live_[i]) continue;
      if (!diving_[i]) {
        if (rng.uniform() < dive_prob_) {
          diving_[i] = true;
          dive_x_[i] = bird_x(i);
          dive_y_[i] = kRowY[i / kCols];
        } else if (rng.uniform() < 0.003f) {
          // Formation bird drops a bomb from its current sway position.
          for (int b = 0; b < kMaxBombs; ++b) {
            if (bomb_live_[b]) continue;
            bomb_live_[b] = true;
            bx_[b] = bird_x(i) + kBirdW / 2.0f;
            by_[b] = kRowY[i / kCols] + kBirdH;
            break;
          }
        }
      } else {
        // Homing dive; past the player row the bird climbs back to its slot.
        dive_y_[i] += 1.0f;
        dive_x_[i] += dive_x_[i] < px_ ? 0.5f : -0.5f;
        if (dive_y_[i] > 82.0f) {
          diving_[i] = false;  // rejoin the formation at the top
        }
      }
    }

    // Bombs fall.
    for (int b = 0; b < kMaxBombs; ++b) {
      if (!bomb_live_[b]) continue;
      by_[b] += 1.1f;
      if (by_[b] > 84.0f) bomb_live_[b] = false;
    }

    // Shot vs birds (divers are worth more).
    if (shot_live_) {
      for (int i = 0; i < kBirds; ++i) {
        if (!live_[i]) continue;
        float ex = diving_[i] ? dive_x_[i] : bird_x(i);
        float ey = diving_[i] ? dive_y_[i] : kRowY[i / kCols];
        if (sx_ + 1.0f > ex && sx_ < ex + kBirdW && sy_ + 2.0f > ey && sy_ < ey + kBirdH) {
          live_[i] = false;
          shot_live_ = false;
          reward += diving_[i] ? 50.0f : 20.0f;
          break;
        }
      }
    }

    // Player hit by a bomb or a diver (shield blocks both).
    if (invuln_ > 0) {
      --invuln_;
    } else if (shield_ == 0) {
      bool hit = false;
      for (int b = 0; b < kMaxBombs; ++b) {
        if (!bomb_live_[b]) continue;
        if (bx_[b] + 1.0f > px_ && bx_[b] < px_ + kPlayerW &&
            by_[b] + 2.0f > kPlayerY && by_[b] < kPlayerY + kPlayerH) {
          hit = true;
          bomb_live_[b] = false;
        }
      }
      for (int i = 0; i < kBirds; ++i) {
        if (!live_[i] || !diving_[i]) continue;
        if (dive_x_[i] + kBirdW > px_ && dive_x_[i] < px_ + kPlayerW &&
            dive_y_[i] + kBirdH > kPlayerY && dive_y_[i] < kPlayerY + kPlayerH) {
          hit = true;
          live_[i] = false;
        }
      }
      if (hit) {
        --lives_;
        invuln_ = 60;
        for (int b = 0; b < kMaxBombs; ++b) bomb_live_[b] = false;
        if (lives_ <= 0) over_ = true;
      }
    }

    // Wave cleared: respawn the flock, faster and more aggressive.
    bool any = false;
    for (int i = 0; i < kBirds; ++i) any |= live_[i];
    if (!any) {
      ++wave_;
      dive_prob_ *= 1.3f;
      for (int i = 0; i < kBirds; ++i) {
        live_[i] = true;
        diving_[i] = false;
      }
    }

    score_ += static_cast<int>(reward);
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    for (int s = 0; s < score_ / 100 && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
    for (int i = 0; i < kBirds; ++i) {
      if (!live_[i]) continue;
      float ex = diving_[i] ? dive_x_[i] : bird_x(i);
      float ey = diving_[i] ? dive_y_[i] : kRowY[i / kCols];
      draw_rect(f, ex, ey, kBirdW, kBirdH, diving_[i] ? 220 : 150);
    }
    for (int b = 0; b < kMaxBombs; ++b)
      if (bomb_live_[b]) draw_rect(f, bx_[b], by_[b], 1, 2, 100);
    if (shot_live_) draw_rect(f, sx_, sy_, 1, 2, 224);
    if (invuln_ == 0 || (invuln_ / 4) % 2 == 0)
      draw_rect(f, px_, kPlayerY, kPlayerW, kPlayerH, 210);
    if (shield_ > 0) draw_rect(f, px_ - 1.0f, kPlayerY - 3.0f, kPlayerW + 2.0f, 2, 120);
    for (int l = 0; l < lives_; ++l) draw_rect(f, 2.0f + 4.0f * static_cast<float>(l), 83.0f, 3, 1, 180);
  }

  bool game_over() const override { return over_; }
  int lives() const override { return lives_; }
  int minimal_actions() const override { return 8; }
  int minimal_to_full(int a) const override {
    // NOOP FIRE RIGHT LEFT DOWN RIGHTFIRE LEFTFIRE DOWNFIRE
    static const int map[8] = {0, 1, 3, 4, 5, 11, 12, 13};
    return map[a < 0 || a >= 8 ? 0 : a];
  }

 private:
  float bird_x(int i) const {
    float base = 10.0f + 16.0f * static_cast<float>(i % kCols);
    return base + 6.0f * tri(phase_ + 0.7f * static_cast<float>(i));
  }

  static void draw_rect(uint8_t* f, float fx, float fy, float fw, float fh, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + fw), y1 = static_cast<int>(fy + fh);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  float px_ = 39.5f, phase_ = 0.0f;
  int wave_ = 0;
  float dive_prob_ = 0.004f;
  bool live_[kBirds] = {}, diving_[kBirds] = {};
  float dive_x_[kBirds] = {}, dive_y_[kBirds] = {};
  bool bomb_live_[kMaxBombs] = {};
  float bx_[kMaxBombs] = {}, by_[kMaxBombs] = {};
  bool shot_live_ = false;
  float sx_ = 0, sy_ = 0;
  int shield_ = 0, shield_cd_ = 0, lives_ = 3, invuln_ = 0, score_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_phoenix_game() { return std::make_unique<PhoenixGame>(); }

}  // namespace cleanba
