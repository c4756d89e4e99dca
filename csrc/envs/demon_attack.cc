// DemonAttack — from-scratch C++ fixed shooter with the classic mechanics:
// ranks of demons weave overhead and rain bombs; the player strafes along
// the bottom and picks them off, with deeper ranks worth more and each
// cleared wave returning faster and meaner.
//
// Stands in for EnvPool's ALE DemonAttack-v5 in the reference's benchmark
// configs (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs are
// not available here, so the engine provides a rules-true clone with
// identical protocol semantics (sticky actions / frameskip / stacking are
// applied by AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave3.py and must mirror these rules exactly.

#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr int kDemons = 6;      // 3 ranks x 2 columns
constexpr int kRanks = 3;
constexpr int kDemonW = 7;
constexpr int kDemonH = 4;
constexpr int kPlayerW = 5;
constexpr int kPlayerH = 4;
constexpr float kPlayerY = 76.0f;
constexpr float kPXMin = 2.0f;
constexpr float kPXMax = 84.0f - 2.0f - kPlayerW;
constexpr int kMaxBombs = 8;
constexpr float kBombSpeed = 1.2f;
constexpr float kMissileSpeed = 3.0f;
constexpr int kStartLives = 3;

// Rank geometry: y per rank, oscillation amplitude and speed.
const float kRankY[kRanks] = {14.0f, 26.0f, 38.0f};
const float kAmp[kRanks] = {24.0f, 18.0f, 12.0f};
const float kOscSpeed[kRanks] = {0.40f, 0.55f, 0.70f};

// Triangle wave in [-1, 1] with period 4 (phase units).
inline float tri(float p) {
  p = p - static_cast<float>(static_cast<long long>(p / 4.0f)) * 4.0f;
  if (p < 0) p += 4.0f;
  return p < 2.0f ? p - 1.0f : 3.0f - p;
}

class DemonAttackGame : public Game {
 public:
  void reset_game(PCG32&) override {
    px_ = 40.0f;
    missile_live_ = false;
    for (int b = 0; b < kMaxBombs; ++b) bomb_live_[b] = false;
    lives_ = kStartLives;
    score_ = 0;
    wave_ = 0;
    frame_ = 0;
    over_ = false;
    spawn_wave();
  }

  float act(const AleAction& a, PCG32& rng) override {
    if (over_) return 0.0f;
    ++frame_;
    float reward = 0.0f;

    // Player strafes; FIRE launches the single live missile.
    px_ += static_cast<float>(a.dx);
    px_ = px_ < kPXMin ? kPXMin : (px_ > kPXMax ? kPXMax : px_);
    if (a.fire && !missile_live_) {
      missile_live_ = true;
      mx_ = px_ + kPlayerW / 2.0f;
      my_ = kPlayerY;
    }

    // Demons weave on deterministic triangle tracks.
    for (int d = 0; d < kDemons; ++d) {
      if (!alive_[d]) continue;
      int r = d / 2;
      float phase = phase0_[d] + kOscSpeed[r] * (1.0f + 0.1f * static_cast<float>(wave_))
                                    * static_cast<float>(frame_) * 0.04f;
      dx_[d] = 38.0f + (d % 2 == 0 ? -1.0f : 1.0f) * 4.0f + kAmp[r] * tri(phase);
      // Bombs drop with a wave-scaled probability.
      if (rng.uniform() < 0.004f + 0.002f * static_cast<float>(wave_ > 4 ? 4 : wave_)) {
        for (int b = 0; b < kMaxBombs; ++b) {
          if (bomb_live_[b]) continue;
          bomb_live_[b] = true;
          bx_[b] = dx_[d] + kDemonW / 2.0f;
          by_[b] = kRankY[r] + kDemonH;
          break;
        }
      }
    }

    // Missile travels and kills the first demon it overlaps.
    if (missile_live_) {
      my_ -= kMissileSpeed;
      if (my_ < 4.0f) missile_live_ = false;
      for (int d = 0; d < kDemons && missile_live_; ++d) {
        if (!alive_[d]) continue;
        int r = d / 2;
        if (mx_ >= dx_[d] && mx_ < dx_[d] + kDemonW && my_ >= kRankY[r] &&
            my_ < kRankY[r] + kDemonH) {
          alive_[d] = false;
          missile_live_ = false;
          float pts = 10.0f * static_cast<float>(kRanks - r) + 10.0f * static_cast<float>(wave_ > 3 ? 3 : wave_);
          reward += pts;
          score_ += static_cast<int>(pts);
        }
      }
    }

    // Bombs fall; one hit costs a life and clears the sky of bombs.
    for (int b = 0; b < kMaxBombs; ++b) {
      if (!bomb_live_[b]) continue;
      by_[b] += kBombSpeed;
      if (by_[b] > 84.0f) {
        bomb_live_[b] = false;
        continue;
      }
      if (bx_[b] >= px_ && bx_[b] < px_ + kPlayerW && by_[b] >= kPlayerY &&
          by_[b] < kPlayerY + kPlayerH) {
        if (--lives_ <= 0) over_ = true;
        px_ = 40.0f;
        for (int k = 0; k < kMaxBombs; ++k) bomb_live_[k] = false;
        missile_live_ = false;
        break;
      }
    }

    // Wave cleared: respawn the ranks.
    bool any = false;
    for (int d = 0; d < kDemons; ++d) any = any || alive_[d];
    if (!any) {
      ++wave_;
      spawn_wave();
    }
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    // Ground line.
    for (int x = 0; x < kScreen; ++x) f[82 * kScreen + x] = 70;
    // Score ticks (one per 100 points).
    for (int s = 0; s < score_ / 100 && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
    // Lives markers.
    for (int l = 0; l < lives_ && l < kStartLives; ++l)
      for (int k = 0; k < 3; ++k) f[83 * kScreen + 2 + l * 5 + k] = 160;
    // Demons (brighter when higher rank).
    for (int d = 0; d < kDemons; ++d) {
      if (!alive_[d]) continue;
      int r = d / 2;
      draw_rect(f, dx_[d], kRankY[r], kDemonW, kDemonH,
                static_cast<uint8_t>(190 - 25 * r));
    }
    // Bombs and missile.
    for (int b = 0; b < kMaxBombs; ++b)
      if (bomb_live_[b]) draw_rect(f, bx_[b], by_[b], 1, 3, 120);
    if (missile_live_) draw_rect(f, mx_, my_, 1, 4, 255);
    // Player.
    draw_rect(f, px_, kPlayerY, kPlayerW, kPlayerH, 224);
  }

  bool game_over() const override { return over_; }
  int lives() const override { return lives_; }
  int minimal_actions() const override { return 6; }
  int minimal_to_full(int a) const override {
    // NOOP FIRE RIGHT LEFT RIGHTFIRE LEFTFIRE
    static const int map[6] = {0, 1, 3, 4, 11, 12};
    return map[a < 0 || a >= 6 ? 0 : a];
  }

 private:
  void spawn_wave() {
    for (int d = 0; d < kDemons; ++d) {
      alive_[d] = true;
      // Deterministic staggered phases (cross-engine reset-frame parity).
      phase0_[d] = static_cast<float>(d) * 0.7f;
      int r = d / 2;
      dx_[d] = 38.0f + (d % 2 == 0 ? -1.0f : 1.0f) * 4.0f + kAmp[r] * tri(phase0_[d]);
    }
  }

  static void draw_rect(uint8_t* f, float fx, float fy, float fw, float fh, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + fw), y1 = static_cast<int>(fy + fh);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  float px_ = 40.0f;
  bool missile_live_ = false;
  float mx_ = 0.0f, my_ = 0.0f;
  bool alive_[kDemons] = {};
  float dx_[kDemons] = {};
  float phase0_[kDemons] = {};
  bool bomb_live_[kMaxBombs] = {};
  float bx_[kMaxBombs] = {}, by_[kMaxBombs] = {};
  int lives_ = kStartLives, score_ = 0, wave_ = 0, frame_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_demon_attack_game() { return std::make_unique<DemonAttackGame>(); }

}  // namespace cleanba
