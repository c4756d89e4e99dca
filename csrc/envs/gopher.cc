// Gopher — from-scratch C++ clone with the classic mechanics: a gopher
// tunnels underground toward one of three carrots and digs up to the
// surface; the farmer fills partially-dug holes with his shovel (+20 a
// block) and bonks the gopher when it nears the surface (+80). Losing all
// three carrots ends the game.
//
// Stands in for EnvPool's ALE Gopher-v5 in the reference's benchmark
// configs (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs are
// not available here, so the engine provides a rules-true clone with
// identical protocol semantics (sticky actions / frameskip / stacking are
// applied by AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave5.py and must mirror these rules exactly.

#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr int kCarrots = 3;
constexpr float kCarrotX[kCarrots] = {26.0f, 41.0f, 56.0f};
constexpr float kCarrotW = 4.0f;
constexpr float kGroundY = 60.0f;      // grass line
constexpr float kGopherY = 70.0f;      // tunnel depth
constexpr float kFarmerY = 52.0f, kFarmerW = 5.0f, kFarmerH = 8.0f;
constexpr int kDigFrames = 40;         // frames to dig from tunnel to surface
constexpr int kWhackReach = 5;

class GopherGame : public Game {
 public:
  void reset_game(PCG32&) override {
    fx_ = 39.0f;
    gx_ = 4.0f;
    for (int c = 0; c < kCarrots; ++c) {
      carrot_[c] = true;
      dig_[c] = 0;
    }
    target_ = 1;  // opening run goes for the middle carrot
    stun_ = 0;
    whack_cd_ = 0;
    score_ = 0;
    over_ = false;
  }

  float act(const AleAction& a, PCG32& rng) override {
    if (over_) return 0.0f;
    float reward = 0.0f;

    // Farmer runs along the surface; the shovel has a short swing cooldown.
    fx_ += static_cast<float>(a.dx) * 1.2f;
    fx_ = fx_ < 2.0f ? 2.0f : (fx_ > 84.0f - 2.0f - kFarmerW ? 84.0f - 2.0f - kFarmerW : fx_);
    if (whack_cd_ > 0) --whack_cd_;
    bool whack = a.fire && whack_cd_ == 0;
    if (whack) whack_cd_ = 10;

    float fcx = fx_ + kFarmerW / 2.0f;
    float tx = kCarrotX[target_] + kCarrotW / 2.0f;

    if (stun_ > 0) {
      --stun_;
    } else if (gx_ + 2.0f < tx || gx_ - 2.0f > tx) {
      // Tunnel toward the target column.
      gx_ += gx_ < tx ? 0.7f : -0.7f;
    } else if (dig_[target_] < kDigFrames) {
      // At the column: dig upward.
      ++dig_[target_];
    } else {
      // Breach: surface and eat the carrot, then go for another.
      carrot_[target_] = false;
      dig_[target_] = 0;
      retarget(rng);
    }

    if (whack) {
      bool near_gopher = stun_ == 0 &&
          (gx_ + 2.0f >= fcx - kWhackReach && gx_ - 2.0f <= fcx + kWhackReach);
      bool gopher_shallow = dig_[target_] > kDigFrames / 2 &&
          (tx >= fcx - kWhackReach && tx <= fcx + kWhackReach);
      if (near_gopher && gopher_shallow) {
        // Bonk: the gopher is climbing under the farmer's feet.
        reward += 80.0f;
        stun_ = 90;
        gx_ = 4.0f;
        dig_[target_] = dig_[target_] / 2;  // the burrow partially collapses
        retarget(rng);
      } else {
        // Fill the nearest dug column the farmer stands over (+20 a block).
        for (int c = 0; c < kCarrots; ++c) {
          float cx = kCarrotX[c] + kCarrotW / 2.0f;
          if (dig_[c] > 0 && cx >= fcx - kWhackReach && cx <= fcx + kWhackReach) {
            dig_[c] -= 8;
            if (dig_[c] < 0) dig_[c] = 0;
            reward += 20.0f;
            break;
          }
        }
      }
    }

    bool any = false;
    for (int c = 0; c < kCarrots; ++c) any |= carrot_[c];
    if (!any) over_ = true;

    score_ += static_cast<int>(reward);
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    for (int s = 0; s < score_ / 100 && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
    // Grass line and dirt texture rows.
    for (int x = 0; x < kScreen; ++x) f[static_cast<int>(kGroundY) * kScreen + x] = 90;
    for (int y = static_cast<int>(kGroundY) + 4; y < 84; y += 6)
      for (int x = 0; x < kScreen; x += 4) f[y * kScreen + x] = 40;
    // Carrots (above ground) and dig shafts (below, height = progress).
    for (int c = 0; c < kCarrots; ++c) {
      if (carrot_[c]) draw_rect(f, kCarrotX[c], kGroundY - 6.0f, kCarrotW, 6, 170);
      if (dig_[c] > 0) {
        float h = static_cast<float>(dig_[c]) / kDigFrames * (kGopherY - kGroundY - 1.0f);
        draw_rect(f, kCarrotX[c], kGopherY - h, kCarrotW, h, 120);
      }
    }
    // Gopher in its tunnel (hidden while stunned).
    if (stun_ == 0) draw_rect(f, gx_ - 2.0f, kGopherY, 5, 3, 220);
    // Farmer.
    draw_rect(f, fx_, kFarmerY, kFarmerW, kFarmerH, 210);
    if (whack_cd_ > 6) draw_rect(f, fx_ - 1.0f, kFarmerY + 6.0f, kFarmerW + 2.0f, 2, 255);
  }

  bool game_over() const override { return over_; }
  int lives() const override { return 1; }
  int minimal_actions() const override { return 8; }
  int minimal_to_full(int a) const override {
    // NOOP FIRE UP RIGHT LEFT UPFIRE RIGHTFIRE LEFTFIRE
    static const int map[8] = {0, 1, 2, 3, 4, 10, 11, 12};
    return map[a < 0 || a >= 8 ? 0 : a];
  }

 private:
  void retarget(PCG32& rng) {
    // Prefer a random carrot that still stands; fall back to current.
    int alive[kCarrots], n = 0;
    for (int c = 0; c < kCarrots; ++c)
      if (carrot_[c]) alive[n++] = c;
    if (n > 0) target_ = alive[rng.randint(static_cast<uint32_t>(n))];
  }

  static void draw_rect(uint8_t* f, float fx, float fy, float fw, float fh, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + fw), y1 = static_cast<int>(fy + fh);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  float fx_ = 39.0f, gx_ = 4.0f;
  bool carrot_[kCarrots] = {};
  int dig_[kCarrots] = {};
  int target_ = 1, stun_ = 0, whack_cd_ = 0, score_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_gopher_game() { return std::make_unique<GopherGame>(); }

}  // namespace cleanba
