// Yars' Revenge — from-scratch C++ clone with the classic mechanics: nibble
// cells out of the Qotile's shield (+69 each) to charge the Zorlon cannon,
// dodge the homing destroyer missile and the periodic swirl, then fire the
// cannon through a gap to destroy the Qotile (+2000) and re-arm the shield.
//
// Stands in for EnvPool's ALE YarsRevenge-v5 in the reference's benchmark
// configs (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs are
// not available here, so the engine provides a rules-true clone with
// identical protocol semantics (sticky actions / frameskip / stacking are
// applied by AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave12.py and must mirror these rules exactly.

#include <cmath>
#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr int kShieldCols = 4, kShieldRows = 10;
constexpr float kShieldX = 66.0f, kShieldY = 22.0f;  // top-left of the block
constexpr float kCellW = 4.0f, kCellH = 4.0f;
constexpr float kQotileX = 78.0f, kQotileY = 40.0f;  // behind the shield
constexpr float kYarW = 4.0f, kYarH = 4.0f;
constexpr float kMove = 1.2f;
constexpr float kMissileV = 0.55f;
constexpr float kSwirlV = 2.2f;
constexpr int kSwirlPeriod = 600;
constexpr float kCannonV = 2.5f;
constexpr int kCannonCost = 4;  // nibbles per shot
constexpr int kLives = 3;

class YarsRevengeGame : public Game {
 public:
  void reset_game(PCG32&) override {
    lives_ = kLives;
    score_ = 0;
    over_ = false;
    start_level();
    respawn();
  }

  float act(const AleAction& a, PCG32&) override {
    if (over_) return 0.0f;
    float reward = 0.0f;
    ++frame_;

    px_ += static_cast<float>(a.dx) * kMove;
    py_ += static_cast<float>(a.dy) * kMove;
    if (px_ < 2.0f) px_ = 2.0f;
    if (px_ > 80.0f - kYarW) px_ = 80.0f - kYarW;
    if (py_ < 10.0f) py_ = 10.0f;
    if (py_ > 80.0f - kYarH) py_ = 80.0f - kYarH;

    // Nibble: touching a live shield cell eats it and charges the cannon.
    int c = static_cast<int>((px_ + kYarW / 2.0f - kShieldX) / kCellW);
    int r = static_cast<int>((py_ + kYarH / 2.0f - kShieldY) / kCellH);
    if (c >= 0 && c < kShieldCols && r >= 0 && r < kShieldRows &&
        px_ + kYarW / 2.0f >= kShieldX && py_ + kYarH / 2.0f >= kShieldY &&
        shield_[r][c]) {
      shield_[r][c] = false;
      ++charge_;
      reward += 69.0f;
      score_ += 69;
    }

    // Zorlon cannon: launches from the left edge at the Yar's row.
    if (a.fire && !cannon_live_ && charge_ >= kCannonCost) {
      charge_ -= kCannonCost;
      cannon_live_ = true;
      cannon_x_ = 0.0f;
      cannon_y_ = py_ + kYarH / 2.0f;
    }
    if (cannon_live_) {
      cannon_x_ += kCannonV;
      int cc = static_cast<int>((cannon_x_ - kShieldX) / kCellW);
      int cr = static_cast<int>((cannon_y_ - kShieldY) / kCellH);
      if (cc >= 0 && cc < kShieldCols && cr >= 0 && cr < kShieldRows &&
          cannon_x_ >= kShieldX && cannon_y_ >= kShieldY && shield_[cr][cc]) {
        shield_[cr][cc] = false;  // the bolt spends itself on the shield
        cannon_live_ = false;
        reward += 69.0f;
        score_ += 69;
      } else if (cannon_x_ >= kQotileX - 2.0f &&
                 std::fabs(cannon_y_ - (kQotileY + 3.0f)) < 5.0f) {
        cannon_live_ = false;
        reward += 2000.0f;
        score_ += 2000;
        start_level();  // the Qotile falls; the shield re-arms
      } else if (cannon_x_ >= 84.0f) {
        cannon_live_ = false;
      }
    }

    // The destroyer missile homes relentlessly.
    float mdx = px_ + kYarW / 2.0f - mis_x_;
    float mdy = py_ + kYarH / 2.0f - mis_y_;
    float mn = std::sqrt(mdx * mdx + mdy * mdy) + 1e-3f;
    mis_x_ += mdx / mn * kMissileV;
    mis_y_ += mdy / mn * kMissileV;
    if (px_ + kYarW > mis_x_ - 1.0f && px_ < mis_x_ + 1.0f &&
        py_ + kYarH > mis_y_ - 1.0f && py_ < mis_y_ + 1.0f) {
      reward += lose_life();
      return reward;
    }

    // The swirl: periodic straight-line lunge at the Yar's position.
    if (!swirl_live_ && frame_ % kSwirlPeriod == 0) {
      swirl_live_ = true;
      swirl_x_ = kQotileX;
      swirl_y_ = kQotileY + 3.0f;
      float sdx = px_ - swirl_x_, sdy = py_ - swirl_y_;
      float sn = std::sqrt(sdx * sdx + sdy * sdy) + 1e-3f;
      swirl_vx_ = sdx / sn * kSwirlV;
      swirl_vy_ = sdy / sn * kSwirlV;
    }
    if (swirl_live_) {
      swirl_x_ += swirl_vx_;
      swirl_y_ += swirl_vy_;
      if (swirl_x_ < -4.0f || swirl_x_ >= 88.0f || swirl_y_ < -4.0f ||
          swirl_y_ >= 88.0f)
        swirl_live_ = false;
      else if (px_ + kYarW > swirl_x_ - 2.0f && px_ < swirl_x_ + 2.0f &&
               py_ + kYarH > swirl_y_ - 2.0f && py_ < swirl_y_ + 2.0f) {
        reward += lose_life();
        return reward;
      }
    }
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    for (int r = 0; r < kShieldRows; ++r)
      for (int c = 0; c < kShieldCols; ++c)
        if (shield_[r][c])
          draw_rect(f, kShieldX + c * kCellW, kShieldY + r * kCellH,
                    kCellW - 1.0f, kCellH - 1.0f, 150);
    draw_rect(f, kQotileX, kQotileY, 4.0f, 6.0f, 200);
    if (cannon_live_) draw_rect(f, cannon_x_ - 2.0f, cannon_y_ - 1.0f, 4.0f, 2.0f, 240);
    draw_rect(f, mis_x_ - 1.0f, mis_y_ - 1.0f, 2.0f, 2.0f, 210);
    if (swirl_live_) draw_rect(f, swirl_x_ - 2.0f, swirl_y_ - 2.0f, 4.0f, 4.0f, 230);
    draw_rect(f, px_, py_, kYarW, kYarH, 255);
    // Cannon charge pips.
    for (int t = 0; t < charge_ && t < 20; ++t) f[3 * kScreen + 2 + t * 2] = 180;
    for (int s = 0; s < score_ / 69 && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
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
    mis_x_ = 70.0f;
    mis_y_ = 10.0f;
    swirl_live_ = false;
    cannon_live_ = false;
    frame_ = 0;
  }

  void start_level() {
    for (int r = 0; r < kShieldRows; ++r)
      for (int c = 0; c < kShieldCols; ++c) shield_[r][c] = true;
    charge_ = 0;
  }

  static void draw_rect(uint8_t* f, float fx, float fy, float fw, float fh, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + fw), y1 = static_cast<int>(fy + fh);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  bool shield_[kShieldRows][kShieldCols] = {};
  float px_ = 10.0f, py_ = 40.0f;
  float mis_x_ = 70.0f, mis_y_ = 10.0f;
  bool swirl_live_ = false;
  float swirl_x_ = 0, swirl_y_ = 0, swirl_vx_ = 0, swirl_vy_ = 0;
  bool cannon_live_ = false;
  float cannon_x_ = 0, cannon_y_ = 0;
  int charge_ = 0;
  int frame_ = 0;
  int lives_ = kLives;
  int score_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_yars_revenge_game() {
  return std::make_unique<YarsRevengeGame>();
}

}  // namespace cleanba
