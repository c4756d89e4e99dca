// Kung-Fu Master — from-scratch C++ clone with the classic mechanics:
// grippers close in from both sides and drain energy on contact, knife
// throwers lob high and low knives that must be jumped or ducked, and the
// master answers with directional punches.
//
// Stands in for EnvPool's ALE KungFuMaster-v5 in the reference's benchmark
// configs (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs are
// not available here, so the engine provides a rules-true clone with
// identical protocol semantics (sticky actions / frameskip / stacking are
// applied by AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave6.py and must mirror these rules exactly.

#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr float kFloorY = 70.0f;
constexpr float kPlayerW = 5.0f, kPlayerH = 10.0f;
constexpr int kMaxGrippers = 5;
constexpr int kMaxKnives = 2;
constexpr float kEnergyMax = 100.0f;
constexpr int kJumpFrames = 20;

class KungFuMasterGame : public Game {
 public:
  void reset_game(PCG32&) override {
    px_ = 40.0f;
    facing_ = 1.0f;
    energy_ = kEnergyMax;
    for (int g = 0; g < kMaxGrippers; ++g) glive_[g] = false;
    thrower_live_ = false;
    for (int k = 0; k < kMaxKnives; ++k) klive_[k] = false;
    spawn_timer_ = 40;
    thrower_timer_ = 300;
    punch_ = 0;
    punch_cd_ = 0;
    punch_dir_ = 1.0f;
    jump_ = 0;
    ducking_ = false;
    kills_ = 0;
    lives_ = 3;
    score_ = 0;
    over_ = false;
  }

  float act(const AleAction& a, PCG32& rng) override {
    if (over_) return 0.0f;
    float reward = 0.0f;

    // Movement, facing, jump and duck.
    bool ducking = a.dy > 0 && jump_ == 0;
    ducking_ = ducking;
    if (jump_ > 0) --jump_;
    if (a.dy < 0 && jump_ == 0 && !ducking) jump_ = kJumpFrames;
    if (!ducking) {
      px_ += static_cast<float>(a.dx) * 1.2f;
      px_ = px_ < 4.0f ? 4.0f : (px_ > 84.0f - 4.0f - kPlayerW ? 84.0f - 4.0f - kPlayerW : px_);
    }
    if (a.dx != 0) facing_ = a.dx > 0 ? 1.0f : -1.0f;

    // Punch: active window with a cooldown; direction follows dx or facing.
    if (punch_cd_ > 0) --punch_cd_;
    if (punch_ > 0) --punch_;
    if (a.fire && punch_cd_ == 0) {
      punch_ = 4;
      punch_cd_ = 28;
      punch_dir_ = a.dx != 0 ? (a.dx > 0 ? 1.0f : -1.0f) : facing_;
    }

    // Grippers walk in from the edges and grab on contact.
    if (--spawn_timer_ <= 0) {
      int interval = 70 - 3 * (kills_ / 4);
      spawn_timer_ = interval < 30 ? 30 : interval;
      for (int g = 0; g < kMaxGrippers; ++g) {
        if (glive_[g]) continue;
        glive_[g] = true;
        bool from_left = rng.uniform() < 0.5f;
        gx_[g] = from_left ? 0.0f : 84.0f - 4.0f;
        gdir_[g] = from_left ? 1.0f : -1.0f;
        break;
      }
    }
    for (int g = 0; g < kMaxGrippers; ++g) {
      if (!glive_[g]) continue;
      bool touching = gx_[g] + 4.0f > px_ && gx_[g] < px_ + kPlayerW;
      if (!touching)
        gx_[g] += (gx_[g] + 2.0f < px_ + kPlayerW / 2.0f ? 1.0f : -1.0f) * 0.7f;
      else
        energy_ -= 1.0f;  // the grip drains energy until punched off
    }

    // A knife thrower takes position at an edge and lobs high/low knives.
    if (!thrower_live_) {
      if (--thrower_timer_ <= 0) {
        thrower_live_ = true;
        thrower_left_ = rng.uniform() < 0.5f;
        tx_ = thrower_left_ ? 6.0f : 84.0f - 6.0f - 4.0f;
        throw_timer_ = 30;
      }
    } else {
      if (--throw_timer_ <= 0) {
        throw_timer_ = 90;
        for (int k = 0; k < kMaxKnives; ++k) {
          if (klive_[k]) continue;
          klive_[k] = true;
          kx_[k] = thrower_left_ ? tx_ + 4.0f : tx_ - 2.0f;
          khigh_[k] = rng.uniform() < 0.5f;
          ky_[k] = khigh_[k] ? kFloorY + 1.0f : kFloorY + 7.0f;
          kdir_[k] = thrower_left_ ? 1.0f : -1.0f;
          break;
        }
      }
    }
    for (int k = 0; k < kMaxKnives; ++k) {
      if (!klive_[k]) continue;
      kx_[k] += kdir_[k] * 1.8f;
      if (kx_[k] < 0.0f || kx_[k] > 84.0f) klive_[k] = false;
    }

    // Punch resolution: grippers in reach on the punch side, then thrower.
    if (punch_ > 0) {
      for (int g = 0; g < kMaxGrippers; ++g) {
        if (!glive_[g]) continue;
        float rel = gx_[g] + 2.0f - (px_ + kPlayerW / 2.0f);
        if (rel * punch_dir_ > 0.0f && rel * punch_dir_ < 9.0f) {
          glive_[g] = false;
          ++kills_;
          reward += 100.0f;
        }
      }
      if (thrower_live_) {
        float rel = tx_ + 2.0f - (px_ + kPlayerW / 2.0f);
        if (rel * punch_dir_ > 0.0f && rel * punch_dir_ < 9.0f) {
          thrower_live_ = false;
          thrower_timer_ = 300;
          reward += 800.0f;
        }
      }
    }

    // Knife hits: high knives are ducked under, low knives jumped over.
    for (int k = 0; k < kMaxKnives; ++k) {
      if (!klive_[k]) continue;
      if (kx_[k] + 2.0f > px_ && kx_[k] < px_ + kPlayerW) {
        bool dodged = khigh_[k] ? ducking : jump_ > 0;
        if (!dodged) energy_ -= 25.0f;
        klive_[k] = false;
      }
    }

    // Out of energy: lose a life, reset the wave.
    if (energy_ <= 0.0f) {
      --lives_;
      energy_ = kEnergyMax;
      for (int g = 0; g < kMaxGrippers; ++g) glive_[g] = false;
      for (int k = 0; k < kMaxKnives; ++k) klive_[k] = false;
      thrower_live_ = false;
      thrower_timer_ = 300;
      if (lives_ <= 0) over_ = true;
    }

    score_ += static_cast<int>(reward);
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    for (int s = 0; s < score_ / 400 && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
    // Floor.
    for (int x = 0; x < kScreen; ++x) f[(static_cast<int>(kFloorY) + 10) * kScreen + x] = 70;
    // Grippers and thrower.
    for (int g = 0; g < kMaxGrippers; ++g)
      if (glive_[g]) draw_rect(f, gx_[g], kFloorY, 4, 10, 150);
    if (thrower_live_) draw_rect(f, tx_, kFloorY, 4, 10, 190);
    // Knives.
    for (int k = 0; k < kMaxKnives; ++k)
      if (klive_[k]) draw_rect(f, kx_[k], ky_[k], 2, 1, 255);
    // Player: shorter when ducking, raised when jumping.
    float ph = ducking_ ? kPlayerH - 5.0f : kPlayerH;
    float py = ducking_ ? kFloorY + 5.0f : kFloorY;
    if (jump_ > 0) py -= 8.0f;
    draw_rect(f, px_, py, kPlayerW, ph, 210);
    // Punch arm.
    if (punch_ > 0) {
      float ax = punch_dir_ > 0 ? px_ + kPlayerW : px_ - 4.0f;
      draw_rect(f, ax, py + 3.0f, 4, 1, 255);
    }
    // Energy bar and lives.
    draw_rect(f, 2.0f, 82.0f, energy_ / kEnergyMax * 80.0f, 1, 150);
    for (int l = 0; l < lives_; ++l) draw_rect(f, 2.0f + 4.0f * static_cast<float>(l), 80.0f, 3, 1, 180);
  }

  bool game_over() const override { return over_; }
  int lives() const override { return lives_; }
  int minimal_actions() const override { return 14; }
  int minimal_to_full(int a) const override {
    // ALE KungFuMaster minimal set.
    static const int map[14] = {0, 2, 3, 4, 5, 8, 9, 11, 12, 13, 14, 15, 16, 17};
    return map[a < 0 || a >= 14 ? 0 : a];
  }

 private:
  static void draw_rect(uint8_t* f, float fx, float fy, float fw, float fh, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + fw), y1 = static_cast<int>(fy + fh);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  float px_ = 40.0f, facing_ = 1.0f, energy_ = kEnergyMax;
  bool glive_[kMaxGrippers] = {};
  float gx_[kMaxGrippers] = {}, gdir_[kMaxGrippers] = {};
  bool thrower_live_ = false, thrower_left_ = true;
  float tx_ = 0;
  int thrower_timer_ = 300, throw_timer_ = 0;
  bool klive_[kMaxKnives] = {}, khigh_[kMaxKnives] = {};
  float kx_[kMaxKnives] = {}, ky_[kMaxKnives] = {}, kdir_[kMaxKnives] = {};
  int spawn_timer_ = 40, punch_ = 0, punch_cd_ = 0, jump_ = 0, kills_ = 0;
  bool ducking_ = false;
  float punch_dir_ = 1.0f;
  int lives_ = 3, score_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_kung_fu_master_game() {
  return std::make_unique<KungFuMasterGame>();
}

}  // namespace cleanba
