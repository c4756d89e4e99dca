// James Bond 007 — from-scratch C++ clone with the classic mechanics: the
// multi-purpose craft auto-scrolls through enemy territory; steer vertically
// over ground mounds, shoot the diagonal up-forward gun at flying enemies
// (+50) and spinning satellites (+100). Colliding with anything costs a life.
//
// Round-5 calibration (HNS.md wave-9 appendix): the original clone streamed
// obstacles at a fixed pace forever, so a trained agent farmed the kill
// stream to 10.7k (3,887% HNS) — far beyond the real cabinet, where rising
// wave pressure kills even strong players within a few thousand points.
// The difficulty now ramps without bound with every spawn (obstacle speed,
// spawn rate, and flying enemies homing onto the player's altitude), which
// caps episodes near published strong-agent scores on the real game
// (IMPALA ~600, R2D2-class low thousands).
//
// Stands in for EnvPool's ALE Jamesbond-v5 in the reference's benchmark
// configs (reference make_env, cleanba/cleanba_ppo.py:126-146); ALE ROMs are
// not available here, so the engine provides a rules-true clone with
// identical protocol semantics (sticky actions / frameskip / stacking are
// applied by AtariLikeEnv). The pure-JAX twin lives in
// cleanba_tpu/envs/jax_games_wave9b.py and must mirror these rules exactly.

#include <cmath>
#include <cstring>

#include "atari_like.h"

namespace cleanba {
namespace {

constexpr float kPlayerX = 16.0f;
constexpr float kPlayerW = 6.0f, kPlayerH = 5.0f;
constexpr float kMoveY = 1.0f;
constexpr float kScroll = 1.0f;
constexpr int kSlots = 4;               // obstacle stream slots
constexpr int kSpawnPeriod = 90;        // raw frames between spawns
constexpr float kShotVX = 2.0f, kShotVY = -1.0f;
constexpr int kLives = 3;
// Obstacle types cycle deterministically; vertical placement draws the RNG.
// 0 = ground mound (deadly), 1 = flying enemy (+50, deadly),
// 2 = satellite (+100, harmless).
constexpr int kTypeCycle[4] = {0, 1, 2, 1};

class JamesbondGame : public Game {
 public:
  void reset_game(PCG32&) override {
    py_ = 50.0f;
    shot_live_ = false;
    for (int i = 0; i < kSlots; ++i) ob_live_[i] = false;
    spawn_clock_ = 0;
    spawn_count_ = 0;
    lives_ = kLives;
    score_ = 0;
    over_ = false;
  }

  float act(const AleAction& a, PCG32& rng) override {
    if (over_) return 0.0f;
    float reward = 0.0f;

    py_ += static_cast<float>(a.dy) * kMoveY;
    if (py_ < 24.0f) py_ = 24.0f;
    if (py_ > 70.0f) py_ = 70.0f;

    // Diagonal up-forward shot (one slot).
    if (a.fire && !shot_live_) {
      shot_live_ = true;
      shot_x_ = kPlayerX + kPlayerW;
      shot_y_ = py_;
    }
    if (shot_live_) {
      shot_x_ += kShotVX;
      shot_y_ += kShotVY;
      if (shot_x_ > 84.0f || shot_y_ < 0.0f) shot_live_ = false;
    }

    // Spawn the next obstacle into a free slot; the spawn period shrinks as
    // the wave count climbs (floor 36 raw frames).
    int period = kSpawnPeriod - spawn_count_ / 2;
    if (period < 36) period = 36;
    if (++spawn_clock_ >= period) {
      spawn_clock_ = 0;
      for (int i = 0; i < kSlots; ++i) {
        if (ob_live_[i]) continue;
        int type = kTypeCycle[spawn_count_ % 4];
        ++spawn_count_;
        ob_live_[i] = true;
        ob_type_[i] = type;
        ob_x_[i] = 84.0f;
        if (type == 0) {
          ob_y_[i] = 70.0f;  // mound sits on the ground line
        } else if (type == 1) {
          ob_y_[i] = 28.0f + static_cast<float>(rng.randint(36));
        } else {
          ob_y_[i] = 20.0f + static_cast<float>(rng.randint(8));
        }
        break;
      }
    }

    // Obstacles scroll left, faster with every spawn (unbounded ramp), and
    // flying enemies home onto the player's altitude; resolve shots and
    // collisions.
    float ramp = static_cast<float>(spawn_count_);
    for (int i = 0; i < kSlots; ++i) {
      if (!ob_live_[i]) continue;
      float speed = ob_type_[i] == 1 ? 1.5f + 0.05f * ramp : 1.0f + 0.025f * ramp;
      ob_x_[i] -= speed;
      if (ob_x_[i] < -8.0f) {
        ob_live_[i] = false;
        continue;
      }
      if (ob_type_[i] == 1) {
        float home = 0.06f + 0.004f * ramp;
        float d = py_ - ob_y_[i];
        ob_y_[i] += d > 0.0f ? home : (d < 0.0f ? -home : 0.0f);
        if (ob_y_[i] < 20.0f) ob_y_[i] = 20.0f;
        if (ob_y_[i] > 70.0f) ob_y_[i] = 70.0f;
      }
      float w = ob_type_[i] == 0 ? 10.0f : 6.0f;
      float h = ob_type_[i] == 0 ? 6.0f : 4.0f;
      if (shot_live_ && ob_type_[i] != 0 &&
          shot_x_ >= ob_x_[i] && shot_x_ < ob_x_[i] + w &&
          shot_y_ >= ob_y_[i] && shot_y_ < ob_y_[i] + h) {
        shot_live_ = false;
        ob_live_[i] = false;
        int pts = ob_type_[i] == 1 ? 50 : 100;
        reward += static_cast<float>(pts);
        score_ += pts;
        continue;
      }
      if (ob_type_[i] != 2 &&
          kPlayerX + kPlayerW > ob_x_[i] && kPlayerX < ob_x_[i] + w &&
          py_ + kPlayerH > ob_y_[i] && py_ < ob_y_[i] + h) {
        reward += lose_life();
        return reward;
      }
    }
    return reward;
  }

  void render(uint8_t* f) const override {
    std::memset(f, 0, kScreenPx);
    // Ground line.
    for (int y = 76; y < 78; ++y)
      for (int x = 0; x < kScreen; ++x) f[y * kScreen + x] = 100;
    // Obstacles.
    for (int i = 0; i < kSlots; ++i) {
      if (!ob_live_[i]) continue;
      if (ob_type_[i] == 0) {
        draw_rect(f, ob_x_[i], ob_y_[i], 10.0f, 6.0f, 130);
      } else if (ob_type_[i] == 1) {
        draw_rect(f, ob_x_[i], ob_y_[i], 6.0f, 4.0f, 170);
      } else {
        draw_rect(f, ob_x_[i], ob_y_[i], 6.0f, 4.0f, 210);
      }
    }
    // Shot.
    if (shot_live_) draw_rect(f, shot_x_ - 1.0f, shot_y_ - 1.0f, 2.0f, 2.0f, 220);
    // Player craft.
    draw_rect(f, kPlayerX, py_, kPlayerW, kPlayerH, 255);
    // Score ticks and lives pips.
    for (int s = 0; s < score_ / 50 && s < 40; ++s) f[1 * kScreen + 2 + s * 2] = 200;
    for (int l = 0; l < lives_ && l < kLives; ++l)
      for (int k = 0; k < 3; ++k) f[82 * kScreen + 2 + l * 5 + k] = 160;
  }

  bool game_over() const override { return over_; }
  int lives() const override { return lives_; }
  int minimal_actions() const override { return 6; }
  int minimal_to_full(int a) const override {
    static const int map[6] = {0, 1, 2, 5, 10, 13};  // NOOP FIRE UP DOWN UPFIRE DOWNFIRE
    return map[a < 0 || a >= 6 ? 0 : a];
  }

 private:
  float lose_life() {
    --lives_;
    if (lives_ <= 0) {
      over_ = true;
      return 0.0f;
    }
    py_ = 50.0f;
    shot_live_ = false;
    for (int i = 0; i < kSlots; ++i) ob_live_[i] = false;
    spawn_clock_ = 0;
    return 0.0f;
  }

  static void draw_rect(uint8_t* f, float fx, float fy, float fw, float fh, uint8_t v) {
    int x0 = static_cast<int>(fx), y0 = static_cast<int>(fy);
    int x1 = static_cast<int>(fx + fw), y1 = static_cast<int>(fy + fh);
    for (int y = y0 < 0 ? 0 : y0; y < y1 && y < kScreen; ++y)
      for (int x = x0 < 0 ? 0 : x0; x < x1 && x < kScreen; ++x)
        f[y * kScreen + x] = v;
  }

  float py_ = 50.0f;
  bool shot_live_ = false;
  float shot_x_ = 0.0f, shot_y_ = 0.0f;
  bool ob_live_[kSlots] = {};
  int ob_type_[kSlots] = {};
  float ob_x_[kSlots] = {}, ob_y_[kSlots] = {};
  int spawn_clock_ = 0;
  int spawn_count_ = 0;
  int lives_ = kLives;
  int score_ = 0;
  bool over_ = false;
};

}  // namespace

std::unique_ptr<Game> make_jamesbond_game() { return std::make_unique<JamesbondGame>(); }

}  // namespace cleanba
