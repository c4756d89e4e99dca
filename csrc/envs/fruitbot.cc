// Fruitbot — procgen-style procedural corridor scroller. Rules-true clone of
// procgen's fruitbot: the robot drives up a corridor past walls with gaps,
// collecting fruit (+1) and avoiding non-fruit food (-4); reaching the end
// of the corridor pays +10 and completes the level; hitting a wall ends the
// episode. Every episode draws a fresh procedural configuration (wall gaps,
// item placement, corridor length) from the env RNG stream. Hard mode
// narrows the gaps and lengthens the corridor.
//
// The pure-JAX twin lives in cleanba_tpu/envs/jax_procgen_wave5.py and must
// mirror these rules exactly.

#include <cstring>

#include "procgen_like.h"

namespace cleanba {
namespace {

constexpr float kBotW = 5.0f, kBotH = 4.0f;
constexpr float kBotY = 54.0f;        // screen row of the robot
constexpr float kScroll = 0.8f;       // corridor rows per step
constexpr int kWallEvery = 16;        // corridor rows between walls
constexpr int kMaxItems = 12;
constexpr float kItemR = 2.0f;

// Deterministic per-wall hash -> [0, 1) (mirrored in the JAX twin): wall
// layouts depend on the wall index + per-episode salt, not the live RNG
// stream, so the two engines agree on level geometry for a whole episode.
inline float wall_hash(int idx, uint32_t salt, int lane) {
  uint32_t h = static_cast<uint32_t>(idx) * 2654435761u + salt * 97u +
               static_cast<uint32_t>(lane) * 40503u;
  h ^= h >> 13;
  h *= 1274126177u;
  h ^= h >> 16;
  return static_cast<float>(h >> 8) * (1.0f / 16777216.0f);
}

class FruitbotEnv : public ProcgenLikeEnv {
 public:
  FruitbotEnv(const EnvOptions& opts, bool hard) : ProcgenLikeEnv(opts), hard_(hard) {}

 protected:
  void reset_level(PCG32& rng) override {
    px_ = 32.0f;
    dist_ = 0.0f;
    salt_ = rng.next_uint32();
    length_ = hard_ ? 480.0f : 320.0f;
    gap_w_ = hard_ ? 12.0f : 18.0f;
    for (int i = 0; i < kMaxItems; ++i) item_alive_[i] = false;
    spawn_row_ = 8.0f;
    bg_ = static_cast<uint8_t>(25 + rng.randint(35));
  }

  StepResult act(const PgAction& a, PCG32& rng) override {
    StepResult out;
    px_ = clampf(px_ + 1.5f * static_cast<float>(a.dx), 1.0f, kPg - 1.0f - kBotW);
    dist_ += kScroll;

    // Spawn items ahead on a rolling schedule.
    if (dist_ + 70.0f > spawn_row_) {
      spawn_row_ += 10.0f;
      if (rng.uniform() < 0.55f) {
        for (int i = 0; i < kMaxItems; ++i) {
          if (item_alive_[i]) continue;
          item_alive_[i] = true;
          item_fruit_[i] = rng.uniform() < 0.5f;
          item_x_[i] = 3.0f + rng.uniform() * (kPg - 8.0f);
          item_row_[i] = spawn_row_;
          break;
        }
      }
    }

    // Collisions with items at the robot's row.
    for (int i = 0; i < kMaxItems; ++i) {
      if (!item_alive_[i]) continue;
      float sy = item_screen_y(item_row_[i]);
      if (sy > kPg + 4.0f) {
        item_alive_[i] = false;
        continue;
      }
      if (sy + 2.0f * kItemR > kBotY && sy < kBotY + kBotH &&
          item_x_[i] + 2.0f * kItemR > px_ && item_x_[i] < px_ + kBotW) {
        item_alive_[i] = false;
        out.raw_reward += item_fruit_[i] ? 1.0f : -4.0f;
      }
    }

    // Wall collision at the robot's row.
    float wall_row = wall_row_at(kBotY);
    if (wall_row >= 0.0f) {
      int idx = static_cast<int>(wall_row) / kWallEvery;
      float gap = gap_center(idx);
      float cx = px_ + kBotW / 2.0f;
      if (cx < gap - gap_w_ / 2.0f || cx > gap + gap_w_ / 2.0f) out.terminated = true;
    }

    if (dist_ >= length_ && !out.terminated) {
      out.raw_reward += 10.0f;  // corridor completed
      out.terminated = true;
    }
    out.reward = out.raw_reward;
    return out;
  }

  void render(uint8_t* f) const override {
    fill(f, bg_, static_cast<uint8_t>(bg_ + 20), bg_);  // field
    // Walls with their gaps.
    int first = static_cast<int>(dist_) / kWallEvery;
    for (int idx = first; idx <= first + 6; ++idx) {
      float row = static_cast<float>(idx) * kWallEvery + 8.0f;
      float sy = kBotY - (row - dist_);
      if (sy < -3.0f || sy > kPg + 1.0f) continue;
      float gap = gap_center(idx);
      rect(f, 0.0f, sy, gap - gap_w_ / 2.0f, 3, 140, 90, 50);
      rect(f, gap + gap_w_ / 2.0f, sy, kPg - gap - gap_w_ / 2.0f, 3, 140, 90, 50);
    }
    // Items: fruit red-ish, junk grey.
    for (int i = 0; i < kMaxItems; ++i) {
      if (!item_alive_[i]) continue;
      float sy = item_screen_y(item_row_[i]);
      if (sy < -4.0f || sy > kPg) continue;
      if (item_fruit_[i])
        rect(f, item_x_[i], sy, 2 * kItemR, 2 * kItemR, 230, 60, 60);
      else
        rect(f, item_x_[i], sy, 2 * kItemR, 2 * kItemR, 120, 120, 120);
    }
    // Progress bar along the top and the robot.
    rect(f, 0.0f, 0.0f, dist_ / length_ * kPg, 2, 240, 240, 120);
    rect(f, px_, kBotY, kBotW, kBotH, 90, 160, 230);
  }

 private:
  static float clampf(float v, float lo, float hi) {
    return v < lo ? lo : (v > hi ? hi : v);
  }

  // Items live at fixed corridor rows and scroll toward the robot.
  float item_screen_y(float row) const { return kBotY - (row - dist_); }

  // If a wall overlaps screen row `sy`, return its corridor row, else -1.
  float wall_row_at(float sy) const {
    int first = static_cast<int>(dist_) / kWallEvery;
    for (int idx = first; idx <= first + 6; ++idx) {
      float row = static_cast<float>(idx) * kWallEvery + 8.0f;
      float wy = kBotY - (row - dist_);
      if (wy + 3.0f > sy && wy < sy + kBotH) return row;
    }
    return -1.0f;
  }

  float gap_center(int idx) const {
    return 8.0f + wall_hash(idx, salt_, 0) * (kPg - 16.0f);
  }

  bool hard_;
  float px_ = 32.0f, dist_ = 0.0f, length_ = 320.0f, gap_w_ = 18.0f;
  uint32_t salt_ = 0;
  bool item_alive_[kMaxItems] = {}, item_fruit_[kMaxItems] = {};
  float item_x_[kMaxItems] = {}, item_row_[kMaxItems] = {};
  float spawn_row_ = 8.0f;
  uint8_t bg_ = 40;
};

}  // namespace

std::unique_ptr<Env> make_fruitbot_env(const EnvOptions& opts, bool hard) {
  return std::make_unique<FruitbotEnv>(opts, hard);
}

}  // namespace cleanba
