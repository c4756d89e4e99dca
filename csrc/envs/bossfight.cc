// Bossfight — procgen-style boss duel (clone of procgen's bossfight task,
// part of the reference's procgen family: legacy_scripts/
// cleanba_ppo_envpool_procgen.py uses plain `envpool.make(env_id)` over the
// procgen suite). The boss strafes the top under a shield that drops
// periodically: land hits while it is down (+1 each) through the radial
// barrage; enough hits destroy a round (+10) and the next boss is meaner.
// Any barrage shard on your hull ends the run. The pure-JAX twin lives in
// cleanba_tpu/envs/jax_procgen_wave14.py.

#include <cmath>
#include <cstring>

#include "procgen_like.h"

namespace cleanba {
namespace {

constexpr float kBossW = 10.0f, kBossH = 6.0f;
constexpr float kPlayerW = 5.0f, kPlayerH = 4.0f;
constexpr float kMove = 1.3f;
constexpr float kShotV = 2.6f;
constexpr int kShards = 8;
constexpr float kShardV = 1.1f;
constexpr int kShieldDown = 140, kShieldUp = 180;
constexpr int kBarragePeriod = 90;

class BossfightEnv : public ProcgenLikeEnv {
 public:
  BossfightEnv(const EnvOptions& opts, bool hard) : ProcgenLikeEnv(opts), hard_(hard) {}

 protected:
  void reset_level(PCG32& rng) override {
    round_ = 0;
    boss_hp_ = hard_ ? 9 : 6;
    boss_x_ = 20.0f + rng.uniform() * 14.0f;
    boss_vx_ = 0.5f + rng.uniform() * 0.3f;
    shield_ = true;
    phase_clock_ = kShieldUp;
    barrage_clock_ = 0;
    for (int i = 0; i < kShards; ++i) shard_live_[i] = false;
    px_ = kPg / 2.0f - kPlayerW / 2.0f;
    py_ = 54.0f;
    shot_live_ = false;
  }

  StepResult act(const PgAction& a, PCG32& rng) override {
    StepResult out;
    float aggr = 1.0f + 0.2f * static_cast<float>(round_);

    px_ += kMove * static_cast<float>(a.dx);
    py_ += kMove * static_cast<float>(a.dy) * 0.6f;
    if (px_ < 2.0f) px_ = 2.0f;
    if (px_ > kPg - 2.0f - kPlayerW) px_ = kPg - 2.0f - kPlayerW;
    if (py_ < 44.0f) py_ = 44.0f;
    if (py_ > kPg - 4.0f - kPlayerH) py_ = kPg - 4.0f - kPlayerH;

    // The boss strafes and cycles its shield.
    boss_x_ += boss_vx_ * aggr;
    if (boss_x_ < 4.0f || boss_x_ + kBossW > kPg - 4.0f) boss_vx_ = -boss_vx_;
    if (--phase_clock_ <= 0) {
      shield_ = !shield_;
      phase_clock_ = shield_ ? kShieldUp : kShieldDown;
    }
    // Radial barrage.
    if (++barrage_clock_ >= static_cast<int>(kBarragePeriod / aggr)) {
      barrage_clock_ = 0;
      for (int i = 0; i < kShards; ++i) {
        if (shard_live_[i]) continue;
        float ang = rng.uniform() * 6.2831853f;
        shard_live_[i] = true;
        shard_x_[i] = boss_x_ + kBossW / 2.0f;
        shard_y_[i] = 10.0f + kBossH;
        shard_vx_[i] = std::cos(ang) * kShardV;
        shard_vy_[i] = std::fabs(std::sin(ang)) * kShardV + 0.3f;
        break;
      }
    }

    if ((a.special != 0 || a.dy < 0) && !shot_live_) {
      shot_live_ = true;
      shot_x_ = px_ + kPlayerW / 2.0f;
      shot_y_ = py_;
    }
    if (shot_live_) {
      shot_y_ -= kShotV;
      if (shot_y_ < 0.0f) shot_live_ = false;
      else if (shot_x_ >= boss_x_ && shot_x_ < boss_x_ + kBossW &&
               shot_y_ >= 10.0f && shot_y_ < 10.0f + kBossH) {
        shot_live_ = false;
        if (!shield_) {
          out.raw_reward += 1.0f;
          if (--boss_hp_ <= 0) {
            out.raw_reward += 10.0f;
            ++round_;
            boss_hp_ = (hard_ ? 9 : 6) + round_;
            shield_ = true;
            phase_clock_ = kShieldUp;
            for (int i = 0; i < kShards; ++i) shard_live_[i] = false;
          }
        }
      }
    }

    for (int i = 0; i < kShards; ++i) {
      if (!shard_live_[i]) continue;
      shard_x_[i] += shard_vx_[i];
      shard_y_[i] += shard_vy_[i];
      if (shard_x_[i] < 0.0f || shard_x_[i] >= kPg || shard_y_[i] >= kPg) {
        shard_live_[i] = false;
        continue;
      }
      if (px_ + kPlayerW > shard_x_[i] - 1.0f && px_ < shard_x_[i] + 1.0f &&
          py_ + kPlayerH > shard_y_[i] - 1.0f && py_ < shard_y_[i] + 1.0f) {
        out.terminated = true;
        out.reward = out.raw_reward;
        return out;
      }
    }
    out.reward = out.raw_reward;
    return out;
  }

  void render(uint8_t* f) const override {
    fill(f, 18, 16, 30);
    // Boss (shield glows when up).
    if (shield_)
      rect(f, boss_x_ - 2.0f, 8.0f, kBossW + 4.0f, kBossH + 4.0f, 90, 110, 200);
    rect(f, boss_x_, 10.0f, kBossW, kBossH, 190, 80, 90);
    for (int i = 0; i < kShards; ++i)
      if (shard_live_[i])
        rect(f, shard_x_[i] - 1.0f, shard_y_[i] - 1.0f, 2.0f, 2.0f, 240, 170, 90);
    if (shot_live_) rect(f, shot_x_ - 1.0f, shot_y_ - 2.0f, 2.0f, 3.0f, 150, 230, 240);
    rect(f, px_, py_, kPlayerW, kPlayerH, 210, 210, 230);
    // Boss HP pips.
    for (int h = 0; h < boss_hp_ && h < 15; ++h)
      rect(f, 2.0f + h * 3.0f, 2.0f, 2.0f, 2.0f, 230, 120, 120);
  }

 private:
  bool hard_;
  int round_ = 0, boss_hp_ = 6;
  float boss_x_ = 24.0f, boss_vx_ = 0.6f;
  bool shield_ = true;
  int phase_clock_ = kShieldUp, barrage_clock_ = 0;
  bool shard_live_[kShards] = {};
  float shard_x_[kShards] = {}, shard_y_[kShards] = {};
  float shard_vx_[kShards] = {}, shard_vy_[kShards] = {};
  float px_ = 0, py_ = 54.0f;
  bool shot_live_ = false;
  float shot_x_ = 0, shot_y_ = 0;
};

}  // namespace

std::unique_ptr<Env> make_bossfight_env(const EnvOptions& opts, bool hard) {
  return std::make_unique<BossfightEnv>(opts, hard);
}

}  // namespace cleanba
