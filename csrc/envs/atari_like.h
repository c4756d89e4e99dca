// Atari-protocol wrapper around simple C++ games.
//
// Reproduces the ALE/EnvPool preprocessing semantics the reference relies on
// (reference make_env flags, cleanba/cleanba_ppo.py:126-146): sticky actions
// with repeat probability, frame skip with max-pool over the last two raw
// frames, 4-frame stacking, grayscale 84x84 observations, noop starts,
// optional episodic-life termination, and sign reward clipping. Games render
// natively at 84x84 (we control the renderer, so no downsampling pass).
//
// Observations are written channel-last: [84, 84, frame_stack] uint8 — the
// TPU-native NHWC layout (the reference's EnvPool emits NCHW and transposes
// on-device, cleanba_ppo.py:178).
#pragma once

#include <algorithm>
#include <cstring>

#include "env.h"

namespace cleanba {

constexpr int kScreen = 84;
constexpr int kScreenPx = kScreen * kScreen;

// ALE full action set (18). Index -> (dx in {-1,0,1}, dy in {-1,0,1}, fire).
struct AleAction {
  int dx, dy, fire;
};
// 0 NOOP, 1 FIRE, 2 UP, 3 RIGHT, 4 LEFT, 5 DOWN, 6 UPRIGHT, 7 UPLEFT,
// 8 DOWNRIGHT, 9 DOWNLEFT, 10 UPFIRE, 11 RIGHTFIRE, 12 LEFTFIRE, 13 DOWNFIRE,
// 14 UPRIGHTFIRE, 15 UPLEFTFIRE, 16 DOWNRIGHTFIRE, 17 DOWNLEFTFIRE
inline AleAction decode_full_action(int a) {
  static const AleAction table[18] = {
      {0, 0, 0},  {0, 0, 1},  {0, -1, 0}, {1, 0, 0},  {-1, 0, 0}, {0, 1, 0},
      {1, -1, 0}, {-1, -1, 0}, {1, 1, 0}, {-1, 1, 0}, {0, -1, 1}, {1, 0, 1},
      {-1, 0, 1}, {0, 1, 1},  {1, -1, 1}, {-1, -1, 1}, {1, 1, 1}, {-1, 1, 1}};
  return table[a < 0 || a >= 18 ? 0 : a];
}

// A game steps one *raw frame* at a time and renders 84x84 grayscale.
class Game {
 public:
  virtual ~Game() = default;
  virtual void reset_game(PCG32& rng) = 0;
  virtual float act(const AleAction& action, PCG32& rng) = 0;  // raw reward
  virtual void render(uint8_t* frame) const = 0;               // 84x84 grayscale
  virtual bool game_over() const = 0;
  virtual int lives() const = 0;
  virtual int minimal_actions() const = 0;  // size of the minimal action set
  // Map minimal-set index -> full-set index (used when full_action_space=false).
  virtual int minimal_to_full(int a) const = 0;
};

class AtariLikeEnv : public Env {
 public:
  AtariLikeEnv(std::unique_ptr<Game> game, const EnvOptions& opts)
      : game_(std::move(game)), opts_(opts), rng_(opts.seed) {}

  int num_actions() const {
    return opts_.full_action_space ? 18 : game_->minimal_actions();
  }

  void reset(void* obs) override {
    game_->reset_game(rng_);
    prev_action_ = 0;
    prev_lives_ = game_->lives();
    // Noop starts (Machado noop_max=1 -> zero noops; Espeholt noop_max=30).
    int noops = opts_.noop_max > 1 ? static_cast<int>(rng_.randint(opts_.noop_max)) : 0;
    AleAction noop = decode_full_action(0);
    for (int i = 0; i < noops && !game_->game_over(); ++i) game_->act(noop, rng_);
    game_->render(raw_[0]);
    // Initial stack: the first frame repeated.
    for (int s = 0; s < opts_.frame_stack; ++s)
      std::memcpy(stack_[s], raw_[0], kScreenPx);
    stack_head_ = 0;
    compose(static_cast<uint8_t*>(obs));
  }

  StepResult step(int action, void* obs) override {
    // Sticky actions: repeat the previous action with probability p
    // (Machado et al. 2017; EnvPool repeat_action_probability=0.25).
    if (rng_.uniform() < opts_.repeat_action_probability) action = prev_action_;
    prev_action_ = action;
    int full = action;
    if (!opts_.full_action_space) full = game_->minimal_to_full(action);
    AleAction decoded = decode_full_action(full);

    StepResult out;
    float reward = 0.0f;
    // Frame skip with max-pool over the last two raw frames (ALE standard).
    for (int k = 0; k < opts_.frame_skip; ++k) {
      reward += game_->act(decoded, rng_);
      if (k == opts_.frame_skip - 2) game_->render(raw_[0]);
      if (game_->game_over()) break;
    }
    game_->render(raw_[1]);
    uint8_t* dst = stack_[stack_head_];
    for (int i = 0; i < kScreenPx; ++i) dst[i] = std::max(raw_[0][i], raw_[1][i]);
    stack_head_ = (stack_head_ + 1) % opts_.frame_stack;

    out.terminated = game_->game_over();
    if (opts_.episodic_life && game_->lives() < prev_lives_) out.terminated = true;
    prev_lives_ = game_->lives();
    out.raw_reward = reward;
    out.reward = opts_.reward_clip ? sign(reward) : reward;
    compose(static_cast<uint8_t*>(obs));
    return out;
  }

 private:
  static float sign(float r) { return r > 0 ? 1.0f : (r < 0 ? -1.0f : 0.0f); }

  // Write [84, 84, stack] uint8, oldest frame in channel 0.
  void compose(uint8_t* obs) const {
    const int S = opts_.frame_stack;
    if (S == 4) {
      // Fast path: one 32-bit store per pixel instead of 4 strided byte stores.
      const uint8_t* f0 = stack_[stack_head_ % 4];
      const uint8_t* f1 = stack_[(stack_head_ + 1) % 4];
      const uint8_t* f2 = stack_[(stack_head_ + 2) % 4];
      const uint8_t* f3 = stack_[(stack_head_ + 3) % 4];
      uint32_t* out = reinterpret_cast<uint32_t*>(obs);
      for (int i = 0; i < kScreenPx; ++i)
        out[i] = static_cast<uint32_t>(f0[i]) | (static_cast<uint32_t>(f1[i]) << 8) |
                 (static_cast<uint32_t>(f2[i]) << 16) | (static_cast<uint32_t>(f3[i]) << 24);
      return;
    }
    for (int s = 0; s < S; ++s) {
      const uint8_t* src = stack_[(stack_head_ + s) % S];
      uint8_t* dst = obs + s;
      for (int i = 0; i < kScreenPx; ++i) dst[i * S] = src[i];
    }
  }

  std::unique_ptr<Game> game_;
  EnvOptions opts_;
  PCG32 rng_;
  int prev_action_ = 0;
  int prev_lives_ = 0;
  uint8_t raw_[2][kScreenPx] = {};
  uint8_t stack_[8][kScreenPx] = {};  // frame_stack <= 8
  int stack_head_ = 0;
};

}  // namespace cleanba
