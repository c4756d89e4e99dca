// Environment interface for the batched engine.
//
// The engine (engine.cc) owns N Env instances and drives them from a worker
// thread pool through the sync (step-all) and async (send/recv sub-batch)
// APIs — the same surfaces EnvPool gives the reference (SURVEY.md L0).
#pragma once

#include <cstdint>
#include <memory>
#include <string>
#include <vector>

#include "../common/rng.h"

namespace cleanba {

struct StepResult {
  float reward = 0.0f;      // post-clip training reward
  float raw_reward = 0.0f;  // unclipped game score delta (EnvPool info["reward"])
  bool terminated = false;
};

struct EnvOptions {
  uint64_t seed = 0;
  int max_episode_steps = 27000;  // agent steps; engine enforces truncation
  // Atari-protocol options (ignored by vector-state tasks):
  float repeat_action_probability = 0.25f;  // sticky actions (Machado et al. 2017)
  bool episodic_life = false;
  int noop_max = 1;
  bool full_action_space = true;
  bool reward_clip = true;
  int frame_stack = 4;
  int frame_skip = 4;
};

class Env {
 public:
  virtual ~Env() = default;
  // Reset the episode and write the first observation.
  virtual void reset(void* obs) = 0;
  // One agent step (frame-skip etc. handled inside); writes the next observation.
  virtual StepResult step(int action, void* obs) = 0;
};

struct TaskInfo {
  std::vector<int64_t> obs_shape;  // per-env observation shape
  int obs_dtype;                   // 0 = uint8, 1 = float32
  int num_actions;
  int64_t obs_size_bytes;
};

// Factory: returns nullptr for unknown task ids.
std::unique_ptr<Env> make_env(const std::string& task, const EnvOptions& opts);
bool task_info(const std::string& task, const EnvOptions& opts, TaskInfo* out);

}  // namespace cleanba
