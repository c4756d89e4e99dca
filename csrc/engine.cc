// Batched environment engine: worker thread pool + sync and async stepping.
//
// TPU-native stand-in for EnvPool (the reference's only perf-critical native
// dependency, SURVEY.md §2.3): N envs stepped by a pool of host worker
// threads, exposed through
//   - a sync API (step all envs, env-ordered, deterministic) used by the PPO
//     rollout path (reference cleanba_ppo.py:321), and
//   - an async API (send/recv of earliest-finished sub-batches) used by the
//     IMPALA rollout path (reference cleanba_impala.py:352,365).
//
// Auto-reset semantics match EnvPool: when an episode ends, the returned
// observation is already the next episode's first frame, the final reward and
// terminated/truncated flags are reported with it, and elapsed_step==0 marks
// the fresh observation. Truncation at max_episode_steps is enforced here.
//
// Concurrency model: per-env state is owned by exactly one in-flight task at
// a time (an env only receives a new action after its previous result was
// returned), so env code is lock-free; only the task/ready queues are locked.
//
// Exposed via a plain C ABI consumed with ctypes (cleanba_tpu/envs/native.py).

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include "envs/env.h"

namespace cleanba {
namespace {

struct CConfig {
  int32_t num_envs;
  int32_t batch_size;
  int32_t num_threads;
  int64_t seed;
  int32_t max_episode_steps;
  float repeat_action_probability;
  int32_t episodic_life;
  int32_t noop_max;
  int32_t full_action_space;
  int32_t reward_clip;
  int32_t frame_stack;
  int32_t frame_skip;
};

struct Task {
  int32_t env_id;
  int32_t action;
  bool is_reset;
};

struct Result {
  int32_t env_id;
  float reward;
  float raw_reward;
  uint8_t terminated;
  uint8_t truncated;
  int32_t elapsed;
};

class Engine {
 public:
  Engine(const std::string& task, const CConfig& c) : cfg_(c) {
    EnvOptions base = options_from(c, 0);
    if (!task_info(task, base, &info_)) throw std::runtime_error("unknown task: " + task);
    envs_.reserve(c.num_envs);
    for (int i = 0; i < c.num_envs; ++i) {
      EnvOptions o = options_from(c, i);
      envs_.push_back(make_env(task, o));
    }
    elapsed_.assign(c.num_envs, 0);
    obs_buf_.assign(static_cast<size_t>(c.num_envs) * info_.obs_size_bytes, 0);
    results_.resize(c.num_envs);
    int n_threads = c.num_threads > 0
                        ? c.num_threads
                        : static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads < 1) n_threads = 1;
    for (int t = 0; t < n_threads; ++t)
      workers_.emplace_back([this] { worker_loop(); });
  }

  ~Engine() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      shutdown_ = true;
    }
    task_cv_.notify_all();
    for (auto& w : workers_) w.join();
  }

  const TaskInfo& info() const { return info_; }
  int num_envs() const { return cfg_.num_envs; }
  int batch_size() const { return cfg_.batch_size > 0 ? cfg_.batch_size : cfg_.num_envs; }

  // ---- sync API: dispatch everything, wait for all, emit in env order ----
  void reset_all(void* obs_out) {
    dispatch_all(nullptr, /*reset=*/true);
    wait_ready(cfg_.num_envs);
    drain_ordered(obs_out, nullptr, nullptr, nullptr, nullptr, nullptr);
  }

  void step_all(const int32_t* actions, void* obs, float* rew, float* raw_rew,
                uint8_t* term, uint8_t* trunc, int32_t* elapsed) {
    dispatch_all(actions, /*reset=*/false);
    wait_ready(cfg_.num_envs);
    drain_ordered(obs, rew, raw_rew, term, trunc, elapsed);
  }

  // ---- async API ----
  void async_reset() { dispatch_all(nullptr, /*reset=*/true); }

  void send(const int32_t* env_ids, const int32_t* actions, int n) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      for (int i = 0; i < n; ++i)
        tasks_.push_back(Task{env_ids[i], actions[i], false});
    }
    task_cv_.notify_all();
  }

  int recv(int32_t* env_ids, void* obs, float* rew, float* raw_rew, uint8_t* term,
           uint8_t* trunc, int32_t* elapsed) {
    const int b = batch_size();
    std::unique_lock<std::mutex> lk(mu_);
    ready_cv_.wait(lk, [this, b] { return static_cast<int>(ready_.size()) >= b; });
    for (int i = 0; i < b; ++i) {
      Result r = ready_.front();
      ready_.pop_front();
      env_ids[i] = r.env_id;
      rew[i] = r.reward;
      raw_rew[i] = r.raw_reward;
      term[i] = r.terminated;
      trunc[i] = r.truncated;
      elapsed[i] = r.elapsed;
      std::memcpy(static_cast<uint8_t*>(obs) + static_cast<size_t>(i) * info_.obs_size_bytes,
                  obs_buf_.data() + static_cast<size_t>(r.env_id) * info_.obs_size_bytes,
                  info_.obs_size_bytes);
    }
    return b;
  }

 private:
  static EnvOptions options_from(const CConfig& c, int env_id) {
    EnvOptions o;
    o.seed = static_cast<uint64_t>(c.seed) + static_cast<uint64_t>(env_id);
    o.max_episode_steps = c.max_episode_steps;
    o.repeat_action_probability = c.repeat_action_probability;
    o.episodic_life = c.episodic_life != 0;
    o.noop_max = c.noop_max;
    o.full_action_space = c.full_action_space != 0;
    o.reward_clip = c.reward_clip != 0;
    o.frame_stack = c.frame_stack;
    o.frame_skip = c.frame_skip;
    return o;
  }

  void dispatch_all(const int32_t* actions, bool reset) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      for (int i = 0; i < cfg_.num_envs; ++i)
        tasks_.push_back(Task{i, actions ? actions[i] : 0, reset});
    }
    task_cv_.notify_all();
  }

  void wait_ready(int n) {
    std::unique_lock<std::mutex> lk(mu_);
    ready_cv_.wait(lk, [this, n] { return static_cast<int>(ready_.size()) >= n; });
  }

  void drain_ordered(void* obs, float* rew, float* raw_rew, uint8_t* term,
                     uint8_t* trunc, int32_t* elapsed) {
    std::lock_guard<std::mutex> lk(mu_);
    for (const Result& r : ready_) results_[r.env_id] = r;
    ready_.clear();
    if (obs)
      std::memcpy(obs, obs_buf_.data(),
                  static_cast<size_t>(cfg_.num_envs) * info_.obs_size_bytes);
    for (int i = 0; i < cfg_.num_envs; ++i) {
      if (rew) rew[i] = results_[i].reward;
      if (raw_rew) raw_rew[i] = results_[i].raw_reward;
      if (term) term[i] = results_[i].terminated;
      if (trunc) trunc[i] = results_[i].truncated;
      if (elapsed) elapsed[i] = results_[i].elapsed;
    }
  }

  void worker_loop() {
    for (;;) {
      Task t;
      {
        std::unique_lock<std::mutex> lk(mu_);
        task_cv_.wait(lk, [this] { return shutdown_ || !tasks_.empty(); });
        if (shutdown_) return;
        t = tasks_.front();
        tasks_.pop_front();
      }
      Result r{};
      r.env_id = t.env_id;
      uint8_t* obs_dst =
          obs_buf_.data() + static_cast<size_t>(t.env_id) * info_.obs_size_bytes;
      if (t.is_reset) {
        envs_[t.env_id]->reset(obs_dst);
        elapsed_[t.env_id] = 0;
      } else {
        StepResult s = envs_[t.env_id]->step(t.action, obs_dst);
        int el = ++elapsed_[t.env_id];
        r.reward = s.reward;
        r.raw_reward = s.raw_reward;
        r.terminated = s.terminated;
        r.truncated = !s.terminated && el >= cfg_.max_episode_steps;
        if (s.terminated || r.truncated) {
          // EnvPool auto-reset: overwrite with the fresh episode's first obs.
          envs_[t.env_id]->reset(obs_dst);
          elapsed_[t.env_id] = 0;
        }
      }
      r.elapsed = elapsed_[t.env_id];
      {
        std::lock_guard<std::mutex> lk(mu_);
        ready_.push_back(r);
      }
      ready_cv_.notify_all();
    }
  }

  CConfig cfg_;
  TaskInfo info_;
  std::vector<std::unique_ptr<Env>> envs_;
  std::vector<int32_t> elapsed_;
  std::vector<uint8_t> obs_buf_;   // per-env latest observation, env-indexed
  std::vector<Result> results_;    // sync-mode env-ordered scratch

  std::mutex mu_;
  std::condition_variable task_cv_, ready_cv_;
  std::deque<Task> tasks_;
  std::deque<Result> ready_;
  bool shutdown_ = false;
  std::vector<std::thread> workers_;
};

}  // namespace
}  // namespace cleanba

// ----------------------------- C ABI -----------------------------
extern "C" {

void* cb_make(const char* task, const cleanba::CConfig* cfg) {
  try {
    return new cleanba::Engine(task, *cfg);
  } catch (...) {
    return nullptr;
  }
}

void cb_close(void* h) { delete static_cast<cleanba::Engine*>(h); }

int32_t cb_obs_ndim(void* h) {
  return static_cast<int32_t>(static_cast<cleanba::Engine*>(h)->info().obs_shape.size());
}

void cb_obs_shape(void* h, int64_t* out) {
  const auto& s = static_cast<cleanba::Engine*>(h)->info().obs_shape;
  for (size_t i = 0; i < s.size(); ++i) out[i] = s[i];
}

int32_t cb_obs_dtype(void* h) { return static_cast<cleanba::Engine*>(h)->info().obs_dtype; }

int32_t cb_num_actions(void* h) {
  return static_cast<cleanba::Engine*>(h)->info().num_actions;
}

void cb_reset(void* h, void* obs) { static_cast<cleanba::Engine*>(h)->reset_all(obs); }

void cb_step(void* h, const int32_t* actions, void* obs, float* rew, float* raw_rew,
             uint8_t* term, uint8_t* trunc, int32_t* elapsed) {
  static_cast<cleanba::Engine*>(h)->step_all(actions, obs, rew, raw_rew, term, trunc, elapsed);
}

void cb_async_reset(void* h) { static_cast<cleanba::Engine*>(h)->async_reset(); }

void cb_send(void* h, const int32_t* env_ids, const int32_t* actions, int32_t n) {
  static_cast<cleanba::Engine*>(h)->send(env_ids, actions, n);
}

int32_t cb_recv(void* h, int32_t* env_ids, void* obs, float* rew, float* raw_rew,
                uint8_t* term, uint8_t* trunc, int32_t* elapsed) {
  return static_cast<cleanba::Engine*>(h)->recv(env_ids, obs, rew, raw_rew, term, trunc, elapsed);
}

}  // extern "C"
