// Leaper — procgen-style road-and-river crosser (clone of procgen's leaper
// task, part of the reference's procgen family: legacy_scripts/
// cleanba_ppo_envpool_procgen.py uses plain `envpool.make(env_id)` over the
// procgen suite). Hop up through car lanes, ride logs across the river, reach
// the finish strip for +10; cars, water, and drifting off-screen kill.
// Lane counts/speeds/phases are procedurally drawn each episode; hard mode
// adds lanes. The pure-JAX twin lives in cleanba_tpu/envs/jax_procgen_extra.py.

#include <cstring>

#include "procgen_like.h"

namespace cleanba {
namespace {

constexpr int kMaxLanes = 4;   // per kind (road / river)
constexpr int kCars = 2;       // per road lane
constexpr int kLogs = 2;       // per river lane
constexpr float kLaneH = 5.0f;
constexpr float kFrog = 4.0f;
constexpr float kCarW = 7.0f, kCarH = 3.0f;
constexpr float kLogW = 12.0f, kLogH = 4.0f;

class LeaperEnv : public ProcgenLikeEnv {
 public:
  LeaperEnv(const EnvOptions& opts, bool hard) : ProcgenLikeEnv(opts), hard_(hard) {}

 protected:
  void reset_level(PCG32& rng) override {
    n_road_ = (hard_ ? 3 : 2) + static_cast<int>(rng.randint(2));
    n_river_ = (hard_ ? 3 : 2) + static_cast<int>(rng.randint(2));
    rows_ = n_river_ + n_road_ + 3;  // finish + river + safe + road + start
    y0_ = (kPg - rows_ * kLaneH) / 2.0f;
    for (int l = 0; l < n_road_; ++l) {
      road_speed_[l] = (0.5f + 0.7f * rng.uniform()) * (l % 2 ? 1.0f : -1.0f);
      for (int c = 0; c < kCars; ++c)
        car_x_[l][c] = rng.uniform() * kPg * 0.5f + c * kPg * 0.5f;
    }
    for (int l = 0; l < n_river_; ++l) {
      log_speed_[l] = (0.3f + 0.5f * rng.uniform()) * (l % 2 ? 1.0f : -1.0f);
      for (int c = 0; c < kLogs; ++c)
        log_x_[l][c] = rng.uniform() * kPg * 0.5f + c * kPg * 0.5f;
    }
    frog_row_ = rows_ - 1;
    frog_x_ = kPg / 2.0f - kFrog / 2.0f;
  }

  StepResult act(const PgAction& a, PCG32&) override {
    StepResult out;
    // Hop rows on vertical input, slide on horizontal (procgen's leaper
    // moves one lane per press; we sample per engine frame).
    frog_x_ += 2.5f * a.dx;
    if (frog_x_ < 0.0f) frog_x_ = 0.0f;
    if (frog_x_ > kPg - kFrog) frog_x_ = kPg - kFrog;
    if (a.dy < 0 && frog_row_ > 0) --frog_row_;          // procgen UP = dy<0 here
    if (a.dy > 0 && frog_row_ < rows_ - 1) ++frog_row_;

    // World advances.
    for (int l = 0; l < n_road_; ++l)
      for (int c = 0; c < kCars; ++c) car_x_[l][c] = wrap(car_x_[l][c] + road_speed_[l], kCarW);
    for (int l = 0; l < n_river_; ++l)
      for (int c = 0; c < kLogs; ++c) log_x_[l][c] = wrap(log_x_[l][c] + log_speed_[l], kLogW);

    // Row semantics. Row 0 = finish; 1..n_river = river; n_river+1 = safe;
    // next n_road = road; last = start.
    if (frog_row_ == 0) {
      out.raw_reward = 10.0f;
      out.terminated = true;
    } else if (frog_row_ >= 1 && frog_row_ <= n_river_) {
      int l = frog_row_ - 1;
      bool on_log = false;
      for (int c = 0; c < kLogs; ++c) {
        if (frog_x_ + kFrog / 2.0f >= log_x_[l][c] &&
            frog_x_ + kFrog / 2.0f <= log_x_[l][c] + kLogW) {
          on_log = true;
          break;
        }
      }
      if (!on_log) {
        out.terminated = true;  // in the water
      } else {
        frog_x_ += log_speed_[l];  // drift with the log
        if (frog_x_ < -kFrog / 2.0f || frog_x_ > kPg - kFrog / 2.0f)
          out.terminated = true;  // carried off-screen
      }
    } else if (frog_row_ >= n_river_ + 2 && frog_row_ < rows_ - 1) {
      int l = frog_row_ - n_river_ - 2;
      for (int c = 0; c < kCars; ++c) {
        if (frog_x_ + kFrog > car_x_[l][c] && frog_x_ < car_x_[l][c] + kCarW) {
          out.terminated = true;  // run over
          break;
        }
      }
    }
    out.reward = out.raw_reward;
    return out;
  }

  void render(uint8_t* f) const override {
    fill(f, 28, 30, 34);
    // Strips.
    rect(f, 0, y0_, kPg, kLaneH, 60, 160, 70);  // finish
    for (int l = 0; l < n_river_; ++l)
      rect(f, 0, y0_ + (1 + l) * kLaneH, kPg, kLaneH, 40, 70, 170);
    rect(f, 0, y0_ + (1 + n_river_) * kLaneH, kPg, kLaneH, 110, 110, 100);  // safe
    for (int l = 0; l < n_road_; ++l)
      rect(f, 0, y0_ + (2 + n_river_ + l) * kLaneH, kPg, kLaneH, 55, 55, 60);
    rect(f, 0, y0_ + (rows_ - 1) * kLaneH, kPg, kLaneH, 110, 110, 100);  // start
    // Logs then cars then frog.
    for (int l = 0; l < n_river_; ++l)
      for (int c = 0; c < kLogs; ++c)
        rect(f, log_x_[l][c], y0_ + (1 + l) * kLaneH + 0.5f, kLogW, kLogH, 140, 95, 50);
    for (int l = 0; l < n_road_; ++l)
      for (int c = 0; c < kCars; ++c)
        rect(f, car_x_[l][c], y0_ + (2 + n_river_ + l) * kLaneH + 1.0f, kCarW, kCarH,
             210, 210, 220);
    rect(f, frog_x_, y0_ + frog_row_ * kLaneH + 0.5f, kFrog, kFrog, 90, 220, 60);
  }

 private:
  static float wrap(float x, float w) {
    if (x < -w) return x + kPg + w;
    if (x > kPg) return x - (kPg + w);
    return x;
  }

  bool hard_;
  int n_road_ = 2, n_river_ = 2, rows_ = 7;
  float y0_ = 0;
  float road_speed_[kMaxLanes] = {}, log_speed_[kMaxLanes] = {};
  float car_x_[kMaxLanes][kCars] = {}, log_x_[kMaxLanes][kLogs] = {};
  int frog_row_ = 0;
  float frog_x_ = 0;
};

}  // namespace

std::unique_ptr<Env> make_leaper_env(const EnvOptions& opts, bool hard) {
  return std::make_unique<LeaperEnv>(opts, hard);
}

}  // namespace cleanba
