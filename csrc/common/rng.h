// PCG32 (PCG-XSH-RR) — bit-for-bit mirror of cleanba_tpu/envs/python_engine.py::PCG32
// so C++ and Python engines produce identical trajectories from the same seed.
#pragma once

#include <cstdint>

namespace cleanba {

struct PCG32 {
  uint64_t state;
  static constexpr uint64_t kMult = 6364136223846793005ULL;
  static constexpr uint64_t kInc = 1442695040888963407ULL;

  explicit PCG32(uint64_t seed) {
    state = 0;
    next_uint32();
    state += seed;
    next_uint32();
  }

  uint32_t next_uint32() {
    uint64_t old = state;
    state = old * kMult + kInc;
    uint32_t xorshifted = static_cast<uint32_t>(((old >> 18) ^ old) >> 27);
    uint32_t rot = static_cast<uint32_t>(old >> 59);
    return (xorshifted >> rot) | (xorshifted << ((32u - rot) & 31u));
  }

  // float32 in [0, 1): top 24 bits / 2^24 (same as the Python oracle).
  float uniform() { return static_cast<float>(next_uint32() >> 8) * (1.0f / 16777216.0f); }

  // uniform integer in [0, n)
  uint32_t randint(uint32_t n) { return n ? next_uint32() % n : 0; }
};

}  // namespace cleanba
