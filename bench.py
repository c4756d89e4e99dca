"""Headline benchmark: Breakout-v5 PPO env-steps/s on one TPU chip.

Runs the real pipelined Sebulba trainer (actor + learner colocated on the
single available chip, concurrency on) for a fixed number of updates and
measures steady-state env-steps/s, excluding the compile/warmup updates.

Baseline: the reference's 1×A100 full Breakout-v5 run — 50M env steps in
154.079 min (README.md:104) = 5409 env-steps/s per chip.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "env_steps/s", "vs_baseline": N/5409}
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

BASELINE_SPS = 50_000_000 / (154.079 * 60)  # reference 1xA100 Breakout PPO

# Keep XLA/host threads off the two env-stepping cores as much as possible.
os.environ.setdefault("XLA_FLAGS", "")


def run_bench(num_updates: int = 12, warmup_updates: int = 3) -> dict:
    import jax
    import numpy as np

    from cleanba_tpu.config import PPOConfig
    from cleanba_tpu.runtime import trainer as trainer_mod

    cfg = PPOConfig(
        env_id="Breakout-v5",
        local_num_envs=64,
        num_actor_threads=2,
        num_steps=128,
        num_minibatches=4,
        update_epochs=4,
        concurrency=True,
        log_frequency=1000000,  # silence periodic logging
        run_dir="/tmp/bench_runs",
        total_timesteps=64 * 128 * 2 * num_updates,
    )

    # Observe learner-loop progress by wrapping the update fn via a module hook.
    progress = {"updates": [], "t": []}
    real_make_ppo_update = trainer_mod.make_ppo_update

    def instrumented_make_ppo_update(*args, **kw):
        fn = real_make_ppo_update(*args, **kw)

        def wrapped(*a, **k):
            out = fn(*a, **k)
            # Force true completion: fetch a metric scalar (block_until_ready
            # alone does not guarantee remote execution finished on this stack).
            float(out[1].loss)
            n = len(progress["updates"]) + 1
            now = time.time()
            if progress["t"]:
                print(f"[bench] update {n}: {now - progress['t'][-1]:.2f}s", file=sys.stderr, flush=True)
            progress["updates"].append(n)
            progress["t"].append(now)
            return out

        return wrapped

    trainer_mod.make_ppo_update = instrumented_make_ppo_update
    try:
        t0 = time.time()
        trainer_mod.train(cfg)
        total_wall = time.time() - t0
    finally:
        trainer_mod.make_ppo_update = real_make_ppo_update

    steps_per_update = cfg.local_num_envs * cfg.num_steps * cfg.num_actor_threads
    ts = progress["t"]
    if len(ts) > warmup_updates + 1:
        steady_updates = len(ts) - warmup_updates - 1
        steady_time = ts[-1] - ts[warmup_updates]
        sps = steps_per_update * steady_updates / steady_time
    else:
        sps = steps_per_update * len(ts) / total_wall
    return {
        "metric": "breakout_ppo_env_steps_per_sec_per_chip",
        "value": round(sps, 1),
        "unit": "env_steps/s",
        "vs_baseline": round(sps / BASELINE_SPS, 3),
    }


if __name__ == "__main__":
    result = run_bench()
    print(json.dumps(result))
