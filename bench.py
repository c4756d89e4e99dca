"""Headline benchmark: Breakout-v5 PPO env-steps/s on one TPU chip.

Runs the flagship TPU-native path — the Anakin trainer
(cleanba_tpu/train_ppo_anakin.py): on-device JAX envs, so the whole
rollout -> GAE -> minibatch-epoch update compiles into one XLA program per
update. Reference PPO hyperparameters (128 envs, T=128, 4 minibatches,
4 epochs — the same batch of 16384 as cleanba_ppo.py defaults) with bf16
conv compute (f32 params/optimizer).

Baseline: the reference's 1xA100 full Breakout-v5 run — 50M env steps in
154.079 min (README.md:104) = 5409 env-steps/s per chip. Learning quality is
validated separately (tests + learning curves: return ~65 by 2M steps).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "env_steps/s", "vs_baseline": N/5409}
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_SPS = 50_000_000 / (154.079 * 60)  # reference 1xA100 Breakout PPO


def run_bench(num_updates: int = 10, warmup_updates: int = 2) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cleanba_tpu import train_ppo_anakin as anakin
    from cleanba_tpu.config import PPOConfig
    from cleanba_tpu.envs import PROTOCOLS
    from cleanba_tpu.runtime.agent import build_agent

    cfg = PPOConfig(
        env_id="Breakout-v5",
        local_num_envs=128,
        num_actor_threads=1,
        num_steps=128,
        num_minibatches=4,
        update_epochs=4,
        bf16=True,
        log_frequency=10**9,
        run_dir="/tmp/bench_runs",
        total_timesteps=128 * 128 * num_updates,
    )
    cfg.resolve()

    env = anakin.make_jax_env(cfg.env_id, dict(PROTOCOLS["machado"]))
    mesh = jax.sharding.Mesh(np.array(jax.local_devices()), (anakin.AXIS,))
    key = jax.random.PRNGKey(cfg.seed)
    agent = build_agent(
        cfg, env.num_actions, np.zeros((1, 84, 84, 4), np.uint8), key,
        compute_dtype=jnp.bfloat16,
    )
    n_envs = cfg.local_num_envs * cfg.num_actor_threads
    train_step = anakin.build_train_step(cfg, env, mesh, agent, n_envs)
    carry = anakin.make_anakin_state(cfg, env, mesh, agent, key)

    steps_per_update = n_envs * cfg.num_steps
    times = []
    for i in range(num_updates):
        t0 = time.time()
        carry, metrics, charts = train_step(carry)
        loss = float(metrics.loss)  # force completion on the remote chip
        times.append(time.time() - t0)
        print(f"[bench] update {i + 1}: {times[-1]:.2f}s loss={loss:.3f} "
              f"ret={float(charts[0]):.2f}", file=sys.stderr, flush=True)
    steady = times[warmup_updates:]
    sps = steps_per_update * len(steady) / sum(steady)
    return {
        "metric": "breakout_ppo_env_steps_per_sec_per_chip",
        "value": round(sps, 1),
        "unit": "env_steps/s",
        "vs_baseline": round(sps / BASELINE_SPS, 3),
    }


if __name__ == "__main__":
    result = run_bench()
    print(json.dumps(result))
