"""Headline benchmark: Breakout-v5 env-steps/s on one TPU chip, all four
trainer paths.

Headline metric (the JSON line's value): the flagship TPU-native path —
**Anakin PPO** (cleanba_tpu/train_ppo_anakin.py): on-device JAX envs, so the
whole rollout -> GAE -> minibatch-epoch update compiles into one XLA program
per update. Reference PPO hyperparameters (128 envs, T=128, 4 minibatches,
4 epochs — the same 16384 batch as cleanba_ppo.py defaults) with bf16 conv
compute (f32 params/optimizer).

Secondary metrics (the `secondary` dict in the same JSON line):
- anakin_impala_sps — Anakin IMPALA/V-trace (T=20, RMSProp).
- sebulba_ppo_sps / sebulba_impala_sps — the reference-parity architecture:
  C++ envs on host CPUs, actor threads, maxsize-1 queues, shard_map learner.
  On this tunneled single chip every env-step pays a ~27ms host<->device
  round trip, so these are tunnel-penalized (BENCH notes in ARCHITECTURE.md);
  on a real TPU VM the host-local dispatch removes that penalty.

Baseline: the reference's 1xA100 full Breakout-v5 run — 50M env steps in
154.079 min (README.md:104) = 5409 env-steps/s per chip.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "env_steps/s", "vs_baseline": N/5409,
   "secondary": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

# Reuse the repo's persistent XLA compile cache (populated by sweeps and
# earlier bench runs) — first-compile through the tunneled remote compiler
# costs minutes per program otherwise. Must be set before jax imports.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

BASELINE_SPS = 50_000_000 / (154.079 * 60)  # reference 1xA100 Breakout PPO


def bench_anakin_ppo(num_updates: int = 10, warmup_updates: int = 2) -> float:
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
    # Warmup (compile + first dispatches), forced per update for visibility.
    for i in range(warmup_updates):
        t0 = time.time()
        carry, metrics, charts = train_step(carry)
        loss = float(metrics.loss)  # force completion on the remote chip
        print(f"[bench:anakin_ppo] warmup {i + 1}: {time.time() - t0:.2f}s "
              f"loss={loss:.3f} ret={float(charts[0]):.2f}",
              file=sys.stderr, flush=True)
    # Steady window: dispatch every update, force once at the end — this is
    # how train() actually runs (async dispatch, metrics fetched only every
    # log_frequency), so per-update host round trips don't pollute the number.
    t0 = time.time()
    for i in range(num_updates):
        carry, metrics, charts = train_step(carry)
    loss = float(metrics.loss)
    dt = time.time() - t0
    print(f"[bench:anakin_ppo] steady: {num_updates} updates in {dt:.2f}s "
          f"({dt / num_updates * 1000:.0f} ms/update) loss={loss:.3f} "
          f"ret={float(charts[0]):.2f}", file=sys.stderr, flush=True)
    return steps_per_update * num_updates / dt


def bench_anakin_impala(num_updates: int = 40, warmup_updates: int = 5) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cleanba_tpu import train_impala_anakin as anakin
    from cleanba_tpu.config import ImpalaConfig
    from cleanba_tpu.envs import PROTOCOLS
    from cleanba_tpu.runtime.agent import build_agent

    cfg = ImpalaConfig(
        env_id="Breakout-v5",
        local_num_envs=128,
        num_actor_threads=1,
        num_steps=20,
        num_minibatches=4,
        bf16=True,
        log_frequency=10**9,
        run_dir="/tmp/bench_runs",
        total_timesteps=128 * 20 * num_updates,
    )
    cfg.resolve()

    env = anakin.make_jax_env(cfg.env_id, dict(PROTOCOLS["machado"]))
    from cleanba_tpu.train_ppo_anakin import AXIS

    mesh = jax.sharding.Mesh(np.array(jax.local_devices()), (AXIS,))
    key = jax.random.PRNGKey(cfg.seed)
    agent = build_agent(
        cfg, env.num_actions, np.zeros((1, 84, 84, 4), np.uint8), key,
        compute_dtype=jnp.bfloat16,
    )
    n_envs = cfg.local_num_envs * cfg.num_actor_threads
    train_step, sample_step = anakin.build_train_step(cfg, env, mesh, agent, n_envs)
    carry = anakin.make_impala_anakin_state(cfg, env, mesh, agent, key, sample_step)

    steps_per_update = n_envs * cfg.num_steps
    for i in range(warmup_updates):
        carry, metrics, charts = train_step(carry)
        loss = float(metrics.loss)
    print(f"[bench:anakin_impala] warmup done, loss={loss:.3f}",
          file=sys.stderr, flush=True)
    t0 = time.time()
    for i in range(num_updates):
        carry, metrics, charts = train_step(carry)
    loss = float(metrics.loss)
    dt = time.time() - t0
    print(f"[bench:anakin_impala] steady: {num_updates} updates in {dt:.2f}s "
          f"({dt / num_updates * 1000:.1f} ms/update) loss={loss:.3f}",
          file=sys.stderr, flush=True)
    return steps_per_update * num_updates / dt


def bench_sebulba(algo: str, num_updates: int = 12) -> float:
    """End-to-end Sebulba trainer SPS (C++ envs + actor threads + shard_map
    learner), measured inside the learner loop past the compile/warmup
    updates. Tunnel-penalized on this host (see module docstring)."""
    from cleanba_tpu.config import ImpalaConfig, PPOConfig
    from cleanba_tpu.runtime.trainer import train

    # Thread layout matters on this 2-vCPU host: ONE actor thread with all 128
    # envs beats two threads x 64 (the overlap study in ARCHITECTURE.md —
    # extra actor + engine worker threads oversubscribe the cores and slow the
    # host env loop ~3x, inverting the concurrency win).
    common = dict(
        env_id="Breakout-v5",
        local_num_envs=128,
        num_actor_threads=1,
        num_minibatches=4,
        bf16=True,
        concurrency=True,
        device_stack=True,
        log_frequency=10**9,
        run_dir="/tmp/bench_runs",
        env_backend="native",
    )
    if algo == "ppo":
        cfg = PPOConfig(num_steps=128, update_epochs=4,
                        total_timesteps=128 * 128 * num_updates, **common)
    else:
        # Dispatch pipelining (round 4): sub-batch async_batch_size=32 with
        # inference_pipeline_depth=4 keeps four inference round trips in
        # flight, so the ~25ms tunnel RTT overlaps instead of serializing —
        # measured 1790 SPS vs 1175 full-pool and 463 unpipelined at the
        # same sub-batch (static/perf_sweep_r4.jsonl).
        cfg = ImpalaConfig(num_steps=20, async_batch_size=32,
                           inference_pipeline_depth=4,
                           total_timesteps=128 * 20 * max(num_updates, 30), **common)
    import contextlib

    # Keep stdout clean for the single JSON result line (train() pprints the
    # resolved config and progress to stdout).
    with contextlib.redirect_stdout(sys.stderr):
        stats = train(cfg)
    print(f"[bench:sebulba_{algo}] {stats}", file=sys.stderr, flush=True)
    return float(stats["sps"])


def _median_of(fn, n: int = 3) -> tuple:
    """Median-of-n with the raw samples: the Sebulba numbers swung ±20%
    between rounds on this shared 2-vCPU host (r3 2444 -> r4 1967 at the same
    config), so the metric of record now carries its own spread."""
    samples = sorted(round(fn(), 1) for _ in range(n))
    return samples[n // 2], samples


def run_bench() -> dict:
    sps = bench_anakin_ppo()
    secondary = {}
    for name, fn in (
        ("anakin_impala_sps", bench_anakin_impala),
    ):
        try:
            secondary[name] = round(fn(), 1)
        except Exception as e:  # a secondary path must not sink the headline
            print(f"[bench] {name} failed: {e}", file=sys.stderr, flush=True)
            secondary[name] = None
    for name, fn in (
        ("sebulba_ppo_sps", lambda: bench_sebulba("ppo")),
        ("sebulba_impala_sps", lambda: bench_sebulba("impala")),
    ):
        try:
            med, samples = _median_of(fn, 3)
            secondary[name] = med
            secondary[name + "_samples"] = samples
        except Exception as e:
            print(f"[bench] {name} failed: {e}", file=sys.stderr, flush=True)
            secondary[name] = None
    return {
        "metric": "breakout_ppo_env_steps_per_sec_per_chip",
        "value": round(sps, 1),
        "unit": "env_steps/s",
        "vs_baseline": round(sps / BASELINE_SPS, 3),
        "secondary": secondary,
    }


if __name__ == "__main__":
    result = run_bench()
    print(json.dumps(result))
