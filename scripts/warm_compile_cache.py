"""Warm the persistent XLA compile cache for the catalog HNS sweep.

The Anakin trainers compile ONE XLA program per game (the env step logic is
inlined into the train step), and on the tunneled remote compiler each fresh
game costs minutes of compile while the training itself takes ~2 min. This
script front-loads those compiles: it replays the exact program-construction
path of `cleanba_tpu.train_impala_anakin.train()` for every requested game
and executes one update, which (a) populates JAX_COMPILATION_CACHE_DIR with
byte-identical cache keys for the sweep's subsequent runs and (b) overlaps
many remote compiles via a thread pool — compile RPCs release the GIL, and
the compile service processes independent programs concurrently.

Run it ALONGSIDE the sweep (the tunnel multiplexes clients; each warm step
costs the running trainer ~50 ms of device time per game):

    JAX_COMPILATION_CACHE_DIR=.jax_cache CLEANBA_FRAMESKIP_UNROLL=1 \
      python scripts/warm_compile_cache.py --threads 4 \
      --total-timesteps 4000000 --skip-done runs/hns_sweep
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def warm_one(env_id: str, total_timesteps: int) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cleanba_tpu import train_impala_anakin as anakin
    from cleanba_tpu.config import ImpalaConfig
    from cleanba_tpu.envs import PROTOCOLS
    from cleanba_tpu.envs.jax_engine import make_jax_env
    from cleanba_tpu.runtime.agent import build_agent

    t0 = time.time()
    # Must match scripts/run_hns_sweep.sh's trainer flags exactly — config
    # constants (lr schedule horizon etc.) are baked into the program.
    cfg = ImpalaConfig(
        env_id=env_id, local_num_envs=128, num_steps=20, bf16=True,
        total_timesteps=total_timesteps, log_frequency=20,
        run_dir="/tmp/warm_runs",
    )
    cfg.resolve()
    proto = dict(PROTOCOLS.get(cfg.env_protocol, PROTOCOLS["machado"]))
    env = make_jax_env(cfg.env_id, proto)
    mesh = jax.sharding.Mesh(np.array(jax.local_devices()), (anakin.AXIS,))
    key = jax.random.PRNGKey(cfg.seed)
    key, agent_key = jax.random.split(key)
    sample_obs = np.zeros((1, *env.obs_shape), np.uint8)
    agent = build_agent(cfg, env.num_actions, sample_obs, agent_key,
                        compute_dtype=jnp.bfloat16 if cfg.bf16 else jnp.float32)
    n_envs = cfg.local_num_envs * cfg.num_actor_threads
    train_step, sample_step = anakin.build_train_step(cfg, env, mesh, agent, n_envs)
    carry = anakin.make_impala_anakin_state(cfg, env, mesh, agent, key, sample_step)
    carry, metrics, _ = train_step(carry)
    jax.block_until_ready(metrics.loss)
    return time.time() - t0


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("games", nargs="*", help="default: full native Atari catalog")
    p.add_argument("--threads", type=int, default=4)
    p.add_argument("--total-timesteps", type=int, default=4_000_000)
    p.add_argument("--skip-done", default="",
                   help="sweep run dir: skip games with a .done_<game>_s1 marker")
    args = p.parse_args()

    from cleanba_tpu.envs import NATIVE_ATARI_TASKS

    games = args.games or list(NATIVE_ATARI_TASKS)
    if args.skip_done:
        games = [g for g in games
                 if not os.path.exists(os.path.join(args.skip_done, f".done_{g}_s1"))]
    print(f"warming {len(games)} games with {args.threads} threads", flush=True)

    t0 = time.time()
    with ThreadPoolExecutor(max_workers=args.threads) as pool:
        for g, fut in [(g, pool.submit(warm_one, g, args.total_timesteps)) for g in games]:
            try:
                dt = fut.result()
                print(f"warm {g}: {dt:.1f}s", flush=True)
            except Exception as e:  # keep warming the rest
                print(f"warm {g} FAILED: {e!r}", flush=True)
    print(f"total {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
