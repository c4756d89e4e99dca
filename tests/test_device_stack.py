"""On-device frame stacking correctness vs engine-side stacking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cleanba_tpu.config import PPOConfig
from cleanba_tpu.envs import make_env
from cleanba_tpu.envs.native import native_available
from cleanba_tpu.runtime.agent import build_agent

needs_native = pytest.mark.skipif(not native_available(), reason="native engine not built")


@needs_native
def test_device_stack_matches_engine_stack():
    """engine(frame_stack=1) + on-device stacker == engine(frame_stack=4),
    including episode-boundary resets."""
    e4 = make_env("Breakout-v5", seed=9, num_envs=4)()
    e1 = make_env("Breakout-v5", seed=9, num_envs=4, frame_stack=1)()
    cfg = PPOConfig()
    agent = build_agent(cfg, 18, np.zeros((1, 84, 84, 4), np.uint8), jax.random.PRNGKey(0))

    obs4, _ = e4.reset()
    obs1, _ = e1.reset()
    stack = jnp.repeat(jnp.asarray(obs1), 4, axis=-1)
    np.testing.assert_array_equal(np.asarray(stack), obs4)

    rng = np.random.default_rng(0)
    for t in range(120):  # long enough to cross life-loss boundaries
        a = rng.integers(0, 18, size=4).astype(np.int32)
        obs4, r4, term4, trunc4, i4 = e4.step(a)
        obs1, r1, term1, trunc1, i1 = e1.step(a)
        np.testing.assert_array_equal(r4, r1)
        first = (i1["elapsed_step"] == 0).astype(np.float32)
        stack = agent.stack_frames(stack, jnp.asarray(obs1), jnp.asarray(first))
        np.testing.assert_array_equal(np.asarray(stack), obs4, err_msg=f"step {t}")
    e4.close()
    e1.close()


@needs_native
def test_ppo_device_stack_e2e(tmp_path):
    """Tiny Breakout PPO run with --device-stack completes on CPU."""
    from cleanba_tpu.runtime.trainer import train

    cfg = PPOConfig(
        env_id="Breakout-v5", local_num_envs=4, num_steps=4, num_actor_threads=1,
        num_minibatches=2, update_epochs=1, total_timesteps=32,
        device_stack=True, run_dir=str(tmp_path), log_frequency=50,
        channels=[4, 8], hiddens=[32],
    )
    train(cfg)
