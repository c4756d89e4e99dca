"""Anakin trainer tests on the 8-virtual-device CPU mesh (conftest.py).

Covers: the single-program train step compiles and executes over a real
multi-device mesh with sharded envs + replicated params, learning actually
happens on CartPole, and the update is bitwise deterministic per seed.
"""

import jax
import jax.numpy as jnp
import numpy as np

from cleanba_tpu import train_ppo_anakin as anakin
from cleanba_tpu.config import PPOConfig
from cleanba_tpu.runtime.agent import build_agent


def _setup(env_id, network, n_envs, num_steps, seed=1, **kw):
    cfg = PPOConfig(
        env_id=env_id, network=network, total_timesteps=10**6,
        local_num_envs=n_envs, num_actor_threads=1, num_steps=num_steps,
        num_minibatches=2, update_epochs=1, log_frequency=1,
        run_dir="/tmp/anakin_test", seed=seed, **kw,
    )
    cfg.resolve()
    env = anakin.make_jax_env(cfg.env_id, {"repeat_action_probability": 0.25})
    mesh = jax.sharding.Mesh(np.array(jax.local_devices()), (anakin.AXIS,))
    key = jax.random.PRNGKey(cfg.seed)
    obs_shape = env.obs_shape
    dtype = np.uint8 if env.obs_dtype == jnp.uint8 else np.float32
    agent = build_agent(cfg, env.num_actions, np.zeros((1, *obs_shape), dtype), key)
    step = anakin.build_train_step(cfg, env, mesh, agent, n_envs)
    carry = anakin.make_anakin_state(cfg, env, mesh, agent, key)
    return cfg, step, carry


def test_train_step_runs_on_mesh(eight_cpu_devices):
    cfg, step, carry = _setup("Breakout-v5", "impala_cnn", n_envs=16, num_steps=4)
    carry, metrics, charts = step(carry)
    assert np.isfinite(float(metrics.loss))
    assert np.isfinite(float(charts[0]))
    # env state stays sharded over the mesh after the step
    assert len(carry.obs.sharding.device_set) == 8


def test_cartpole_learns(eight_cpu_devices):
    cfg, step, carry = _setup("CartPole-v1", "mlp", n_envs=32, num_steps=32)
    first_ret = None
    for i in range(12):
        carry, metrics, charts = step(carry)
        ret = float(charts[0])
        if i == 1:
            first_ret = ret
    assert np.isfinite(float(metrics.loss))
    assert ret > first_ret, f"no learning signal: {first_ret} -> {ret}"


def test_update_is_deterministic(eight_cpu_devices):
    def run():
        cfg, step, carry = _setup("CartPole-v1", "mlp", n_envs=16, num_steps=8, seed=7)
        for _ in range(2):
            carry, metrics, charts = step(carry)
        leaf = jax.tree.leaves(carry.agent_state.params)[0]
        return np.asarray(jax.device_get(leaf)), float(metrics.loss)

    p1, l1 = run()
    p2, l2 = run()
    assert l1 == l2
    np.testing.assert_array_equal(p1, p2)


def test_train_entrypoint_smoke(eight_cpu_devices, tmp_path):
    cfg = PPOConfig(
        env_id="CartPole-v1", network="mlp", total_timesteps=2048,
        local_num_envs=16, num_actor_threads=1, num_steps=16,
        num_minibatches=2, update_epochs=1, log_frequency=4,
        run_dir=str(tmp_path), seed=3,
    )
    cfg.resolve()
    params, stats = anakin.train(cfg)
    assert stats["global_step"] == 2048
    assert jax.tree.leaves(params)


def test_impala_anakin_cartpole_learns(eight_cpu_devices, tmp_path):
    from cleanba_tpu import train_impala_anakin as ia
    from cleanba_tpu.config import ImpalaConfig

    cfg = ImpalaConfig(
        env_id="CartPole-v1", network="mlp", total_timesteps=32 * 20 * 10,
        local_num_envs=32, num_actor_threads=1, num_minibatches=4,
        log_frequency=5, run_dir=str(tmp_path), seed=2,
    )
    cfg.resolve()
    params, stats = ia.train(cfg)
    assert stats["global_step"] == 32 * 20 * 10
    assert np.isfinite(stats["loss"])
    assert stats["avg_episodic_return"] > 15.0  # random policy baseline ~9


def test_impala_anakin_bootstrap_row_carries(eight_cpu_devices):
    """The first storage row of update N+1 must be the last row of update N
    (reference carry, cleanba_impala.py:415-416) — checked via determinism:
    two runs with the same seed produce identical params."""
    from cleanba_tpu import train_impala_anakin as ia
    from cleanba_tpu.config import ImpalaConfig

    def run():
        cfg = ImpalaConfig(
            env_id="CartPole-v1", network="mlp", total_timesteps=16 * 20 * 3,
            local_num_envs=16, num_actor_threads=1, num_minibatches=2,
            log_frequency=100, run_dir="/tmp/ia_det", seed=11,
        )
        cfg.resolve()
        params, stats = ia.train(cfg)
        return np.asarray(jax.tree.leaves(params)[0]), stats["loss"] if "loss" in stats else 0.0

    p1, _ = run()
    p2, _ = run()
    np.testing.assert_array_equal(p1, p2)


def test_anakin_checkpoint_resume(eight_cpu_devices, tmp_path):
    """Interrupt after N updates, resume, and land on the same num_updates."""
    from cleanba_tpu.config import PPOConfig

    def cfg_for(total):
        cfg = PPOConfig(
            env_id="CartPole-v1", network="mlp", total_timesteps=total,
            local_num_envs=16, num_actor_threads=1, num_steps=16,
            num_minibatches=2, update_epochs=1, log_frequency=100,
            checkpoint_frequency=2, resume=True,
            run_dir=str(tmp_path), seed=5, run_name="resume_test",
        )
        cfg.resolve()
        return cfg

    # Phase 1: 4 updates (1024 steps), checkpoints at update 2 and 4.
    params1, stats1 = anakin.train(cfg_for(16 * 16 * 4))
    assert stats1["global_step"] == 1024
    # Phase 2: same run dir, target 8 updates total -> resumes from update 4.
    params2, stats2 = anakin.train(cfg_for(16 * 16 * 8))
    assert stats2["global_step"] == 2048  # 4 restored + 4 new updates


import pytest


@pytest.mark.parametrize("env_id", ["Freeway-v5", "Boxing-v5", "Seaquest-v5", "Qbert-v5",
                                    "MsPacman-v5", "DemonAttack-v5",
                                    "Atlantis-v5", "FishingDerby-v5",
                                    "Assault-v5", "Phoenix-v5", "Gopher-v5",
                                    "NameThisGame-v5", "Riverraid-v5",
                                    "KungFuMaster-v5", "Tennis-v5", "StarGunner-v5",
                                    "Leaper-v0", "ChaserHard-v0",
                                    "Starpilot-v0", "FruitbotHard-v0"])
def test_new_games_train_step_on_mesh(eight_cpu_devices, env_id):
    """Every second-wave game runs through the full sharded Anakin update."""
    cfg, step, carry = _setup(env_id, "impala_cnn", n_envs=16, num_steps=4)
    carry, metrics, charts = step(carry)
    assert np.isfinite(float(metrics.loss))
    assert len(carry.obs.sharding.device_set) == 8
