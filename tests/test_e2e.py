"""End-to-end trainer tests: learning, exact-seed determinism, resume, IMPALA.

BASELINE.json config 1: "CartPole-v1 PPO, 8 envs, MLP policy, single host CPU
(exact-seed rollout check)".
"""

import glob
import os

import numpy as np
import pytest

from cleanba_tpu.config import ImpalaConfig, PPOConfig
from cleanba_tpu.runtime.trainer import train


def cartpole_ppo_cfg(tmp_path, **kw):
    defaults = dict(
        env_id="CartPole-v1",
        network="mlp",
        hiddens=[64, 64],
        local_num_envs=8,
        num_steps=32,
        num_actor_threads=1,
        num_minibatches=2,
        update_epochs=2,
        total_timesteps=4096,
        learning_rate=2.5e-3,
        anneal_lr=False,
        concurrency=False,
        run_dir=str(tmp_path),
        log_frequency=50,
        env_backend="python",
    )
    defaults.update(kw)
    return PPOConfig(**defaults)


def test_ppo_cartpole_learns(tmp_path):
    """PPO on CartPole must improve eval returns above the random baseline
    (~20) within ~25k env steps."""
    cfg = cartpole_ppo_cfg(
        tmp_path, total_timesteps=65536, save_model=True, exp_name="learn"
    )
    train(cfg)
    # train() runs a 10-episode eval when save_model is set; re-evaluate here
    from cleanba_tpu.evaluate import evaluate

    model_path = os.path.join(cfg.run_path, "learn.cleanba_model")
    assert os.path.exists(model_path)
    returns = evaluate(model_path, "CartPole-v1", 10, "test-eval", cfg, seed=123)
    assert np.mean(returns) > 80, f"did not learn: eval returns {returns}"


def test_ppo_exact_seed_determinism(tmp_path):
    """Same seed, sync mode, single thread -> bit-identical final models."""
    import jax

    from cleanba_tpu.runtime.agent import build_agent
    from cleanba_tpu.utils.checkpoint import load_model

    models = []
    for run in range(2):
        cfg = cartpole_ppo_cfg(
            tmp_path / f"run{run}", total_timesteps=1024, save_model=True,
            exp_name="det", seed=42,
        )
        train(cfg)
        path = os.path.join(cfg.run_path, "det.cleanba_model")
        agent = build_agent(cfg, 2, np.zeros((1, 4), np.float32), jax.random.PRNGKey(0))
        models.append(load_model(path, agent.init_params))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        models[0], models[1],
    )


def test_checkpoint_resume(tmp_path):
    """Interrupted training resumes from the checkpointed update and produces
    additional checkpoints (the reference has no resume at all, SURVEY.md §5)."""
    cfg = cartpole_ppo_cfg(
        tmp_path, total_timesteps=1024, checkpoint_frequency=2, exp_name="ckpt",
    )
    cfg.run_name = "fixed-run"  # stable dir across both phases
    train(cfg)
    ckpts = sorted(glob.glob(os.path.join(cfg.run_path, "checkpoint_*.msgpack")))
    assert len(ckpts) >= 2

    # Phase 2: extend total_timesteps and resume from the latest checkpoint.
    cfg2 = cartpole_ppo_cfg(
        tmp_path, total_timesteps=2048, checkpoint_frequency=2, exp_name="ckpt",
        resume=True,
    )
    cfg2.run_name = "fixed-run"
    train(cfg2)
    ckpts2 = sorted(glob.glob(os.path.join(cfg2.run_path, "checkpoint_*.msgpack")))
    assert len(ckpts2) > len(ckpts)
    # the newest checkpoint must be beyond phase 1's final update (4)
    newest = max(int(os.path.basename(c).split("_")[1].split(".")[0]) for c in ckpts2)
    assert newest > 4


def test_impala_cartpole_runs(tmp_path):
    cfg = ImpalaConfig(
        env_id="CartPole-v1",
        network="mlp",
        hiddens=[64, 64],
        local_num_envs=8,
        num_steps=16,
        num_actor_threads=1,
        num_minibatches=2,
        total_timesteps=2048,
        anneal_lr=False,
        concurrency=True,
        run_dir=str(tmp_path),
        log_frequency=50,
        env_backend="python",
    )
    train(cfg)  # completes without deadlock or error


def test_ppo_concurrency_mode(tmp_path):
    """Pipelined mode (actors one policy version behind) must not deadlock."""
    cfg = cartpole_ppo_cfg(tmp_path, total_timesteps=1024, concurrency=True)
    train(cfg)


def test_ppo_prev_action_reward_variant(tmp_path):
    """R2D2-style input conditioning trains end to end (reference
    legacy_scripts/..._last_action_reward.py:168-183)."""
    cfg = cartpole_ppo_cfg(tmp_path, total_timesteps=1024, use_prev_action_reward=True)
    train(cfg)


def test_impala_asap_mode(tmp_path):
    cfg = ImpalaConfig(
        env_id="CartPole-v1", network="mlp", hiddens=[32], local_num_envs=8,
        num_steps=16, num_actor_threads=2, num_minibatches=2,
        total_timesteps=2048, anneal_lr=False, asap=True,
        run_dir=str(tmp_path), log_frequency=50, env_backend="python",
    )
    stats = train(cfg)
    # Every train() path returns the same stats contract (VERDICT r2 weak #4).
    assert set(stats) >= {"global_step", "sps", "num_updates"}
    assert stats["global_step"] >= cfg.total_timesteps


def test_throughput_test_mode_returns_stats(tmp_path):
    """--test-actor-learner-throughput returns the same stats dict as the
    normal path, so bench tooling can consume any mode uniformly."""
    cfg = cartpole_ppo_cfg(
        tmp_path, total_timesteps=1024, test_actor_learner_throughput=True,
        log_frequency=1,
    )
    stats = train(cfg)
    assert set(stats) >= {"global_step", "sps", "num_updates"}
    assert stats["sps"] > 0 and stats["num_updates"] == cfg.num_updates
