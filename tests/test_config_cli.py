"""Config derived-field math and the dataclass CLI bridge."""

import pytest

from cleanba_tpu.config import ImpalaConfig, PPOConfig
from cleanba_tpu.utils.cli import parse_cli


def test_ppo_defaults_batch_math():
    cfg = PPOConfig().resolve(world_size=1)
    # 64 envs * 128 steps * 2 threads * 1 actor chip (cleanba_ppo.py:411-418)
    assert cfg.local_batch_size == 64 * 128 * 2
    assert cfg.local_minibatch_size == cfg.local_batch_size // 4
    assert cfg.num_envs == 64 * 2
    assert cfg.num_updates == 50_000_000 // cfg.local_batch_size


def test_world_size_scaling():
    cfg = PPOConfig().resolve(world_size=4)
    assert cfg.batch_size == cfg.local_batch_size * 4
    assert cfg.num_updates == 50_000_000 // (cfg.local_batch_size * 4)


def test_divisibility_assert():
    cfg = PPOConfig(local_num_envs=6, learner_device_ids=[0, 1, 2, 3])
    with pytest.raises(AssertionError):
        cfg.resolve()


def test_impala_defaults():
    cfg = ImpalaConfig().resolve()
    assert cfg.num_steps == 20
    assert cfg.concurrency is True
    assert cfg.max_grad_norm == 40.0


def test_cli_round_trip():
    cfg = parse_cli(
        PPOConfig,
        [
            "--env-id", "Pong-v5",
            "--seed", "7",
            "--local-num-envs", "32",
            "--learner-device-ids", "0", "1",
            "--concurrency",
            "--no-anneal-lr",
            "--learning-rate", "1e-3",
        ],
    )
    assert cfg.env_id == "Pong-v5"
    assert cfg.seed == 7
    assert cfg.local_num_envs == 32
    assert cfg.learner_device_ids == [0, 1]
    assert cfg.concurrency is True
    assert cfg.anneal_lr is False
    assert cfg.learning_rate == pytest.approx(1e-3)


def test_cli_derived_fields_not_exposed():
    # runtime-filled fields are excluded from the CLI
    with pytest.raises(SystemExit):
        parse_cli(PPOConfig, ["--local-batch-size", "3"])


def test_cli_optional_none():
    cfg = parse_cli(PPOConfig, ["--wandb-entity", "None"])
    assert cfg.wandb_entity is None


def test_run_name_template_resolution():
    """'{env_id}'/'{seed}' placeholders give orchestrated jobs deterministic
    run dirs so a retried job can --resume its checkpoints."""
    from cleanba_tpu.config import ImpalaConfig

    cfg = ImpalaConfig(env_id="Pong-v5", seed=7, run_name="hns_{env_id}_s{seed}")
    cfg.resolve()
    assert cfg.run_name == "hns_Pong-v5_s7"
    # Non-templated explicit names pass through untouched.
    cfg2 = ImpalaConfig(run_name="fixed")
    cfg2.resolve()
    assert cfg2.run_name == "fixed"
