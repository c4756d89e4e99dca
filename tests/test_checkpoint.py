"""Checkpoint serialization round trips."""

import jax
import numpy as np

from cleanba_tpu.config import PPOConfig
from cleanba_tpu.models import AgentParams
from cleanba_tpu.ops import make_ppo_optimizer
from cleanba_tpu.runtime.agent import build_agent
from cleanba_tpu.runtime.train_state import TrainState
from cleanba_tpu.utils.checkpoint import (
    latest_checkpoint,
    load_model,
    restore_checkpoint,
    save_checkpoint,
    save_model,
)


def make_state():
    cfg = PPOConfig(network="mlp", hiddens=[16], local_num_envs=4, num_steps=4,
                    num_actor_threads=1, num_minibatches=2, total_timesteps=64)
    cfg.resolve()
    agent = build_agent(cfg, 2, np.zeros((1, 4), np.float32), jax.random.PRNGKey(0))
    return cfg, agent, TrainState.create(params=agent.init_params, tx=make_ppo_optimizer(cfg))


def test_checkpoint_round_trip(tmp_path):
    cfg, agent, state = make_state()
    path = save_checkpoint(str(tmp_path), state, update=7, global_step=1234)
    assert latest_checkpoint(str(tmp_path)) == path

    # restore into a state with different params — must come back identical
    _, _, fresh = make_state()
    perturbed = fresh.replace(
        params=jax.tree.map(lambda x: x + 1.0, fresh.params)
    )
    restored, update, global_step = restore_checkpoint(path, perturbed)
    assert update == 7 and global_step == 1234
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored.params, state.params,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored.opt_state, state.opt_state,
    )


def test_latest_checkpoint_picks_newest(tmp_path):
    _, _, state = make_state()
    save_checkpoint(str(tmp_path), state, update=2, global_step=10)
    p10 = save_checkpoint(str(tmp_path), state, update=10, global_step=99)
    save_checkpoint(str(tmp_path), state, update=9, global_step=50)
    assert latest_checkpoint(str(tmp_path)) == p10


def test_model_save_load_round_trip(tmp_path):
    cfg, agent, state = make_state()
    path = str(tmp_path / "model.cleanba_model")
    save_model(path, cfg.asdict(), state.params)
    template = AgentParams(
        jax.tree.map(lambda x: np.zeros_like(x), state.params.network_params),
        jax.tree.map(lambda x: np.zeros_like(x), state.params.actor_params),
        jax.tree.map(lambda x: np.zeros_like(x), state.params.critic_params),
    )
    loaded = load_model(path, template)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        loaded, state.params,
    )
