"""In-graph env stepping (io_callback) and the sync XLA-scan trainer."""

import jax
import jax.numpy as jnp
import numpy as np

from cleanba_tpu.envs import make_env
from cleanba_tpu.envs.xla_interface import xla_interface


def test_step_env_inside_scan():
    envs = make_env("CartPole-v1", seed=0, num_envs=4, backend="python")()
    _, step_env = xla_interface(envs)
    obs0, _ = envs.reset()

    @jax.jit
    def run(actions_seq):
        def body(carry, actions):
            obs, rew, term, trunc, first = step_env(actions)
            return carry + rew.sum(), (obs, term)

        total, (obs_t, term_t) = jax.lax.scan(body, 0.0, actions_seq)
        return total, obs_t, term_t

    actions = jnp.zeros((10, 4), jnp.int32)
    total, obs_t, term_t = run(actions)
    assert obs_t.shape == (10, 4, 4)
    assert float(total) == 40.0  # CartPole: +1 per env per step
    envs.close()


def test_in_graph_matches_direct_stepping():
    """The io_callback path must see exactly the same transitions as direct
    host stepping with the same seed and actions."""
    e1 = make_env("CartPole-v1", seed=3, num_envs=2, backend="python")()
    e2 = make_env("CartPole-v1", seed=3, num_envs=2, backend="python")()
    _, step_env = xla_interface(e1)
    e1.reset()
    e2.reset()

    actions = np.array([[0, 1], [1, 1], [0, 0], [1, 0]], np.int32)
    for a in actions:
        obs_g, rew_g, term_g, trunc_g, first_g = jax.jit(step_env)(jnp.asarray(a))
        obs_d, rew_d, term_d, trunc_d, _ = e2.step(a)
        np.testing.assert_allclose(np.asarray(obs_g), obs_d, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(term_g), term_d)
    e1.close()
    e2.close()


def test_xla_scan_trainer_runs(tmp_path):
    from cleanba_tpu.train_ppo_xla import main

    main([
        "--env-id", "CartPole-v1", "--network", "mlp", "--local-num-envs", "4",
        "--num-steps", "16", "--total-timesteps", "256", "--num-minibatches", "2",
        "--update-epochs", "1", "--log-frequency", "2", "--run-dir", str(tmp_path),
        "--env-backend", "python",
    ])
