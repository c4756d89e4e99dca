"""Model shape/init/equivalence tests."""

import jax
import jax.numpy as jnp
import numpy as np

from cleanba_tpu.models import (
    Actor,
    Critic,
    ImpalaCNN,
    MLPTrunk,
    NatureCNN,
    init_agent_params,
    make_trunk,
)


def test_impala_cnn_shapes():
    net = ImpalaCNN(channels=(16, 32, 32), hiddens=(256,))
    x = jnp.zeros((2, 84, 84, 4), jnp.uint8)
    params = net.init(jax.random.PRNGKey(0), x)
    feats = net.apply(params, x)
    assert feats.shape == (2, 256)
    assert feats.dtype == jnp.float32


def test_impala_cnn_nchw_matches_nhwc():
    x_nhwc = np.random.default_rng(0).integers(0, 255, size=(3, 84, 84, 4)).astype(np.uint8)
    x_nchw = np.transpose(x_nhwc, (0, 3, 1, 2))
    net_hwc = ImpalaCNN(obs_format="NHWC")
    net_chw = ImpalaCNN(obs_format="NCHW")
    params = net_hwc.init(jax.random.PRNGKey(1), jnp.asarray(x_nhwc))
    f1 = net_hwc.apply(params, jnp.asarray(x_nhwc))
    f2 = net_chw.apply(params, jnp.asarray(x_nchw))
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-5, atol=1e-5)


def test_nature_cnn_shapes():
    net = NatureCNN(hiddens=(512,))
    x = jnp.zeros((2, 84, 84, 4), jnp.uint8)
    params = net.init(jax.random.PRNGKey(0), x)
    assert net.apply(params, x).shape == (2, 512)


def test_mlp_shapes():
    net = MLPTrunk(hiddens=(64, 64))
    x = jnp.zeros((5, 4), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)
    assert net.apply(params, x).shape == (5, 64)


def test_bf16_compute_close_to_f32():
    x = np.random.default_rng(2).integers(0, 255, size=(2, 84, 84, 4)).astype(np.uint8)
    f32 = ImpalaCNN(dtype=jnp.float32)
    bf16 = ImpalaCNN(dtype=jnp.bfloat16)
    params = f32.init(jax.random.PRNGKey(3), jnp.asarray(x))
    out32 = f32.apply(params, jnp.asarray(x))
    out16 = bf16.apply(params, jnp.asarray(x))
    assert out16.dtype == jnp.float32  # heads stay full precision
    # bf16 conv trunk should stay within coarse tolerance of f32
    err = np.abs(np.asarray(out32) - np.asarray(out16)).max()
    assert err < 0.15, err


def test_head_init_scales():
    """Actor uses orthogonal(0.01), Critic orthogonal(1.0) (cleanba_ppo.py:194-203)."""
    feats = jnp.zeros((1, 256))
    actor_p = Actor(action_dim=18).init(jax.random.PRNGKey(0), feats)
    critic_p = Critic().init(jax.random.PRNGKey(0), feats)
    aw = np.asarray(actor_p["params"]["Dense_0"]["kernel"])
    cw = np.asarray(critic_p["params"]["Dense_0"]["kernel"])
    # orthogonal(scale) columns have norm == scale
    np.testing.assert_allclose(np.linalg.norm(aw, axis=0), 0.01, rtol=1e-4)
    np.testing.assert_allclose(np.linalg.norm(cw, axis=0), 1.0, rtol=1e-4)


def test_init_agent_params_roundtrip():
    trunk = make_trunk("mlp", [], [32, 32])
    obs = jnp.zeros((1, 4))
    params, actor, critic = init_agent_params(jax.random.PRNGKey(0), trunk, 2, obs)
    feats = trunk.apply(params.network_params, obs)
    logits = actor.apply(params.actor_params, feats)
    value = critic.apply(params.critic_params, feats)
    assert logits.shape == (1, 2)
    assert value.shape == (1, 1)
