"""PyTorch-style RMSProp parity against torch.optim.RMSprop."""

import jax.numpy as jnp
import numpy as np
import optax
import torch

from cleanba_tpu.ops import rmsprop_pytorch_style, scale_by_rms_pytorch_style


def test_rmsprop_matches_torch():
    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(4, 3)).astype(np.float32)
    grads = [rng.normal(size=(4, 3)).astype(np.float32) for _ in range(10)]
    lr, decay, eps = 6e-4, 0.99, 0.01

    # torch trajectory
    tp = torch.nn.Parameter(torch.tensor(p0.copy()))
    opt = torch.optim.RMSprop([tp], lr=lr, alpha=decay, eps=eps)
    for g in grads:
        tp.grad = torch.tensor(g)
        opt.step()

    # ours
    tx = rmsprop_pytorch_style(learning_rate=lr, decay=decay, eps=eps)
    params = jnp.asarray(p0)
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params), tp.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_rmsprop_differs_from_stock_optax_eps_placement():
    """The whole point: eps inside vs outside the sqrt diverge for small nu."""
    g = jnp.full((3,), 1e-3)
    ours = scale_by_rms_pytorch_style(decay=0.99, eps=0.01)
    stock = optax.scale_by_rms(decay=0.99, eps=0.01)
    p = jnp.zeros(3)
    u1, _ = ours.update(g, ours.init(p), p)
    u2, _ = stock.update(g, stock.init(p), p)
    assert not np.allclose(np.asarray(u1), np.asarray(u2), rtol=1e-3)


def test_momentum_variant_matches_torch():
    rng = np.random.default_rng(1)
    p0 = rng.normal(size=(5,)).astype(np.float32)
    grads = [rng.normal(size=(5,)).astype(np.float32) for _ in range(6)]
    lr, decay, eps, mom = 1e-3, 0.9, 1e-8, 0.9

    tp = torch.nn.Parameter(torch.tensor(p0.copy()))
    opt = torch.optim.RMSprop([tp], lr=lr, alpha=decay, eps=eps, momentum=mom)
    for g in grads:
        tp.grad = torch.tensor(g)
        opt.step()

    tx = rmsprop_pytorch_style(learning_rate=lr, decay=decay, eps=eps, momentum=mom)
    params = jnp.asarray(p0)
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update(jnp.asarray(g), state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(np.asarray(params), tp.detach().numpy(), rtol=1e-4, atol=1e-6)
