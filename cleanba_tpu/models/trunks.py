"""Policy/value network trunks.

Re-implements the reference's three trunk families with a TPU-first layout:

- **IMPALA-CNN** (Espeholt et al. 2018): conv-sequence trunk used by both main
  trainers (reference cleanba_ppo.py:149-185).
- **NatureCNN** (Mnih et al. 2015): the classic DQN trunk
  (reference legacy_scripts/..._naturecnn.py:143-180).
- **MLP**: small trunk for state-vector envs (CartPole exact-seed tests).

TPU-first deviations from the reference (documented, intentional):

- Observations arrive **NHWC** (the native engine emits [H, W, stack] uint8);
  the reference transposes NCHW EnvPool output inside the net
  (cleanba_ppo.py:178). An `obs_format="NCHW"` switch keeps compatibility.
- A `compute_dtype` knob runs convs/matmuls in bfloat16 on the MXU while
  keeping parameters and head outputs in float32 (mixed precision). Default is
  float32 for exact learning-curve parity with the reference.
- Normalization (x/255) happens after casting to the compute dtype, fusing into
  the first conv under XLA.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from flax.linen.initializers import constant, orthogonal

__all__ = ["ResidualBlock", "ConvSequence", "ImpalaCNN", "NatureCNN", "MLPTrunk"]

Dtype = Any


class ResidualBlock(nn.Module):
    """Pre-activation residual block: relu → conv3x3 → relu → conv3x3 → +skip
    (reference cleanba_ppo.py:149-158)."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        skip = x
        x = nn.relu(x)
        x = nn.Conv(self.channels, (3, 3), dtype=self.dtype, name="conv0")(x)
        x = nn.relu(x)
        x = nn.Conv(self.channels, (3, 3), dtype=self.dtype, name="conv1")(x)
        return x + skip


class ConvSequence(nn.Module):
    """conv3x3 → maxpool3x3/2 → residual ×2 (reference cleanba_ppo.py:161-171)."""

    channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.channels, (3, 3), dtype=self.dtype, name="conv")(x)
        x = nn.max_pool(x, window_shape=(3, 3), strides=(2, 2), padding="SAME")
        x = ResidualBlock(self.channels, self.dtype, name="res0")(x)
        x = ResidualBlock(self.channels, self.dtype, name="res1")(x)
        return x


class ImpalaCNN(nn.Module):
    """IMPALA conv trunk → flatten → relu → dense stack (cleanba_ppo.py:174-189).

    Output features are float32 regardless of `dtype` so that downstream heads
    and losses run in full precision.
    """

    channels: Sequence[int] = (16, 32, 32)
    hiddens: Sequence[int] = (256,)
    dtype: Dtype = jnp.float32
    obs_format: str = "NHWC"

    @nn.compact
    def __call__(self, x):
        if self.obs_format == "NCHW":
            x = jnp.transpose(x, (0, 2, 3, 1))
        x = x.astype(self.dtype) / 255.0
        for i, ch in enumerate(self.channels):
            x = ConvSequence(ch, self.dtype, name=f"seq{i}")(x)
        x = nn.relu(x)
        x = x.reshape((x.shape[0], -1))
        for i, hidden in enumerate(self.hiddens):
            x = nn.Dense(
                hidden,
                kernel_init=orthogonal(np.sqrt(2)),
                bias_init=constant(0.0),
                dtype=self.dtype,
                name=f"dense{i}",
            )(x)
            x = nn.relu(x)
        return x.astype(jnp.float32)


class NatureCNN(nn.Module):
    """DQN trunk: 8x8/4, 4x4/2, 3x3/1 convs → dense(512)
    (reference legacy_scripts/..._naturecnn.py:143-166)."""

    hiddens: Sequence[int] = (512,)
    dtype: Dtype = jnp.float32
    obs_format: str = "NHWC"

    @nn.compact
    def __call__(self, x):
        if self.obs_format == "NCHW":
            x = jnp.transpose(x, (0, 2, 3, 1))
        x = x.astype(self.dtype) / 255.0
        conv = lambda ch, k, s, name: nn.Conv(
            ch, (k, k), (s, s), padding="VALID",
            kernel_init=orthogonal(np.sqrt(2)), bias_init=constant(0.0),
            dtype=self.dtype, name=name,
        )
        x = nn.relu(conv(32, 8, 4, "conv0")(x))
        x = nn.relu(conv(64, 4, 2, "conv1")(x))
        x = nn.relu(conv(64, 3, 1, "conv2")(x))
        x = x.reshape((x.shape[0], -1))
        for i, hidden in enumerate(self.hiddens):
            x = nn.Dense(
                hidden, kernel_init=orthogonal(np.sqrt(2)), bias_init=constant(0.0),
                dtype=self.dtype, name=f"dense{i}",
            )(x)
            x = nn.relu(x)
        return x.astype(jnp.float32)


class MLPTrunk(nn.Module):
    """Small MLP trunk for state-vector observations (CartPole exact-seed config)."""

    hiddens: Sequence[int] = (64, 64)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = x.reshape((x.shape[0], -1))
        for i, hidden in enumerate(self.hiddens):
            x = nn.Dense(
                hidden, kernel_init=orthogonal(np.sqrt(2)), bias_init=constant(0.0),
                dtype=self.dtype, name=f"dense{i}",
            )(x)
            x = jnp.tanh(x)
        return x.astype(jnp.float32)
