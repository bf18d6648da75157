"""Non-causal WaveNet denoiser backbone.

Capability parity with ``/root/reference/modules/backbones/wavenet.py``:
input 1x1 projection + ReLU, sinusoidal diffusion-step embedding with
Mish MLP, N residual blocks (dilated conv k=3, dilation 2^(i % cycle), gated
tanh*sigmoid with additive conditioner + step projections), skip-sum / sqrt(N),
zero-initialized output projection.

TPU-first layout: all activations are feature-last [B, T, C]; the dilated
convs run as XLA convolutions over static shapes so they fuse with the
surrounding element-wise ops.  Residual-channel counts default to multiples of
128 to fill MXU/VPU lanes.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..common import sinusoidal_step_embedding


class WaveNetResidualBlock(nn.Module):
    residual_channels: int
    dilation: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond, step_emb):
        """
        :param x: [B, T, C]; cond: [B, T, H]; step_emb: [B, C]
        :return: (residual_out [B, T, C], skip [B, T, C])
        """
        C = self.residual_channels
        step = nn.Dense(C, dtype=self.dtype, name="diffusion_projection")(step_emb)
        y = x + step[:, None, :]
        y = nn.Conv(
            2 * C, (3,), kernel_dilation=self.dilation, padding="SAME",
            dtype=self.dtype, name="dilated_conv",
        )(y)
        y = y + nn.Dense(2 * C, dtype=self.dtype, name="conditioner_projection")(cond)
        gate, filt = jnp.split(y, 2, axis=-1)
        y = jax.nn.sigmoid(gate) * jnp.tanh(filt)
        y = nn.Dense(2 * C, dtype=self.dtype, name="output_projection")(y)
        residual, skip = jnp.split(y, 2, axis=-1)
        return (x + residual) / math.sqrt(2.0), skip


class WaveNet(nn.Module):
    in_dims: int  # mel bins (or repeat bins)
    n_feats: int = 1
    num_layers: int = 20
    num_channels: int = 256
    dilation_cycle_length: int = 4
    cond_dims: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, spec, diffusion_step, cond):
        """
        :param spec: [B, F, T, M] noisy input
        :param diffusion_step: [B] float/int step
        :param cond: [B, T, H] condition
        :return: [B, F, T, M]
        """
        B, F, T, M = spec.shape
        C = self.num_channels
        x = spec.transpose(0, 2, 1, 3).reshape(B, T, F * M)
        x = nn.Dense(C, dtype=self.dtype, kernel_init=nn.initializers.kaiming_normal(),
                     name="input_projection")(x)
        x = jax.nn.relu(x)

        step = sinusoidal_step_embedding(diffusion_step, C)
        step = nn.Dense(C * 4, dtype=self.dtype, name="mlp_0")(step)
        step = step * jnp.tanh(jax.nn.softplus(step))  # Mish
        step = nn.Dense(C, dtype=self.dtype, name="mlp_2")(step)

        skip_sum = jnp.zeros_like(x)
        for i in range(self.num_layers):
            x, skip = WaveNetResidualBlock(
                residual_channels=C,
                dilation=2 ** (i % self.dilation_cycle_length),
                dtype=self.dtype,
                name=f"residual_layers_{i}",
            )(x, cond, step)
            skip_sum = skip_sum + skip

        x = skip_sum / math.sqrt(self.num_layers)
        x = nn.Dense(C, dtype=self.dtype, kernel_init=nn.initializers.kaiming_normal(),
                     name="skip_projection")(x)
        x = jax.nn.relu(x)
        x = nn.Dense(F * M, dtype=self.dtype, kernel_init=nn.initializers.zeros,
                     name="output_projection")(x)
        return x.reshape(B, T, F, M).transpose(0, 2, 1, 3)
