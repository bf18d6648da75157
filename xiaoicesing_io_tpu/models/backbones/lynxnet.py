"""LYNXNet (Conformer-NaiveV2-style) denoiser backbone.

Capability parity with ``/root/reference/modules/backbones/lynxnet.py``:
per-layer conditioner + diffusion-step 1x1 projections feeding a residual
module of LayerNorm -> 1x1 conv (2x inner) -> SwiGLU -> depthwise conv(k) ->
PReLU -> 1x1 conv; optional ``strong_cond`` front injection; post-LayerNorm;
zero-initialized output projection.  Feature-last [B, T, C] layout; the
depthwise conv is an XLA grouped convolution.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..common import sinusoidal_step_embedding


class PReLU(nn.Module):
    """Per-channel PReLU (torch nn.PReLU(num_parameters=C) equivalent)."""

    channels: int
    init: float = 0.25

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(self.init), (self.channels,))
        return jnp.where(x >= 0, x, a * x)


class LYNXConvModule(nn.Module):
    dim: int
    expansion_factor: int = 2
    kernel_size: int = 31
    activation: str = "PReLU"
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        inner = self.dim * self.expansion_factor
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        h = nn.Dense(inner * 2, dtype=self.dtype, name="pw_in")(h)
        out, gate = jnp.split(h, 2, axis=-1)
        h = out * jax.nn.silu(gate)  # SwiGLU
        # depthwise conv over time; torch 'same' padding for even/odd kernels
        pad = self.kernel_size // 2
        pad_r = pad - (self.kernel_size + 1) % 2
        h = nn.Conv(
            inner, (self.kernel_size,), padding=[(pad, pad_r)], feature_group_count=inner,
            dtype=self.dtype, name="dw_conv",
        )(h)
        if self.activation == "PReLU":
            h = PReLU(inner, name="act")(h)
        elif self.activation == "SiLU":
            h = jax.nn.silu(h)
        elif self.activation == "ReLU":
            h = jax.nn.relu(h)
        else:
            raise ValueError(f"unknown activation {self.activation}")
        h = nn.Dense(self.dim, dtype=self.dtype, name="pw_out")(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return h


class LYNXNetResidualLayer(nn.Module):
    dim: int
    cond_dims: int
    expansion_factor: int = 2
    kernel_size: int = 31
    activation: str = "PReLU"
    dropout: float = 0.0
    strong_cond: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond, step_emb, deterministic=True):
        cond_proj = nn.Dense(self.dim, dtype=self.dtype, name="conditioner_projection")(cond)
        if self.strong_cond:
            x = x + cond_proj
            res = x
        else:
            res = x
            x = x + cond_proj
        x = x + nn.Dense(self.dim, dtype=self.dtype, name="diffusion_projection")(step_emb)[
            :, None, :
        ]
        x = LYNXConvModule(
            dim=self.dim, expansion_factor=self.expansion_factor,
            kernel_size=self.kernel_size, activation=self.activation,
            dropout=self.dropout, dtype=self.dtype, name="convmodule",
        )(x, deterministic=deterministic)
        return x + res


class LYNXNet(nn.Module):
    in_dims: int
    n_feats: int = 1
    num_layers: int = 6
    num_channels: int = 512
    expansion_factor: int = 2
    kernel_size: int = 31
    activation: str = "PReLU"
    dropout_rate: float = 0.0
    strong_cond: bool = False
    cond_dims: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, spec, diffusion_step, cond, deterministic=True):
        """
        :param spec: [B, F, T, M]; diffusion_step: [B]; cond: [B, T, H]
        :return: [B, F, T, M]
        """
        B, F, T, M = spec.shape
        C = self.num_channels
        x = spec.transpose(0, 2, 1, 3).reshape(B, T, F * M)
        x = nn.Dense(C, dtype=self.dtype, kernel_init=nn.initializers.kaiming_normal(),
                     name="input_projection")(x)
        if not self.strong_cond:
            x = jax.nn.gelu(x, approximate=False)

        step = sinusoidal_step_embedding(diffusion_step, C)
        step = nn.Dense(C * 4, dtype=self.dtype, name="diff_mlp_0")(step)
        step = jax.nn.gelu(step, approximate=False)
        step = nn.Dense(C, dtype=self.dtype, name="diff_mlp_1")(step)

        for i in range(self.num_layers):
            x = LYNXNetResidualLayer(
                dim=C, cond_dims=self.cond_dims,
                expansion_factor=self.expansion_factor, kernel_size=self.kernel_size,
                activation=self.activation, dropout=self.dropout_rate,
                strong_cond=self.strong_cond, dtype=self.dtype,
                name=f"residual_layers_{i}",
            )(x, cond, step, deterministic=deterministic)

        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(F * M, dtype=self.dtype, kernel_init=nn.initializers.zeros,
                     name="output_projection")(x)
        return x.reshape(B, T, F, M).transpose(0, 2, 1, 3)
