"""Auxiliary (shallow-diffusion source) mel decoder: 1D ConvNeXt stack.

Capability parity with ``/root/reference/modules/aux_decoder/convnext.py`` and
the ``AuxDecoderAdaptor`` wrapper (``modules/aux_decoder/__init__.py:28-70``).
Feature-last layout; depthwise conv k=7 + pointwise MLP with layer scale.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvNeXtBlock(nn.Module):
    dim: int
    intermediate_dim: int
    layer_scale_init_value: float = 1e-6
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        residual = x
        x = nn.Conv(self.dim, (7,), padding="SAME", feature_group_count=self.dim,
                    dtype=self.dtype, name="dwconv")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = nn.Dense(self.intermediate_dim, dtype=self.dtype, name="pwconv1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(x)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma", nn.initializers.constant(self.layer_scale_init_value), (self.dim,)
            )
            x = gamma * x
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return residual + x


class ConvNeXtDecoder(nn.Module):
    out_dims: int
    num_channels: int = 512
    num_layers: int = 6
    kernel_size: int = 7
    dropout_rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        """x: [B, T, H] condition -> [B, T, out_dims] normalized-domain mel."""
        x = nn.Conv(self.num_channels, (self.kernel_size,), padding="SAME",
                    dtype=self.dtype, name="inconv")(x)
        for i in range(self.num_layers):
            x = ConvNeXtBlock(
                dim=self.num_channels, intermediate_dim=self.num_channels * 4,
                layer_scale_init_value=1e-6, dropout=self.dropout_rate,
                dtype=self.dtype, name=f"conv_{i}",
            )(x, deterministic=deterministic)
        x = nn.Conv(self.out_dims, (self.kernel_size,), padding="SAME",
                    dtype=self.dtype, name="outconv")(x)
        return x


AUX_DECODERS = {"convnext": ConvNeXtDecoder}


def build_aux_decoder(out_dims: int, arch: str, args: dict, dtype=jnp.float32):
    from ..utils import filter_kwargs

    cls = AUX_DECODERS[arch]
    kwargs = dict(args or {})
    kwargs.update(out_dims=out_dims, dtype=dtype)
    return cls(**filter_kwargs(kwargs, cls.__init__))
