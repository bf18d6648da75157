"""FastSpeech2-style transformer encoder.

Capability parity with ``/root/reference/modules/fastspeech/tts_modules.py:353-428``:
scaled main embedding + additive extra embedding, optional positional encoding
(RoPE inside attention by default, absolute sinusoidal otherwise), N pre-LN
transformer layers with conv-FFN, final LayerNorm, all gated by the padding
mask.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..common import (
    TransformerEncoderLayer,
    make_positions,
    rel_positional_encoding,
    sinusoidal_positions,
)


class FastSpeech2Encoder(nn.Module):
    hidden_size: int = 256
    num_layers: int = 4
    ffn_kernel_size: int = 9
    ffn_act: str = "gelu"
    dropout: float = 0.1
    num_heads: int = 2
    use_pos_embed: bool = True
    use_rope: bool = True
    rel_pos: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        main_embed: jnp.ndarray,
        extra_embed: Optional[jnp.ndarray],
        padding_mask: jnp.ndarray,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """
        :param main_embed: [B, T, H] (token embedding, unscaled)
        :param extra_embed: [B, T, H] or None
        :param padding_mask: bool [B, T], True at padding
        :return: [B, T, H]
        """
        x = main_embed * math.sqrt(self.hidden_size)
        if extra_embed is not None:
            x = x + extra_embed
        if self.use_pos_embed and not self.use_rope:
            if self.rel_pos:
                # ESPnet RelPositionalEncoding applies another sqrt(d) scale
                # on top (ref: tts_modules.py:394-395 + espnet forward)
                x = x * math.sqrt(self.hidden_size) + rel_positional_encoding(
                    x.shape[1], self.hidden_size
                )
            else:
                positions = make_positions(
                    1 - padding_mask.astype(jnp.int32), padding_idx=0
                )
                x = x + sinusoidal_positions(positions, self.hidden_size)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)

        nonpad = (1.0 - padding_mask.astype(jnp.float32))[..., None]
        x = x * nonpad
        for i in range(self.num_layers):
            x = TransformerEncoderLayer(
                self.hidden_size,
                self.num_heads,
                ffn_kernel_size=self.ffn_kernel_size,
                ffn_act=self.ffn_act,
                dropout=self.dropout,
                use_rope=self.use_pos_embed and self.use_rope,
                dtype=self.dtype,
                name=f"layers_{i}",
            )(x, padding_mask, deterministic=deterministic)
            x = x * nonpad
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm")(x) * nonpad
        return x
