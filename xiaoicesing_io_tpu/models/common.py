"""Common layers: embeddings, positional encodings, attention, FFN.

Capability parity with ``/root/reference/modules/commons/common_layers.py``
(init conventions, RoPE attention, conv-FFN transformer layer) re-designed in
flax.linen with feature-last layouts and explicit dtypes.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = jnp.dtype


def normal_embed_init(dim: int, zero_padding_row: bool = False):
    """N(0, dim^-0.5) embedding init; optionally zero row 0 (the padding id).

    Parity with NormalInitEmbedding (ref: common_layers.py:14-26): the
    padding row is zeroed ONLY when a padding_idx is configured — the
    reference does this for txt_embed (PAD_INDEX) and note_glide_embed, but
    not for spk/midi/onset/retake embeddings.
    """

    def init(key, shape, dtype=jnp.float32):
        w = jax.random.normal(key, shape, dtype) * (dim ** -0.5)
        if zero_padding_row:
            w = w.at[0].set(0.0)
        return w

    return init


def sinusoidal_step_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Diffusion-step embedding (ref: common_layers.py:266-278).

    :param t: [B] float or int steps.
    :return: [B, dim]
    """
    half = dim // 2
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / (half - 1)))
    ang = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def sinusoidal_positions(positions: jnp.ndarray, dim: int) -> jnp.ndarray:
    """tensor2tensor-convention sinusoidal table lookup
    (ref: common_layers.py:61-78): [sin(p*f0..), cos(p*f0..)] concatenated.

    :param positions: int [B, T] absolute positions.
    :return: [B, T, dim]
    """
    half = dim // 2
    emb = math.log(10000.0) / (half - 1)
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -emb)
    ang = positions.astype(jnp.float32)[..., None] * freqs
    out = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    if dim % 2 == 1:
        out = jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, 1)])
    return out


def rel_positional_encoding(t: int, dim: int, max_len: int = 5000) -> jnp.ndarray:
    """ESPnet RelPositionalEncoding table with reversed positions and
    interleaved sin/cos (ref: espnet_positional_embedding.py:89-113;
    the reference adds ``x * sqrt(d) + pe`` on top of the already-scaled
    embedding).  NOTE the reference quirk: the table is built reversed over
    ``max_len`` positions at init and sliced to the FIRST ``t`` rows, so the
    actual position values are max_len-1 ... max_len-t (for t <= max_len).
    -> [1, t, dim]
    """
    if t <= max_len:
        position = jnp.arange(
            max_len - 1, max_len - 1 - t, -1.0, dtype=jnp.float32
        )[:, None]
    else:
        position = jnp.arange(t - 1, -1, -1.0, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(
        jnp.arange(0, dim, 2, dtype=jnp.float32) * (-math.log(10000.0) / dim)
    )
    pe = jnp.stack(
        [jnp.sin(position * div_term), jnp.cos(position * div_term)], axis=2
    ).reshape(t, dim)
    return pe[None]


def make_positions(tokens: jnp.ndarray, padding_idx: int = 0) -> jnp.ndarray:
    """Position ids counting only non-padding tokens, offset by padding_idx+1
    (fairseq convention used by the reference's SinusoidalPositionalEmbedding)."""
    mask = (tokens != padding_idx).astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + padding_idx


def rope_rotate(x: jnp.ndarray) -> jnp.ndarray:
    """Interleaved rotary rotation applied along the last axis.

    Matches the vendored rotary_embedding_torch convention
    (ref: rotary_embedding_torch.py:35-75, :311-314): frequencies repeated in
    adjacent pairs, rotate_half swaps (x0,x1)->(-x1,x0).
    """
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def apply_rope(x: jnp.ndarray, theta: float = 10000.0) -> jnp.ndarray:
    """Apply RoPE to [B, H, T, D] (rotates the full head dim)."""
    d = x.shape[-1]
    t = x.shape[-2]
    freqs = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))  # [D/2]
    ang = jnp.arange(t, dtype=jnp.float32)[:, None] * freqs[None, :]  # [T, D/2]
    ang = jnp.repeat(ang, 2, axis=-1)  # interleaved pairs [T, D]
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    return (x * cos + rope_rotate(x) * sin).astype(x.dtype)


class SelfAttention(nn.Module):
    """Multi-head self-attention, optionally with RoPE; no bias
    (ref: common_layers.py:152-213 and torch MultiheadAttention(bias=False))."""

    hidden_size: int
    num_heads: int
    use_rope: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask=None):
        B, T, C = x.shape
        H, D = self.num_heads, C // self.num_heads
        qkv = nn.Dense(3 * C, use_bias=False, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(y):
            return y.reshape(B, T, H, D).transpose(0, 2, 1, 3)  # [B, H, T, D]

        q, k, v = heads(q), heads(k), heads(v)
        if self.use_rope:
            q, k = apply_rope(q), apply_rope(k)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores / math.sqrt(D)
        if padding_mask is not None:
            neg = jnp.finfo(jnp.float32).min
            scores = jnp.where(padding_mask[:, None, None, :], neg, scores)
        w = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", w, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, C)
        return nn.Dense(C, use_bias=False, dtype=self.dtype, name="out_proj")(out)


class ConvFFN(nn.Module):
    """Transformer FFN whose first projection is a 1D conv
    (ref: common_layers.py:120-149), with the k^-0.5 rescale."""

    hidden_size: int
    filter_size: int
    kernel_size: int = 9
    act: str = "gelu"
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic=True):
        filter_1 = self.filter_size * 2 if self.act == "swiglu" else self.filter_size
        x = nn.Conv(
            filter_1, (self.kernel_size,), padding="SAME", dtype=self.dtype, name="ffn_1"
        )(x)
        x = x * self.kernel_size ** -0.5
        if self.act == "gelu":
            x = jax.nn.gelu(x, approximate=False)
        elif self.act == "relu":
            x = jax.nn.relu(x)
        elif self.act == "swish":
            x = jax.nn.silu(x)
        elif self.act == "swiglu":
            out, gate = jnp.split(x, 2, axis=-1)
            x = out * jax.nn.silu(gate)
        else:
            raise ValueError(f"unknown ffn act {self.act}")
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        x = nn.Dense(
            self.hidden_size,
            dtype=self.dtype,
            kernel_init=nn.initializers.xavier_uniform(),
            name="ffn_2",
        )(x)
        return x


class TransformerEncoderLayer(nn.Module):
    """Pre-LN self-attention + conv-FFN block (ref: common_layers.py:216-263)."""

    hidden_size: int
    num_heads: int
    ffn_kernel_size: int = 9
    ffn_act: str = "gelu"
    dropout: float = 0.0
    use_rope: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, padding_mask, deterministic=True):
        nonpad = (1.0 - padding_mask.astype(jnp.float32))[..., None]
        residual = x
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm1")(x)
        h = SelfAttention(
            self.hidden_size, self.num_heads, use_rope=self.use_rope, dtype=self.dtype,
            name="self_attn",
        )(h, padding_mask)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        x = (residual + h) * nonpad

        residual = x
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm2")(x)
        h = ConvFFN(
            self.hidden_size, 4 * self.hidden_size, kernel_size=self.ffn_kernel_size,
            act=self.ffn_act, dropout=self.dropout, dtype=self.dtype, name="ffn",
        )(h, deterministic=deterministic)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        x = (residual + h) * nonpad
        return x
