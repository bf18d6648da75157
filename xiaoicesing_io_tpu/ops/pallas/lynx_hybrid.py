"""Hybrid LYNX conv-module: XLA does the big matmul, Pallas the conv tail.

Round-3 experiment against the v1 fused kernel's measured MXU stall: per
grid step, v1 issues [tile+30, dim] x [dim, inner] matmuls whose ragged M
(286 rows) and fine granularity leave the MXU at ~40% during its busy
phases (docs/PerformanceNotes.md round-2 attribution).  Here the
LN -> pw_in -> SwiGLU head runs as ONE XLA matmul over all B*T rows
([rows, dim] @ [dim, 2*inner] — XLA's large-matmul pipeline, no halo
waste), and only the fusion-breaking tail (31-tap depthwise conv -> PReLU
-> pw_out) runs as a Pallas row-tiled kernel on the bf16 ``inner``
activations.

Cost model vs v1: adds one HBM round-trip of ``inner`` ([rows, 2048] bf16,
~34 MB per layer at the bench shape, ~80 us) in exchange for running 2/3 of
the module FLOPs at XLA's large-matmul efficiency; the conv padding rows
inserted by ``flatten_batch_windows`` are genuine zeros, so the v1 kernel's
in-kernel validity masking disappears entirely.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import flatten_batch_windows


def _tail_kernel(
    inner_ref,  # [1, TILE + K - 1, inner] bf16 (zero rows between sequences)
    dw_ref,  # [K, inner] f32 depthwise taps
    dw_bias_ref,  # [1, inner]
    alpha_ref,  # [1, inner] PReLU slope
    w2_ref,  # [inner, dim] bf16
    b2_ref,  # [1, dim]
    o_ref,  # [TILE, dim]
    *,
    k: int,
    tile: int,
):
    inner = inner_ref[0].astype(jnp.float32)
    acc = jnp.zeros((tile, inner.shape[1]), jnp.float32)
    for tap in range(k):
        acc = acc + inner[tap : tap + tile] * dw_ref[tap, :][None, :]
    acc = acc + dw_bias_ref[...]
    acc = jnp.where(acc >= 0, acc, alpha_ref[...] * acc)  # PReLU
    out = jnp.dot(acc.astype(jnp.bfloat16), w2_ref[...],
                  preferred_element_type=jnp.float32)
    o_ref[...] = (out + b2_ref[...]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("kernel_size", "tile", "interpret")
)
def lynx_conv_module_hybrid(
    x: jnp.ndarray,  # [B, T, dim]
    ln_scale, ln_bias,  # [dim]
    w_in,  # [dim, 2*inner] (columns = [out | gate])
    b_in,  # [2*inner]
    dw_kernel,  # [k, 1, inner] flax depthwise layout
    dw_bias,  # [inner]
    alpha,  # [inner]
    w2,  # [inner, dim]
    b2,  # [dim]
    kernel_size: int = 31,
    tile: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Module output [B, T, dim] (residual NOT added); numerics == v1."""
    B, T, dim = x.shape
    inner_dim = w2.shape[0]
    k = kernel_size
    pad_l = k // 2
    pad_r = pad_l - (k + 1) % 2

    # ---- phase 1 (XLA): LN + pw_in + SwiGLU on exact rows ----
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
    xn = xn * ln_scale + ln_bias
    y = jnp.dot(xn.astype(jnp.bfloat16), w_in.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32) + b_in
    out_h, gate_h = y[..., :inner_dim], y[..., inner_dim:]
    inner = (out_h * (gate_h * jax.nn.sigmoid(gate_h))).astype(jnp.bfloat16)

    # ---- phase 2 (Pallas): dwconv + PReLU + pw_out on halo windows ----
    windows, period, total_rows, n_tiles = flatten_batch_windows(
        inner, pad_l, pad_r, tile
    )
    total = n_tiles * tile
    dw = dw_kernel.reshape(k, inner_dim)
    out = pl.pallas_call(
        functools.partial(_tail_kernel, k=k, tile=tile),
        out_shape=jax.ShapeDtypeStruct((total, dim), x.dtype),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, tile + k - 1, inner_dim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, inner_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, inner_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, inner_dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((inner_dim, dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        windows,
        dw.astype(jnp.float32),
        dw_bias.reshape(1, inner_dim).astype(jnp.float32),
        alpha.reshape(1, inner_dim).astype(jnp.float32),
        w2.astype(jnp.bfloat16),
        b2.reshape(1, dim).astype(jnp.float32),
    )
    return out[:total_rows].reshape(B, period, dim)[:, :T]
