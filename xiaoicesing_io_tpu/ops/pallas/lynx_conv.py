"""Fused LYNXNet conv-module kernel.

The LYNXNet residual layer's inner module is the per-step hot op of the
flagship acoustic denoiser (6 layers x K sampler steps):

    LayerNorm -> Dense(2*inner) -> SwiGLU -> depthwise conv(k=31, time)
              -> PReLU -> Dense(dim)

Unfused, the [rows, inner]=（B*T, 2048) activations round-trip HBM between
the two matmuls because the depthwise conv breaks XLA's fusion chain.  This
kernel keeps the whole module in VMEM per row-tile: both matmuls hit the MXU,
the 31-tap depthwise conv is computed as shifted-slice FMAs on the VPU, and
the only HBM traffic is x in / out plus the weights.

Grid: one program per row tile (rows = flattened B*T with a halo of k-1
rows for the conv).  Weights are resident in VMEM across the grid.  The
gate/out halves of the first matmul are computed separately to halve the
peak VMEM (W_in is [dim, 2*inner]).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    x_ref,  # [1, TILE + K - 1, dim] input rows (with halo; pre-LN domain)
    ln_scale_ref, ln_bias_ref,  # [1, dim]
    w_out_ref,  # [dim, inner]   (first half of pw_in: the 'out' branch)
    w_gate_ref,  # [dim, inner]  (second half: the 'gate' branch)
    b_out_ref, b_gate_ref,  # [1, inner]
    dw_ref,  # [K, inner] depthwise taps
    dw_bias_ref,  # [1, inner]
    alpha_ref,  # [1, inner] PReLU slope
    w2_ref,  # [inner, dim]
    b2_ref,  # [1, dim]
    o_ref,  # [TILE, dim]
    *,
    k: int,
    tile: int,
    pad_l: int,
    seq_len: int,
    period: int,
    total_rows: int,
    chunks: int,
):
    x = x_ref[0].astype(jnp.float32)
    # LayerNorm over channels
    mean = jnp.mean(x, axis=1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=1, keepdims=True)
    xn = (x - mean) * jax.lax.rsqrt(var + 1e-5)
    xn = xn * ln_scale_ref[...] + ln_bias_ref[...]
    xn = xn.astype(jnp.bfloat16)

    # software pipelining: the tile is split into row chunks; both pw_in
    # matmuls of EVERY chunk are issued first (back-to-back MXU work), then
    # the VPU stage (SwiGLU/mask/31-tap conv/PReLU) and the out-projection
    # run per chunk — so chunk c's VPU work overlaps chunk c+1's matmuls and
    # chunk c-1's out-projection instead of serializing MXU and VPU.
    assert tile % chunks == 0
    csz = tile // chunks
    row0 = pl.program_id(0) * tile

    mats = []
    for c in range(chunks):
        xn_c = xn[c * csz : c * csz + csz + k - 1]
        mats.append((
            jnp.dot(xn_c, w_out_ref[...], preferred_element_type=jnp.float32),
            jnp.dot(xn_c, w_gate_ref[...], preferred_element_type=jnp.float32),
        ))

    alpha = alpha_ref[...]
    for c in range(chunks):
        out_b, gate_b = mats[c]
        g = gate_b + b_gate_ref[...]
        inner = (out_b + b_out_ref[...]) * (g * jax.nn.sigmoid(g))  # SwiGLU

        # zero the conv's padding rows: the torch 'same' zero padding applies
        # to the INNER activations (post pw_in), while our halo rows are zero
        # x rows whose LN/matmul output is nonzero — mask them out.  Sequences
        # are laid out periodically with pad_l + pad_r = k - 1 padding rows
        # between them (period = seq_len + k - 1), so windows never mix
        # sequences.  The mask depends only on the row index: compute it
        # [rows, 1] and let the where broadcast.
        gidx = (row0 + c * csz) + jax.lax.broadcasted_iota(
            jnp.int32, (inner.shape[0], 1), 0
        )
        pos = jax.lax.rem(gidx, jnp.int32(period))
        valid = (pos >= pad_l) & (pos < pad_l + seq_len) & (gidx < total_rows)
        inner = jnp.where(valid, inner, 0.0)

        # depthwise conv over the row (time) axis: valid over the halo
        acc = jnp.zeros((csz, inner.shape[1]), jnp.float32)
        for tap in range(k):
            acc = acc + inner[tap : tap + csz, :] * dw_ref[tap, :][None, :]
        acc = acc + dw_bias_ref[...]

        # PReLU
        acc = jnp.where(acc >= 0, acc, alpha * acc)

        out = jnp.dot(acc.astype(jnp.bfloat16), w2_ref[...],
                      preferred_element_type=jnp.float32)
        o_ref[c * csz : (c + 1) * csz] = (out + b2_ref[...]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("kernel_size", "tile", "chunks", "interpret")
)
def lynx_conv_module(
    x: jnp.ndarray,  # [B, T, dim]
    ln_scale, ln_bias,  # [dim]
    w_in,  # [dim, 2*inner] (pw_in kernel; columns = [out | gate])
    b_in,  # [2*inner]
    dw_kernel,  # [k, 1, inner] flax depthwise layout
    dw_bias,  # [inner]
    alpha,  # [inner]
    w2,  # [inner, dim]
    b2,  # [dim]
    kernel_size: int = 31,
    tile: int = 256,
    chunks: int = 1,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns the conv-module output [B, T, dim] (residual NOT added)."""
    B, T, dim = x.shape
    inner = w2.shape[0]
    k = kernel_size
    pad_l = k // 2
    pad_r = pad_l - (k + 1) % 2  # torch same-padding for even/odd k
    assert pad_l + pad_r == k - 1

    # flatten batches into one row axis with exactly k-1 zero rows between
    # sequences (the conv's own padding), so one kernel call covers the whole
    # batch with weights resident in VMEM and windows never mix sequences.
    # (BlockSpec indexing is block-granular, so halos are materialized in the
    # gather; ~12% duplicated input traffic at tile=256, k=31)
    from . import flatten_batch_windows

    x_windows, period, total_rows, n_tiles = flatten_batch_windows(
        x, pad_l, pad_r, tile
    )
    total = n_tiles * tile

    dw = dw_kernel.reshape(k, inner)
    w_out_half, w_gate_half = w_in[:, :inner], w_in[:, inner:]
    b_out_half, b_gate_half = b_in[:inner], b_in[inner:]

    grid = (n_tiles,)
    out = pl.pallas_call(
        functools.partial(
            _kernel, k=k, tile=tile, pad_l=pad_l, seq_len=T, period=period,
            total_rows=total_rows, chunks=chunks,
        ),
        out_shape=jax.ShapeDtypeStruct((total, dim), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile + k - 1, dim), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, inner), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, inner), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, inner), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, inner), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, inner), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, inner), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, inner), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((inner, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        # Scoped-vmem cap: Mosaic's default budget (16M) trips at B>=8 even
        # though the per-block working set is B-independent (v5e has 128M),
        # but raising the cap unconditionally costs ~5% on the B=4 headline
        # shape — Mosaic schedules the pipeline differently against the
        # larger budget (measured round 5: 6.78 -> 7.12 ms/step, the whole
        # r2->r3 headline drift; docs/PerformanceNotes.md).  Raise it only
        # for the large row counts that actually need it.
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            if total > 12288 else None
        ),
        interpret=interpret,
    )(
        x_windows.astype(jnp.bfloat16),  # halve input HBM traffic; LN is f32 inside
        ln_scale.reshape(1, dim).astype(jnp.float32),
        ln_bias.reshape(1, dim).astype(jnp.float32),
        w_out_half.astype(jnp.bfloat16), w_gate_half.astype(jnp.bfloat16),
        b_out_half.reshape(1, inner).astype(jnp.float32),
        b_gate_half.reshape(1, inner).astype(jnp.float32),
        dw.astype(jnp.float32),
        dw_bias.reshape(1, inner).astype(jnp.float32),
        alpha.reshape(1, inner).astype(jnp.float32),
        w2.astype(jnp.bfloat16),
        b2.reshape(1, dim).astype(jnp.float32),
    )
    return out[:total_rows].reshape(B, period, dim)[:, :T]
