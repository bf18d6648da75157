"""Fused NSF-HiFiGAN residual-block unit kernel.

One HiFiGAN ResBlock1 unit (``/root/reference/modules/nsf_hifigan/models.py:60-66``)
is

    t = lrelu(h); t = conv1_{k,d}(t); t = lrelu(t); t = conv2_{k,1}(t); h = h + t

With XLA convs the [rows, C] intermediate round-trips HBM twice per unit and
the dilated-conv lowering reaches only ~25-30% MFU at the vocoder's hot stage
(C=128, T=131k rows — see docs/PerformanceNotes.md).  This kernel computes a
whole unit per row-tile in VMEM: both convolutions run as k shifted
[rows, C] x [C, C] MXU matmuls with f32 accumulation, the two leaky-relus and
the residual add ride along on the VPU, and the only HBM traffic is the tile
in (with halo) and the tile out.

It consumes either raw conv weights (tap dilation = d) or time-folded weights
from ``models/vocoders/nsf_fast.py`` (fold factor F, taps pre-densified, tap
dilation 1) — both are "taps x [C_lanes, C_lanes] matrices", the only
difference is the per-tap row offset.

Layout: batch sequences are flattened into one padded row axis (period =
T + gap) so a single kernel call covers the batch with weights resident in
VMEM.  Conv SAME zero-padding at sequence boundaries is reproduced by (a)
keeping the gap rows of ``h`` zero (enforced by masking the output) and (b)
masking the intermediate conv1 rows that fall on gap rows before conv2 reads
them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.1


def _lrelu(x, slope=LRELU_SLOPE):
    return jnp.where(x >= 0, x, slope * x)


def _kernel(
    h_ref,    # [1, tile + halo, C] input rows (halo = span1 + span2)
    w1_ref,   # [k1, C, C] conv1 taps
    b1_ref,   # [1, C]
    w2_ref,   # [k2, C, C] conv2 taps
    b2_ref,   # [1, C]
    o_ref,    # [tile, C]
    *,
    k1: int, d1: int, pad1_l: int,
    k2: int, d2: int, pad2_l: int,
    tile: int,
    period: int,     # T + halo; LOGICAL coordinates: valid rows are [0, T)
    seq_len: int,    # T — rows [seq_len, period) of each period are padding
    total_rows: int,
):
    span2_l = pad2_l
    span2_r = (k2 - 1) * d2 - pad2_l
    # conv1 must produce rows [-span2_l, tile + span2_r) relative to the tile
    m1 = tile + span2_l + span2_r

    h = h_ref[0]
    t = _lrelu(h.astype(jnp.float32)).astype(h.dtype)

    z1 = jnp.zeros((m1, h.shape[-1]), jnp.float32)
    for tap in range(k1):
        off = tap * d1  # h_ref row 0 is output row -span2_l - pad1_l
        z1 = z1 + jnp.dot(t[off : off + m1], w1_ref[tap],
                          preferred_element_type=jnp.float32)
    z1 = z1 + b1_ref[...]

    # conv1 output rows that are sequence-gap rows must read as zero for
    # conv2 (the logical conv pads each sequence with zeros); mask by global
    # row index.  z1 row j corresponds to global output row row0 - span2_l + j.
    row0 = pl.program_id(0) * tile
    gidx1 = (row0 - span2_l) + jax.lax.broadcasted_iota(jnp.int32, (m1, 1), 0)
    pos1 = jax.lax.rem(gidx1 + period, jnp.int32(period))  # (+period: rows < 0)
    valid1 = (pos1 < seq_len) & (gidx1 >= 0) & (gidx1 < total_rows)
    z1 = jnp.where(valid1, z1, 0.0)

    t2 = _lrelu(z1).astype(h.dtype)
    z2 = jnp.zeros((tile, h.shape[-1]), jnp.float32)
    for tap in range(k2):
        off = tap * d2  # t2 row 0 is output row -span2_l
        z2 = z2 + jnp.dot(t2[off : off + tile], w2_ref[tap],
                          preferred_element_type=jnp.float32)
    z2 = z2 + b2_ref[...]

    # residual add; keep gap rows zero so h stays logically padded across units
    center = pad1_l + span2_l  # = halo_l
    res = h[center : center + tile].astype(jnp.float32)
    gidx = row0 + jax.lax.broadcasted_iota(jnp.int32, (tile, 1), 0)
    pos = jax.lax.rem(gidx, jnp.int32(period))
    valid = (pos < seq_len) & (gidx < total_rows)
    o_ref[...] = jnp.where(valid, res + z2, 0.0).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("d1", "pad1_l", "d2", "pad2_l", "tile", "interpret"),
)
def resblock_unit(
    x: jnp.ndarray,        # [B, T, C]
    w1: jnp.ndarray,       # [k1, C, C]
    b1: jnp.ndarray,       # [C]
    w2: jnp.ndarray,       # [k2, C, C]
    b2: jnp.ndarray,       # [C]
    d1: int = 1,
    pad1_l: int = None,    # default: torch SAME
    d2: int = 1,
    pad2_l: int = None,
    tile: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """x + conv2(lrelu(conv1(lrelu(x)))) with SAME zero padding per sequence."""
    B, T, C = x.shape
    k1, k2 = w1.shape[0], w2.shape[0]
    if pad1_l is None:
        pad1_l = (k1 - 1) * d1 // 2
    if pad2_l is None:
        pad2_l = (k2 - 1) * d2 // 2
    span1_l, span1_r = pad1_l, (k1 - 1) * d1 - pad1_l
    span2_l, span2_r = pad2_l, (k2 - 1) * d2 - pad2_l
    halo_l = span1_l + span2_l
    halo_r = span1_r + span2_r
    halo = halo_l + halo_r

    # flatten sequences with a zero gap wide enough that no window crosses
    # into the neighbouring sequence (gap split: halo_l before, halo_r after)
    from . import flatten_batch_windows

    x_windows, period, total_rows, n_tiles = flatten_batch_windows(
        x, halo_l, halo_r, tile
    )
    total = n_tiles * tile
    compute_dtype = x.dtype
    out = pl.pallas_call(
        functools.partial(
            _kernel,
            k1=k1, d1=d1, pad1_l=pad1_l,
            k2=k2, d2=d2, pad2_l=pad2_l,
            tile=tile, period=period, seq_len=T,
            total_rows=total_rows,
        ),
        out_shape=jax.ShapeDtypeStruct((total, C), x.dtype),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, tile + halo, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k1, C, C), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k2, C, C), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        x_windows.astype(compute_dtype),
        w1.astype(compute_dtype),
        b1.reshape(1, C).astype(jnp.float32),
        w2.astype(compute_dtype),
        b2.reshape(1, C).astype(jnp.float32),
    )
    return out[:total_rows].reshape(B, period, C)[:, :T]
