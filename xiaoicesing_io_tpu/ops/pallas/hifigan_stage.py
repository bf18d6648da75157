"""Fused NSF-HiFiGAN whole-stage resblock kernel.

One generator stage runs ``num_k`` parallel ResBlock1 branches over the same
input and averages them (``/root/reference/modules/nsf_hifigan/models.py:265-276``):

    xs = mean_j( ResBlock1_j(x) ),   ResBlock1 = 3 x [lrelu -> conv_{k_j,d} ->
                                                      lrelu -> conv_{k_j,1} -> +res]

The round-1 per-unit kernel (``hifigan_resblock.py``) lost to XLA ~1.8x: each
unit paid its own HBM round trip + window gather, and its per-tap
[rows, C] x [C, C] dots (N = 128 lanes) cannot spread across the MXUs.  This
kernel fixes both:

* the WHOLE stage (all 18 convs at the default [3,7,11] x [1,3,5] config)
  runs per row-tile with every intermediate resident in VMEM — HBM traffic is
  one tile in (+ halo) and one tile out;
* each conv is ONE "stacked-tap" matmul ``[rows, C] @ [C, k*C]`` (N = k*128
  lane-tiles spreads over the MXUs), followed by k shifted partial-product
  adds on the VPU:  ``out[r] = sum_tap z[r + tap*d, tap*C:(tap+1)*C]``.

Weights consume taps in either raw (dilated) or time-folded
(``models/vocoders/nsf_fast.py``) form — both are "taps of [L, L] matrices
with a row offset per tap"; asymmetric folded padding is supported via
``pad_l`` per conv.

Buffers shrink as convs consume their halo; all coordinates are tracked
relative to the tile's first output row so branches with different receptive
fields re-align for the final mean.  Sequence-boundary SAME padding is
enforced by masking conv outputs whose logical row falls outside the
sequence (the input windows already carry zero gap rows).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.1


class ConvSpec(NamedTuple):
    """Static geometry of one conv inside the stage (weights passed separately)."""

    k: int        # taps
    d: int        # tap row stride (dilation; folded convs use 1)
    pad_l: int    # SAME left padding in rows (may be asymmetric for folded)


def _lrelu(x):
    return jnp.where(x >= 0, x, LRELU_SLOPE * x)


def _kernel(*refs, tile, halo_l, specs, seq_len, period, total_rows, num_k):
    # refs: x_win, (w, b) per conv ..., out
    x_ref = refs[0]
    o_ref = refs[-1]
    wrefs = refs[1:-1]

    x = x_ref[0]  # [tile + halo, L] bf16
    L = x.shape[-1]
    row0 = pl.program_id(0) * tile  # logical row of output row 0

    def mask_rows(v, first_logical):
        # zero rows outside the (period-striped) valid sequence rows
        gidx = first_logical + jax.lax.broadcasted_iota(
            jnp.int32, (v.shape[0], 1), 0
        )
        pos = jax.lax.rem(gidx + period, jnp.int32(period))
        valid = (pos < seq_len) & (gidx >= 0) & (gidx < total_rows)
        return jnp.where(valid, v, 0.0)

    def conv(h, off, spec, w_ref, b_ref):
        """h: [rows, L] f32; h[0] is logical row ``row0 + off`` (off static).

        Returns (out, new_off) with out[0] at logical ``row0 + new_off``.
        """
        rows = h.shape[0]
        out_rows = rows - (spec.k - 1) * spec.d
        t = _lrelu(h).astype(jnp.bfloat16)
        z = jnp.dot(t, w_ref[...], preferred_element_type=jnp.float32)
        acc = z[0 : out_rows, 0:L]
        for tap in range(1, spec.k):
            o = tap * spec.d
            acc = acc + z[o : o + out_rows, tap * L : (tap + 1) * L]
        acc = acc + b_ref[...]
        new_off = off + spec.pad_l
        return mask_rows(acc, row0 + new_off), new_off

    ci = 0
    acc_out = jnp.zeros((tile, L), jnp.float32)
    for j in range(num_k):
        h = x.astype(jnp.float32)
        off = -halo_l  # static offset of h[0] relative to row0
        units = len(specs[j])
        for u in range(units):
            s1, s2 = specs[j][u]
            t1, o1 = conv(h, off, s1, wrefs[2 * ci], wrefs[2 * ci + 1])
            ci += 1
            t2, o2 = conv(t1, o1, s2, wrefs[2 * ci], wrefs[2 * ci + 1])
            ci += 1
            # residual: crop h to t2's coordinates
            start = o2 - off
            h = h[start : start + t2.shape[0]] + t2
            off = o2
        # crop branch output to the tile's rows [row0, row0 + tile)
        acc_out = acc_out + h[-off : -off + tile]
    acc_out = mask_rows(acc_out / num_k, row0)
    o_ref[...] = acc_out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("specs", "tile", "interpret")
)
def fused_resblock_stage(
    x: jnp.ndarray,                     # [B, T, L] stage input (post source add)
    weights: Sequence[jnp.ndarray],     # per conv: stacked [L, k*L]
    biases: Sequence[jnp.ndarray],      # per conv: [L]
    specs: Tuple[Tuple[Tuple[ConvSpec, ConvSpec], ...], ...],  # [branch][unit]
    tile: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """mean over branches of ResBlock1_j(x), all in one kernel."""
    B, T, L = x.shape
    num_k = len(specs)

    # per-branch receptive halo (left/right) from the chained conv pads
    halo_l = halo_r = 0
    for branch in specs:
        bl = br = 0
        for s1, s2 in branch:
            for s in (s1, s2):
                span = (s.k - 1) * s.d
                bl += s.pad_l
                br += span - s.pad_l
        halo_l, halo_r = max(halo_l, bl), max(halo_r, br)
    # equalize: the kernel tracks one shared window, branches crop themselves
    from . import flatten_batch_windows

    x_win, period, total_rows, n_tiles = flatten_batch_windows(
        x.astype(jnp.bfloat16), halo_l, halo_r, tile
    )
    total = n_tiles * tile

    flat_wb = []
    in_specs = [
        pl.BlockSpec((1, tile + halo_l + halo_r, L), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    for w, b in zip(weights, biases):
        kL = w.shape[1]
        flat_wb.append(w.astype(jnp.bfloat16))
        in_specs.append(pl.BlockSpec((L, kL), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        flat_wb.append(b.reshape(1, L).astype(jnp.float32))
        in_specs.append(pl.BlockSpec((1, L), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    out = pl.pallas_call(
        functools.partial(
            _kernel, tile=tile, halo_l=halo_l, specs=specs, seq_len=T,
            period=period, total_rows=total_rows, num_k=num_k,
        ),
        out_shape=jax.ShapeDtypeStruct((total, L), x.dtype),
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_win, *flat_wb)
    return out[:total_rows].reshape(B, period, L)[:, :T]


def stack_taps(W: np.ndarray) -> np.ndarray:
    """[k, C_in, C_out] conv taps -> stacked [C_in, k*C_out] matmul weight."""
    k, ci, co = W.shape
    return np.asarray(W).transpose(1, 0, 2).reshape(ci, k * co)
