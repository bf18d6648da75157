"""Fused LYNXNet residual-layer kernel, v2 (inference sampler hot path).

v1 (``lynx_conv.py``) fuses the conv module only; the sampler still pays
three XLA elementwise passes per layer (``x + cond_proj``, ``+ step``,
``+ residual``) plus a window-gather pass, and the 31-tap depthwise conv
spends most of its VPU time on misaligned sublane slice reads.

v2 fuses the whole residual layer (reference:
``/root/reference/modules/backbones/lynxnet.py:29-163``, strong_cond path):

    res = x + cond_proj                  (prologue, in-kernel)
    h   = res + step_embed[b]            (prologue; step is per-batch)
    y   = ConvModule(h)                  (LN -> pw_in -> SwiGLU -> dwconv31
                                          -> PReLU -> pw_out)
    out = y + res                        (epilogue, in-kernel)

Grid is (B, n_tiles): every program owns one row tile of one sequence, so
the step embedding is a static per-program block and sequence-boundary
masking needs no period arithmetic.  Inputs are per-sequence row windows
(tile + k - 1 rows, zero-padded at the sequence edges), built by one fused
XLA pad+gather pass per layer; the residual rows are the center of the same
window (no second read).

The depthwise conv supports two schedules (``dw_impl``):

* ``"slice"``  — one (generally misaligned) sublane slice read per tap;
* ``"roll"``   — cyclic roll per tap, then an aligned [0:csz] view; the
  k - 1 spare rows at the buffer tail absorb the wrap-around, so results
  are identical.

Benchmark both on hardware; see docs/PerformanceNotes.md for measurements.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    x_ref,       # [1, chunk, tile + k - 1, dim] windows of (x+cond), bf16
    step_ref,    # [1, 1, dim] step embedding for this batch row, f32
    ln_scale_ref, ln_bias_ref,   # [1, dim]
    w_out_ref, w_gate_ref,       # [dim, inner] halves of pw_in
    b_out_ref, b_gate_ref,       # [1, inner]
    dw_ref,      # [k, inner] depthwise taps, f32
    dw_bias_ref,  # [1, inner]
    alpha_ref,   # [1, inner] PReLU slope
    w2_ref,      # [inner, dim]
    b2_ref,      # [1, dim]
    o_ref,       # [1, chunk, tile, dim]
    *,
    k: int,
    tile: int,
    pad_l: int,
    seq_len: int,
    chunk: int,
    dw_impl: str,
    ablate: str = "",
):
    # ``chunk`` sub-tiles are processed per program as INDEPENDENT value
    # chains — Mosaic dual-issues sub-tile B's matmuls under sub-tile A's
    # VPU stage (measured 73-100% overlap, tools/overlap_probe*.py).
    # ``ablate`` disables stages for on-chip cost attribution ONLY (results
    # are wrong when set); see tools/perf_sweep.py.
    for c in range(chunk):
        res = x_ref[0, c]                   # [tile + k - 1, dim] bf16
        h = res.astype(jnp.float32) + step_ref[0]

        if "ln" in ablate:
            xn = h.astype(jnp.bfloat16)
        else:
            # LayerNorm over channels (f32)
            mean = jnp.mean(h, axis=1, keepdims=True)
            var = jnp.mean((h - mean) ** 2, axis=1, keepdims=True)
            xn = (h - mean) * jax.lax.rsqrt(var + 1e-5)
            xn = (xn * ln_scale_ref[...] + ln_bias_ref[...]).astype(jnp.bfloat16)

        out_b = jnp.dot(xn, w_out_ref[...], preferred_element_type=jnp.float32)
        if "swiglu" in ablate:
            inner = out_b + b_out_ref[...]
        else:
            gate_b = jnp.dot(xn, w_gate_ref[...],
                             preferred_element_type=jnp.float32)
            g = gate_b + b_gate_ref[...]
            inner = (out_b + b_out_ref[...]) * (g * jax.nn.sigmoid(g))  # SwiGLU

        # zero the conv's padding rows: window row j of sub-tile (i, c) is
        # padded row (i*chunk + c)*tile + j; valid rows [pad_l, pad_l+seq_len)
        row0 = (pl.program_id(1) * chunk + c) * tile
        gidx = row0 + jax.lax.broadcasted_iota(
            jnp.int32, (inner.shape[0], 1), 0
        )
        valid = (gidx >= pad_l) & (gidx < pad_l + seq_len)
        inner = jnp.where(valid, inner, 0.0)

        # depthwise conv over the row (time) axis
        acc = jnp.zeros((tile, inner.shape[1]), jnp.float32)
        if "dw" in ablate:
            acc = inner[:tile, :]
        elif dw_impl == "roll":
            # cyclic roll per tap + aligned [0:tile] view; the k-1 spare
            # tail rows absorb the wrap-around
            n_rows = inner.shape[0]
            for tap in range(k):
                # roll shift must be non-negative: -tap == n_rows - tap
                shifted = pltpu.roll(inner, n_rows - tap, 0) if tap else inner
                acc = acc + shifted[:tile, :] * dw_ref[tap, :][None, :]
        else:
            for tap in range(k):
                acc = acc + inner[tap : tap + tile, :] * dw_ref[tap, :][None, :]
        acc = acc + dw_bias_ref[...]

        # PReLU
        acc = jnp.where(acc >= 0, acc, alpha_ref[...] * acc)

        out = jnp.dot(acc.astype(jnp.bfloat16), w2_ref[...],
                      preferred_element_type=jnp.float32)
        out = out + b2_ref[...] + res[pad_l : pad_l + tile].astype(jnp.float32)
        o_ref[0, c] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("kernel_size", "tile", "chunk", "dw_impl", "ablate",
                     "interpret"),
)
def lynx_layer_fused(
    x: jnp.ndarray,          # [B, T, dim] layer input
    cond_proj: jnp.ndarray,  # [B, T, dim] conditioner projection (hoisted)
    step: jnp.ndarray,       # [B, dim] diffusion-step embedding projection
    ln_scale, ln_bias,       # [dim]
    w_in,                    # [dim, 2*inner] pw_in ([out | gate] halves)
    b_in,                    # [2*inner]
    dw_kernel,               # [k, 1, inner] flax depthwise layout
    dw_bias,                 # [inner]
    alpha,                   # [inner]
    w2,                      # [inner, dim]
    b2,                      # [dim]
    kernel_size: int = 31,
    tile: int = 256,
    chunk: int = 1,
    dw_impl: str = "slice",
    ablate: str = "",
    interpret: bool = False,
) -> jnp.ndarray:
    """One full strong_cond LYNX residual layer: ConvModule(x+cond+step) + (x+cond)."""
    B, T, dim = x.shape
    inner = w2.shape[0]
    k = kernel_size
    pad_l = k // 2
    pad_r = pad_l - (k + 1) % 2  # torch SAME for even/odd k
    assert pad_l + pad_r == k - 1

    n_tiles = (T + tile - 1) // tile
    n_tiles = ((n_tiles + chunk - 1) // chunk) * chunk  # chunk-divisible
    total = n_tiles * tile

    # one fused XLA pass: add + pad + overlapping-window gather, per sequence
    hc = (x + cond_proj).astype(jnp.bfloat16)
    hp = jnp.pad(hc, ((0, 0), (pad_l, pad_r + total - T), (0, 0)))
    win_idx = (
        jnp.arange(n_tiles)[:, None] * tile + jnp.arange(tile + k - 1)[None, :]
    )
    windows = hp[:, win_idx]  # [B, n_tiles, tile + k - 1, dim]

    dw = dw_kernel.reshape(k, inner)
    w_out_half, w_gate_half = w_in[:, :inner], w_in[:, inner:]
    b_out_half, b_gate_half = b_in[:inner], b_in[inner:]

    const = lambda shape: pl.BlockSpec(shape, lambda b, i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _kernel, k=k, tile=tile, pad_l=pad_l, seq_len=T, chunk=chunk,
            dw_impl=dw_impl, ablate=ablate,
        ),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles, tile, dim), x.dtype),
        grid=(B, n_tiles // chunk),
        in_specs=[
            pl.BlockSpec((1, chunk, tile + k - 1, dim),
                         lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dim), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            const((1, dim)), const((1, dim)),
            const((dim, inner)), const((dim, inner)),
            const((1, inner)), const((1, inner)),
            const((k, inner)), const((1, inner)), const((1, inner)),
            const((inner, dim)), const((1, dim)),
        ],
        out_specs=pl.BlockSpec((1, chunk, tile, dim),
                               lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        windows,
        step.reshape(B, 1, dim).astype(jnp.float32),
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
    return out.reshape(B, total, dim)[:, :T]
