"""Software-pipelined LYNX residual-layer kernel (v3).

tools/overlap_probe.py measured that Mosaic DUAL-ISSUES independent MXU and
VPU work inside one program (73% overlap) — round 1's failed pipelining
attempts kept intra-program dependency chains.  v3 removes all in-program
dependencies by staging the layer across grid steps on persistent scratch:

    program p (tile index space, per sequence):
        S1 (VPU): LayerNorm of tile p            -> xn scratch
        S2 (MXU): pw_in dots of tile p-1         -> out_b/gate_b scratch
        S3 (VPU): SwiGLU+mask+dwconv+PReLU p-2   -> acc scratch
        S4 (MXU): pw_out dot + residual, tile p-3 -> output block p-3

The four stages touch four DIFFERENT tiles, so the scheduler may freely
overlap the MXU stream (S2+S4, ~2/3 of the serial time) with the VPU stream
(S1+S3).  Scratch is double-buffered by grid-step parity; the grid gets 3
drain steps per sequence and ``pl.when`` guards handle fill/drain.  Math is
identical to v2 (``lynx_conv2.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    x_ref,        # [1, 1, tile + k - 1, dim] windows of (x+cond), block p (S1)
    res_ref,      # same array, block p-3 (S4 residual + epilogue)
    step_ref,     # [1, 1, dim] f32
    ln_scale_ref, ln_bias_ref,
    w_out_ref, w_gate_ref,       # [dim, inner]
    b_out_ref, b_gate_ref,       # [1, inner]
    dw_ref, dw_bias_ref, alpha_ref,
    w2_ref, b2_ref,
    o_ref,        # [1, 1, tile, dim] block p-3
    xn_s,         # scratch [2, tile + k - 1, dim] bf16
    outb_s,       # scratch [2, tile + k - 1, inner] f32
    gateb_s,      # scratch [2, tile + k - 1, inner] f32
    acc_s,        # scratch [2, tile, inner] bf16
    *,
    k: int,
    tile: int,
    pad_l: int,
    seq_len: int,
    n_tiles: int,
    dw_impl: str,
):
    p = pl.program_id(1)
    rows = tile + k - 1

    # All four stages run UNCONDITIONALLY every grid step (predication was
    # measured 2x slower — see docs/PerformanceNotes.md): fill/drain steps
    # compute garbage from clamped input blocks / stale scratch, but every
    # garbage value is either overwritten before the deferred output flush
    # (stores at p<3 hit the same out block as p=3; Mosaic flushes on block
    # INDEX change, so only the last store lands) or never consumed.

    # ---- S1 (VPU): LayerNorm(x + cond + step) for tile p --------------------
    h = x_ref[0, 0].astype(jnp.float32) + step_ref[0]
    mean = jnp.mean(h, axis=1, keepdims=True)
    var = jnp.mean((h - mean) ** 2, axis=1, keepdims=True)
    xn1 = (h - mean) * jax.lax.rsqrt(var + 1e-5)
    xn1 = xn1 * ln_scale_ref[...] + ln_bias_ref[...]
    xn_s[p % 2] = xn1.astype(jnp.bfloat16)

    # ---- S2 (MXU): pw_in dots for tile p-1 ----------------------------------
    xn = xn_s[(p - 1) % 2]
    outb_s[(p - 1) % 2] = jnp.dot(
        xn, w_out_ref[...], preferred_element_type=jnp.float32
    )
    gateb_s[(p - 1) % 2] = jnp.dot(
        xn, w_gate_ref[...], preferred_element_type=jnp.float32
    )

    # ---- S3 (VPU): SwiGLU + pad mask + dwconv + PReLU for tile p-2 ----------
    out_b = outb_s[(p - 2) % 2]
    g = gateb_s[(p - 2) % 2] + b_gate_ref[...]
    inner = (out_b + b_out_ref[...]) * (g * jax.nn.sigmoid(g))

    row0 = (p - 2) * tile
    gidx = row0 + jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    valid = (gidx >= pad_l) & (gidx < pad_l + seq_len)
    inner = jnp.where(valid, inner, 0.0)

    acc = jnp.zeros((tile, inner.shape[1]), jnp.float32)
    if dw_impl == "roll":
        for tap in range(k):
            shifted = pltpu.roll(inner, rows - tap, 0) if tap else inner
            acc = acc + shifted[:tile, :] * dw_ref[tap, :][None, :]
    else:
        for tap in range(k):
            acc = acc + inner[tap : tap + tile, :] * dw_ref[tap, :][None, :]
    acc = acc + dw_bias_ref[...]
    acc = jnp.where(acc >= 0, acc, alpha_ref[...] * acc)
    acc_s[(p - 2) % 2] = acc.astype(jnp.bfloat16)

    # ---- S4 (MXU): pw_out + residual for tile p-3 ----------------------------
    out = jnp.dot(acc_s[(p - 3) % 2], w2_ref[...],
                  preferred_element_type=jnp.float32)
    res = res_ref[0, 0, pad_l : pad_l + tile].astype(jnp.float32)
    o_ref[0, 0] = (out + b2_ref[...] + res).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("kernel_size", "tile", "dw_impl", "interpret"),
)
def lynx_layer_fused_v3(
    x: jnp.ndarray,          # [B, T, dim]
    cond_proj: jnp.ndarray,  # [B, T, dim]
    step: jnp.ndarray,       # [B, dim]
    ln_scale, ln_bias,
    w_in, b_in,
    dw_kernel, dw_bias, alpha,
    w2, b2,
    kernel_size: int = 31,
    tile: int = 256,
    dw_impl: str = "slice",
    interpret: bool = False,
) -> jnp.ndarray:
    """Same contract as lynx_conv2.lynx_layer_fused (strong_cond layer)."""
    B, T, dim = x.shape
    inner = w2.shape[0]
    k = kernel_size
    pad_l = k // 2
    pad_r = pad_l - (k + 1) % 2
    assert pad_l + pad_r == k - 1

    n_tiles = (T + tile - 1) // tile
    total = n_tiles * tile

    hc = (x + cond_proj).astype(jnp.bfloat16)
    hp = jnp.pad(hc, ((0, 0), (pad_l, pad_r + total - T), (0, 0)))
    win_idx = (
        jnp.arange(n_tiles)[:, None] * tile + jnp.arange(tile + k - 1)[None, :]
    )
    windows = hp[:, win_idx]  # [B, n_tiles, tile + k - 1, dim]

    dw = dw_kernel.reshape(k, inner)
    w_out_half, w_gate_half = w_in[:, :inner], w_in[:, inner:]
    b_out_half, b_gate_half = b_in[:inner], b_in[inner:]

    def clamp_s1(b, p):
        return (b, jnp.minimum(p, n_tiles - 1), 0, 0)

    def clamp_s4(b, p):
        return (b, jnp.clip(p - 3, 0, n_tiles - 1), 0, 0)

    const = lambda shape: pl.BlockSpec(shape, lambda b, p: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _kernel, k=k, tile=tile, pad_l=pad_l, seq_len=T,
            n_tiles=n_tiles, dw_impl=dw_impl,
        ),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles, tile, dim), x.dtype),
        grid=(B, n_tiles + 3),
        in_specs=[
            pl.BlockSpec((1, 1, tile + k - 1, dim), clamp_s1,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile + k - 1, dim), clamp_s4,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dim), lambda b, p: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            const((1, dim)), const((1, dim)),
            const((dim, inner)), const((dim, inner)),
            const((1, inner)), const((1, inner)),
            const((k, inner)), const((1, inner)), const((1, inner)),
            const((inner, dim)), const((1, dim)),
        ],
        out_specs=pl.BlockSpec((1, 1, tile, dim), clamp_s4,
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, tile + k - 1, dim), jnp.bfloat16),
            pltpu.VMEM((2, tile + k - 1, inner), jnp.float32),
            pltpu.VMEM((2, tile + k - 1, inner), jnp.float32),
            pltpu.VMEM((2, tile, inner), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        windows,
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
