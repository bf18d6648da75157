"""Fused WaveNet residual-block kernel.

The WaveNet denoiser (``/root/reference/modules/backbones/wavenet.py:18-107``)
is the classic DiffSinger backbone: 20 residual blocks, each

    y = x + step_proj                       (diffusion-step bias, per batch)
    z = dilated_conv_k3(y) + cond_proj      (-> 2C channels)
    g = sigmoid(z[:, :C]) * tanh(z[:, C:])  (gated activation)
    o = out_proj(g)                         (-> 2C channels)
    residual, skip = o[:, :C], o[:, C:]

Unfused, the [rows, 2C] conv output and the [rows, C] gated activations
round-trip HBM between the conv matmul and the output projection.  This
kernel keeps one row-tile of the whole block in VMEM: the k=3 dilated conv
runs as three shifted [tile, C] x [C, 2C] MXU matmuls accumulated in f32,
gating on the VPU, and the output projection as a fourth matmul.  The only
HBM traffic is y in, [residual|skip] out, the precomputed conditioner
projection (step-invariant, hoisted out of the sampler loop by XLA LICM),
and the weights (resident in VMEM across the grid).

Layout: batches are flattened into one row axis with d zero rows of padding
on both sides of every sequence (= the conv's own SAME padding), so windows
never mix sequences and one kernel call covers the whole batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    y_ref,       # [chunk, tile + 2d, C] conv input rows (halo; zero pad rows)
    condp_ref,   # [chunk * tile, 2C] conditioner projection (padded layout)
    w0_ref, w1_ref, w2_ref,  # [C, 2C] dilated-conv taps (t-d, t, t+d)
    b_conv_ref,  # [1, 2C]
    wo_ref,      # [C, 2C] output projection
    bo_ref,      # [1, 2C]
    o_ref,       # [chunk * tile, 2C] = [residual | skip]
    *,
    d: int,
    tile: int,
    chunk: int,
):
    # ``chunk`` sub-tiles per program are independent value chains, so the
    # scheduler hides each sub-tile's gating (VPU) under the next sub-tile's
    # conv matmuls (tools/overlap_probe2.py: near-total overlap)
    for c in range(chunk):
        y = y_ref[c]
        C = y.shape[-1]
        # dilated conv as shifted-slice matmuls, f32 accumulation on the MXU
        z = jnp.dot(y[0:tile], w0_ref[...], preferred_element_type=jnp.float32)
        z += jnp.dot(y[d : d + tile], w1_ref[...],
                     preferred_element_type=jnp.float32)
        z += jnp.dot(y[2 * d : 2 * d + tile], w2_ref[...],
                     preferred_element_type=jnp.float32)
        z += b_conv_ref[...] + condp_ref[
            c * tile : (c + 1) * tile
        ].astype(jnp.float32)

        gate, filt = z[:, :C], z[:, C:]
        g = (jax.nn.sigmoid(gate) * jnp.tanh(filt)).astype(y.dtype)

        out = jnp.dot(g, wo_ref[...], preferred_element_type=jnp.float32)
        o_ref[c * tile : (c + 1) * tile] = (out + bo_ref[...]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("dilation", "tile", "chunk", "interpret")
)
def wavenet_block(
    y: jnp.ndarray,        # [B, T, C] conv input (x + step bias already added)
    cond_proj: jnp.ndarray,  # [B, T, 2C] conditioner projection
    conv_kernel: jnp.ndarray,  # [3, C, 2C] flax dilated-conv kernel
    conv_bias: jnp.ndarray,    # [2C]
    out_kernel: jnp.ndarray,   # [C, 2C]
    out_bias: jnp.ndarray,     # [2C]
    dilation: int = 1,
    tile: int = 256,
    chunk: int = 1,
    interpret: bool = False,
):
    """Returns (residual_delta [B, T, C], skip [B, T, C]) — the raw output
    projection halves; the caller adds x and scales by 1/sqrt(2)."""
    B, T, C = y.shape
    d = dilation

    compute_dtype = jnp.bfloat16 if y.dtype != jnp.float64 else y.dtype
    from . import flatten_batch_windows

    # window rows carry the d-row halo; conv output t lands at logical row t,
    # so cond_proj / the output slice align at offset 0
    y_windows, period, total_rows, n_tiles = flatten_batch_windows(y, d, d, tile)
    n_tiles = ((n_tiles + chunk - 1) // chunk) * chunk
    if y_windows.shape[0] < n_tiles:  # pad window blocks to chunk multiple
        y_windows = jnp.pad(
            y_windows,
            ((0, n_tiles - y_windows.shape[0]), (0, 0), (0, 0)),
        )
    total = n_tiles * tile
    cp = jnp.pad(cond_proj, ((0, 0), (0, 2 * d), (0, 0))).reshape(B * period, 2 * C)
    cp = jnp.pad(cp, ((0, total - cp.shape[0]), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, d=d, tile=tile, chunk=chunk),
        out_shape=jax.ShapeDtypeStruct((total, 2 * C), y.dtype),
        grid=(n_tiles // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, tile + 2 * d, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk * tile, 2 * C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 2 * C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 2 * C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 2 * C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 2 * C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk * tile, 2 * C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        y_windows.astype(compute_dtype),
        cp.astype(compute_dtype),
        conv_kernel[0].astype(compute_dtype),
        conv_kernel[1].astype(compute_dtype),
        conv_kernel[2].astype(compute_dtype),
        conv_bias.reshape(1, 2 * C).astype(jnp.float32),
        out_kernel.astype(compute_dtype),
        out_bias.reshape(1, 2 * C).astype(jnp.float32),
    )
    out = out[:total_rows].reshape(B, period, 2 * C)[:, :T]
    return out[..., :C], out[..., C:]
