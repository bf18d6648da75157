"""Pallas-accelerated WaveNet denoiser apply (inference path).

Numerically equivalent to ``WaveNet.__call__`` (``wavenet.py``) but driven
directly off the parameter pytree with the fused residual-block kernel
(``ops/pallas/wavenet_block.py``) replacing the dilated-conv -> gating ->
output-projection chain.  The conditioner projections are plain XLA matmuls
inside the step function — they are sampler-loop invariants, so XLA LICM
hoists them out of the scan (same behavior as the reference's ONNX
"conditioner projection extraction",
``deployment/exporters/acoustic_exporter.py:333-361``).  Training keeps the
flax path (autodiff).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..common import sinusoidal_step_embedding
from ...ops.pallas.wavenet_block import wavenet_block


def _dense(p, x):
    return x @ p["kernel"].astype(x.dtype) + p["bias"].astype(x.dtype)


def wavenet_denoiser_apply(
    params: dict,
    spec: jnp.ndarray,            # [B, F, T, M]
    diffusion_step: jnp.ndarray,  # [B]
    cond: jnp.ndarray,            # [B, T, H]
    *,
    num_layers: int = 20,
    dilation_cycle_length: int = 4,
    tile: int = 256,
    chunk: int = 1,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    p = params["params"] if "params" in params else params
    if "backbone" in p:
        p = p["backbone"]
    B, F, T, M = spec.shape
    x = spec.transpose(0, 2, 1, 3).reshape(B, T, F * M).astype(compute_dtype)
    cond = cond.astype(compute_dtype)
    x = _dense(p["input_projection"], x)
    x = jax.nn.relu(x)
    C = x.shape[-1]

    step = sinusoidal_step_embedding(diffusion_step, C).astype(compute_dtype)
    step = _dense(p["mlp_0"], step)
    step = step * jnp.tanh(jax.nn.softplus(step))  # Mish
    step = _dense(p["mlp_2"], step)

    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    skip_sum = jnp.zeros_like(x)
    for i in range(num_layers):
        lp = p[f"residual_layers_{i}"]
        step_i = _dense(lp["diffusion_projection"], step)  # [B, C]
        cond_proj = _dense(lp["conditioner_projection"], cond)  # [B, T, 2C]
        y = x + step_i[:, None, :]
        residual, skip = wavenet_block(
            y, cond_proj,
            lp["dilated_conv"]["kernel"], lp["dilated_conv"]["bias"],
            lp["output_projection"]["kernel"], lp["output_projection"]["bias"],
            dilation=2 ** (i % dilation_cycle_length),
            tile=tile, chunk=chunk, interpret=interpret,
        )
        x = (x + residual.astype(compute_dtype)) * inv_sqrt2
        skip_sum = skip_sum + skip.astype(compute_dtype)

    x = skip_sum * (1.0 / math.sqrt(num_layers))
    x = jax.nn.relu(_dense(p["skip_projection"], x))
    out = _dense(p["output_projection"], x)
    return out.reshape(B, T, F, M).transpose(0, 2, 1, 3)
