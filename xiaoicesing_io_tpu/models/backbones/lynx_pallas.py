"""Pallas-accelerated LYNXNet denoiser apply (inference path).

Numerically equivalent to ``LYNXNet.__call__`` but driven directly off the
parameter pytree with the fused Pallas conv-module kernel
(``ops/pallas/lynx_conv.py``) replacing the LayerNorm -> pw_in -> SwiGLU ->
depthwise conv -> PReLU -> pw_out chain.  Used by samplers/bench through the
``denoise_fn`` closure; training keeps the flax path (autodiff).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..common import sinusoidal_step_embedding
from ...ops.pallas.lynx_conv import lynx_conv_module
from ...ops.pallas.lynx_conv2 import lynx_layer_fused
from ...ops.pallas.lynx_conv3 import lynx_layer_fused_v3


def _dense(p, x):
    return x @ p["kernel"].astype(x.dtype) + p["bias"].astype(x.dtype)


def _resolve(params: dict) -> dict:
    p = params["params"] if "params" in params else params
    if "backbone" in p:
        p = p["backbone"]
    return p


def lynx_cond_projections(
    params: dict,
    cond: jnp.ndarray,  # [B, T, H]
    *,
    num_layers: int = 6,
    compute_dtype=jnp.bfloat16,
):
    """Per-layer conditioner projections, loop-invariant across sampler steps.

    The K-step samplers call the denoiser with the SAME ``cond`` every step;
    each layer's ``conditioner_projection`` matmul (~1/7 of the denoiser's
    FLOPs at the acoustic shape) therefore only needs to run once.  Compute
    these before the scan and pass them to :func:`lynx_denoiser_apply` via
    ``cond_projs`` — the projections become scan constants instead of
    per-step work.
    """
    p = _resolve(params)
    cond = cond.astype(compute_dtype)
    return tuple(
        _dense(p[f"residual_layers_{i}"]["conditioner_projection"], cond)
        for i in range(num_layers)
    )


def lynx_denoiser_apply(
    params: dict,  # LYNXNet param collection (params["params"]... resolved)
    spec: jnp.ndarray,  # [B, F, T, M]
    diffusion_step: jnp.ndarray,  # [B]
    cond: jnp.ndarray = None,  # [B, T, H] (unused when cond_projs given)
    *,
    num_layers: int = 6,
    strong_cond: bool = False,
    kernel_size: int = 31,
    tile: int = 256,
    chunks: int = 1,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
    cond_projs=None,  # precomputed lynx_cond_projections (hoisted out of the loop)
    fused_layer=False,  # True/"v2": whole-layer kernel; "v3": software-pipelined
    dw_impl: str = "slice",
    ablate: str = "",  # v2 stage ablation for perf attribution (wrong results)
    module_impl: str = "v1",  # "hybrid": XLA matmul head + Pallas conv tail
) -> jnp.ndarray:
    p = _resolve(params)
    B, F, T, M = spec.shape
    x = spec.transpose(0, 2, 1, 3).reshape(B, T, F * M).astype(compute_dtype)
    if cond_projs is None:
        cond = cond.astype(compute_dtype)
    x = _dense(p["input_projection"], x)
    if not strong_cond:
        x = jax.nn.gelu(x, approximate=False)

    step = sinusoidal_step_embedding(diffusion_step, x.shape[-1]).astype(compute_dtype)
    step = _dense(p["diff_mlp_0"], step)
    step = jax.nn.gelu(step, approximate=False)
    step = _dense(p["diff_mlp_1"], step)

    for i in range(num_layers):
        lp = p[f"residual_layers_{i}"]
        if cond_projs is not None:
            cond_proj = cond_projs[i].astype(compute_dtype)
        else:
            cond_proj = _dense(lp["conditioner_projection"], cond)
        if fused_layer and strong_cond:
            # v2/v3: the whole residual layer (cond/step pre-adds, conv
            # module, residual) runs in one kernel; v3 software-pipelines
            # the MXU and VPU stages across row tiles
            cm = lp["convmodule"]
            sp = _dense(lp["diffusion_projection"], step)
            layer_fn = (lynx_layer_fused_v3 if fused_layer == "v3"
                        else lynx_layer_fused)
            kw = ({} if fused_layer == "v3"
                  else {"ablate": ablate, "chunk": chunks})
            x = layer_fn(
                x, cond_proj, sp,
                cm["norm"]["scale"], cm["norm"]["bias"],
                cm["pw_in"]["kernel"], cm["pw_in"]["bias"],
                cm["dw_conv"]["kernel"], cm["dw_conv"]["bias"],
                cm["act"]["alpha"],
                cm["pw_out"]["kernel"], cm["pw_out"]["bias"],
                kernel_size=kernel_size, tile=tile, dw_impl=dw_impl,
                interpret=interpret, **kw,
            ).astype(compute_dtype)
            continue
        if strong_cond:
            x = x + cond_proj
            res = x
            h = x
        else:
            res = x
            h = x + cond_proj
        h = h + _dense(lp["diffusion_projection"], step)[:, None, :]
        cm = lp["convmodule"]
        if module_impl == "hybrid":
            from ...ops.pallas.lynx_hybrid import lynx_conv_module_hybrid

            h = lynx_conv_module_hybrid(
                h,
                cm["norm"]["scale"], cm["norm"]["bias"],
                cm["pw_in"]["kernel"], cm["pw_in"]["bias"],
                cm["dw_conv"]["kernel"], cm["dw_conv"]["bias"],
                cm["act"]["alpha"],
                cm["pw_out"]["kernel"], cm["pw_out"]["bias"],
                kernel_size=kernel_size, tile=tile, interpret=interpret,
            ).astype(compute_dtype)
        else:
            h = lynx_conv_module(
                h,
                cm["norm"]["scale"], cm["norm"]["bias"],
                cm["pw_in"]["kernel"], cm["pw_in"]["bias"],
                cm["dw_conv"]["kernel"], cm["dw_conv"]["bias"],
                cm["act"]["alpha"],
                cm["pw_out"]["kernel"], cm["pw_out"]["bias"],
                kernel_size=kernel_size, tile=tile, chunks=chunks,
                interpret=interpret,
            ).astype(compute_dtype)
        x = h + res

    # final LayerNorm (f32) + zero-init output projection
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
    xn = xn * p["norm"]["scale"] + p["norm"]["bias"]
    out = xn.astype(compute_dtype) @ p["output_projection"]["kernel"].astype(
        compute_dtype
    ) + p["output_projection"]["bias"].astype(compute_dtype)
    return out.reshape(B, T, F, M).transpose(0, 2, 1, 3)
