"""Pallas LYNX conv-module kernel vs the flax reference implementation
(interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xiaoicesing_io_tpu.models.backbones.lynxnet import LYNXConvModule
from xiaoicesing_io_tpu.ops.pallas.lynx_conv import lynx_conv_module


@pytest.mark.parametrize("B,T,dim,inner_x,k", [
    (1, 300, 128, 2, 31),
    (2, 257, 128, 2, 31),
    (1, 64, 128, 2, 7),
])
def test_lynx_conv_kernel_matches_flax(rng, B, T, dim, inner_x, k):
    module = LYNXConvModule(dim=dim, expansion_factor=inner_x, kernel_size=k)
    x = jnp.asarray(rng.standard_normal((B, T, dim)).astype(np.float32))
    params = module.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(module.apply(params, x))

    p = params["params"]
    out = lynx_conv_module(
        x,
        p["norm"]["scale"], p["norm"]["bias"],
        p["pw_in"]["kernel"], p["pw_in"]["bias"],
        p["dw_conv"]["kernel"], p["dw_conv"]["bias"],
        p["act"]["alpha"],
        p["pw_out"]["kernel"], p["pw_out"]["bias"],
        kernel_size=k, tile=128, interpret=True,
    )
    out = np.asarray(out)
    assert out.shape == ref.shape
    # bf16 matmuls inside the kernel vs f32 flax reference
    np.testing.assert_allclose(out, ref, atol=0.15, rtol=0.05)
    corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert corr > 0.999


@pytest.mark.parametrize("chunks", [2, 4])
def test_lynx_conv_kernel_chunked_matches_unchunked(rng, chunks):
    module = LYNXConvModule(dim=128, expansion_factor=2, kernel_size=31)
    x = jnp.asarray(rng.standard_normal((2, 257, 128)).astype(np.float32))
    params = module.init(jax.random.PRNGKey(0), x)
    p = params["params"]
    args = (
        x,
        p["norm"]["scale"], p["norm"]["bias"],
        p["pw_in"]["kernel"], p["pw_in"]["bias"],
        p["dw_conv"]["kernel"], p["dw_conv"]["bias"],
        p["act"]["alpha"],
        p["pw_out"]["kernel"], p["pw_out"]["bias"],
    )
    base = np.asarray(lynx_conv_module(*args, kernel_size=31, tile=128, interpret=True))
    out = np.asarray(lynx_conv_module(*args, kernel_size=31, tile=128,
                                      chunks=chunks, interpret=True))
    # identical math, different issue order -> bitwise equal up to reassoc-free ops
    np.testing.assert_allclose(out, base, atol=1e-6)


@pytest.mark.parametrize("dw_impl", ["slice", "roll"])
@pytest.mark.parametrize("B,T,dim,k,tile", [
    (2, 257, 128, 31, 128),
    (1, 300, 128, 7, 128),
])
def test_lynx_layer_fused_matches_composed(rng, dw_impl, B, T, dim, k, tile):
    """v2 whole-layer kernel == (x+cond) + ConvModule(x+cond+step)."""
    from xiaoicesing_io_tpu.ops.pallas.lynx_conv2 import lynx_layer_fused

    module = LYNXConvModule(dim=dim, expansion_factor=2, kernel_size=k)
    x = jnp.asarray(rng.standard_normal((B, T, dim)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((B, T, dim)).astype(np.float32))
    step = jnp.asarray(rng.standard_normal((B, dim)).astype(np.float32))
    res = x + cond
    h = res + step[:, None, :]
    params = module.init(jax.random.PRNGKey(0), h)
    ref = np.asarray(module.apply(params, h) + res)

    p = params["params"]
    out = np.asarray(lynx_layer_fused(
        x, cond, step,
        p["norm"]["scale"], p["norm"]["bias"],
        p["pw_in"]["kernel"], p["pw_in"]["bias"],
        p["dw_conv"]["kernel"], p["dw_conv"]["bias"],
        p["act"]["alpha"],
        p["pw_out"]["kernel"], p["pw_out"]["bias"],
        kernel_size=k, tile=tile, dw_impl=dw_impl, interpret=True,
    ))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=0.2, rtol=0.05)
    corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert corr > 0.999


@pytest.mark.parametrize("B,T,dim,k,tile", [
    (2, 257, 128, 31, 128),   # partial final tile
    (1, 512, 128, 31, 128),   # exact tiling, deeper pipeline
])
def test_lynx_layer_v3_matches_v2(rng, B, T, dim, k, tile):
    """software-pipelined v3 == v2 (same math, staged across grid steps)."""
    from xiaoicesing_io_tpu.ops.pallas.lynx_conv2 import lynx_layer_fused
    from xiaoicesing_io_tpu.ops.pallas.lynx_conv3 import lynx_layer_fused_v3

    module = LYNXConvModule(dim=dim, expansion_factor=2, kernel_size=k)
    x = jnp.asarray(rng.standard_normal((B, T, dim)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((B, T, dim)).astype(np.float32))
    step = jnp.asarray(rng.standard_normal((B, dim)).astype(np.float32))
    params = module.init(jax.random.PRNGKey(0), x + cond)
    p = params["params"]
    args = (
        x, cond, step,
        p["norm"]["scale"], p["norm"]["bias"],
        p["pw_in"]["kernel"], p["pw_in"]["bias"],
        p["dw_conv"]["kernel"], p["dw_conv"]["bias"],
        p["act"]["alpha"],
        p["pw_out"]["kernel"], p["pw_out"]["bias"],
    )
    ref = np.asarray(lynx_layer_fused(*args, kernel_size=k, tile=tile,
                                      interpret=True))
    out = np.asarray(lynx_layer_fused_v3(*args, kernel_size=k, tile=tile,
                                         interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("chunk", [2, 4])
def test_lynx_layer_fused_chunked_matches(rng, chunk):
    """multi-sub-tile programs (MXU/VPU overlap structure) == chunk=1."""
    from xiaoicesing_io_tpu.ops.pallas.lynx_conv2 import lynx_layer_fused

    B, T, dim, k, tile = 2, 300, 128, 31, 64
    module = LYNXConvModule(dim=dim, expansion_factor=2, kernel_size=k)
    x = jnp.asarray(rng.standard_normal((B, T, dim)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((B, T, dim)).astype(np.float32))
    step = jnp.asarray(rng.standard_normal((B, dim)).astype(np.float32))
    params = module.init(jax.random.PRNGKey(0), x + cond)
    p = params["params"]
    args = (
        x, cond, step,
        p["norm"]["scale"], p["norm"]["bias"],
        p["pw_in"]["kernel"], p["pw_in"]["bias"],
        p["dw_conv"]["kernel"], p["dw_conv"]["bias"],
        p["act"]["alpha"],
        p["pw_out"]["kernel"], p["pw_out"]["bias"],
    )
    ref = np.asarray(lynx_layer_fused(*args, kernel_size=k, tile=tile,
                                      interpret=True))
    out = np.asarray(lynx_layer_fused(*args, kernel_size=k, tile=tile,
                                      chunk=chunk, interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-6)
