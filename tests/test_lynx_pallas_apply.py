"""Full LYNXNet pallas-apply vs the flax module (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from xiaoicesing_io_tpu.models.backbones import build_backbone
from xiaoicesing_io_tpu.models.backbones.lynx_pallas import lynx_denoiser_apply


def test_lynx_pallas_apply_matches_flax(rng):
    B, T, M, H = 2, 160, 16, 64
    args = {"num_layers": 2, "num_channels": 128, "kernel_size": 31,
            "strong_cond": True}
    bb = build_backbone(M, 1, "lynxnet", args, cond_dims=H)
    spec = jnp.asarray(rng.standard_normal((B, 1, T, M)).astype(np.float32))
    step = jnp.asarray(np.array([3.0, 700.0], np.float32))
    cond = jnp.asarray(rng.standard_normal((B, T, H)).astype(np.float32))
    params = bb.init(jax.random.PRNGKey(0), spec, step, cond)
    ref = np.asarray(bb.apply(params, spec, step, cond))

    out = np.asarray(lynx_denoiser_apply(
        params, spec, step, cond,
        num_layers=2, strong_cond=True, kernel_size=31, tile=128,
        interpret=True, compute_dtype=jnp.float32,
    ))
    assert out.shape == ref.shape
    # zero-init output projection makes outputs 0 at init; perturb instead
    p = jax.tree.map(lambda x: x, params)
    key = jax.random.PRNGKey(1)
    p["params"]["output_projection"]["kernel"] = 0.02 * jax.random.normal(
        key, p["params"]["output_projection"]["kernel"].shape
    )
    ref = np.asarray(bb.apply(p, spec, step, cond))
    out = np.asarray(lynx_denoiser_apply(
        p, spec, step, cond, num_layers=2, strong_cond=True,
        kernel_size=31, tile=128, interpret=True, compute_dtype=jnp.float32,
    ))
    np.testing.assert_allclose(out, ref, atol=0.02, rtol=0.02)
    corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert corr > 0.999

    # hoisted conditioner projections (the sampler-loop-invariant path) must
    # be bit-identical to computing them inside the apply
    from xiaoicesing_io_tpu.models.backbones.lynx_pallas import lynx_cond_projections

    projs = lynx_cond_projections(p, cond, num_layers=2, compute_dtype=jnp.float32)
    out_hoisted = np.asarray(lynx_denoiser_apply(
        p, spec, step, num_layers=2, strong_cond=True,
        kernel_size=31, tile=128, interpret=True, compute_dtype=jnp.float32,
        cond_projs=projs,
    ))
    np.testing.assert_array_equal(out_hoisted, out)


def test_lynx_pallas_apply_fused_layer_matches(rng):
    """fused_layer=True (v2 whole-layer kernel) == v1 module-kernel path."""
    B, T, M, H = 2, 160, 16, 64
    args = {"num_layers": 2, "num_channels": 128, "kernel_size": 31,
            "strong_cond": True}
    bb = build_backbone(M, 1, "lynxnet", args, cond_dims=H)
    spec = jnp.asarray(rng.standard_normal((B, 1, T, M)).astype(np.float32))
    step = jnp.asarray(np.array([3.0, 700.0], np.float32))
    cond = jnp.asarray(rng.standard_normal((B, T, H)).astype(np.float32))
    params = bb.init(jax.random.PRNGKey(0), spec, step, cond)
    p = jax.tree.map(lambda x: x, params)
    p["params"]["output_projection"]["kernel"] = 0.02 * jax.random.normal(
        jax.random.PRNGKey(1), p["params"]["output_projection"]["kernel"].shape
    )
    ref = np.asarray(bb.apply(p, spec, step, cond))
    for dw_impl in ("slice", "roll"):
        out = np.asarray(lynx_denoiser_apply(
            p, spec, step, cond, num_layers=2, strong_cond=True,
            kernel_size=31, tile=128, interpret=True,
            compute_dtype=jnp.float32, fused_layer=True, dw_impl=dw_impl,
        ))
        np.testing.assert_allclose(out, ref, atol=0.02, rtol=0.02)
        assert np.corrcoef(out.ravel(), ref.ravel())[0, 1] > 0.999


def test_hybrid_module_matches_v1(rng):
    """lynx_conv_module_hybrid (XLA head + Pallas tail) == the v1 fused
    kernel's module numerics (bf16-storage tolerance on `inner`)."""
    import jax
    import jax.numpy as jnp

    from xiaoicesing_io_tpu.ops.pallas.lynx_conv import lynx_conv_module
    from xiaoicesing_io_tpu.ops.pallas.lynx_hybrid import lynx_conv_module_hybrid

    B, T, dim, inner, k = 2, 300, 128, 256, 31
    x = jnp.asarray(rng.standard_normal((B, T, dim)).astype(np.float32))
    args = (
        jnp.asarray(rng.standard_normal(dim).astype(np.float32)) * 0.1 + 1.0,
        jnp.asarray(rng.standard_normal(dim).astype(np.float32)) * 0.1,
        jnp.asarray(rng.standard_normal((dim, 2 * inner)).astype(np.float32)) * 0.05,
        jnp.asarray(rng.standard_normal(2 * inner).astype(np.float32)) * 0.05,
        jnp.asarray(rng.standard_normal((k, 1, inner)).astype(np.float32)) * 0.2,
        jnp.asarray(rng.standard_normal(inner).astype(np.float32)) * 0.05,
        jnp.asarray(np.full(inner, 0.25, np.float32)),
        jnp.asarray(rng.standard_normal((inner, dim)).astype(np.float32)) * 0.05,
        jnp.asarray(rng.standard_normal(dim).astype(np.float32)) * 0.05,
    )
    ref = lynx_conv_module(x, *args, kernel_size=k, tile=128, interpret=True)
    got = lynx_conv_module_hybrid(x, *args, kernel_size=k, tile=128,
                                  interpret=True)
    assert got.shape == ref.shape == (B, T, dim)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=5e-2, rtol=5e-2,
    )
