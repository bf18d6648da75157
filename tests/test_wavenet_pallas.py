"""Fused WaveNet block kernel + full pallas-apply vs the flax module
(interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from xiaoicesing_io_tpu.models.backbones import build_backbone
from xiaoicesing_io_tpu.models.backbones.wavenet_pallas import wavenet_denoiser_apply
from xiaoicesing_io_tpu.ops.pallas.wavenet_block import wavenet_block


def test_wavenet_block_kernel_matches_xla(rng):
    """The fused block vs a direct XLA computation of the same math, at every
    dilation in the default cycle (halo/padding handling)."""
    B, T, C = 2, 100, 128
    y = rng.standard_normal((B, T, C)).astype(np.float32) * 0.3
    condp = rng.standard_normal((B, T, 2 * C)).astype(np.float32) * 0.3
    ck = rng.standard_normal((3, C, 2 * C)).astype(np.float32) * 0.05
    cb = rng.standard_normal((2 * C,)).astype(np.float32) * 0.05
    ok = rng.standard_normal((C, 2 * C)).astype(np.float32) * 0.05
    ob = rng.standard_normal((2 * C,)).astype(np.float32) * 0.05

    for d in (1, 2, 4, 8):
        # XLA oracle
        yp = jnp.pad(jnp.asarray(y), ((0, 0), (d, d), (0, 0)))
        z = (
            yp[:, 0:T] @ ck[0] + yp[:, d : d + T] @ ck[1]
            + yp[:, 2 * d : 2 * d + T] @ ck[2] + cb + condp
        )
        g = jax.nn.sigmoid(z[..., :C]) * jnp.tanh(z[..., C:])
        o = g @ ok + ob
        want_r, want_s = np.asarray(o[..., :C]), np.asarray(o[..., C:])

        got_r, got_s = wavenet_block(
            jnp.asarray(y), jnp.asarray(condp), jnp.asarray(ck),
            jnp.asarray(cb), jnp.asarray(ok), jnp.asarray(ob),
            dilation=d, tile=128, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got_r), want_r, atol=0.02, rtol=0.02)
        np.testing.assert_allclose(np.asarray(got_s), want_s, atol=0.02, rtol=0.02)


def test_wavenet_pallas_apply_matches_flax(rng):
    B, T, M, H = 2, 160, 16, 64
    args = {"num_layers": 5, "num_channels": 128, "dilation_cycle_length": 4}
    bb = build_backbone(M, 1, "wavenet", args, cond_dims=H)
    spec = jnp.asarray(rng.standard_normal((B, 1, T, M)).astype(np.float32))
    step = jnp.asarray(np.array([3.0, 700.0], np.float32))
    cond = jnp.asarray(rng.standard_normal((B, T, H)).astype(np.float32))
    params = bb.init(jax.random.PRNGKey(0), spec, step, cond)
    # zero-init output projection makes outputs 0 at init; perturb instead
    params["params"]["output_projection"]["kernel"] = 0.02 * jax.random.normal(
        jax.random.PRNGKey(1), params["params"]["output_projection"]["kernel"].shape
    )
    ref = np.asarray(bb.apply(params, spec, step, cond))

    out = np.asarray(wavenet_denoiser_apply(
        params, spec, step, cond,
        num_layers=5, dilation_cycle_length=4, tile=128, interpret=True,
    ))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=0.02, rtol=0.02)
    corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert corr > 0.999


def test_wavenet_block_chunked_matches(rng):
    """chunk>1 (overlap structure) == chunk=1."""
    from xiaoicesing_io_tpu.ops.pallas.wavenet_block import wavenet_block

    B, T, C = 2, 300, 64
    y = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((B, T, 2 * C)).astype(np.float32))
    ck = jnp.asarray(0.1 * rng.standard_normal((3, C, 2 * C)).astype(np.float32))
    cb = jnp.asarray(0.1 * rng.standard_normal(2 * C).astype(np.float32))
    ok = jnp.asarray(0.1 * rng.standard_normal((C, 2 * C)).astype(np.float32))
    ob = jnp.asarray(0.1 * rng.standard_normal(2 * C).astype(np.float32))
    r1, s1 = wavenet_block(y, cond, ck, cb, ok, ob, dilation=2, tile=64,
                           interpret=True)
    r2, s2 = wavenet_block(y, cond, ck, cb, ok, ob, dilation=2, tile=64,
                           chunk=4, interpret=True)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r1), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s1), atol=1e-6)
