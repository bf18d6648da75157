"""Fused HiFiGAN resblock-unit kernel vs XLA reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xiaoicesing_io_tpu.ops.pallas.hifigan_resblock import resblock_unit


def _ref_unit(x, w1, b1, w2, b2, d1, d2=1):
    """x + conv2(lrelu(conv1(lrelu(x)))) with torch SAME zero padding."""
    def lrelu(v):
        return jnp.where(v >= 0, v, 0.1 * v)

    def conv(v, W, b, d):
        y = jax.lax.conv_general_dilated(
            v, W, window_strides=(1,),
            padding=[((W.shape[0] - 1) * d // 2,
                      (W.shape[0] - 1) * d - (W.shape[0] - 1) * d // 2)],
            rhs_dilation=(d,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y + b

    t = lrelu(x)
    t = conv(t, w1, b1, d1)
    t = lrelu(t)
    t = conv(t, w2, b2, d2)
    return x + t


@pytest.mark.parametrize("k,d,C,T,tile", [
    (3, 1, 128, 300, 128),
    (3, 5, 128, 300, 128),
    (11, 5, 128, 257, 128),   # largest halo of the HiFiGAN config
    (7, 3, 256, 200, 256),    # stage-1 channel width
])
def test_resblock_unit_matches_xla(rng, k, d, C, T, tile):
    B = 2
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    w1 = jnp.asarray(0.1 * rng.standard_normal((k, C, C)).astype(np.float32))
    b1 = jnp.asarray(0.1 * rng.standard_normal(C).astype(np.float32))
    w2 = jnp.asarray(0.1 * rng.standard_normal((k, C, C)).astype(np.float32))
    b2 = jnp.asarray(0.1 * rng.standard_normal(C).astype(np.float32))

    ref = np.asarray(_ref_unit(x, w1, b1, w2, b2, d))
    out = np.asarray(resblock_unit(x, w1, b1, w2, b2, d1=d, tile=tile,
                                   interpret=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_resblock_unit_folded_taps(rng):
    """Kernel consumes time-folded weights (taps dilation 1, asymmetric pad)."""
    from xiaoicesing_io_tpu.models.vocoders.nsf_fast import fold_conv

    B, T, C, F, k, d = 2, 320, 64, 2, 3, 5
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    W1 = 0.1 * rng.standard_normal((k, C, C)).astype(np.float32)
    b1 = 0.1 * rng.standard_normal(C).astype(np.float32)
    W2 = 0.1 * rng.standard_normal((k, C, C)).astype(np.float32)
    b2 = 0.1 * rng.standard_normal(C).astype(np.float32)

    ref = np.asarray(_ref_unit(x, jnp.asarray(W1), jnp.asarray(b1),
                               jnp.asarray(W2), jnp.asarray(b2), d))

    w1f, b1f, p1, rd1 = fold_conv(W1, b1, F, dilation=d)
    w2f, b2f, p2, rd2 = fold_conv(W2, b2, F)
    assert rd1 == 1 and rd2 == 1
    xf = x.reshape(B, T // F, F * C)
    out = resblock_unit(
        jnp.asarray(xf), jnp.asarray(w1f), jnp.asarray(b1f),
        jnp.asarray(w2f), jnp.asarray(b2f),
        d1=1, pad1_l=p1, d2=1, pad2_l=p2, tile=64, interpret=True,
    )
    out = np.asarray(out).reshape(B, T, C)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def _ref_conv(v, W, b, d, pad_l):
    # bf16 conv with f32 accumulation — the production vocoder's precision
    # (nsf_fast._conv_folded); the kernel computes the same way
    y = jax.lax.conv_general_dilated(
        v.astype(jnp.bfloat16), W.astype(jnp.bfloat16), window_strides=(1,),
        padding=[(pad_l, (W.shape[0] - 1) * d - pad_l)],
        rhs_dilation=(d,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    )
    return y + b


@pytest.mark.parametrize("L,T,tile,kernels,dils", [
    (128, 300, 128, (3, 7, 11), ((1, 3, 5),) * 3),   # default HiFiGAN stage
    (128, 257, 256, (3, 5), ((1, 2), (2, 6))),       # asymmetric-ish shapes
    (256, 200, 128, (3, 7, 11), ((1, 3, 5),) * 3),   # stage-1 width
])
def test_fused_stage_matches_xla(rng, L, T, tile, kernels, dils):
    from xiaoicesing_io_tpu.ops.pallas.hifigan_stage import (
        ConvSpec, fused_resblock_stage, stack_taps,
    )

    B = 2
    x = jnp.asarray(rng.standard_normal((B, T, L)).astype(np.float32))

    specs, weights, biases, ref_params = [], [], [], []
    for k, ds in zip(kernels, dils):
        branch = []
        for d in ds:
            ws = []
            for dd in (d, 1):
                W = jnp.asarray(0.1 * rng.standard_normal((k, L, L)).astype(np.float32))
                b = jnp.asarray(0.1 * rng.standard_normal(L).astype(np.float32))
                pad_l = (k - 1) * dd // 2
                branch_spec = ConvSpec(k=k, d=dd, pad_l=pad_l)
                ws.append((W, b, dd, pad_l, branch_spec))
            branch.append((ws[0][4], ws[1][4]))
            for W, b, dd, pad_l, _ in ws:
                weights.append(jnp.asarray(stack_taps(np.asarray(W))))
                biases.append(b)
                ref_params.append((W, b, dd, pad_l))
        specs.append(tuple(branch))

    def lrelu(v):
        return jnp.where(v >= 0, v, 0.1 * v)

    # XLA reference: mean over branches of chained units
    ci = 0
    acc = None
    for bi, (k, ds) in enumerate(zip(kernels, dils)):
        h = x
        for d in ds:
            W1, b1, d1, p1 = ref_params[ci]; ci += 1
            W2, b2, d2, p2 = ref_params[ci]; ci += 1
            t = _ref_conv(lrelu(h), W1, b1, d1, p1)
            t = _ref_conv(lrelu(t), W2, b2, d2, p2)
            h = h + t
        acc = h if acc is None else acc + h
    ref = np.asarray(acc / len(kernels))

    out = np.asarray(fused_resblock_stage(
        x, tuple(weights), tuple(biases), tuple(specs), tile=tile,
        interpret=True,
    ))
    assert out.shape == ref.shape
    # random weights amplify values ~O(100) through the residual chain; both
    # paths are bf16 with different summation orders, so tolerance is relative
    scale = np.abs(ref).max()
    np.testing.assert_allclose(out / scale, ref / scale, atol=6e-3)
    corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert corr > 0.9999
