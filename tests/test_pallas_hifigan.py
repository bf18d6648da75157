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
