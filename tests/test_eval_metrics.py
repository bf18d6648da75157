"""Eval metric sanity tests."""

import numpy as np

from xiaoicesing_io_tpu.eval.metrics import f0_rmse_cents, mcd, mel_mae


def test_mel_mae_zero_on_identical(rng):
    mel = rng.standard_normal((50, 128)).astype(np.float32)
    assert mel_mae(mel, mel) == 0.0
    assert mel_mae(mel, mel + 0.1) > 0.09


def test_mcd_zero_on_identical(rng):
    mel = rng.standard_normal((50, 128)).astype(np.float32)
    assert mcd(mel, mel) < 1e-9
    noisy = mel + 0.05 * rng.standard_normal(mel.shape).astype(np.float32)
    v = mcd(mel, noisy)
    assert 0 < v < 10  # small perturbation -> small dB distortion
    # monotonic in perturbation size
    noisier = mel + 0.5 * rng.standard_normal(mel.shape).astype(np.float32)
    assert mcd(mel, noisier) > v


def test_f0_rmse_cents():
    f0 = np.full(100, 220.0)
    rmse, agr = f0_rmse_cents(f0, f0 * 2 ** (1 / 12))  # one semitone off
    np.testing.assert_allclose(rmse, 100.0, rtol=1e-6)
    assert agr == 1.0
    f0b = f0.copy()
    f0b[:50] = 0  # half unvoiced
    rmse, agr = f0_rmse_cents(f0, f0b)
    assert agr == 0.5
