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


class TestPesqApprox:
    @staticmethod
    def _singing(sr=44100, secs=2.0, seed=0):
        rng = np.random.default_rng(seed)
        t = np.arange(int(sr * secs)) / sr
        f0 = 220 * (1 + 0.01 * np.sin(2 * np.pi * 5 * t))
        ph = 2 * np.pi * np.cumsum(f0) / sr
        wav = sum(np.sin(k * ph) / k for k in range(1, 9)) * 0.2
        return wav + 0.002 * rng.standard_normal(len(wav))

    def test_identity_scores_high(self):
        from xiaoicesing_io_tpu.eval.metrics import pesq_approx

        wav = self._singing()
        assert pesq_approx(wav, wav, 44100) > 4.3

    def test_monotonic_in_noise(self):
        from xiaoicesing_io_tpu.eval.metrics import pesq_approx

        wav = self._singing()
        rng = np.random.default_rng(1)
        noise = rng.standard_normal(len(wav))
        noise /= np.sqrt(np.mean(noise ** 2))
        rms = np.sqrt(np.mean(wav ** 2))
        scores = [
            pesq_approx(wav, wav + rms * 10 ** (-snr / 20) * noise, 44100)
            for snr in (40, 25, 10)
        ]
        assert scores[0] > scores[1] > scores[2]
        assert scores[0] > 3.8 and scores[2] < 2.5

    def test_small_delay_tolerated(self):
        from xiaoicesing_io_tpu.eval.metrics import pesq_approx

        wav = self._singing()
        assert pesq_approx(wav, np.roll(wav, -100), 44100) > 4.0
