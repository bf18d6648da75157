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

    def test_monotonic_within_non_noise_degradation_families(self):
        """Severity monotonicity beyond additive noise: lowpass filtering and
        waveform clipping (vocoder-artifact-like degradations) must also
        rank correctly."""
        from scipy.signal import butter, lfilter

        from xiaoicesing_io_tpu.eval.metrics import pesq_approx

        wav = self._singing()
        # lowpass: narrower cutoff = worse
        lp_scores = []
        for cutoff in (7000, 3000, 1200):
            b, a = butter(4, cutoff / (44100 / 2))
            lp_scores.append(pesq_approx(wav, lfilter(b, a, wav), 44100))
        assert lp_scores[0] > lp_scores[1] > lp_scores[2], lp_scores

        # hard clipping: lower threshold = worse
        peak = np.abs(wav).max()
        cl_scores = []
        for frac in (0.8, 0.4, 0.15):
            cl_scores.append(
                pesq_approx(wav, np.clip(wav, -frac * peak, frac * peak), 44100)
            )
        assert cl_scores[0] > cl_scores[1] > cl_scores[2], cl_scores

    def test_rank_consistent_with_mcd_within_families(self):
        """Cross-metric anchor: within each degradation family (noise,
        lowpass, clipping at increasing severity), PESQ must fall while
        waveform MCD rises — the two independent quality rulers must order
        severities consistently.  (Across heterogeneous families the two
        legitimately disagree: MCD's log-domain upper bands explode under
        lowpass while the perceptual model weights the voiced low bands, so
        cross-family rank correlation is NOT asserted.)"""
        from scipy.signal import butter, lfilter

        from xiaoicesing_io_tpu.eval.metrics import mcd, pesq_approx
        from xiaoicesing_io_tpu.ops.mel import MelConfig

        wav = self._singing()
        rng = np.random.default_rng(2)
        noise = rng.standard_normal(len(wav))
        noise /= np.sqrt(np.mean(noise ** 2))
        rms = np.sqrt(np.mean(wav ** 2))
        peak = np.abs(wav).max()

        families = {
            "noise": [wav + rms * 10 ** (-snr / 20) * noise
                      for snr in (35, 20, 8)],
            "lowpass": [lfilter(*butter(4, c / (44100 / 2)), wav)
                        for c in (8000, 4000, 1500)],
            "clip": [np.clip(wav, -f * peak, f * peak)
                     for f in (0.6, 0.3, 0.12)],
        }
        cfg = MelConfig()
        for name, degs in families.items():
            pesqs = [pesq_approx(wav, d, 44100) for d in degs]
            mcds = [mcd(wav.astype(np.float32), np.asarray(d, np.float32),
                        is_mel=False, mel_cfg=cfg) for d in degs]
            assert pesqs[0] > pesqs[1] > pesqs[2], (name, pesqs)
            assert mcds[0] < mcds[1] < mcds[2], (name, mcds)

    def test_stable_across_sample_rates(self):
        """The metric resamples internally to 16 kHz: the same content
        presented at 44.1k and at 16k must score nearly the same."""
        from scipy.signal import resample_poly

        from xiaoicesing_io_tpu.eval.metrics import pesq_approx

        wav = self._singing()
        rng = np.random.default_rng(3)
        noise = rng.standard_normal(len(wav))
        noise /= np.sqrt(np.mean(noise ** 2))
        rms = np.sqrt(np.mean(wav ** 2))
        deg = wav + rms * 10 ** (-20 / 20) * noise

        s44 = pesq_approx(wav, deg, 44100)
        wav16 = resample_poly(wav, 160, 441)
        deg16 = resample_poly(deg, 160, 441)
        s16 = pesq_approx(wav16, deg16, 16000)
        assert abs(s44 - s16) < 0.25, (s44, s16)


def test_griffin_lim_inversion_orders_quality():
    """Griffin-Lim inversion (the waveform-eval fallback when no trained
    vocoder exists) must reconstruct a harmonic signal well enough that
    PESQ-approx orders a clean mel above a corrupted one."""
    from xiaoicesing_io_tpu.eval.metrics import (
        griffin_lim_from_logmel,
        pesq_approx,
    )
    from xiaoicesing_io_tpu.ops.mel import MelConfig, MelSpectrogram

    sr = 44100
    t = np.arange(sr * 2) / sr
    y = (0.4 * np.sin(2 * np.pi * 220 * t)
         + 0.2 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    ext = MelSpectrogram(MelConfig())
    lm = ext.numpy(y)
    w = griffin_lim_from_logmel(lm)
    assert abs(len(w) - len(lm) * 512) < 2048  # ~frames*hop samples
    w_bad = griffin_lim_from_logmel(
        lm + np.random.default_rng(0).normal(0, 0.5, lm.shape))
    m = min(len(w), len(y))
    good = pesq_approx(y[:m], w[:m], sr)
    bad = pesq_approx(y[:m], w_bad[:m], sr)
    assert good > bad + 0.2, (good, bad)
