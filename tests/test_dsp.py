"""DSP tests: pitch tracking on synthetic signals, harmonic separation,
variance curve definitions."""

import numpy as np
import pytest

from xiaoicesing_io_tpu.dsp.features import (
    amplitude_to_db,
    get_breathiness,
    get_energy,
    get_tension,
    get_voicing,
    rms_frames,
)
from xiaoicesing_io_tpu.dsp.hnsep import DecomposedWaveform
from xiaoicesing_io_tpu.dsp.pitch import get_pitch

SR = 44100
HOP = 512


def _sine_sweep(f0_start, f0_end, dur, sr=SR, amp=0.3):
    t = np.arange(int(dur * sr)) / sr
    f = np.linspace(f0_start, f0_end, len(t))
    phase = 2 * np.pi * np.cumsum(f) / sr
    return (amp * np.sin(phase)).astype(np.float32), f


def test_pitch_constant_tone():
    y = 0.4 * np.sin(2 * np.pi * 220.0 * np.arange(SR) / SR).astype(np.float32)
    length = len(y) // HOP + 1
    f0, uv = get_pitch(y, SR, length, hop_size=HOP)
    voiced = ~uv
    assert voiced.mean() > 0.9
    np.testing.assert_allclose(np.median(f0[voiced]), 220.0, rtol=0.02)


def test_pitch_sweep_tracks():
    y, f_true = _sine_sweep(150, 400, 2.0)
    length = len(y) // HOP + 1
    f0, uv = get_pitch(y, SR, length, hop_size=HOP)
    centers = np.minimum(np.arange(length) * HOP, len(y) - 1)
    ft = f_true[centers]
    voiced = ~uv
    assert voiced.mean() > 0.85
    err = np.abs(f0[voiced] - ft[voiced]) / ft[voiced]
    assert np.median(err) < 0.03


def test_pitch_silence_is_unvoiced():
    y = (0.001 * np.random.default_rng(0).standard_normal(SR)).astype(np.float32)
    length = len(y) // HOP + 1
    f0, uv = get_pitch(y, SR, length, hop_size=HOP)
    assert uv.mean() > 0.9


def test_pitch_voiced_unvoiced_segmentation():
    rng = np.random.default_rng(0)
    tone = 0.4 * np.sin(2 * np.pi * 330 * np.arange(SR) / SR)
    noise = 0.005 * rng.standard_normal(SR)
    y = np.concatenate([tone, noise, tone]).astype(np.float32)
    length = len(y) // HOP + 1
    f0, uv = get_pitch(y, SR, length, hop_size=HOP)
    third = length // 3
    assert (~uv[: third - 4]).mean() > 0.8
    assert uv[third + 4 : 2 * third - 4].mean() > 0.8


def test_rms_matches_definition():
    rng = np.random.default_rng(1)
    y = rng.standard_normal(HOP * 20).astype(np.float32)
    r = rms_frames(y, 2048, HOP)
    # frame 4 covers samples [4*HOP-1024, 4*HOP+1024)
    start = 4 * HOP - 1024
    seg = y[start : start + 2048]
    np.testing.assert_allclose(r[4], np.sqrt(np.mean(seg**2)), rtol=1e-6)


def test_amplitude_to_db_top_db():
    a = np.array([1.0, 1e-3, 1e-7])
    db = amplitude_to_db(a)
    assert db[0] == 0.0
    assert db[1] == -60.0
    assert db[2] == -80.0  # clipped by top_db=80 relative to max


def test_harmonic_separation_pure_tone_plus_noise():
    rng = np.random.default_rng(2)
    n = SR  # 1 s
    f0_hz = 220.0
    tone = 0.3 * np.sin(2 * np.pi * f0_hz * np.arange(n) / SR)
    noise = 0.03 * rng.standard_normal(n)
    y = (tone + noise).astype(np.float32)
    length = n // HOP + 1
    f0 = np.full(length, f0_hz, np.float32)
    dw = DecomposedWaveform(y, SR, f0, hop_size=HOP, fft_size=2048, win_size=2048)
    harm = dw.harmonic()
    ap = dw.aperiodic()
    # energies: harmonic close to tone, aperiodic close to noise (mid region)
    sl = slice(4096, n - 4096)
    tone_e = np.sqrt(np.mean(tone[sl] ** 2))
    harm_e = np.sqrt(np.mean(harm[sl] ** 2))
    ap_e = np.sqrt(np.mean(ap[sl] ** 2))
    assert abs(harm_e - tone_e) / tone_e < 0.15
    assert ap_e < 2.5 * np.sqrt(np.mean(noise[sl] ** 2))
    # reconstruction identity
    np.testing.assert_allclose(harm + ap, y, atol=1e-4)


def test_variance_curves_sane():
    rng = np.random.default_rng(3)
    n = SR
    f0_hz = 220.0
    t = np.arange(n) / SR
    # tone with 3 harmonics + noise
    y = (
        0.3 * np.sin(2 * np.pi * f0_hz * t)
        + 0.1 * np.sin(2 * np.pi * 2 * f0_hz * t)
        + 0.05 * np.sin(2 * np.pi * 3 * f0_hz * t)
        + 0.01 * rng.standard_normal(n)
    ).astype(np.float32)
    length = n // HOP + 1
    f0 = np.full(length, f0_hz, np.float32)
    dw = DecomposedWaveform(y, SR, f0, hop_size=HOP, fft_size=2048, win_size=2048)
    energy = get_energy(y, length, hop_size=HOP, win_size=2048)
    breath = get_breathiness(dw, length=length)
    voic = get_voicing(dw, length=length)
    tens = get_tension(dw, length=length)
    assert energy.shape == breath.shape == voic.shape == tens.shape == (length,)
    mid = slice(8, length - 8)
    # voicing dominates breathiness for a harmonic-rich signal
    assert (voic[mid] > breath[mid]).all()
    # tension is a logit of the non-base harmonic ratio: finite, mostly < 0
    assert np.isfinite(tens[mid]).all()
    assert np.median(tens[mid]) < 0


def test_comb_mask_candidate_offsets_match_bruteforce():
    """The vectorized nearest-harmonic candidate mask in _comb_mask_filter
    must keep exactly the bins the per-harmonic brute-force loop keeps
    (the reference semantics: OR over k of bins within half_width of
    k*f0*n_fft/sr with center >= 1)."""
    rng = np.random.default_rng(3)
    sr, n_fft = SR, 2048
    n_bins = n_fft // 2 + 1
    n_frames = 40
    half_width = 3.5
    # include low f0 (dense harmonics -> candidate overlap regime)
    f0 = rng.uniform(65.0, 880.0, size=n_frames)
    lo_k, hi_k = 1, int(np.floor((sr / 2) / f0.min())) + 1

    bins = np.arange(n_bins, dtype=np.float64)[None, :]
    # brute force over all harmonics
    brute = np.zeros((n_frames, n_bins), bool)
    for k in range(lo_k, hi_k + 1):
        center = f0 * k * n_fft / sr
        lo = np.clip(center - half_width, 0, None)
        hi = np.clip(center + half_width, None, n_bins)
        brute |= (center[:, None] >= 1) & (bins >= lo[:, None]) & (bins < hi[:, None])

    # vectorized candidate-offset form (mirrors dsp/hnsep.py:_comb_mask_filter)
    spacing = (f0 * n_fft / sr)[:, None]
    nearest = np.round(bins / spacing)
    n_cand = int(np.ceil(half_width / max(spacing.min(), 1e-6))) + 1
    fast = np.zeros((n_frames, n_bins), bool)
    for d in range(-n_cand, n_cand + 1):
        k = nearest + d
        center = k * spacing
        fast |= (
            (k >= lo_k) & (k <= hi_k)
            & (center >= 1)
            & (bins >= np.clip(center - half_width, 0, None))
            & (bins < np.clip(center + half_width, None, n_bins))
        )

    np.testing.assert_array_equal(fast, brute)


def test_world_replacement_curves_vs_ground_truth():
    """Quantitative validation of the comb-STFT WORLD replacement.

    The reference derives breathiness/voicing from pyworld CheapTrick+D4C
    parts (ref utils/decomposed_waveform.py:64-230); pyworld is absent here,
    so validate against SYNTHETIC ground truth instead: a singing-like
    signal built as known harmonic part H + known noise part N with a
    time-varying mix.  The decomposition's curves must match curves computed
    from the true parts within a stated dB bound (documented in PARITY.md).
    """
    rng = np.random.default_rng(7)
    secs = 2.0
    n = int(SR * secs)
    t = np.arange(n) / SR
    f0_curve = 220.0 * (1 + 0.02 * np.sin(2 * np.pi * 5.5 * t))
    ph = 2 * np.pi * np.cumsum(f0_curve) / SR
    harm_true = sum(
        np.sin(k * ph + 0.1 * k) * 0.2 / k ** 0.9 for k in range(1, 12)
    )
    # breathiness swells in the middle of the note (time-varying mix)
    breath_env = 0.01 + 0.05 * np.exp(-(((t - 1.0) / 0.3) ** 2))
    noise_true = breath_env * rng.standard_normal(n)
    y = (harm_true + noise_true).astype(np.float32)

    length = n // HOP + 1
    frame_t = np.arange(length) * HOP / SR
    f0 = np.interp(frame_t, t, f0_curve).astype(np.float32)

    dw = DecomposedWaveform(y, SR, f0, hop_size=HOP, fft_size=2048, win_size=2048)
    breath = get_breathiness(dw, length=length)
    voic = get_voicing(dw, length=length)

    # golden curves: the SAME RMS-dB definition applied to the true parts
    gold_breath = get_energy(noise_true.astype(np.float32), length,
                             hop_size=HOP, win_size=2048)
    gold_voic = get_energy(harm_true.astype(np.float32), length,
                           hop_size=HOP, win_size=2048)

    mid = slice(8, length - 8)
    voic_err = np.abs(voic[mid] - gold_voic[mid])
    breath_err = np.abs(breath[mid] - gold_breath[mid])
    # documented bounds: voicing within 1 dB everywhere; breathiness within
    # 3 dB median / 6 dB p95 (the separator leaks a little harmonic energy
    # into the residual near the vibrato extremes)
    assert voic_err.max() < 1.0, voic_err.max()
    assert np.median(breath_err) < 3.0, np.median(breath_err)
    assert np.percentile(breath_err, 95) < 6.0
    # the breathiness CURVE must track the swell: correlation with gold
    assert np.corrcoef(breath[mid], gold_breath[mid])[0, 1] > 0.95


def test_tension_matches_analytic_ratio():
    """Tension = logit of sqrt(1 - E_base^2/E_harm^2); with analytically
    known per-harmonic amplitudes the expected value is exact."""
    n = SR
    t = np.arange(n) / SR
    f0_hz = 220.0
    for a_base, a_upper, expect_sign in [(0.4, 0.08, -1), (0.08, 0.4, +1)]:
        y = (
            a_base * np.sin(2 * np.pi * f0_hz * t)
            + a_upper * np.sin(2 * np.pi * 2 * f0_hz * t)
            + a_upper * np.sin(2 * np.pi * 3 * f0_hz * t)
        ).astype(np.float32)
        length = n // HOP + 1
        f0 = np.full(length, f0_hz, np.float32)
        dw = DecomposedWaveform(y, SR, f0, hop_size=HOP, fft_size=2048,
                                win_size=2048)
        tens = get_tension(dw, length=length, domain="ratio")
        e_base = a_base / np.sqrt(2)
        e_harm = np.sqrt((a_base ** 2 + 2 * a_upper ** 2) / 2)
        expected = np.sqrt(max(e_harm ** 2 - e_base ** 2, 0.0)) / e_harm
        mid = slice(8, length - 8)
        np.testing.assert_allclose(np.median(tens[mid]), expected, atol=0.05)
        logit = get_tension(dw, length=length, domain="logit")
        assert np.sign(np.median(logit[mid])) == expect_sign
