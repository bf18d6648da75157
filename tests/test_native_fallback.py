"""Native C++ DSP core vs pure-numpy fallback equivalence.

dsp/pitch.py and dsp/hnsep.py each carry two implementations of their hot
loops — ctypes into native/libpitch_core.so when the toolchain built it, and
a numpy fallback otherwise.  These tests pin them together so neither path
can drift (skipped when the native lib is unavailable).
"""

import numpy as np
import pytest

from xiaoicesing_io_tpu.dsp import native as native_mod
from xiaoicesing_io_tpu.dsp.pitch import get_pitch


@pytest.fixture(autouse=True)
def _require_native():
    # lazy check: get_lib() may shell out to make (up to 120 s); keep that
    # out of collection time and only pay it when these tests actually run
    if native_mod.get_lib() is None:
        pytest.skip("native lib unavailable (no toolchain)")


def _tone(sr=44100, dur=1.0, f0=220.0, vibrato=0.02):
    t = np.arange(int(sr * dur)) / sr
    f = f0 * (1 + vibrato * np.sin(2 * np.pi * 5.0 * t))
    phase = 2 * np.pi * np.cumsum(f) / sr
    x = 0.4 * np.sin(phase) + 0.15 * np.sin(2 * phase) + 0.002 * np.random.default_rng(0).standard_normal(len(t))
    # silent tail: exercises the unvoiced candidate + viterbi switch
    x[int(0.8 * sr):] = 0.0
    return x.astype(np.float32)


def test_pitch_native_matches_fallback(monkeypatch):
    wav = _tone()
    sr, hop = 44100, 512
    length = len(wav) // hop
    f0_nat, uv_nat = get_pitch(wav, sr, length, hop_size=hop)

    monkeypatch.setattr(native_mod, "get_lib", lambda: None)
    f0_py, uv_py = get_pitch(wav, sr, length, hop_size=hop)

    assert f0_nat.shape == f0_py.shape
    np.testing.assert_array_equal(uv_nat, uv_py)
    np.testing.assert_allclose(f0_nat, f0_py, atol=1e-3)


def test_overlap_add_native_matches_fallback(monkeypatch):
    from xiaoicesing_io_tpu.dsp.hnsep import istft_centered, stft_centered

    rng = np.random.default_rng(1)
    x = rng.standard_normal(8192).astype(np.float64)
    n_fft, hop = 2048, 512
    window = np.hanning(n_fft + 1)[:-1] ** 0.5  # sqrt-hann, torch convention
    spec = stft_centered(x, n_fft, hop, window)

    out_nat = istft_centered(spec, n_fft, hop, window, len(x))

    monkeypatch.setattr(native_mod, "get_lib", lambda: None)
    out_py = istft_centered(spec, n_fft, hop, window, len(x))

    np.testing.assert_allclose(out_nat, out_py, atol=1e-10)
    # and both reconstruct the signal
    np.testing.assert_allclose(out_nat, x, atol=1e-6)
