"""Objective audio evaluation: mel MAE and MCD.

BASELINE.json names "mel MAE vs reference" and "MCD/PESQ tolerance" as the
quality criteria; this module provides frame-aligned mel MAE and the standard
mel-cepstral distortion (MCD, dB) between waveforms or mel spectrograms.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..ops.mel import MelConfig, MelSpectrogram


def mel_mae(mel_a: np.ndarray, mel_b: np.ndarray) -> float:
    """Mean absolute error between aligned log-mel spectrograms [T, M]."""
    n = min(len(mel_a), len(mel_b))
    return float(np.abs(np.asarray(mel_a)[:n] - np.asarray(mel_b)[:n]).mean())


def _mfcc_from_logmel(logmel: np.ndarray, n_mfcc: int = 13) -> np.ndarray:
    """DCT-II cepstra from natural-log mel [T, M] (librosa/htk convention)."""
    from scipy.fftpack import dct

    return dct(np.asarray(logmel, np.float64), type=2, axis=1, norm="ortho")[:, :n_mfcc]


def mcd(
    a: np.ndarray, b: np.ndarray, *,
    is_mel: bool = True, mel_cfg: Optional[MelConfig] = None,
    n_mfcc: int = 13, exclude_c0: bool = True,
) -> float:
    """Mel-cepstral distortion in dB between two signals.

    :param a, b: log-mel spectrograms [T, M] (``is_mel=True``) or waveforms.
    """
    if not is_mel:
        ext = MelSpectrogram(mel_cfg or MelConfig())
        a = ext.numpy(np.asarray(a, np.float32))
        b = ext.numpy(np.asarray(b, np.float32))
    ca = _mfcc_from_logmel(a, n_mfcc)
    cb = _mfcc_from_logmel(b, n_mfcc)
    n = min(len(ca), len(cb))
    ca, cb = ca[:n], cb[:n]
    if exclude_c0:
        ca, cb = ca[:, 1:], cb[:, 1:]
    d = np.sqrt(2.0 * np.sum((ca - cb) ** 2, axis=1))
    return float((10.0 / np.log(10.0)) * d.mean())


def f0_rmse_cents(f0_a: np.ndarray, f0_b: np.ndarray) -> Tuple[float, float]:
    """RMSE in cents over co-voiced frames + voicing-decision agreement."""
    n = min(len(f0_a), len(f0_b))
    a, b = np.asarray(f0_a[:n], np.float64), np.asarray(f0_b[:n], np.float64)
    va, vb = a > 0, b > 0
    both = va & vb
    agreement = float((va == vb).mean())
    if not both.any():
        return float("nan"), agreement
    cents = 1200.0 * np.abs(np.log2(a[both] / b[both]))
    return float(np.sqrt(np.mean(cents ** 2))), agreement
