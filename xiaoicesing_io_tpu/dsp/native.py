"""ctypes bindings for the native DSP core (native/pitch_core.cpp).

Auto-builds ``libpitch_core.so`` with g++ on first use (cached); every entry
point has a pure-numpy fallback in the calling module, so the framework works
without a toolchain.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libpitch_core.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)], check=True,
            capture_output=True, timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception as e:  # noqa: BLE001
        print(f"| WARN: native DSP core build failed ({e}); using numpy fallback")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and not _build():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    dp = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    ip = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.pitch_candidates.argtypes = [
        dp, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, dp, dp,
    ]
    lib.pitch_viterbi.argtypes = [
        dp, dp, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_double, ctypes.c_double, ip,
    ]
    lib.overlap_add.argtypes = [
        dp, dp, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, dp, dp,
    ]
    _lib = lib
    return _lib


def pitch_candidates_native(r, lag_min, lag_max, max_cand, octave_cost,
                            f0_min, f0_max, samplerate):
    lib = get_lib()
    if lib is None:
        return None
    r = np.ascontiguousarray(r, np.float64)
    F, frame_len = r.shape
    cand_freq = np.zeros((F, max_cand), np.float64)
    cand_str = np.full((F, max_cand), -1e9, np.float64)
    cand_str[:, 1:] = -1e9
    lib.pitch_candidates(
        r, F, frame_len, lag_min, lag_max, max_cand,
        octave_cost, f0_min, f0_max, samplerate, cand_freq, cand_str,
    )
    return cand_freq, cand_str


def pitch_viterbi_native(cand_freq, cand_str, octave_jump_cost, vuv_cost):
    lib = get_lib()
    if lib is None:
        return None
    cand_freq = np.ascontiguousarray(cand_freq, np.float64)
    cand_str = np.ascontiguousarray(cand_str, np.float64)
    F, C = cand_freq.shape
    path = np.zeros(F, np.int32)
    lib.pitch_viterbi(cand_freq, cand_str, F, C, octave_jump_cost, vuv_cost, path)
    return path


def overlap_add_native(frames, window, hop, length):
    """frames: [n, n_fft] already windowed; -> normalized signal [length]."""
    lib = get_lib()
    if lib is None:
        return None
    frames = np.ascontiguousarray(frames, np.float64)
    n_frames, n_fft = frames.shape
    total = n_fft + hop * (n_frames - 1)
    out = np.zeros(total, np.float64)
    norm = np.zeros(total, np.float64)
    w2 = np.ascontiguousarray(window.astype(np.float64) ** 2)
    lib.overlap_add(frames, w2, n_frames, n_fft, hop, out, norm)
    pad = n_fft // 2
    out = out[pad : pad + length]
    norm = norm[pad : pad + length]
    return out / np.maximum(norm, 1e-8)
