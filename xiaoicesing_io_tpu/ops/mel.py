"""STFT + log-mel spectrogram extraction.

Numerically matches the reference convention
(``/root/reference/modules/nsf_hifigan/nvSTFT.py:27-87``):

* hann window, ``center=False`` with manual reflect padding of
  ``((win - hop) // 2, (win - hop + 1) // 2)`` samples,
* magnitude spectrum |STFT|,
* Slaney-scale, Slaney-normalized mel filterbank (librosa defaults),
* natural-log dynamic-range compression ``log(clip(x, 1e-5))``,
* ``keyshift`` rescales fft/window sizes (frequency stretch) and ``speed``
  rescales the hop (time stretch) for spectral-domain augmentation.

Two execution paths share the same math:

* :func:`MelSpectrogram.numpy` — offline binarization on CPU, any (dynamic)
  sizes, float64-free.
* :func:`MelSpectrogram.jax` — a jit-able, static-shape path where the DFT is
  expressed as one big matmul so it lands on the TPU MXU (the rfft of a
  2048-point real frame is a ``[frames, 2048] @ [2048, 2 * 1025]`` product),
  fused with the mel projection.

The mel filterbank is implemented from scratch (the librosa C-free formula);
librosa itself is not a dependency.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Mel filterbank (Slaney scale + Slaney norm, librosa-compatible)
# ---------------------------------------------------------------------------

def hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    mel = f / f_sp
    above = f >= min_log_hz
    mel = np.where(above, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)
    return mel


def mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    f = m * f_sp
    above = m >= min_log_mel
    return np.where(above, min_log_hz * np.exp(logstep * (m - min_log_mel)), f)


def hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)


def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float,
                   htk: bool = False) -> np.ndarray:
    """Triangular mel filterbank, shape [n_mels, 1 + n_fft // 2].

    Matches ``librosa.filters.mel(htk=htk, norm='slaney')`` to float32
    precision.
    """
    n_freqs = 1 + n_fft // 2
    fftfreqs = np.linspace(0.0, sr / 2.0, n_freqs)
    to_mel = hz_to_mel_htk if htk else hz_to_mel_slaney
    to_hz = mel_to_hz_htk if htk else mel_to_hz_slaney
    mel_pts = np.linspace(to_mel(fmin), to_mel(fmax), n_mels + 2)
    hz_pts = to_hz(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights = weights * enorm[:, None]
    return weights.astype(np.float32)


def hann_window(n: int) -> np.ndarray:
    """Periodic hann window (matches ``torch.hann_window(periodic=True)``)."""
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(np.float32)


# ---------------------------------------------------------------------------
# Framing / padding helpers
# ---------------------------------------------------------------------------

def _stft_sizes(n_fft: int, win_size: int, hop: int, keyshift: float, speed: float):
    factor = 2.0 ** (keyshift / 12.0)
    n_fft_new = int(np.round(n_fft * factor))
    win_new = int(np.round(win_size * factor))
    hop_new = int(np.round(hop * speed))
    return n_fft_new, win_new, hop_new


def _padded_window(win_size: int, n_fft: int) -> np.ndarray:
    """Hann window of ``win_size`` centered in an ``n_fft`` buffer
    (torch.stft semantics when win_length < n_fft)."""
    w = hann_window(win_size)
    if win_size < n_fft:
        left = (n_fft - win_size) // 2
        w = np.pad(w, (left, n_fft - win_size - left))
    return w.astype(np.float32)


def reflect_pad(y: np.ndarray, left: int, right: int) -> np.ndarray:
    return np.pad(y, [(0, 0)] * (y.ndim - 1) + [(left, right)], mode="reflect")


def num_frames(n_samples: int, win_size: int, hop: int) -> int:
    """Frame count after the reference's padding scheme."""
    padded = n_samples + (win_size - hop) // 2 + (win_size - hop + 1) // 2
    return 1 + (padded - win_size) // hop


# ---------------------------------------------------------------------------
# Config + entry points
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class MelConfig:
    sample_rate: int = 44100
    n_mels: int = 128
    n_fft: int = 2048
    win_size: int = 2048
    hop_size: int = 512
    fmin: float = 40.0
    fmax: float = 16000.0
    clip_val: float = 1e-5

    @staticmethod
    def from_config(cfg) -> "MelConfig":
        return MelConfig(
            sample_rate=cfg["audio_sample_rate"],
            n_mels=cfg["audio_num_mel_bins"],
            n_fft=cfg["fft_size"],
            win_size=cfg["win_size"],
            hop_size=cfg["hop_size"],
            fmin=cfg["fmin"],
            fmax=cfg["fmax"],
        )


class MelSpectrogram:
    """Mel extractor with matching numpy (offline) and JAX (on-device) paths.

    ``center=False`` uses the reference acoustic convention (manual
    (win-hop)//2 reflect padding); ``center=True`` matches
    ``torch.stft(center=True)`` (n_fft//2 reflect padding), as used by the
    RMVPE 16 kHz HTK mel (ref: modules/pe/rmvpe/spec.py).
    """

    def __init__(self, cfg: MelConfig, htk: bool = False, center: bool = False):
        self.cfg = cfg
        self.center = center
        self.mel_basis = mel_filterbank(
            cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax, htk=htk
        )  # [M, F]

    # -- numpy path (any shapes; used by binarizers) ------------------------

    def numpy(self, y: np.ndarray, keyshift: float = 0.0, speed: float = 1.0) -> np.ndarray:
        """y: [T] or [B, T] in [-1, 1] -> log-mel [frames, M] (or [B, frames, M])."""
        squeeze = y.ndim == 1
        y = np.atleast_2d(np.asarray(y, dtype=np.float32))
        c = self.cfg
        n_fft_new, win_new, hop_new = _stft_sizes(c.n_fft, c.win_size, c.hop_size, keyshift, speed)
        if self.center:
            pad_l = pad_r = n_fft_new // 2
        else:
            pad_l = (win_new - hop_new) // 2
            pad_r = (win_new - hop_new + 1) // 2
        ypad = reflect_pad(y, pad_l, pad_r)
        window = _padded_window(win_new, n_fft_new)
        n_frames = 1 + (ypad.shape[-1] - n_fft_new) // hop_new
        idx = np.arange(n_fft_new)[None, :] + hop_new * np.arange(n_frames)[:, None]
        frames = ypad[:, idx] * window[None, None, :]  # [B, frames, n_fft_new]
        spec = np.abs(np.fft.rfft(frames, axis=-1)).astype(np.float32)  # [B, frames, F_new]
        if keyshift != 0:
            size = c.n_fft // 2 + 1
            if spec.shape[-1] < size:
                spec = np.pad(spec, [(0, 0), (0, 0), (0, size - spec.shape[-1])])
            spec = spec[..., :size] * (c.win_size / win_new)
        mel = spec @ self.mel_basis.T  # [B, frames, M]
        mel = np.log(np.clip(mel, c.clip_val, None))
        return mel[0] if squeeze else mel

    # -- JAX path (static shapes; MXU matmul DFT) ---------------------------

    @functools.cached_property
    def _dft_matrix(self) -> np.ndarray:
        """Real-input DFT as a single real matrix [n_fft, 2 * n_freqs]."""
        c = self.cfg
        n_freqs = 1 + c.n_fft // 2
        k = np.arange(c.n_fft)[:, None]
        f = np.arange(n_freqs)[None, :]
        ang = -2.0 * np.pi * k * f / c.n_fft
        return np.concatenate([np.cos(ang), np.sin(ang)], axis=1).astype(np.float32)

    def device(self, y: np.ndarray, bucket_frames: int = 256) -> np.ndarray:
        """Batched on-accelerator mel for [B, T] waveforms -> [B, frames, M].

        Pads T up to a ``bucket_frames`` hop grid (bounded jit cache) and
        dispatches to the fused Pallas kernel on TPU for B >= 2 — measured
        20.3 ms vs 27-32 ms XLA at B=4 x 2048 frames on v5e; parity at B=1,
        where the XLA matmul-DFT path is used instead
        (docs/PerformanceNotes.md round 3). Callers slice the true frame
        count off the result.
        """
        import jax

        y = np.atleast_2d(np.asarray(y, np.float32))
        c = self.cfg
        bucket = bucket_frames * c.hop_size
        pad_t = (-y.shape[1]) % bucket
        y = np.pad(y, ((0, 0), (0, pad_t)))
        if jax.default_backend() == "tpu" and y.shape[0] >= 2:
            if not hasattr(self, "_pallas"):
                from .pallas.mel_kernel import PallasMelSpectrogram

                self._pallas = PallasMelSpectrogram(c)
            return np.asarray(self._pallas(jnp.asarray(y)))
        if not hasattr(self, "_jax_jit"):
            import functools

            self._jax_jit = jax.jit(self.jax)
        return np.asarray(self._jax_jit(jnp.asarray(y)))

    def jax(self, y: jnp.ndarray) -> jnp.ndarray:
        """y: [B, T] -> log-mel [B, frames, M]; jit-able, static shapes.

        The windowed frames are multiplied against the [n_fft, 2F] DFT basis
        and the [F, M] mel basis — both matmuls map onto the MXU; XLA fuses
        the window multiply and log into the surrounding ops.
        """
        c = self.cfg
        pad_l = (c.win_size - c.hop_size) // 2
        pad_r = (c.win_size - c.hop_size + 1) // 2
        ypad = jnp.pad(y, [(0, 0), (pad_l, pad_r)], mode="reflect")
        n_frames = 1 + (ypad.shape[-1] - c.n_fft) // c.hop_size
        window = jnp.asarray(_padded_window(c.win_size, c.n_fft))
        idx = jnp.arange(c.n_fft)[None, :] + c.hop_size * jnp.arange(n_frames)[:, None]
        frames = ypad[:, idx] * window[None, None, :]  # [B, frames, n_fft]
        dft = jnp.asarray(self._dft_matrix)  # [n_fft, 2F]
        n_freqs = 1 + c.n_fft // 2
        re_im = jnp.einsum("btn,nf->btf", frames, dft, preferred_element_type=jnp.float32)
        power = re_im[..., :n_freqs] ** 2 + re_im[..., n_freqs:] ** 2
        spec = jnp.sqrt(jnp.maximum(power, 0.0))
        mel = jnp.einsum(
            "btf,mf->btm", spec, jnp.asarray(self.mel_basis), preferred_element_type=jnp.float32
        )
        return jnp.log(jnp.clip(mel, min=c.clip_val))
