"""Fused STFT -> mel -> log kernel (Pallas TPU).

On-device mel extraction for validation/serving paths.  One kernel per
(frame-tile, freq-block) computes window * frame @ DFT-block -> |.|^2 and
accumulates the mel projection of the magnitude into the output tile; the
final grid step applies the log dynamic-range compression.

The f32 DFT basis (2048 x 2050 ~ 17 MB) exceeds VMEM, so the frequency axis
is blocked: each grid step keeps only a [n_fft, 2*FB] DFT slice and the
[FB, M] mel slice resident.  Magnitude needs sqrt before the mel projection,
so the kernel accumulates mel @ sqrt(re^2 + im^2) per block — exact, since
mel weights are nonnegative and blocks partition the frequency axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..mel import MelConfig, _padded_window, mel_filterbank


def _kernel(frames_ref, dft_ref, mel_ref, o_ref, *, n_freq_blocks: int,
            clip_val: float):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    frames = frames_ref[...]  # [TILE_T, n_fft] (pre-windowed)
    dft = dft_ref[...]  # [n_fft, 2*FB]
    re_im = jnp.dot(frames, dft, preferred_element_type=jnp.float32)
    fb = re_im.shape[1] // 2
    mag = jnp.sqrt(jnp.maximum(re_im[:, :fb] ** 2 + re_im[:, fb:] ** 2, 0.0))
    o_ref[...] += jnp.dot(
        mag.astype(mel_ref.dtype), mel_ref[...], preferred_element_type=jnp.float32
    )

    @pl.when(j == n_freq_blocks - 1)
    def _():
        o_ref[...] = jnp.log(jnp.clip(o_ref[...], clip_val, None))


class PallasMelSpectrogram:
    """Drop-in on-device mel extractor (matches MelSpectrogram.jax)."""

    def __init__(self, cfg: MelConfig, tile_t: int = 256, freq_block: int = 256,
                 compute_dtype=jnp.float32):
        self.cfg = cfg
        self.tile_t = tile_t
        self.freq_block = freq_block
        self.compute_dtype = compute_dtype
        n_freqs = 1 + cfg.n_fft // 2
        # pad freq axis to a block multiple with zero weights
        self.n_freqs_pad = ((n_freqs + freq_block - 1) // freq_block) * freq_block
        k = np.arange(cfg.n_fft)[:, None]
        f = np.arange(self.n_freqs_pad)[None, :]
        ang = -2.0 * np.pi * k * f / cfg.n_fft
        ang[:, n_freqs:] = 0.0
        # interleave re/im per block: [n_fft, nb, 2, FB] -> [n_fft, nb*2FB]
        nb = self.n_freqs_pad // freq_block
        cos = np.cos(ang).reshape(cfg.n_fft, nb, freq_block)
        sin = np.sin(ang).reshape(cfg.n_fft, nb, freq_block)
        sin[:, :, :] *= (f.reshape(1, nb, freq_block) < n_freqs)
        cos[:, :, :] *= (np.arange(self.n_freqs_pad).reshape(1, nb, freq_block) < n_freqs)
        self.dft = np.concatenate([cos, sin], axis=2).reshape(
            cfg.n_fft, nb * 2 * freq_block
        ).astype(np.float32)
        mel = mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax)
        mel_pad = np.zeros((self.n_freqs_pad, cfg.n_mels), np.float32)
        mel_pad[:n_freqs] = mel.T
        self.mel = mel_pad
        self.window = _padded_window(cfg.win_size, cfg.n_fft)
        self.nb = nb

    @functools.partial(jax.jit, static_argnames=("self", "interpret"))
    def __call__(self, y: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
        """y: [B, T_samples] -> log-mel [B, frames, M]."""
        c = self.cfg
        pad_l = (c.win_size - c.hop_size) // 2
        pad_r = (c.win_size - c.hop_size + 1) // 2
        ypad = jnp.pad(y, [(0, 0), (pad_l, pad_r)], mode="reflect")
        n_frames = 1 + (ypad.shape[-1] - c.n_fft) // c.hop_size
        idx = jnp.arange(c.n_fft)[None, :] + c.hop_size * jnp.arange(n_frames)[:, None]
        frames = (ypad[:, idx] * jnp.asarray(self.window)).astype(self.compute_dtype)
        B = y.shape[0]
        tile = self.tile_t
        n_tiles = (n_frames + tile - 1) // tile
        total = n_tiles * tile
        frames = jnp.pad(frames, [(0, 0), (0, total - n_frames), (0, 0)])
        fb = self.freq_block

        def run_one(fr):
            return pl.pallas_call(
                functools.partial(_kernel, n_freq_blocks=self.nb, clip_val=c.clip_val),
                out_shape=jax.ShapeDtypeStruct((total, c.n_mels), jnp.float32),
                grid=(n_tiles, self.nb),
                in_specs=[
                    pl.BlockSpec((tile, c.n_fft), lambda i, j: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((c.n_fft, 2 * fb), lambda i, j: (0, j),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((fb, c.n_mels), lambda i, j: (j, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((tile, c.n_mels), lambda i, j: (i, 0),
                                       memory_space=pltpu.VMEM),
                interpret=interpret,
            )(
                fr,
                jnp.asarray(self.dft).astype(self.compute_dtype),
                jnp.asarray(self.mel).astype(self.compute_dtype),
            )

        out = jax.vmap(run_one)(frames)
        return out[:, :n_frames]
