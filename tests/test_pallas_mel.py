"""Pallas fused STFT->mel kernel vs the XLA reference path (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from xiaoicesing_io_tpu.ops.mel import MelConfig, MelSpectrogram
from xiaoicesing_io_tpu.ops.pallas.mel_kernel import PallasMelSpectrogram


@pytest.mark.parametrize("n_samples", [2000, 4096])
def test_pallas_mel_matches_xla(n_samples):
    cfg = MelConfig(sample_rate=16000, n_mels=64, n_fft=256, win_size=256,
                    hop_size=64, fmin=30.0, fmax=8000.0)
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((2, n_samples)) * 0.3, jnp.float32)

    ref = MelSpectrogram(cfg).jax(y)
    got = PallasMelSpectrogram(cfg, tile_t=16, freq_block=64)(y, interpret=True)

    assert got.shape == ref.shape
    diff = np.abs(np.asarray(got) - np.asarray(ref))
    assert diff.max() < 2e-4, diff.max()

    # bf16 fast path: ~2^-9 relative error on mel energies -> O(1e-2..1e-1)
    # worst-case in the log domain (serving/bench only)
    got16 = PallasMelSpectrogram(cfg, tile_t=16, freq_block=64,
                                 compute_dtype=jnp.bfloat16)(y, interpret=True)
    diff16 = np.abs(np.asarray(got16) - np.asarray(ref))
    assert diff16.max() < 0.5, diff16.max()
    assert diff16.mean() < 0.02, diff16.mean()


def test_pallas_mel_frame_count_matches_numpy():
    cfg = MelConfig(sample_rate=16000, n_mels=64, n_fft=256, win_size=256,
                    hop_size=64, fmin=30.0, fmax=8000.0)
    rng = np.random.default_rng(1)
    y = rng.standard_normal((1, 3333)).astype(np.float32) * 0.1
    ref = MelSpectrogram(cfg).numpy(y)
    got = PallasMelSpectrogram(cfg, tile_t=16, freq_block=64)(jnp.asarray(y), interpret=True)
    assert got.shape == ref.shape
