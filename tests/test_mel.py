"""Golden tests for STFT/mel extraction vs an in-test torch.stft oracle.

The oracle reproduces the reference convention
(``/root/reference/modules/nsf_hifigan/nvSTFT.py:51-87``) directly with
torch.stft — no reference code is imported.
"""

import numpy as np
import pytest
import torch

from xiaoicesing_io_tpu.ops.mel import MelConfig, MelSpectrogram, mel_filterbank, num_frames


def torch_oracle_mel(y, cfg: MelConfig, mel_basis, keyshift=0.0, speed=1.0):
    factor = 2 ** (keyshift / 12)
    n_fft_new = int(np.round(cfg.n_fft * factor))
    win_new = int(np.round(cfg.win_size * factor))
    hop_new = int(np.round(cfg.hop_size * speed))
    yt = torch.from_numpy(y).float()[None]
    window = torch.hann_window(win_new)
    yt = torch.nn.functional.pad(
        yt[None], ((win_new - hop_new) // 2, (win_new - hop_new + 1) // 2), mode="reflect"
    )[0]
    spec = torch.stft(
        yt, n_fft_new, hop_length=hop_new, win_length=win_new, window=window,
        center=False, pad_mode="reflect", normalized=False, onesided=True, return_complex=True,
    ).abs()
    if keyshift != 0:
        size = cfg.n_fft // 2 + 1
        if spec.size(1) < size:
            spec = torch.nn.functional.pad(spec, (0, 0, 0, size - spec.size(1)))
        spec = spec[:, :size, :] * cfg.win_size / win_new
    mel = torch.from_numpy(mel_basis).float() @ spec
    return torch.log(torch.clamp(mel, min=cfg.clip_val))[0].T.numpy()  # [T, M]


@pytest.fixture(scope="module")
def cfg():
    return MelConfig()


@pytest.fixture(scope="module")
def extractor(cfg):
    return MelSpectrogram(cfg)


def _rand_wav(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 44100
    y = 0.4 * np.sin(2 * np.pi * 220 * t) + 0.2 * np.sin(2 * np.pi * 440 * t + 0.3)
    y += 0.05 * rng.standard_normal(n)
    return y.astype(np.float32)


def test_mel_filterbank_shape(cfg):
    fb = mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax)
    assert fb.shape == (128, 1025)
    assert fb.min() >= 0
    # every mel band has some support
    assert (fb.sum(axis=1) > 0).all()


def test_numpy_matches_torch_oracle(cfg, extractor):
    y = _rand_wav(44100)  # 1 s
    ours = extractor.numpy(y)
    ref = torch_oracle_mel(y, cfg, extractor.mel_basis)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=0)


def test_numpy_matches_torch_oracle_keyshift_speed(cfg, extractor):
    y = _rand_wav(44100, seed=1)
    for keyshift, speed in [(2.0, 1.0), (-3.0, 1.0), (0.0, 1.5), (1.5, 0.8)]:
        ours = extractor.numpy(y, keyshift=keyshift, speed=speed)
        ref = torch_oracle_mel(y, cfg, extractor.mel_basis, keyshift=keyshift, speed=speed)
        assert ours.shape == ref.shape, (keyshift, speed)
        np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=0, err_msg=f"{keyshift},{speed}")


def test_jax_matches_numpy(cfg, extractor):
    y = _rand_wav(2 * 44100, seed=2)
    ours_np = extractor.numpy(y)
    ours_jax = np.asarray(extractor.jax(y[None]))[0]
    assert ours_jax.shape == ours_np.shape
    np.testing.assert_allclose(ours_jax, ours_np, atol=5e-3, rtol=0)


def test_num_frames_helper(cfg, extractor):
    for n in [44100, 44100 + 13, 512 * 100]:
        y = _rand_wav(n, seed=3)
        assert extractor.numpy(y).shape[0] == num_frames(n, cfg.win_size, cfg.hop_size)


def test_device_batched_matches_numpy():
    """MelSpectrogram.device (bucketed, backend-dispatched) == the numpy
    path on the true frame range."""
    from xiaoicesing_io_tpu.ops.mel import MelConfig, MelSpectrogram

    cfg = MelConfig()
    ext = MelSpectrogram(cfg)
    rng = np.random.default_rng(0)
    T = 3 * cfg.hop_size * 100 + 77  # deliberately off-bucket
    y = rng.uniform(-0.5, 0.5, (2, T)).astype(np.float32)
    ref0 = ext.numpy(y[0])
    got = ext.device(y, bucket_frames=64)
    n = len(ref0)
    assert got.shape[1] >= n
    np.testing.assert_allclose(got[0][: n - 2], ref0[: n - 2], atol=2e-3)
