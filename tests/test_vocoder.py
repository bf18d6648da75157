"""NSF-HiFiGAN component tests against small inline torch oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from xiaoicesing_io_tpu.models.vocoders.nsf_hifigan import (
    ConvTranspose1d,
    Generator,
    NsfHifiganConfig,
    fast_sine_gen,
    sine_gen,
)


def test_conv_transpose_matches_torch(rng):
    B, L, Cin, Cout, k, u = 2, 13, 8, 4, 16, 8
    x = rng.standard_normal((B, L, Cin)).astype(np.float32)
    mod = ConvTranspose1d(out_ch=Cout, kernel_size=k, stride=u)
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(mod.apply(params, jnp.asarray(x)))
    # torch oracle: weight [in, out, k] = flip(kernel_jax[k, in, out]) over taps
    kj = np.asarray(params["params"]["kernel"])  # [k, in, out]
    w_t = torch.from_numpy(np.ascontiguousarray(kj[::-1].transpose(1, 2, 0)))
    b_t = torch.from_numpy(np.asarray(params["params"]["bias"]))
    y_t = F.conv_transpose1d(
        torch.from_numpy(x).transpose(1, 2), w_t, b_t, stride=u, padding=(k - u) // 2
    ).transpose(1, 2).numpy()
    assert y.shape == y_t.shape == (B, L * u, Cout)
    np.testing.assert_allclose(y, y_t, atol=1e-5)


def test_sine_gen_phase_continuity():
    """Constant f0 must produce a pure continuous sine across frame boundaries."""
    sr, upp = 44100, 512
    f0_hz = 220.0
    f0 = jnp.full((1, 20), f0_hz)
    s = np.asarray(sine_gen(f0, upp, sr, harmonic_num=0))[0, :, 0]
    t = np.arange(len(s)) / sr
    expected = np.sin(2 * np.pi * f0_hz * (t + 1 / sr))  # n starts at 1
    np.testing.assert_allclose(s, expected, atol=5e-3)


def test_sine_gen_matches_torch_formula(rng):
    """Oracle: direct torch transcription of the phase-accumulation formula
    (models.py:133-147)."""
    sr, upp, harmonics = 44100, 64, 3
    f0_np = rng.uniform(80, 500, size=(2, 12)).astype(np.float32)
    ours = np.asarray(sine_gen(jnp.asarray(f0_np), upp, sr, harmonic_num=harmonics))

    f0 = torch.from_numpy(f0_np).unsqueeze(-1)
    rad = f0 / sr * torch.arange(1, upp + 1)
    rad2 = torch.fmod(rad[..., -1:].float() + 0.5, 1.0) - 0.5
    rad_acc = rad2.cumsum(dim=1).fmod(1.0).to(f0)
    rad += F.pad(rad_acc[:, :-1, :], (0, 0, 1, 0))
    rad = rad.reshape(f0.shape[0], -1, 1)
    rad = rad * torch.arange(1, harmonics + 2).reshape(1, 1, -1)
    ref = torch.sin(2 * np.pi * rad).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_fast_sine_gen_matches_torch_formula(rng):
    src_sr, upp = 44100 / 8, 64
    f0_np = rng.uniform(80, 500, size=(2, 12)).astype(np.float32)
    ours = np.asarray(fast_sine_gen(jnp.asarray(f0_np), upp, src_sr))

    f0 = torch.from_numpy(f0_np)
    n = torch.arange(1, upp + 1)
    s0 = f0.unsqueeze(-1) / src_sr
    ds0 = F.pad(s0[:, 1:, :] - s0[:, :-1, :], (0, 0, 0, 1))
    rad = s0 * n + 0.5 * ds0 * n * (n - 1) / upp
    rad2 = torch.fmod(rad[..., -1:].float() + 0.5, 1.0) - 0.5
    rad_acc = rad2.cumsum(dim=1).fmod(1.0).to(f0)
    rad += F.pad(rad_acc[:, :-1, :], (0, 0, 1, 0))
    rad = rad.reshape(f0.shape[0], 1, -1)
    ref = torch.sin(2 * np.pi * rad).transpose(1, 2).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_generator_output_shape(rng):
    cfg = NsfHifiganConfig(
        num_mels=16, sampling_rate=44100, hop_size=64,
        upsample_rates=(4, 4, 2, 2), upsample_kernel_sizes=(8, 8, 4, 4),
        upsample_initial_channel=32, resblock="1",
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3, 5),),
    )
    gen = Generator(cfg)
    B, T = 2, 10
    mel = jnp.asarray(rng.standard_normal((B, T, 16)).astype(np.float32))
    f0 = jnp.full((B, T), 220.0)
    params = gen.init(jax.random.PRNGKey(0), mel, f0)
    wav = gen.apply(params, mel, f0)
    assert wav.shape == (B, T * 64)
    assert np.isfinite(np.asarray(wav)).all()


def test_generator_mini_nsf_shape(rng):
    cfg = NsfHifiganConfig(
        num_mels=16, sampling_rate=44100, hop_size=64,
        upsample_rates=(4, 4, 2, 2), upsample_kernel_sizes=(8, 8, 4, 4),
        upsample_initial_channel=32, resblock="2",
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
        mini_nsf=True,
    )
    gen = Generator(cfg)
    B, T = 2, 10
    mel = jnp.asarray(rng.standard_normal((B, T, 16)).astype(np.float32))
    f0 = jnp.full((B, T), 220.0)
    params = gen.init(jax.random.PRNGKey(0), mel, f0)
    wav = gen.apply(params, mel, f0)
    assert wav.shape == (B, T * 64)
