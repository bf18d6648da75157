"""Time-folded vocoder equals the stock generator."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xiaoicesing_io_tpu.models.vocoders.nsf_fast import FastNsfHifigan
from xiaoicesing_io_tpu.models.vocoders.nsf_hifigan import (
    Generator,
    NsfHifiganConfig,
)


@pytest.mark.parametrize(
    "mini_nsf,resblock",
    [pytest.param(False, "1", marks=pytest.mark.slow), (True, "2")],
)
def test_fast_vocoder_matches_stock(rng, mini_nsf, resblock):
    cfg = NsfHifiganConfig(
        num_mels=16, sampling_rate=44100, hop_size=64,
        upsample_rates=(4, 4, 2, 2), upsample_kernel_sizes=(8, 8, 4, 4),
        upsample_initial_channel=64, resblock=resblock,
        resblock_kernel_sizes=(3, 7) if resblock == "1" else (3,),
        resblock_dilation_sizes=((1, 3, 5), (1, 3, 5)) if resblock == "1"
        else ((1, 3),),
        mini_nsf=mini_nsf,
    )
    gen = Generator(cfg)  # f32 stock
    B, T = 2, 12
    mel = jnp.asarray(rng.standard_normal((B, T, 16)).astype(np.float32))
    f0 = jnp.asarray(rng.uniform(100, 400, (B, T)).astype(np.float32))
    params = gen.init(jax.random.PRNGKey(0), mel, f0)
    ref = np.asarray(gen.apply(params, mel, f0))

    fast = FastNsfHifigan(cfg, params, dtype=jnp.float32, min_lanes=8)
    out = np.asarray(fast(mel, f0))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_fast_vocoder_bf16_close(rng):
    cfg = NsfHifiganConfig(
        num_mels=16, sampling_rate=44100, hop_size=64,
        upsample_rates=(4, 4, 2, 2), upsample_kernel_sizes=(8, 8, 4, 4),
        upsample_initial_channel=64, resblock="1",
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3, 5),),
    )
    gen = Generator(cfg)
    B, T = 1, 10
    mel = jnp.asarray(rng.standard_normal((B, T, 16)).astype(np.float32))
    f0 = jnp.asarray(rng.uniform(100, 400, (B, T)).astype(np.float32))
    params = gen.init(jax.random.PRNGKey(0), mel, f0)
    ref = np.asarray(gen.apply(params, mel, f0))
    fast = FastNsfHifigan(cfg, params, dtype=jnp.bfloat16, min_lanes=8)
    out = np.asarray(fast(mel, f0))
    # waveform in [-1, 1]; bf16 conv chain tolerance
    assert np.corrcoef(out.ravel(), ref.ravel())[0, 1] > 0.999


def test_fast_vocoder_source_noise(rng):
    """With a key, the folded applier reproduces SineGen's stochastic source
    (ref models.py:143-165): random per-harmonic initial phases + additive
    noise with std 0.003 in voiced regions and sine_amp/3 in unvoiced ones.
    Without a key the source stays deterministic (parity-test mode)."""
    cfg = NsfHifiganConfig(
        num_mels=16, sampling_rate=44100, hop_size=64,
        upsample_rates=(4, 4, 2, 2), upsample_kernel_sizes=(8, 8, 4, 4),
        upsample_initial_channel=64, resblock="1",
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3, 5),),
        mini_nsf=False,
    )
    gen = Generator(cfg)
    B, T = 1, 16
    mel = jnp.asarray(rng.standard_normal((B, T, 16)).astype(np.float32))
    f0_np = rng.uniform(100, 400, (B, T)).astype(np.float32)
    f0_np[:, 8:] = 0.0  # unvoiced second half
    f0 = jnp.asarray(f0_np)
    params = gen.init(jax.random.PRNGKey(0), mel, f0)
    fast = FastNsfHifigan(cfg, params, dtype=jnp.float32, min_lanes=8)

    base = np.asarray(fast(mel, f0))
    k1, k2 = jax.random.PRNGKey(1), jax.random.PRNGKey(2)
    n1 = np.asarray(fast(mel, f0, key=k1))
    n1b = np.asarray(fast(mel, f0, key=k1))
    n2 = np.asarray(fast(mel, f0, key=k2))

    np.testing.assert_array_equal(n1, n1b)       # same key -> identical
    assert np.abs(n1 - n2).max() > 0             # different keys differ
    assert np.abs(n1 - base).max() > 0           # noise changes the output

    # fully-unvoiced input: without a key the excitation collapses to the
    # constant tanh(bias) (sines are gated by uv), so the wav is a fixed
    # function of the mel; with a key the amp/3 unvoiced noise drives it
    f0_uv = jnp.zeros_like(f0)
    uv_base = np.asarray(fast(mel, f0_uv))
    np.testing.assert_array_equal(uv_base, np.asarray(fast(mel, f0_uv)))
    uv_n = np.asarray(fast(mel, f0_uv, key=k1))
    assert np.abs(uv_n - uv_base).max() > 0


def test_fast_vocoder_pallas_stage_matches(rng):
    """Fused whole-stage Pallas resblocks == XLA folded resblocks."""
    cfg = NsfHifiganConfig(
        num_mels=16, sampling_rate=44100, hop_size=64,
        upsample_rates=(4, 4, 2, 2), upsample_kernel_sizes=(8, 8, 4, 4),
        upsample_initial_channel=64, resblock="1",
        resblock_kernel_sizes=(3, 7), resblock_dilation_sizes=((1, 3, 5),) * 2,
    )
    gen = Generator(cfg)
    B, T = 2, 12
    mel = jnp.asarray(rng.standard_normal((B, T, 16)).astype(np.float32))
    f0 = jnp.asarray(rng.uniform(100, 400, (B, T)).astype(np.float32))
    params = gen.init(jax.random.PRNGKey(0), mel, f0)

    base = FastNsfHifigan(cfg, params, dtype=jnp.bfloat16, min_lanes=8)
    fused = FastNsfHifigan(
        cfg, params, dtype=jnp.bfloat16, min_lanes=8,
        pallas_stages=(0, 1), pallas_tile=128, pallas_interpret=True,
    )
    ref = np.asarray(base(mel, f0))
    out = np.asarray(fused(mel, f0))
    assert out.shape == ref.shape
    # same bf16 math, different summation order; waveform is tanh-bounded
    np.testing.assert_allclose(out, ref, atol=2e-2)
    assert np.corrcoef(out.ravel(), ref.ravel())[0, 1] > 0.999
