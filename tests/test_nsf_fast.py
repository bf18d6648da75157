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


@pytest.mark.parametrize("mini_nsf,resblock", [(False, "1"), (True, "2")])
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
