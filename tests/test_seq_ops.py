"""Tests for alignment ops vs the reference's documented examples and a
scatter/gather torch oracle."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from xiaoicesing_io_tpu.ops.seq import (
    gather_frames,
    length_regulator,
    mel2ph_to_dur,
    rhythm_regulator,
    stretch_regulator,
)


def test_length_regulator_docstring_example():
    # ref tts_modules.py:282-291 example: dur=[2,2,3] -> mel2ph=[1,1,2,2,3,3,3]
    dur = jnp.array([[2, 2, 3]])
    out = length_regulator(dur, out_len=7)
    np.testing.assert_array_equal(np.asarray(out), [[1, 1, 2, 2, 3, 3, 3]])


def test_length_regulator_padding_and_static_len():
    dur = jnp.array([[2, 1, 0], [1, 1, 1]])
    out = length_regulator(dur, out_len=5)
    np.testing.assert_array_equal(np.asarray(out), [[1, 1, 2, 0, 0], [1, 2, 3, 0, 0]])


def test_mel2ph_to_dur_roundtrip(rng):
    dur = rng.integers(0, 5, size=(4, 9))
    out_len = int(dur.sum(axis=1).max())
    mel2ph = length_regulator(jnp.asarray(dur), out_len=out_len)
    dur2 = mel2ph_to_dur(mel2ph, t_txt=9)
    np.testing.assert_array_equal(np.asarray(dur2), dur)


def test_rhythm_regulator_docstring_example():
    # ref tts_modules.py:256-262: ph_dur=[4,2,3,2], ph2word=[1,2,2,3],
    # word_dur=[3,4,2] -> ph_dur_out=[3,1.6,2.4,2] -> rounded [3,2,2,2]
    ph_dur = jnp.array([[4.0, 2.0, 3.0, 2.0]])
    ph2word = jnp.array([[1, 2, 2, 3]])
    word_dur = jnp.array([[3.0, 4.0, 2.0]])
    out = rhythm_regulator(ph_dur, ph2word, word_dur)
    np.testing.assert_array_equal(np.asarray(out), [[3, 2, 2, 2]])


def test_gather_frames_matches_torch_gather(rng):
    B, T_txt, H, T_f = 3, 7, 16, 20
    enc = rng.standard_normal((B, T_txt, H)).astype(np.float32)
    mel2ph = rng.integers(0, T_txt + 1, size=(B, T_f))
    ours = np.asarray(gather_frames(jnp.asarray(enc), jnp.asarray(mel2ph)))
    # torch oracle replicating acoustic_encoder.py:89-91
    enc_t = F.pad(torch.from_numpy(enc), [0, 0, 1, 0])
    idx = torch.from_numpy(mel2ph)[..., None].repeat(1, 1, H)
    ref = torch.gather(enc_t, 1, idx).numpy()
    np.testing.assert_allclose(ours, ref, atol=0)


def test_stretch_regulator_docstring_example():
    # ref tts_modules.py:317-325: dur=[2,4,3], mel2ph=[1,1,2,2,2,2,3,3,3]
    mel2ph = jnp.array([[1, 1, 2, 2, 2, 2, 3, 3, 3]])
    dur = jnp.array([[2, 4, 3]])
    out = np.asarray(stretch_regulator(mel2ph, dur))
    expect = np.array([[0, 1 / 2, 0, 1 / 4, 2 / 4, 3 / 4, 0, 1 / 3, 2 / 3]])
    np.testing.assert_allclose(out, expect, atol=1e-6)
