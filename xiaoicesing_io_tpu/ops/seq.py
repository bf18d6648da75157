"""Alignment / duration sequence ops (JAX, static shapes, mask-driven).

TPU-first re-designs of the reference's scatter/gather alignment tricks:

* :func:`length_regulator` — durations -> ``mel2ph`` frame-to-token map
  (ref: ``modules/fastspeech/tts_modules.py:278-311``); same cumsum+mask
  construction, which is already fully vectorized, but with a **static**
  output length so the op stays jit-stable under bucketed padding.
* :func:`mel2ph_to_dur` — inverse map via ``segment_sum``
  (ref: ``tts_modules.py:344-350`` which uses ``scatter_add``).
* :func:`rhythm_regulator` — rescale phoneme durations so word sums match
  given word durations (ref: ``tts_modules.py:250-275``).
* :func:`gather_frames` — frame-level conditioning by gathering token
  states with the 1-pad shift convention where ``mel2ph == 0`` selects a
  zero vector (ref: ``modules/fastspeech/acoustic_encoder.py:89-91``).
* :func:`stretch_regulator` — intra-phoneme progress curve
  (ref: ``tts_modules.py:314-341``).

All functions take/return ``jnp`` arrays and are shaped [B, T].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def length_regulator(dur: jnp.ndarray, out_len: int, alpha: float | None = None) -> jnp.ndarray:
    """Expand token durations into a frame->token index map.

    :param dur: int [B, T_txt] durations in frames (0 for padding tokens).
    :param out_len: static number of output frames; frames beyond the total
        duration are 0 (= padding / no phoneme).
    :return: int32 ``mel2ph`` [B, out_len] with 1-based token indices.
    """
    if alpha is not None:
        dur = jnp.round(dur.astype(jnp.float32) * alpha).astype(jnp.int32)
    dur = dur.astype(jnp.int32)
    dur_cumsum = jnp.cumsum(dur, axis=1)  # [B, T_txt]
    dur_cumsum_prev = dur_cumsum - dur
    pos = jnp.arange(out_len, dtype=jnp.int32)[None, None, :]  # [1, 1, T_out]
    token_mask = (pos >= dur_cumsum_prev[:, :, None]) & (pos < dur_cumsum[:, :, None])
    token_idx = jnp.arange(1, dur.shape[1] + 1, dtype=jnp.int32)[None, :, None]
    return jnp.sum(token_idx * token_mask.astype(jnp.int32), axis=1)


def mel2ph_to_dur(mel2ph: jnp.ndarray, t_txt: int, max_dur: int | None = None) -> jnp.ndarray:
    """Count frames per token. ``mel2ph`` is 1-based; 0 = padding.

    :return: int32 [B, t_txt].
    """
    dur = jax.vmap(lambda m: jax.ops.segment_sum(jnp.ones_like(m), m, num_segments=t_txt + 1))(
        mel2ph
    )
    dur = dur[:, 1:]
    if max_dur is not None:
        dur = jnp.minimum(dur, max_dur)
    return dur.astype(jnp.int32)


def rhythm_regulator(
    ph_dur: jnp.ndarray, ph2word: jnp.ndarray, word_dur: jnp.ndarray, eps: float = 1e-5
) -> jnp.ndarray:
    """Scale phoneme durations so that each word's total matches ``word_dur``.

    :param ph_dur: float/int [B, T_ph]; :param ph2word: 1-based word index per
        phoneme (0 = padding); :param word_dur: [B, T_w].
    :return: int32 rounded adjusted durations [B, T_ph].
    """
    num_words = word_dur.shape[1]
    ph_dur = ph_dur.astype(jnp.float32) * (ph2word > 0)
    word_dur_in = jax.vmap(
        lambda d, w: jax.ops.segment_sum(d, w, num_segments=num_words + 1)
    )(ph_dur, ph2word)[:, 1:]
    alpha_w = word_dur.astype(jnp.float32) / jnp.maximum(word_dur_in, eps)  # [B, T_w]
    alpha_w_pad = jnp.pad(alpha_w, [(0, 0), (1, 0)])
    alpha_ph = jnp.take_along_axis(alpha_w_pad, ph2word, axis=1)
    return jnp.round(ph_dur * alpha_ph).astype(jnp.int32)


def gather_frames(encoder_out: jnp.ndarray, mel2ph: jnp.ndarray) -> jnp.ndarray:
    """Gather token-level states to frame level.

    ``mel2ph`` is 1-based; 0 gathers a zero vector (reference realizes this
    by left-padding the encoder output by one row: acoustic_encoder.py:89-91).

    :param encoder_out: [B, T_txt, H]; :param mel2ph: [B, T_frames]
    :return: [B, T_frames, H]
    """
    padded = jnp.pad(encoder_out, [(0, 0), (1, 0), (0, 0)])
    return jnp.take_along_axis(padded, mel2ph[:, :, None], axis=1)


def stretch_regulator(mel2ph: jnp.ndarray, dur: jnp.ndarray) -> jnp.ndarray:
    """Per-frame progress within its phoneme, in [0, 1).

    :param mel2ph: int [B, T_frames] (1-based); :param dur: int [B, T_txt].
    """
    dur_pad = jnp.pad(dur, [(0, 0), (1, 0)], constant_values=1)  # avoid div by 0
    mel2dur = jnp.take_along_axis(dur_pad, mel2ph, axis=1).astype(jnp.float32)
    bound = mel2ph[:, 1:] > mel2ph[:, :-1]
    bound = jnp.pad(bound, [(0, 0), (0, 1)], constant_values=True)
    stretch_delta = 1.0 - bound * mel2dur
    stretch_delta = jnp.pad(stretch_delta[:, :-1], [(0, 0), (1, 0)])
    stretch = jnp.cumsum(stretch_delta, axis=1) / mel2dur
    return stretch * (mel2ph > 0)
