"""Variance-model encoders: linguistic encoder, duration predictor, melody encoder.

Capability parity with ``/root/reference/modules/fastspeech/variance_encoder.py``
and the ``DurationPredictor`` in ``tts_modules.py:53-134``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..common import normal_embed_init
from .encoder import FastSpeech2Encoder


class DurationPredictor(nn.Module):
    """Conv stack predicting log-domain phoneme durations
    (ref: tts_modules.py:53-134).  Returns linear-domain durations;
    at inference they are clamped to >= 0."""

    n_layers: int = 2
    n_chans: int = 384
    kernel_size: int = 3
    dropout_rate: float = 0.1
    offset: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, x_masks, infer=True, deterministic=True):
        """
        :param xs: [B, T, H]; x_masks: bool [B, T] True at padding
        :return: [B, T] durations (linear domain)
        """
        nonpad = (1.0 - x_masks.astype(jnp.float32))[..., None]
        for i in range(self.n_layers):
            xs = nn.Conv(self.n_chans, (self.kernel_size,), padding="SAME",
                         dtype=self.dtype, name=f"conv_{i}")(xs)
            xs = jax.nn.relu(xs)
            xs = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name=f"ln_{i}")(xs)
            xs = nn.Dropout(self.dropout_rate, deterministic=deterministic)(xs)
            xs = xs * nonpad
        xs = nn.Dense(1, dtype=self.dtype, name="linear")(xs)
        xs = xs * nonpad
        dur = jnp.exp(xs[..., 0]) - self.offset
        if infer:
            dur = jnp.maximum(dur, 0.0)
        return dur


class FastSpeech2Variance(nn.Module):
    """Word-mode (onset + word_dur embeds) or phoneme-mode linguistic encoder,
    plus an optional duration predictor (ref: variance_encoder.py:14-87)."""

    vocab_size: int
    hidden_size: int = 256
    enc_layers: int = 4
    enc_ffn_kernel_size: int = 3
    ffn_act: str = "gelu"
    dropout: float = 0.1
    num_heads: int = 2
    use_pos_embed: bool = True
    use_rope: bool = True
    rel_pos: bool = True
    predict_dur: bool = True
    dur_hidden_size: int = 512
    dur_num_layers: int = 5
    dur_kernel_size: int = 3
    dur_dropout: float = 0.1
    dur_log_offset: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        txt_tokens: jnp.ndarray,  # [B, T_ph]
        midi: jnp.ndarray,  # [B, T_ph]
        ph2word: jnp.ndarray,  # [B, T_ph], 1-based word ids
        ph_dur: Optional[jnp.ndarray] = None,  # [B, T_ph]
        word_dur: Optional[jnp.ndarray] = None,  # [B, T_w]
        spk_embed: Optional[jnp.ndarray] = None,  # [B, T|1, H]
        infer: bool = True,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        H = self.hidden_size
        txt_embed = nn.Embed(self.vocab_size, H,
                             embedding_init=normal_embed_init(H, zero_padding_row=True),
                             dtype=self.dtype, name="txt_embed")(txt_tokens)
        if self.predict_dur:
            # word mode (ref: variance_encoder.py:61-73)
            onset = jnp.pad(ph2word[:, 1:] > ph2word[:, :-1], [(0, 0), (1, 0)],
                            constant_values=True) & (ph2word > 0)
            onset_embed = nn.Embed(2, H, embedding_init=normal_embed_init(H),
                                   dtype=self.dtype, name="onset_embed")(onset.astype(jnp.int32))
            if word_dur is None or not infer:
                num_words = ph2word.shape[1]
                word_dur = jax.vmap(
                    lambda d, w: jax.ops.segment_sum(d, w, num_segments=num_words + 1)
                )(ph_dur.astype(jnp.float32), ph2word)[:, 1:]
            wd = jnp.pad(word_dur.astype(jnp.float32), [(0, 0), (1, 0)])
            ph_word_dur = jnp.take_along_axis(wd, ph2word, axis=1)  # word dur per phoneme
            word_dur_embed = nn.Dense(
                H, dtype=self.dtype, kernel_init=nn.initializers.xavier_uniform(),
                name="word_dur_embed",
            )(ph_word_dur[:, :, None])
            extra = onset_embed + word_dur_embed
        else:
            extra = nn.Dense(
                H, dtype=self.dtype, kernel_init=nn.initializers.xavier_uniform(),
                name="ph_dur_embed",
            )(ph_dur.astype(jnp.float32)[:, :, None])

        encoder_out = FastSpeech2Encoder(
            hidden_size=H, num_layers=self.enc_layers,
            ffn_kernel_size=self.enc_ffn_kernel_size, ffn_act=self.ffn_act,
            dropout=self.dropout, num_heads=self.num_heads,
            use_pos_embed=self.use_pos_embed, use_rope=self.use_rope,
            rel_pos=self.rel_pos, dtype=self.dtype, name="encoder",
        )(txt_embed, extra, txt_tokens == 0, deterministic=deterministic)

        if not self.predict_dur:
            return encoder_out, None

        midi_embed = nn.Embed(128, H, embedding_init=normal_embed_init(H),
                              dtype=self.dtype, name="midi_embed")(midi)
        dur_cond = encoder_out + midi_embed
        if spk_embed is not None:
            dur_cond = dur_cond + spk_embed
        ph_dur_pred = DurationPredictor(
            n_layers=self.dur_num_layers, n_chans=self.dur_hidden_size,
            kernel_size=self.dur_kernel_size, dropout_rate=self.dur_dropout,
            offset=self.dur_log_offset, dtype=self.dtype, name="dur_predictor",
        )(dur_cond, txt_tokens == 0, infer=infer, deterministic=deterministic)
        return encoder_out, ph_dur_pred


class MelodyEncoder(nn.Module):
    """Small transformer over note-level midi/duration/glide
    (ref: variance_encoder.py:90-136)."""

    hidden_size: int = 128
    out_size: int = 256
    enc_layers: int = 4
    enc_ffn_kernel_size: int = 3
    ffn_act: str = "gelu"
    dropout: float = 0.1
    num_heads: int = 2
    use_pos_embed: bool = True
    use_rope: bool = True
    rel_pos: bool = True
    use_glide_embed: bool = False
    num_glide_types: int = 2
    glide_embed_scale: float = 11.313708498984760
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, note_midi, note_rest, note_dur, glide=None, deterministic=True):
        """
        :param note_midi: float [B, T_n] (-1 padding); note_rest: bool [B, T_n]
        :param note_dur: int [B, T_n]; glide: int [B, T_n] (0 none, 1 up, 2 down)
        :return: [B, T_n, out_size]
        """
        H = self.hidden_size
        midi_embed = nn.Dense(H, dtype=self.dtype,
                              kernel_init=nn.initializers.xavier_uniform(),
                              name="note_midi_embed")(note_midi[:, :, None])
        midi_embed = midi_embed * (~note_rest)[:, :, None]
        dur_embed = nn.Dense(H, dtype=self.dtype,
                             kernel_init=nn.initializers.xavier_uniform(),
                             name="note_dur_embed")(note_dur.astype(jnp.float32)[:, :, None])
        extra = dur_embed
        if self.use_glide_embed:
            glide_embed = nn.Embed(
                self.num_glide_types + 1, H,
                embedding_init=normal_embed_init(H, zero_padding_row=True),
                dtype=self.dtype, name="note_glide_embed",
            )(glide)
            extra = extra + glide_embed * self.glide_embed_scale
        out = FastSpeech2Encoder(
            hidden_size=H, num_layers=self.enc_layers,
            ffn_kernel_size=self.enc_ffn_kernel_size, ffn_act=self.ffn_act,
            dropout=self.dropout, num_heads=self.num_heads,
            use_pos_embed=self.use_pos_embed, use_rope=self.use_rope,
            rel_pos=self.rel_pos, dtype=self.dtype, name="encoder",
        )(midi_embed, extra, note_midi < 0, deterministic=deterministic)
        return nn.Dense(self.out_size, dtype=self.dtype,
                        kernel_init=nn.initializers.xavier_uniform(),
                        name="out_proj")(out)
