"""Acoustic-model linguistic encoder.

Capability parity with ``/root/reference/modules/fastspeech/acoustic_encoder.py``:
token + duration embeddings -> transformer encoder -> frame-level gather by
``mel2ph`` -> additive speaker / pitch / variance / key-shift / speed
embeddings, producing the diffusion condition [B, T_frames, H].
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ...ops.seq import gather_frames, mel2ph_to_dur
from ..common import normal_embed_init
from .encoder import FastSpeech2Encoder

# legacy coarse-f0 quantization (ref: deployment/modules/fastspeech2.py:14-28)
# plain-python constants: importing a model module must NOT init the backend
_F0_BIN = 256
_F0_MEL_MIN = 1127.0 * math.log(1.0 + 50.0 / 700.0)
_F0_MEL_MAX = 1127.0 * math.log(1.0 + 1100.0 / 700.0)


def f0_to_coarse(f0: jnp.ndarray) -> jnp.ndarray:
    """Quantize f0 (Hz) into the legacy 256-bin coarse mel scale."""
    f0_mel = 1127.0 * jnp.log(1.0 + f0 / 700.0)
    a = (_F0_BIN - 2) / (_F0_MEL_MAX - _F0_MEL_MIN)
    b = _F0_MEL_MIN * a - 1.0
    f0_mel = jnp.where(f0_mel > 0, f0_mel * a - b, f0_mel)
    f0_mel = jnp.clip(f0_mel, 1.0, float(_F0_BIN - 1))
    return jnp.round(f0_mel).astype(jnp.int32)


class FastSpeech2Acoustic(nn.Module):
    vocab_size: int
    hidden_size: int = 256
    enc_layers: int = 4
    enc_ffn_kernel_size: int = 9
    ffn_act: str = "gelu"
    dropout: float = 0.1
    num_heads: int = 2
    use_pos_embed: bool = True
    use_rope: bool = True
    rel_pos: bool = True
    variance_embeds: Tuple[str, ...] = ()  # subset of (energy, breathiness, voicing, tension)
    use_key_shift_embed: bool = False
    use_speed_embed: bool = False
    use_spk_id: bool = False
    num_spk: int = 1
    f0_embed_type: str = "continuous"  # legacy ckpts: "discrete" (coarse bins)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        txt_tokens: jnp.ndarray,  # int [B, T_txt]
        mel2ph: jnp.ndarray,  # int [B, T_frames]
        f0: jnp.ndarray,  # float [B, T_frames]
        key_shift: Optional[jnp.ndarray] = None,
        speed: Optional[jnp.ndarray] = None,
        spk_embed_id: Optional[jnp.ndarray] = None,  # int [B]
        spk_mix_embed: Optional[jnp.ndarray] = None,  # [B, T|1, H]
        variances: Optional[dict] = None,  # name -> [B, T_frames]
        deterministic: bool = True,
    ) -> jnp.ndarray:
        H = self.hidden_size
        dense = lambda name: nn.Dense(
            H, dtype=self.dtype, kernel_init=nn.initializers.xavier_uniform(), name=name
        )
        txt_embed = nn.Embed(
            self.vocab_size, H,
            embedding_init=normal_embed_init(H, zero_padding_row=True),
            dtype=self.dtype, name="txt_embed",
        )(txt_tokens)
        dur = mel2ph_to_dur(mel2ph, txt_tokens.shape[1]).astype(jnp.float32)
        dur_embed = dense("dur_embed")(dur[:, :, None])
        encoder_out = FastSpeech2Encoder(
            hidden_size=H, num_layers=self.enc_layers,
            ffn_kernel_size=self.enc_ffn_kernel_size, ffn_act=self.ffn_act,
            dropout=self.dropout, num_heads=self.num_heads,
            use_pos_embed=self.use_pos_embed, use_rope=self.use_rope,
            rel_pos=self.rel_pos, dtype=self.dtype, name="encoder",
        )(txt_embed, dur_embed, txt_tokens == 0, deterministic=deterministic)

        condition = gather_frames(encoder_out, mel2ph)  # [B, T_frames, H]

        if self.use_spk_id:
            if spk_mix_embed is not None:
                spk = spk_mix_embed
            else:
                spk = nn.Embed(
                    self.num_spk, H, embedding_init=normal_embed_init(H), dtype=self.dtype,
                    name="spk_embed",
                )(spk_embed_id)[:, None, :]
            condition = condition + spk

        # mel-scale pitch embedding (ref: acoustic_encoder.py:101-103); legacy
        # checkpoints use a 256-bin coarse embedding table instead
        # (ref: deployment/modules/fastspeech2.py:48-72)
        if self.f0_embed_type == "discrete":
            condition = condition + nn.Embed(
                _F0_BIN, H, embedding_init=normal_embed_init(H),
                dtype=self.dtype, name="pitch_embed",
            )(f0_to_coarse(f0))
        else:
            f0_mel = jnp.log(1.0 + f0 / 700.0)
            condition = condition + dense("pitch_embed")(f0_mel[:, :, None])

        for v_name in self.variance_embeds:
            v = variances[v_name]
            condition = condition + dense(f"variance_embed_{v_name}")(v[:, :, None])
        if self.use_key_shift_embed:
            condition = condition + dense("key_shift_embed")(key_shift[:, :, None])
        if self.use_speed_embed:
            condition = condition + dense("speed_embed")(speed[:, :, None])
        return condition
