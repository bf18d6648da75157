"""Toplevel models: acoustic (mel diffusion) and variance (dur/pitch/variances).

Capability parity with ``/root/reference/modules/toplevel.py``.  The linen
modules here are pure networks exposing separable methods (``condition``,
``denoise``, ...); the diffusion math (q-sampling, samplers, spec
normalization) lives in ``models/diffusion/core.py`` and is composed by the
training tasks and inference runners, so the K-step loops stay scan-fused.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.seq import gather_frames
from .aux_decoder import build_aux_decoder
from .backbones import build_backbone
from .common import normal_embed_init
from .fastspeech.acoustic import FastSpeech2Acoustic
from .fastspeech.variance import FastSpeech2Variance, MelodyEncoder

VARIANCE_CHECKLIST = ["energy", "breathiness", "voicing", "tension"]


class AcousticModel(nn.Module):
    """DiffSingerAcoustic equivalent (ref: toplevel.py:32-121).

    category = 'acoustic' (checkpoint stamping).
    """

    fs2: FastSpeech2Acoustic
    backbone: nn.Module
    aux_decoder: Optional[nn.Module] = None

    @property
    def category(self) -> str:
        return "acoustic"

    def condition(
        self, txt_tokens, mel2ph, f0, key_shift=None, speed=None,
        spk_embed_id=None, spk_mix_embed=None, variances=None, deterministic=True,
    ) -> jnp.ndarray:
        return self.fs2(
            txt_tokens, mel2ph, f0, key_shift=key_shift, speed=speed,
            spk_embed_id=spk_embed_id, spk_mix_embed=spk_mix_embed,
            variances=variances, deterministic=deterministic,
        )

    def aux_out(self, condition, deterministic=True) -> jnp.ndarray:
        """Normalized-domain aux mel [B, T, M]."""
        return self.aux_decoder(condition, deterministic=deterministic)

    def denoise(self, x, t, cond, deterministic=True) -> jnp.ndarray:
        """x: [B, F, T, M]; t: [B]; cond: [B, T, H]."""
        return self.backbone(x, t, cond)

    def __call__(self, txt_tokens, mel2ph, f0, x, t, **kwargs):
        """Init-only path touching every submodule."""
        cond = self.condition(txt_tokens, mel2ph, f0, **kwargs)
        aux = self.aux_out(cond) if self.aux_decoder is not None else None
        out = self.denoise(x, t, cond)
        return cond, aux, out

    @staticmethod
    def from_config(cfg, vocab_size: int, dtype=jnp.float32) -> "AcousticModel":
        variance_embeds = tuple(
            v for v in VARIANCE_CHECKLIST if cfg.get(f"use_{v}_embed", False)
        )
        fs2 = FastSpeech2Acoustic(
            vocab_size=vocab_size,
            hidden_size=cfg.get("hidden_size", 256),
            enc_layers=cfg.get("enc_layers", 4),
            enc_ffn_kernel_size=cfg.get("enc_ffn_kernel_size", 9),
            ffn_act=cfg.get("ffn_act", "gelu"),
            dropout=cfg.get("dropout", 0.1),
            num_heads=cfg.get("num_heads", 2),
            use_pos_embed=cfg.get("use_pos_embed", True),
            use_rope=cfg.get("use_rope", False),
            rel_pos=cfg.get("rel_pos", False),
            variance_embeds=variance_embeds,
            use_key_shift_embed=cfg.get("use_key_shift_embed", False),
            use_speed_embed=cfg.get("use_speed_embed", False),
            use_spk_id=cfg.get("use_spk_id", False),
            num_spk=cfg.get("num_spk", 1),
            f0_embed_type=cfg.get("f0_embed_type", "continuous"),
            dtype=dtype,
            name="fs2",
        )
        from ..compat import get_backbone_args, get_backbone_type

        backbone_type = get_backbone_type(cfg)
        backbone = build_backbone(
            out_dims=cfg["audio_num_mel_bins"], num_feats=1,
            backbone_type=backbone_type,
            backbone_args=get_backbone_args(cfg, backbone_type) or {},
            cond_dims=cfg.get("hidden_size", 256), dtype=dtype,
        )
        aux = None
        if cfg.get("use_shallow_diffusion", False):
            shallow = cfg.get("shallow_diffusion_args", {})
            aux = build_aux_decoder(
                out_dims=cfg["audio_num_mel_bins"],
                arch=shallow.get("aux_decoder_arch", "convnext"),
                args=shallow.get("aux_decoder_args", {}),
                dtype=dtype,
            )
        return AcousticModel(fs2=fs2, backbone=backbone, aux_decoder=aux)


class VarianceModel(nn.Module):
    """DiffSingerVariance equivalent (ref: toplevel.py:124-306).

    category = 'variance'.
    """

    fs2: FastSpeech2Variance
    pitch_backbone: Optional[nn.Module] = None
    variance_backbone: Optional[nn.Module] = None
    melody_encoder: Optional[nn.Module] = None
    variance_prediction_list: Tuple[str, ...] = ()
    hidden_size: int = 256
    use_spk_id: bool = False
    num_spk: int = 1
    use_melody_encoder: bool = False
    predict_pitch: bool = True
    dtype: jnp.dtype = jnp.float32

    @property
    def category(self) -> str:
        return "variance"

    @property
    def predict_variances(self) -> bool:
        return len(self.variance_prediction_list) > 0

    def setup(self):
        H = self.hidden_size
        dense = lambda name: nn.Dense(
            H, dtype=self.dtype, kernel_init=nn.initializers.xavier_uniform(), name=name
        )
        if self.use_spk_id:
            self._spk_embed = nn.Embed(
                self.num_spk, H, embedding_init=normal_embed_init(H), dtype=self.dtype,
                name="spk_embed",
            )
        if self.predict_pitch:
            self._pitch_retake_embed = nn.Embed(
                2, H, embedding_init=normal_embed_init(H), dtype=self.dtype,
                name="pitch_retake_embed",
            )
            if self.use_melody_encoder:
                self._delta_pitch_embed = dense("delta_pitch_embed")
            else:
                self._base_pitch_embed = dense("base_pitch_embed")
        if self.variance_prediction_list:
            self._var_pitch_embed = dense("pitch_embed")
            self._variance_embeds = {
                v_name: dense(f"variance_embed_{v_name}")
                for v_name in self.variance_prediction_list
            }

    def spk_embed_of(self, spk_id):
        return self._spk_embed(spk_id)[:, None, :]

    def encode(
        self, txt_tokens, midi, ph2word, ph_dur=None, word_dur=None,
        spk_id=None, ph_spk_mix_embed=None, infer=True, deterministic=True,
    ):
        """-> (encoder_out [B, T_ph, H], dur_pred [B, T_ph] or None)."""
        if self.use_spk_id:
            if ph_spk_mix_embed is not None:
                ph_spk_embed = ph_spk_mix_embed
            else:
                ph_spk_embed = self.spk_embed_of(spk_id)
        else:
            ph_spk_embed = None
        encoder_out, dur_pred = self.fs2(
            txt_tokens, midi=midi, ph2word=ph2word, ph_dur=ph_dur, word_dur=word_dur,
            spk_embed=ph_spk_embed, infer=infer, deterministic=deterministic,
        )
        return encoder_out, dur_pred

    def frame_condition(
        self, encoder_out, mel2ph, spk_id=None, spk_mix_embed=None,
    ) -> jnp.ndarray:
        """Gather token states to frame level + speaker embedding."""
        condition = gather_frames(encoder_out, mel2ph)
        if self.use_spk_id:
            spk = spk_mix_embed if spk_mix_embed is not None else self.spk_embed_of(spk_id)
            condition = condition + spk
        return condition

    def pitch_condition(
        self, condition, mel2ph, base_pitch, pitch=None,
        pitch_retake=None, pitch_expr=None,
        note_midi=None, note_rest=None, note_dur=None, note_glide=None, mel2note=None,
        deterministic=True,
    ) -> jnp.ndarray:
        """Build the pitch-diffusion condition with retake/expressiveness logic
        (ref: toplevel.py:236-275)."""
        pitch_cond = condition
        if self.use_melody_encoder:
            mel_enc_out = self.melody_encoder(
                note_midi, note_rest, note_dur, glide=note_glide,
                deterministic=deterministic,
            )
            pitch_cond = pitch_cond + gather_frames(mel_enc_out, mel2note)

        retake_unset = pitch_retake is None
        if retake_unset:
            pitch_retake = jnp.ones_like(mel2ph, dtype=bool)

        retake_embed_table = self._pitch_retake_embed
        if pitch_expr is None:
            pitch_retake_embed = retake_embed_table(pitch_retake.astype(jnp.int32))
        else:
            retake_true = retake_embed_table(jnp.ones((1, 1), jnp.int32))
            retake_false = retake_embed_table(jnp.zeros((1, 1), jnp.int32))
            expr = (pitch_expr * pitch_retake)[:, :, None]
            pitch_retake_embed = expr * retake_true + (1.0 - expr) * retake_false
        pitch_cond = pitch_cond + pitch_retake_embed

        if self.use_melody_encoder:
            if retake_unset:
                delta_pitch_in = jnp.zeros_like(base_pitch)
            else:
                delta_pitch_in = (pitch - base_pitch) * ~pitch_retake
            pitch_cond = pitch_cond + self._delta_pitch_embed(delta_pitch_in[:, :, None])
        else:
            if not retake_unset:
                base_pitch = base_pitch * pitch_retake + pitch * ~pitch_retake
            pitch_cond = pitch_cond + self._base_pitch_embed(base_pitch[:, :, None])
        return pitch_cond

    def variance_condition(
        self, condition, pitch, variances: Dict[str, jnp.ndarray],
        variance_retake: Optional[Dict[str, jnp.ndarray]] = None,
    ) -> jnp.ndarray:
        """Condition for the multi-variance head (ref: toplevel.py:284-297)."""
        var_cond = condition + self._var_pitch_embed(pitch[:, :, None])
        if variance_retake is not None:
            for v_name in self.variance_prediction_list:
                emb = self._variance_embeds[v_name](variances[v_name][:, :, None])
                var_cond = var_cond + emb * (~variance_retake[v_name])[:, :, None]
        return var_cond

    def denoise_pitch(self, x, t, cond) -> jnp.ndarray:
        return self.pitch_backbone(x, t, cond)

    def denoise_variance(self, x, t, cond) -> jnp.ndarray:
        return self.variance_backbone(x, t, cond)

    def __call__(
        self, txt_tokens, midi, ph2word, ph_dur, base_pitch, pitch, mel2ph,
        x_pitch=None, t=None, x_var=None, variances=None,
        note_midi=None, note_rest=None, note_dur=None, note_glide=None, mel2note=None,
        spk_id=None,
    ):
        """Init-only path touching every submodule."""
        encoder_out, dur_pred = self.encode(
            txt_tokens, midi, ph2word, ph_dur=ph_dur, spk_id=spk_id, infer=False
        )
        condition = self.frame_condition(encoder_out, mel2ph, spk_id=spk_id)
        outs = [dur_pred]
        if self.predict_pitch:
            pc = self.pitch_condition(
                condition, mel2ph, base_pitch, pitch=pitch,
                note_midi=note_midi, note_rest=note_rest, note_dur=note_dur,
                note_glide=note_glide, mel2note=mel2note,
            )
            outs.append(self.denoise_pitch(x_pitch, t, pc))
        if self.predict_variances:
            vc = self.variance_condition(
                condition, pitch, variances or {},
                variance_retake={
                    v: jnp.zeros_like(mel2ph, dtype=bool)
                    for v in self.variance_prediction_list
                },
            )
            outs.append(self.denoise_variance(x_var, t, vc))
        return outs

    @staticmethod
    def from_config(cfg, vocab_size: int, dtype=jnp.float32) -> "VarianceModel":
        hidden = cfg.get("hidden_size", 256)
        dur_args = cfg.get("dur_prediction_args", {})
        fs2 = FastSpeech2Variance(
            vocab_size=vocab_size, hidden_size=hidden,
            enc_layers=cfg.get("enc_layers", 4),
            enc_ffn_kernel_size=cfg.get("enc_ffn_kernel_size", 9),
            ffn_act=cfg.get("ffn_act", "gelu"),
            dropout=cfg.get("dropout", 0.1),
            num_heads=cfg.get("num_heads", 2),
            use_pos_embed=cfg.get("use_pos_embed", True),
            use_rope=cfg.get("use_rope", False),
            rel_pos=cfg.get("rel_pos", False),
            predict_dur=cfg.get("predict_dur", True),
            dur_hidden_size=dur_args.get("hidden_size", 512),
            dur_num_layers=dur_args.get("num_layers", 5),
            dur_kernel_size=dur_args.get("kernel_size", 3),
            dur_dropout=dur_args.get("dropout", 0.1),
            dur_log_offset=dur_args.get("log_offset", 1.0),
            dtype=dtype, name="fs2",
        )
        predict_pitch = cfg.get("predict_pitch", True)
        pitch_backbone = None
        melody_encoder = None
        if predict_pitch:
            from ..compat import get_backbone_args, get_backbone_type

            pargs = cfg.get("pitch_prediction_args", {})
            pbt = get_backbone_type(cfg, pargs)
            pitch_backbone = build_backbone(
                out_dims=pargs.get("repeat_bins", 64), num_feats=1,
                backbone_type=pbt,
                backbone_args=get_backbone_args(pargs, pbt) or {},
                cond_dims=hidden, dtype=dtype,
            )
            if cfg.get("use_melody_encoder", False):
                margs = cfg.get("melody_encoder_args", {})

                def _menc(key, default):
                    # melody_encoder_args overrides, falling back to the
                    # top-level key (ref: variance_encoder.py:94-95 get_hparam)
                    return margs.get(key, cfg.get(key, default))

                melody_encoder = MelodyEncoder(
                    hidden_size=_menc("hidden_size", 256),
                    out_size=hidden,
                    enc_layers=_menc("enc_layers", 4),
                    enc_ffn_kernel_size=_menc("enc_ffn_kernel_size", 9),
                    ffn_act=_menc("ffn_act", "gelu"),
                    dropout=_menc("dropout", 0.1),
                    num_heads=_menc("num_heads", 2),
                    use_pos_embed=_menc("use_pos_embed", True),
                    use_rope=_menc("use_rope", False),
                    rel_pos=_menc("rel_pos", False),
                    use_glide_embed=cfg.get("use_glide_embed", False),
                    num_glide_types=len(cfg.get("glide_types", ["up", "down"])),
                    glide_embed_scale=cfg.get("glide_embed_scale", 11.313708498984760),
                    dtype=dtype, name="melody_encoder",
                )
        prediction_list = tuple(
            v for v in VARIANCE_CHECKLIST if cfg.get(f"predict_{v}", False)
        )
        variance_backbone = None
        if prediction_list:
            from ..compat import get_backbone_args, get_backbone_type

            vargs = cfg.get("variances_prediction_args", {})
            total_bins = vargs.get("total_repeat_bins", 48)
            assert total_bins % len(prediction_list) == 0
            vbt = get_backbone_type(cfg, vargs)
            variance_backbone = build_backbone(
                out_dims=total_bins // len(prediction_list),
                num_feats=len(prediction_list),
                backbone_type=vbt,
                backbone_args=get_backbone_args(vargs, vbt) or {},
                cond_dims=hidden, dtype=dtype,
            )
        return VarianceModel(
            fs2=fs2, pitch_backbone=pitch_backbone, variance_backbone=variance_backbone,
            melody_encoder=melody_encoder, variance_prediction_list=prediction_list,
            hidden_size=hidden, use_spk_id=cfg.get("use_spk_id", False),
            num_spk=cfg.get("num_spk", 1),
            use_melody_encoder=cfg.get("use_melody_encoder", False),
            predict_pitch=predict_pitch, dtype=dtype,
        )


def build_variance_normalizers(cfg):
    """SpecNormalizers for the pitch and multi-variance heads
    (ranges/clamps parity: param_adaptor.py:31-86, toplevel.py:157-179)."""
    from .diffusion.core import SpecNormalizer

    out = {}
    if cfg.get("predict_pitch", True):
        p = cfg.get("pitch_prediction_args", {})
        out["pitch"] = SpecNormalizer(
            spec_min=[p.get("pitd_norm_min", -8.0)],
            spec_max=[p.get("pitd_norm_max", 8.0)],
            num_feats=1,
            repeat_bins=p.get("repeat_bins", 64),
            clamps=[(p.get("pitd_clip_min", -12.0), p.get("pitd_clip_max", 12.0))],
        )
    prediction_list = [v for v in VARIANCE_CHECKLIST if cfg.get(f"predict_{v}", False)]
    if prediction_list:
        ranges, clamps = [], []
        for v in prediction_list:
            if v == "tension":
                lo, hi = cfg.get("tension_logit_min", -10.0), cfg.get("tension_logit_max", 10.0)
                ranges.append((lo, hi))
                clamps.append((lo, hi))
            else:
                lo, hi = cfg.get(f"{v}_db_min", -96.0), cfg.get(f"{v}_db_max", -12.0)
                ranges.append((lo, hi))
                clamps.append((lo, 0.0))
        vargs = cfg.get("variances_prediction_args", {})
        total_bins = vargs.get("total_repeat_bins", 48)
        out["variances"] = SpecNormalizer(
            spec_min=[r[0] for r in ranges],
            spec_max=[r[1] for r in ranges],
            num_feats=len(prediction_list),
            repeat_bins=total_bins // len(prediction_list),
            clamps=clamps,
        )
    return out
