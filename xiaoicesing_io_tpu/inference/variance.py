"""Variance inference: score -> duration / pitch / variance curves -> .ds.

Capability parity with ``/root/reference/inference/ds_variance.py``:
``preprocess_input`` (ph2word from ph_num, note arrays with nearest-rest
interpolation, mel2note, word_dur from ph_dur or note-slur grouping,
smoothed base_pitch, phoneme-level MIDI by scatter averaging),
auto-completion per-segment predictor flags, rhythm-regulated durations,
expressiveness curves, and writing predictions back into the .ds JSON.
"""

from __future__ import annotations

import copy
import json
from collections import OrderedDict
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models.diffusion.core import GaussianDiffusion, RectifiedFlow
from ..models.toplevel import VarianceModel, VARIANCE_CHECKLIST, build_variance_normalizers
from ..models.diffusion.schedule import DiffusionSchedule
from ..ops.seq import length_regulator, mel2ph_to_dur, rhythm_regulator
from ..training.checkpoint import load_params_for_inference
from ..utils import fresh_seed
from ..utils.curves import interp_f0, resample_align_curve, smooth_curve
from ..utils.music import hz_to_midi, midi_to_hz, note_to_midi
from ..utils.phonemes import PhonemeDictionary, locate_dictionary
from ..utils.text_encoder import TokenTextEncoder
from .base import BaseSVSInfer


def _lr_np(dur: np.ndarray, out_len: Optional[int] = None) -> np.ndarray:
    total = int(dur.sum(axis=1).max())
    out_len = total if out_len is None else out_len
    return np.asarray(length_regulator(jnp.asarray(dur), out_len=out_len))


def build_variance_cores(cfg):
    diffusion_type = cfg.get("diffusion_type", "ddpm")
    if diffusion_type == "ddpm":
        schedule = DiffusionSchedule.create(
            cfg.get("schedule_type", "linear"), cfg.get("timesteps", 1000)
        )
        core = GaussianDiffusion(
            schedule=schedule, timesteps=cfg.get("timesteps", 1000),
            k_step=cfg.get("timesteps", 1000),
        )
    else:
        core = RectifiedFlow(t_start=0.0, time_scale_factor=cfg.get("time_scale_factor", 1000))
    return core


class DiffSingerVarianceInfer(BaseSVSInfer):
    def __init__(self, cfg: Config, predictions: Optional[set] = None, ckpt_steps=None):
        super().__init__(cfg)
        predictions = predictions or set()
        phdict = PhonemeDictionary.load(
            locate_dictionary(cfg.get("dictionary"), cfg.get("work_dir"))
        )
        self.ph_encoder = TokenTextEncoder(phdict.phoneme_list)
        self.model = VarianceModel.from_config(cfg, self.ph_encoder.vocab_size)
        self.params = load_params_for_inference(cfg["work_dir"], cfg, ckpt_steps)
        self.core = build_variance_cores(cfg)
        self.normalizers = build_variance_normalizers(cfg)
        self.smooth_width = round(cfg["midi_smooth_width"] / self.timestep)

        glide_types = cfg.get("glide_types", [])
        assert "none" not in glide_types, (
            "Type name 'none' is reserved and should not appear in glide_types."
        )
        self.glide_map = {"none": 0, **{t: i + 1 for i, t in enumerate(glide_types)}}

        self._jitted: Dict[Tuple[bool, bool, bool], callable] = {}
        self.auto_completion_mode = len(predictions) == 0
        self.global_predict_dur = "dur" in predictions and cfg["predict_dur"]
        self.global_predict_pitch = "pitch" in predictions and cfg["predict_pitch"]
        self.variance_prediction_set = predictions.intersection(VARIANCE_CHECKLIST)
        self.global_predict_variances = len(self.variance_prediction_set) > 0

    # -- preprocessing (parity: ds_variance.py:85-272) ----------------------

    def preprocess_input(self, param, idx=0, load_dur=False, load_pitch=False):
        cfg = self.cfg
        batch: Dict[str, np.ndarray] = {}
        summary = OrderedDict()
        tokens = np.asarray([self.ph_encoder.encode(param["ph_seq"].split())], np.int32)
        T_ph = tokens.shape[1]
        batch["tokens"] = tokens
        ph_num = np.asarray([param["ph_num"].split()], np.int64)
        ph2word = _lr_np(ph_num)[:, :T_ph]
        if ph2word.shape[1] < T_ph:
            ph2word = np.pad(ph2word, [(0, 0), (0, T_ph - ph2word.shape[1])])
        T_w = int(ph2word.max())
        batch["ph2word"] = ph2word

        note_midi = np.array(
            [note_to_midi(n, round_midi=False) if n != "rest" else -1
             for n in param["note_seq"].split()],
            dtype=np.float32,
        )
        note_rest = note_midi < 0
        if np.all(note_rest):
            note_midi = np.full_like(note_midi, 60.0)
        else:
            # nearest-neighbor interpolation over rests (ds_variance.py:117-122)
            idx_known = np.where(~note_rest)[0]
            idx_rest = np.where(note_rest)[0]
            nearest = idx_known[
                np.abs(idx_rest[:, None] - idx_known[None, :]).argmin(axis=1)
            ]
            note_midi[idx_rest] = note_midi[nearest]
        T_n = len(note_midi)

        note_dur_sec = np.asarray([param["note_dur"].split()], np.float32)
        note_acc = np.round(np.cumsum(note_dur_sec, axis=1) / self.timestep + 0.5).astype(
            np.int64
        )
        note_dur = np.diff(note_acc, axis=1, prepend=0)
        mel2note = _lr_np(note_dur)
        T_s = mel2note.shape[1]

        summary["words"] = T_w
        summary["notes"] = T_n
        summary["tokens"] = T_ph
        summary["frames"] = T_s
        summary["seconds"] = "%.2f" % (T_s * self.timestep)

        if cfg.get("use_spk_id", False):
            ph_spk_mix_id, ph_spk_mix_value = self.load_speaker_mix(
                param, summary, mix_mode="token", mix_length=T_ph
            )
            spk_mix_id, spk_mix_value = self.load_speaker_mix(
                param, summary, mix_mode="frame", mix_length=T_s
            )
            batch["ph_spk_mix_id"] = ph_spk_mix_id
            batch["ph_spk_mix_value"] = ph_spk_mix_value
            batch["spk_mix_id"] = spk_mix_id
            batch["spk_mix_value"] = spk_mix_value

        if load_dur:
            ph_dur_sec = np.asarray([param["ph_dur"].split()], np.float32)
            ph_acc = np.round(np.cumsum(ph_dur_sec, axis=1) / self.timestep + 0.5).astype(
                np.int64
            )
            ph_dur = np.diff(ph_acc, axis=1, prepend=0) * (tokens != 0)
            mel2ph = _lr_np(ph_dur)
            if mel2ph.shape[1] != T_s:
                if mel2ph.shape[1] < T_s:
                    mel2ph = np.pad(mel2ph, [(0, 0), (0, T_s - mel2ph.shape[1])],
                                    mode="edge")
                else:
                    mel2ph = mel2ph[:, :T_s]
                ph_dur = np.asarray(mel2ph_to_dur(jnp.asarray(mel2ph), T_ph))
            word_dur = np.zeros((1, T_w + 1), np.int64)
            np.add.at(word_dur[0], ph2word[0], ph_dur[0])
            word_dur = word_dur[:, 1:]
        else:
            ph_dur = None
            mel2ph = None
            is_slur = np.asarray([[int(s) for s in param["note_slur"].split()]], bool)
            note2word = np.cumsum(~is_slur, axis=1)
            word_dur = np.zeros((1, T_w + 1), np.int64)
            np.add.at(word_dur[0], note2word[0], note_dur[0])
            word_dur = word_dur[:, 1:]

        batch["ph_dur"] = ph_dur
        batch["mel2ph"] = mel2ph

        mel2word = _lr_np(word_dur)
        if mel2word.shape[1] != T_s:
            if mel2word.shape[1] < T_s:
                mel2word = np.pad(mel2word, [(0, 0), (0, T_s - mel2word.shape[1])],
                                  mode="edge")
            else:
                mel2word = mel2word[:, :T_s]
            word_dur = np.asarray(mel2ph_to_dur(jnp.asarray(mel2word), T_w))
        batch["word_dur"] = word_dur

        batch["note_midi"] = note_midi[None]
        batch["note_dur"] = note_dur
        batch["note_rest"] = note_rest[None]
        if cfg.get("use_glide_embed", False) and param.get("note_glide") is not None:
            batch["note_glide"] = np.asarray(
                [[self.glide_map.get(x, 0) for x in param["note_glide"].split()]],
                np.int32,
            )
        else:
            batch["note_glide"] = np.zeros((1, T_n), np.int32)
        batch["mel2note"] = mel2note

        # smoothed frame-level MIDI step curve (ds_variance.py:196-201)
        frame_midi = np.take(np.pad(note_midi, (1, 0)), mel2note[0])
        base_pitch = smooth_curve(frame_midi.astype(np.float32), self.smooth_width)
        batch["base_pitch"] = base_pitch[None]

        if ph_dur is not None:
            # phoneme-level mean MIDI (ds_variance.py:203-208)
            mel2pdur = np.take(np.pad(ph_dur[0], (1, 0), constant_values=1), mel2ph[0])
            ph_midi = np.zeros(T_ph + 1, np.float32)
            np.add.at(ph_midi, mel2ph[0], frame_midi / mel2pdur)
            ph_midi = ph_midi[1:]
        else:
            mel2wdur = np.take(np.pad(word_dur[0], (1, 0), constant_values=1), mel2word[0])
            w_midi = np.zeros(T_w + 1, np.float32)
            np.add.at(w_midi, mel2word[0], frame_midi / mel2wdur)
            w_midi = w_midi[1:]
            ph_midi = np.take(np.pad(w_midi, (1, 0)), ph2word[0])
        batch["midi"] = np.round(ph_midi).astype(np.int32)[None]

        if load_pitch:
            f0 = resample_align_curve(
                np.array(param["f0_seq"].split(), np.float32),
                original_timestep=float(param["f0_timestep"]),
                target_timestep=self.timestep,
                align_length=T_s,
            )
            batch["pitch"] = hz_to_midi(interp_f0(f0)[0]).astype(np.float32)[None]

        if cfg["predict_dur"]:
            summary["ph_dur"] = (
                "manual" if load_dur
                else "auto" if self.auto_completion_mode or self.global_predict_dur
                else "ignored"
            )
        if cfg["predict_pitch"]:
            if load_pitch:
                summary["pitch"] = "manual"
            elif self.auto_completion_mode or self.global_predict_pitch:
                summary["pitch"] = "auto"
                expr = param.get("expr", 1.0)
                if isinstance(expr, (int, float, bool)):
                    summary["expr"] = f"static({expr:.3f})"
                    batch["expr"] = np.full((1, T_s), expr, np.float32)
                else:
                    summary["expr"] = "dynamic"
                    batch["expr"] = resample_align_curve(
                        np.array(expr.split(), np.float32),
                        original_timestep=float(param["expr_timestep"]),
                        target_timestep=self.timestep,
                        align_length=T_s,
                    )[None]
            else:
                summary["pitch"] = "ignored"
        for v_name in self.model.variance_prediction_list:
            if (self.auto_completion_mode and param.get(v_name) is None) \
                    or v_name in self.variance_prediction_set:
                summary[v_name] = "auto"
            else:
                summary[v_name] = "ignored"

        print(f"[{idx}]\t" + ", ".join(f"{k}: {v}" for k, v in summary.items()))
        return batch

    # -- model forward (parity: ds_variance.py:274-318, toplevel.py:197-306) -

    @staticmethod
    def _pad_batch(batch, fb: int = 256, tb: int = 32):
        """Pad to shape buckets so jitted programs are reused across segments
        (frames -> multiples of fb, tokens/notes -> multiples of tb)."""
        up = lambda n, m: ((n + m - 1) // m) * m
        T_s = batch["mel2note"].shape[1] if batch.get("mel2note") is not None \
            else batch["mel2ph"].shape[1]
        T_ph = batch["tokens"].shape[1]
        out = dict(batch)
        pads = {
            # frame-level
            "mel2ph": 0, "mel2note": 0, "base_pitch": "edge", "pitch": "edge",
            "expr": "edge", "spk_mix_value": "edge",
        }
        for k in ("tokens", "ph2word", "midi", "ph_dur"):
            v = batch.get(k)
            if v is not None and v.shape[1] == T_ph:
                out[k] = np.pad(v, [(0, 0), (0, up(T_ph, tb) - T_ph)])
        v = batch.get("ph_spk_mix_value")  # dynamic token-level mix [1, T_ph, N]
        if v is not None and v.ndim == 3 and v.shape[1] == T_ph and T_ph > 1:
            out["ph_spk_mix_value"] = np.pad(
                v, [(0, 0), (0, up(T_ph, tb) - T_ph), (0, 0)], mode="edge"
            )
        for k, mode in pads.items():
            v = batch.get(k)
            if v is not None and v.ndim >= 2 and v.shape[1] == T_s:
                pad = [(0, 0), (0, up(T_s, fb) - T_s)] + [(0, 0)] * (v.ndim - 2)
                out[k] = np.pad(v, pad, mode="edge" if mode == "edge" else "constant")
        for k in ("note_midi", "note_dur", "note_rest", "note_glide"):
            v = batch.get(k)
            if v is not None:
                T_n = v.shape[1]
                pad = [(0, 0), (0, up(T_n, tb) - T_n)]
                if k == "note_midi":
                    out[k] = np.pad(v, pad, constant_values=-1.0)
                elif k == "note_rest":
                    out[k] = np.pad(v, pad, constant_values=True)
                else:
                    out[k] = np.pad(v, pad)
        return out, T_s, T_ph

    _JIT_KEYS = (
        "tokens", "ph2word", "word_dur", "midi", "ph_dur", "mel2ph", "mel2note",
        "base_pitch", "pitch", "expr", "note_midi", "note_dur", "note_rest",
        "note_glide", "spk_mix_id", "spk_mix_value", "ph_spk_mix_id",
        "ph_spk_mix_value",
    )

    def forward_model(self, batch, flags: Tuple[bool, bool, bool], seed: int = 0):
        batch, T_s_real, T_ph_real = self._pad_batch(batch)
        fn = self._jitted.get(flags)
        if fn is None:
            # one compiled program per predict-flag combination; the shape
            # buckets from _pad_batch make jit's shape-keyed cache effective
            import functools

            fn = jax.jit(functools.partial(self._forward_padded, flags=flags))
            self._jitted[flags] = fn
        jbatch = {k: batch.get(k) for k in self._JIT_KEYS}
        key = jax.random.PRNGKey(seed & 0xFFFFFFFF)
        dur, pitch, variances = fn(self.params, jbatch, key)
        if dur is not None:
            dur = dur[:, :T_ph_real]
        if pitch is not None:
            pitch = pitch[:, :T_s_real]
        variances = {k: v[:, :T_s_real] for k, v in variances.items()}
        return dur, pitch, variances

    def _forward_padded(self, params, batch, key, *, flags: Tuple[bool, bool, bool]):
        predict_dur, predict_pitch, predict_variances = flags
        cfg = self.cfg
        model = self.model

        spk_kwargs = {}
        ph_spk_mix_embed = spk_mix_embed = None
        if cfg.get("use_spk_id", False):
            table = jnp.asarray(params["params"]["spk_embed"]["embedding"])
            ph_spk_mix_embed = jnp.sum(
                jnp.take(table, batch["ph_spk_mix_id"], axis=0)
                * batch["ph_spk_mix_value"][..., None],
                axis=2,
            )
            spk_mix_embed = jnp.sum(
                jnp.take(table, batch["spk_mix_id"], axis=0)
                * batch["spk_mix_value"][..., None],
                axis=2,
            )

        tokens = jnp.asarray(batch["tokens"])
        ph2word = jnp.asarray(batch["ph2word"])
        word_dur = jnp.asarray(batch["word_dur"])
        midi = jnp.asarray(batch["midi"])
        T_s = batch["base_pitch"].shape[1]

        encoder_out, dur_pred = model.apply(
            params, tokens, midi, ph2word,
            ph_dur=None if batch["ph_dur"] is None else jnp.asarray(batch["ph_dur"]),
            word_dur=word_dur, ph_spk_mix_embed=ph_spk_mix_embed, infer=True,
            method=VarianceModel.encode,
        )
        dur_pred_out = dur_pred if predict_dur else None
        if not predict_pitch and not predict_variances:
            # rhythm-align even on the dur-only path (ds_variance.py:314-315
            # applies rr unconditionally before returning)
            if dur_pred_out is not None:
                dur_pred_out = rhythm_regulator(dur_pred_out, ph2word, word_dur)
            return dur_pred_out, None, {}

        if batch["mel2ph"] is None:
            dur_align = rhythm_regulator(dur_pred, ph2word, word_dur)
            mel2ph = length_regulator(dur_align, out_len=T_s)
        else:
            mel2ph = jnp.asarray(batch["mel2ph"])

        condition = model.apply(
            params, encoder_out, mel2ph, spk_mix_embed=spk_mix_embed,
            method=VarianceModel.frame_condition,
        )

        base_pitch = jnp.asarray(batch["base_pitch"])
        pitch = jnp.asarray(batch["pitch"]) if batch.get("pitch") is not None else None
        pitch_pred_out = None
        if predict_pitch:
            pitch_cond = model.apply(
                params, condition, mel2ph, base_pitch,
                pitch_expr=jnp.asarray(batch["expr"])
                if batch.get("expr") is not None else None,
                note_midi=jnp.asarray(batch["note_midi"]),
                note_rest=jnp.asarray(batch["note_rest"]),
                note_dur=jnp.asarray(batch["note_dur"]),
                note_glide=jnp.asarray(batch["note_glide"]),
                mel2note=jnp.asarray(batch["mel2note"]),
                method=VarianceModel.pitch_condition,
            )
            pn = self.normalizers["pitch"]
            pargs = cfg.get("pitch_prediction_args", {})
            shape = (1, 1, T_s, pargs.get("repeat_bins", 64))

            def denoise(x, t):
                return model.apply(params, x, t, pitch_cond,
                                   method=VarianceModel.denoise_pitch)

            x = self._sample(denoise, key, shape)
            pitch_pred_out = pn.denorm(x)

        variances_out = {}
        if predict_variances:
            if pitch is None:
                pitch = base_pitch + pitch_pred_out
            var_cond = model.apply(
                params, condition, pitch, {},
                method=VarianceModel.variance_condition,
            )
            vn = self.normalizers["variances"]
            vargs = cfg.get("variances_prediction_args", {})
            n_feats = len(self.model.variance_prediction_list)
            shape = (1, n_feats, T_s, vargs.get("total_repeat_bins", 48) // n_feats)

            def denoise_v(x, t):
                return model.apply(params, x, t, var_cond,
                                   method=VarianceModel.denoise_variance)

            key2 = jax.random.fold_in(key, 1)
            x = self._sample(denoise_v, key2, shape)
            out = vn.denorm(x)
            if n_feats == 1:
                out = [out]
            variances_out = dict(zip(self.model.variance_prediction_list, out))

        # rhythm-align predicted durations (ds_variance.py:314-315)
        if dur_pred_out is not None:
            dur_pred_out = rhythm_regulator(dur_pred_out, ph2word, word_dur)
        if pitch_pred_out is not None:
            pitch_pred_out = base_pitch + pitch_pred_out
        return dur_pred_out, pitch_pred_out, variances_out

    def _sample(self, denoise_fn, key, shape):
        cfg = self.cfg
        if isinstance(self.core, GaussianDiffusion):
            return self.core.inference(
                denoise_fn, key, shape,
                depth=cfg.get("K_step_infer", self.core.k_step),
                speedup=cfg.get("diff_speedup", 10),
                algorithm=cfg.get("diff_accelerator", "ddim"),
            )
        return self.core.inference(
            denoise_fn, key, shape, t_start=0.0,
            steps=cfg.get("sampling_steps", 20),
            algorithm=cfg.get("sampling_algorithm", "euler"),
        )

    # -- driver (parity: ds_variance.py:336-445) ----------------------------

    def segment_flags(self, param) -> Tuple[bool, bool, bool]:
        model = self.model
        cfg = self.cfg
        if self.auto_completion_mode:
            return (
                cfg["predict_dur"] and param.get("ph_dur") is None,
                cfg["predict_pitch"] and param.get("f0_seq") is None,
                model.predict_variances and any(
                    param.get(v) is None for v in model.variance_prediction_list
                ),
            )
        predict_variances = model.predict_variances and self.global_predict_variances
        predict_pitch = cfg["predict_pitch"] and (
            self.global_predict_pitch or (param.get("f0_seq") is None and predict_variances)
        )
        predict_dur = cfg["predict_dur"] and (
            self.global_predict_dur
            or (param.get("ph_dur") is None and (predict_pitch or predict_variances))
        )
        return predict_dur, predict_pitch, predict_variances

    def run_inference(self, params_list: List[dict], out_dir: Path, title: str,
                      num_runs: int = 1, seed: int = -1):
        flags = [self.segment_flags(p) for p in params_list]
        batches = [
            self.preprocess_input(
                p, idx=i,
                load_dur=not f[0] and (f[1] or f[2]),
                load_pitch=not f[1] and f[2],
            )
            for i, (p, f) in enumerate(zip(params_list, flags))
        ]
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        for run in range(num_runs):
            run_seed = seed if seed >= 0 else fresh_seed()
            results = []
            for i, (param, flag, batch) in enumerate(zip(params_list, flags, batches)):
                seg_seed = param.get("seed", run_seed + i)
                dur_pred, pitch_pred, variance_pred = self.forward_model(
                    batch, flag, seed=int(seg_seed)
                )
                out = copy.deepcopy(param)
                if dur_pred is not None and (self.auto_completion_mode or self.global_predict_dur):
                    durs = (np.asarray(dur_pred)[0] * self.timestep).tolist()
                    out["ph_dur"] = " ".join(str(round(d, 6)) for d in durs)
                if pitch_pred is not None and (self.auto_completion_mode or self.global_predict_pitch):
                    f0 = midi_to_hz(np.asarray(pitch_pred)[0])
                    out["f0_seq"] = " ".join(str(round(f, 1)) for f in f0.tolist())
                    out["f0_timestep"] = str(self.timestep)
                keep = {
                    k: v for k, v in variance_pred.items()
                    if (self.auto_completion_mode and param.get(k) is None)
                    or k in self.variance_prediction_set
                }
                for v_name, v in keep.items():
                    out[v_name] = " ".join(str(round(float(x), 4)) for x in np.asarray(v)[0])
                    out[f"{v_name}_timestep"] = str(self.timestep)
                results.append(out)
            name = f"{title}-{run:03d}.ds" if num_runs > 1 else f"{title}.ds"
            path = out_dir / name
            with open(path, "w", encoding="utf8") as f:
                print(f"| save params: {path}")
                json.dump(results, f, ensure_ascii=False, indent=2)
