"""Copy-synthesis evaluation: run a trained acoustic model over its binarized
validation (or train) set with ground-truth alignment/f0 and report mel MAE.

The reference has no objective offline eval (SURVEY §4 — quality assurance is
TensorBoard inspection); this productizes the BASELINE.json "mel MAE" metric:

    python scripts/eval.py --exp my_exp [--dataset valid] [--limit N]

Each item goes through ``DiffSingerAcousticInfer``'s jitted synthesis
function — the exact production path (checkpoint loading incl. torch
conversion, dictionary work-dir fallback, Pallas kernels, sampler dispatch) —
with the dataset's ground-truth mel2ph/f0/variances as conditioning, and the
result is compared to the stored GT mel over non-padding frames.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from .metrics import mcd, mel_mae


def _checkpoint_step(work_dir) -> int:
    from ..training.checkpoint import latest_checkpoint

    ck = latest_checkpoint(work_dir)
    if ck is None:  # reference torch single-file checkpoints
        cks = sorted(Path(work_dir).glob("model_ckpt_steps_*.ckpt"))
        ck = cks[-1] if cks else None
    if ck is None:
        return -1
    m = re.search(r"(\d+)", Path(ck).name)
    return int(m.group(1)) if m else -1


def _batch_from_item(cfg, infer, b: Dict[str, np.ndarray]) -> Dict:
    """Map an AcousticDataset.collate batch (B=1) onto the synthesis-fn
    input contract (inference/acoustic.py preprocess_input layout)."""
    batch = {"tokens": b["tokens"], "mel2ph": b["mel2ph"], "f0": b["f0"]}
    for v in infer.variances_to_embed:
        batch[v] = b[v]
    if cfg.get("use_key_shift_embed", False):
        batch["key_shift"] = b["key_shift"]
    if cfg.get("use_speed_embed", False):
        batch["speed"] = b["speed"]
    if cfg.get("use_spk_id", False):
        # single-speaker "mix": the item's own speaker at weight 1
        batch["spk_mix_id"] = b["spk_ids"].reshape(1, 1, 1).astype(np.int32)
        batch["spk_mix_value"] = np.ones((1, 1, 1), np.float32)
    return batch


def evaluate_acoustic(
    cfg, dataset: str = "valid", limit: Optional[int] = None, seed: int = 0,
    with_pesq: bool = False, ckpt_steps: Optional[int] = None,
    pad_frames_to: int = 0, pad_tokens_to: int = 0,
) -> Dict:
    """Returns {"items": [{name, frames, mel_mae, aux_mae}...],
    "mean_mel_mae": float[, "mean_aux_mae": float], "step": int}.

    ``with_pesq=True`` additionally vocodes the predicted AND ground-truth
    mels with the experiment's vocoder and scores the waveform pair with
    :func:`..eval.metrics.pesq_approx` (BASELINE's "PESQ tolerance"
    criterion; GT waveforms are not stored in the binarized data, so the
    comparison is vocoder-conditioned)."""
    from ..data.dataset import AcousticDataset
    from ..inference.acoustic import DiffSingerAcousticInfer
    from ..models.toplevel import AcousticModel

    vocoder_kind = None
    if with_pesq:
        try:
            infer = DiffSingerAcousticInfer(cfg, load_vocoder=True,
                                            ckpt_steps=ckpt_steps)
            vocoder_kind = str(cfg.get("vocoder", "nsf_hifigan"))
        except Exception as e:  # no trained vocoder in this environment
            print(f"| WARN: vocoder unavailable ({e}); waveform metrics use "
                  "Griffin-Lim inversion (both arms share the same mel->wav "
                  "map, so relative orderings remain meaningful)")
            infer = DiffSingerAcousticInfer(cfg, load_vocoder=False,
                                            ckpt_steps=ckpt_steps)
            vocoder_kind = "griffin_lim"
    else:
        infer = DiffSingerAcousticInfer(cfg, load_vocoder=False,
                                        ckpt_steps=ckpt_steps)

    def _vocode(mel, f0, s):
        """mel [B, T, M] + f0 [B, T] -> waveform (numpy)."""
        if vocoder_kind == "griffin_lim":
            from ..ops.mel import MelConfig
            from .metrics import griffin_lim_from_logmel

            return griffin_lim_from_logmel(
                np.asarray(mel)[0], MelConfig.from_config(cfg), seed=s)
        return np.asarray(infer.run_vocoder(mel, f0, seed=s))

    ds = AcousticDataset(cfg["binary_data_dir"], dataset, cfg)

    use_shallow = cfg.get("use_shallow_diffusion", False)
    names = ds.metadata.get("names", [str(i) for i in range(len(ds))])
    n = len(ds) if limit is None else min(limit, len(ds))
    if n <= 0:
        raise ValueError(
            f"nothing to evaluate: dataset '{dataset}' has {len(ds)} items, limit={limit}"
        )
    items = []
    for i in range(n):
        # forcing one padded shape across items (pad_frames_to/pad_tokens_to)
        # lets a sweep over sampler configs compile ONE program per config
        # instead of one per length bucket (the tunneled remote compiler is
        # the bottleneck); metrics are masked, so padding is quality-neutral
        b = ds.collate([i], pad_to_bucket=True,
                       pad_frames_to=pad_frames_to, pad_tokens_to=pad_tokens_to)
        gt = np.asarray(b["mel"])
        mask = np.asarray(b["mel2ph"])[0] > 0
        batch = _batch_from_item(cfg, infer, b)

        pred = infer.forward_model(batch, seed=seed + i)  # jitted production path
        mae = mel_mae(pred[0][mask], gt[0][mask])
        item_mcd = mcd(pred[0][mask], gt[0][mask])  # BASELINE's MCD criterion

        item_pesq = None
        item_wav_mcd = None
        wav_gt = None
        if with_pesq:
            from ..ops.mel import MelConfig
            from .metrics import pesq_approx

            f0 = np.asarray(b["f0"])
            wav_pred = _vocode(pred, f0, seed + i)
            wav_gt = _vocode(gt, f0, seed + i)
            m = min(len(wav_pred), len(wav_gt))
            item_pesq = pesq_approx(
                wav_gt[:m], wav_pred[:m], cfg["audio_sample_rate"]
            )
            # waveform-domain MCD: mel re-extracted from the two vocoded
            # waveforms — measures the distortion a LISTENER's signal carries,
            # including what vocoding does to over-smoothed input mels
            item_wav_mcd = mcd(wav_gt[:m], wav_pred[:m], is_mel=False,
                               mel_cfg=MelConfig.from_config(cfg))

        aux_mae = None
        aux_mcd = None
        aux_pesq = None
        aux_wav_mcd = None
        if use_shallow:
            kwargs = {}
            if "key_shift" in batch:
                kwargs["key_shift"] = jnp.asarray(batch["key_shift"])
            if "speed" in batch:
                kwargs["speed"] = jnp.asarray(batch["speed"])
            if "spk_mix_id" in batch:
                table = infer.params["params"]["fs2"]["spk_embed"]["embedding"]
                emb = jnp.take(jnp.asarray(table), jnp.asarray(batch["spk_mix_id"]), axis=0)
                kwargs["spk_mix_embed"] = jnp.sum(
                    emb * jnp.asarray(batch["spk_mix_value"])[..., None], axis=2
                )
            variances = {v: jnp.asarray(batch[v]) for v in infer.variances_to_embed}
            if variances:
                kwargs["variances"] = variances
            cond = infer.model.apply(
                infer.params, jnp.asarray(batch["tokens"]),
                jnp.asarray(batch["mel2ph"]), jnp.asarray(batch["f0"]),
                method=AcousticModel.condition, **kwargs,
            )
            aux = infer.model.apply(infer.params, cond, method=AcousticModel.aux_out)
            aux = aux * (jnp.asarray(batch["mel2ph"]) > 0)[:, :, None]
            aux_val = np.asarray(infer.normalizer.denorm(aux[:, None]))
            aux_mae = mel_mae(aux_val[0][mask], gt[0][mask])
            # aux MCD too: the aux decoder trains on L1 so it is near-optimal
            # for MAE by construction; spectral distortion is the metric where
            # the diffusion refinement can actually win (see PerformanceNotes
            # round 3, diffusion-vs-aux analysis)
            aux_mcd = mcd(aux_val[0][mask], gt[0][mask])
            if with_pesq and wav_gt is not None:
                # VERDICT r4 task 1a: diffusion-vs-aux compared on VOCODED
                # audio — the domain where the sharpness advantage is claimed
                from ..ops.mel import MelConfig
                from .metrics import pesq_approx

                wav_aux = _vocode(aux_val, np.asarray(b["f0"]), seed + i)
                m2 = min(len(wav_aux), len(wav_gt))
                aux_pesq = pesq_approx(
                    wav_gt[:m2], wav_aux[:m2], cfg["audio_sample_rate"])
                aux_wav_mcd = mcd(wav_gt[:m2], wav_aux[:m2], is_mel=False,
                                  mel_cfg=MelConfig.from_config(cfg))

        items.append({
            "name": str(names[i]) if i < len(names) else str(i),
            "spk_id": int(np.asarray(b["spk_ids"]).ravel()[0]) if "spk_ids" in b else None,
            "frames": int(mask.sum()),
            "mel_mae": float(mae),
            "mcd_db": float(item_mcd),
            "aux_mae": None if aux_mae is None else float(aux_mae),
            "aux_mcd_db": None if aux_mcd is None else float(aux_mcd),
            "pesq": None if item_pesq is None else float(item_pesq),
            "wav_mcd_db": None if item_wav_mcd is None else float(item_wav_mcd),
            "aux_pesq": None if aux_pesq is None else float(aux_pesq),
            "aux_wav_mcd_db": None if aux_wav_mcd is None else float(aux_wav_mcd),
        })

    out = {
        "step": (int(ckpt_steps) if ckpt_steps is not None
                 else _checkpoint_step(cfg["work_dir"])),
        "dataset": dataset,
        "items": items,
        "mean_mel_mae": float(np.mean([it["mel_mae"] for it in items])),
        "mean_mcd_db": float(np.mean([it["mcd_db"] for it in items])),
    }
    if use_shallow:
        out["mean_aux_mae"] = float(np.mean([it["aux_mae"] for it in items]))
        out["mean_aux_mcd_db"] = float(np.mean([it["aux_mcd_db"] for it in items]))
    if with_pesq:
        out["mean_pesq"] = float(np.mean([it["pesq"] for it in items]))
        out["mean_wav_mcd_db"] = float(
            np.mean([it["wav_mcd_db"] for it in items]))
        if use_shallow:
            out["mean_aux_pesq"] = float(
                np.mean([it["aux_pesq"] for it in items]))
            out["mean_aux_wav_mcd_db"] = float(
                np.mean([it["aux_wav_mcd_db"] for it in items]))
            # item-wise wins on the waveform-domain metrics (sign-test basis)
            out["diff_pesq_wins_items"] = sum(
                1 for it in items if it["pesq"] > it["aux_pesq"])
            out["diff_wav_mcd_wins_items"] = sum(
                1 for it in items if it["wav_mcd_db"] < it["aux_wav_mcd_db"])
    # per-speaker breakdown (multi-speaker runs: BASELINE config 4 demands
    # per-speaker held-out numbers, ref spk map: basics/base_binarizer.py:74-93)
    if any(it["spk_id"] is not None for it in items):
        import json as _json

        spk_names = {}
        spk_map_path = Path(cfg["binary_data_dir"]) / "spk_map.json"
        if spk_map_path.exists():
            spk_names = {v: k for k, v in
                         _json.loads(spk_map_path.read_text()).items()}
        per_spk = {}
        for it in items:
            per_spk.setdefault(it["spk_id"], []).append(it)
        out["per_speaker"] = {
            str(spk_names.get(sid, sid)): {
                "n_items": len(group),
                "mean_mel_mae": float(np.mean([g["mel_mae"] for g in group])),
                "mean_mcd_db": float(np.mean([g["mcd_db"] for g in group])),
                **({"mean_aux_mae": float(np.mean([g["aux_mae"] for g in group])),
                    "mean_aux_mcd_db": float(np.mean([g["aux_mcd_db"] for g in group]))}
                   if use_shallow else {}),
            }
            for sid, group in sorted(per_spk.items())
        }
    return out


def evaluate_variance(
    cfg, dataset: str = "valid", limit: Optional[int] = None,
    ckpt_steps: Optional[int] = None,
    rhythm_tolerances=(0.05, 0.1, 0.2, 0.3),
) -> Dict:
    """Objective metrics of a trained variance model over a binarized set —
    the same metrics the reference computes at validation
    (ref: training/variance_task.py:242-323, modules/metrics/), but over the
    full set instead of the first ``num_valid_plots`` items: duration
    (RhythmCorrectness @5%, PhonemeDurationAccuracy @20%) when
    ``predict_dur``, and sampled-pitch RawCurveAccuracy @0.5 semitones over
    voiced frames when ``predict_pitch``."""
    import jax

    from ..data.dataset import VarianceDataset
    from ..models.toplevel import VarianceModel
    from ..training.checkpoint import load_params_for_inference
    from ..training.metrics import (
        PhonemeDurationAccuracy, RawCurveAccuracy, RhythmCorrectness,
    )
    from ..training.variance import build_variance, sample_variance_inference
    from ..utils.phonemes import PhonemeDictionary, locate_dictionary
    from ..utils.text_encoder import TokenTextEncoder

    predict_dur = cfg.get("predict_dur", True)
    predict_pitch = cfg.get("predict_pitch", False)
    if not (predict_dur or predict_pitch):
        raise ValueError(
            "variance eval needs a duration or pitch predictor "
            "(predict_dur / predict_pitch)"
        )
    phdict = PhonemeDictionary.load(
        locate_dictionary(cfg.get("dictionary"), cfg.get("work_dir"))
    )
    enc = TokenTextEncoder(phdict.phoneme_list)
    ds = VarianceDataset(cfg["binary_data_dir"], dataset, cfg)
    model, core, normalizers = build_variance(cfg, enc.vocab_size)
    params = load_params_for_inference(cfg["work_dir"], cfg,
                                       ckpt_steps=ckpt_steps)

    n = len(ds) if limit is None else min(limit, len(ds))
    if n <= 0:
        raise ValueError(
            f"nothing to evaluate: dataset '{dataset}' has {len(ds)} items, limit={limit}"
        )
    # full word-sum tolerance sweep (round-4 root-cause diagnostic, kept as
    # a first-class output): rhythm@tol for every requested tolerance plus
    # the median relative word-sum error the thresholds are cutting
    rhythms = {tol: RhythmCorrectness(tolerance=tol)
               for tol in rhythm_tolerances}
    rhythm = rhythms.get(0.05) or RhythmCorrectness(tolerance=0.05)
    if 0.05 not in rhythms:
        rhythms[0.05] = rhythm
    ph_acc = PhonemeDurationAccuracy(tolerance=0.2)
    pitch_acc = RawCurveAccuracy(tolerance=0.5)
    wordsum_rel_errs = []
    key = jax.random.PRNGKey(0)
    for i in range(n):
        b = ds.collate([i], pad_to_bucket=True)
        spk_kwargs = (
            {"spk_id": jnp.asarray(b["spk_ids"])}
            if cfg.get("use_spk_id", False) else {}
        )
        if predict_dur:
            _, dur_pred = model.apply(
                params, jnp.asarray(b["tokens"]), jnp.asarray(b["midi"]),
                jnp.asarray(b["ph2word"]), ph_dur=jnp.asarray(b["ph_dur"]),
                infer=True, method=VarianceModel.encode, **spk_kwargs,
            )
            mask = np.asarray(b["tokens"]) > 0
            for m_ in rhythms.values():
                m_.update(np.asarray(dur_pred), b["ph_dur"], b["ph2word"], mask=mask)
            ph_acc.update(np.asarray(dur_pred), b["ph_dur"], b["ph2word"], mask=mask)
            pd_, gt_, w_, mm = (np.asarray(dur_pred)[0], np.asarray(b["ph_dur"])[0],
                                np.asarray(b["ph2word"])[0], mask[0])
            sums_p = np.bincount(w_[mm], weights=pd_[mm])
            sums_g = np.bincount(w_[mm], weights=gt_[mm])
            sel = sums_g > 0
            wordsum_rel_errs.extend(
                (np.abs(sums_p[sel] - sums_g[sel]) / sums_g[sel]).tolist())
        if predict_pitch:
            key, k_item = jax.random.split(key)
            pred_pitch, _ = sample_variance_inference(
                cfg, model, core, normalizers, params, b, k_item,
                want_pitch=True, want_variances=False,
            )
            voiced = (np.asarray(b["mel2ph"]) > 0) & ~np.asarray(b["uv"])
            pitch_acc.update(np.asarray(pred_pitch), b["pitch"], mask=voiced)
    out = {
        "step": (int(ckpt_steps) if ckpt_steps is not None
                 else _checkpoint_step(cfg["work_dir"])),
        "dataset": dataset,
        "items_evaluated": n,
    }
    if predict_dur:
        out["rhythm_corr"] = float(rhythm.compute())
        out["ph_dur_acc"] = float(ph_acc.compute())
        out["rhythm_sweep"] = {
            str(tol): float(m_.compute()) for tol, m_ in sorted(rhythms.items())
        }
        out["median_wordsum_rel_err"] = float(np.median(wordsum_rel_errs)) \
            if wordsum_rel_errs else None
        out["n_words"] = len(wordsum_rel_errs)
    if predict_pitch:
        out["pitch_acc"] = float(pitch_acc.compute())
    return out
