"""Task assembly: wire config -> datasets, model, train/val steps, Trainer.

Equivalent of AcousticTask / VarianceTask construction in
``/root/reference/training/*_task.py`` + ``basics/base_task.py``.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import jax
import numpy as np

from ..data.dataset import AcousticDataset, VarianceDataset
from ..utils.phonemes import PhonemeDictionary, locate_dictionary
from ..utils.text_encoder import TokenTextEncoder
from .acoustic import (
    acoustic_losses,
    build_acoustic,
    init_acoustic_state,
    make_acoustic_train_step,
)
from .trainer import Trainer
from .variance import (
    build_variance,
    init_variance_state,
    make_variance_train_step,
    variance_losses,
)


def _prepare_work_dir(cfg):
    work_dir = Path(cfg["work_dir"])
    work_dir.mkdir(parents=True, exist_ok=True)
    cfg.save(work_dir / "config.yaml")
    # archive spk_map + dictionary (ref: base_task.py:449-467)
    binary_dir = Path(cfg["binary_data_dir"])
    if (binary_dir / "spk_map.json").exists():
        shutil.copy(binary_dir / "spk_map.json", work_dir / "spk_map.json")
    dict_path = locate_dictionary(cfg.get("dictionary"), str(binary_dir))
    shutil.copy(dict_path, work_dir / "dictionary.txt")
    return work_dir


def build_phone_encoder(cfg) -> TokenTextEncoder:
    dict_path = locate_dictionary(
        cfg.get("dictionary"), cfg.get("binary_data_dir") or cfg.get("work_dir")
    )
    return TokenTextEncoder(PhonemeDictionary.load(dict_path).phoneme_list)


def _apply_finetune_and_freezing(state, cfg, category: str):
    """ref: basics/base_task.py:93-166 + 176-183."""
    from .finetune import load_finetune_params, wrap_optimizer_with_freezing
    from .train_state import TrainState

    if cfg.get("finetune_enabled", False) and cfg.get("finetune_ckpt_path"):
        params = load_finetune_params(state.params, cfg, category)
        state = TrainState.create(params, state.tx)
    if cfg.get("freezing_enabled", False) and cfg.get("frozen_params"):
        tx = wrap_optimizer_with_freezing(state.tx, state.params, cfg["frozen_params"])
        state = TrainState.create(state.params, tx)
    return state


def build_acoustic_trainer(cfg) -> Trainer:
    _prepare_work_dir(cfg)
    encoder = build_phone_encoder(cfg)
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if "bf16" in str(cfg.get("precision", "bf16-mixed")) else jnp.float32
    model, core, normalizer = build_acoustic(cfg, encoder.vocab_size, dtype=dtype)
    state = init_acoustic_state(model, cfg, encoder.vocab_size, jax.random.PRNGKey(0))
    state = _apply_finetune_and_freezing(state, cfg, "acoustic")
    train_step = make_acoustic_train_step(model, core, normalizer, cfg)

    def val_losses(params, batch, key):
        return acoustic_losses(
            model, core, normalizer, cfg, {"params": params}, batch, key,
            deterministic=True,
        )

    train_ds = AcousticDataset(cfg["binary_data_dir"], "train", cfg)
    valid_ds = AcousticDataset(cfg["binary_data_dir"], "valid", cfg)
    extras = make_acoustic_validation_extras(cfg, model, core, normalizer, valid_ds)
    return Trainer(
        cfg, state, train_step, val_losses, train_ds, valid_ds, category="acoustic",
        on_validation_extras=extras,
    )


def make_acoustic_validation_extras(cfg, model, core, normalizer, valid_ds):
    """Per-validation inference plots + vocoded audio on the first
    ``num_valid_plots`` validation items (ref: training/acoustic_task.py:170-233)."""
    import jax.numpy as jnp

    from ..models.diffusion.core import GaussianDiffusion
    from ..models.toplevel import AcousticModel
    from ..utils.plot import spec_diff_to_figure, tb_add_audio

    vocoder = None
    vocoder_failed = False

    def extras(trainer, step, key):
        nonlocal vocoder, vocoder_failed
        if trainer.writer is None:
            return
        n_plots = min(cfg.get("num_valid_plots", 10), len(valid_ds))
        params = {"params": jax.device_get(trainer.state.params)}
        if cfg.get("val_with_vocoder", True) and vocoder is None and not vocoder_failed:
            try:
                from ..models.vocoders.wrapper import NsfHifiGAN

                vocoder = NsfHifiGAN(cfg)
            except Exception as e:
                vocoder_failed = True
                print(f"| WARN: vocoder unavailable for validation audio: {e}")
        for i in range(n_plots):
            batch = valid_ds.collate([i], pad_to_bucket=True)
            variances = {
                v: jnp.asarray(batch[v]) for v in valid_ds.required_variances
            }
            cond = model.apply(
                params, jnp.asarray(batch["tokens"]), jnp.asarray(batch["mel2ph"]),
                jnp.asarray(batch["f0"]),
                key_shift=None if "key_shift" not in batch else jnp.asarray(batch["key_shift"]),
                speed=None if "speed" not in batch else jnp.asarray(batch["speed"]),
                spk_embed_id=None if "spk_ids" not in batch else jnp.asarray(batch["spk_ids"]),
                variances=variances, method=AcousticModel.condition,
            )
            mask = (jnp.asarray(batch["mel2ph"]) > 0)[:, :, None]
            x_src = None
            if model.aux_decoder is not None:
                aux = model.apply(params, cond, method=AcousticModel.aux_out) * mask
                x_src = aux.astype(jnp.float32)[:, None]

            def denoise_fn(x, t):
                return model.apply(params, x, t, cond,
                                   method=AcousticModel.denoise).astype(jnp.float32)

            shape = (1, 1, cond.shape[1], cfg["audio_num_mel_bins"])
            if isinstance(core, GaussianDiffusion):
                x = core.inference(
                    denoise_fn, key, shape, x_start=x_src,
                    depth=cfg.get("K_step_infer", core.k_step),
                    speedup=cfg.get("diff_speedup", 10),
                    algorithm=cfg.get("diff_accelerator", "ddim"),
                )
            else:
                x = core.inference(
                    denoise_fn, key, shape, x_end=x_src,
                    t_start=cfg.get("T_start_infer", core.t_start),
                    steps=cfg.get("sampling_steps", 20),
                    algorithm=cfg.get("sampling_algorithm", "euler"),
                )
            mel_pred = np.asarray(normalizer.denorm(x) * mask)[0]
            T_real = int(np.sum(np.asarray(batch["mel2ph"])[0] > 0))
            gt_mel = np.asarray(batch["mel"])[0]
            fig = spec_diff_to_figure(
                gt_mel[:T_real], mel_pred[:T_real],
                vmin=cfg.get("mel_vmin", -14.0), vmax=cfg.get("mel_vmax", 4.0),
                title=f"diffmel_{i}",
            )
            trainer.writer.add_figure(f"validation/diffmel_{i}", fig, step)
            if vocoder is not None:
                f0 = np.asarray(batch["f0"])[0][:T_real]
                wav_pred = vocoder.spec2wav(mel_pred[:T_real], f0)
                tb_add_audio(
                    trainer.writer, f"validation/wav_diff_{i}", wav_pred, step,
                    sample_rate=cfg["audio_sample_rate"],
                )
                if step <= trainer.val_check_interval:  # log GT once
                    wav_gt = vocoder.spec2wav(gt_mel[:T_real], f0)
                    tb_add_audio(
                        trainer.writer, f"validation/wav_gt_{i}", wav_gt, step,
                        sample_rate=cfg["audio_sample_rate"],
                    )

    return extras


def build_variance_trainer(cfg) -> Trainer:
    _prepare_work_dir(cfg)
    encoder = build_phone_encoder(cfg)
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if "bf16" in str(cfg.get("precision", "bf16-mixed")) else jnp.float32
    model, core, normalizers = build_variance(cfg, encoder.vocab_size, dtype=dtype)
    state = init_variance_state(model, cfg, encoder.vocab_size, jax.random.PRNGKey(0))
    state = _apply_finetune_and_freezing(state, cfg, "variance")
    train_step = make_variance_train_step(model, core, normalizers, cfg)

    def val_losses(params, batch, key):
        return variance_losses(
            model, core, normalizers, cfg, {"params": params}, batch, key,
            deterministic=True,
        )

    train_ds = VarianceDataset(cfg["binary_data_dir"], "train", cfg)
    valid_ds = VarianceDataset(cfg["binary_data_dir"], "valid", cfg)
    extras = make_variance_validation_extras(cfg, model, core, normalizers, valid_ds)
    return Trainer(
        cfg, state, train_step, val_losses, train_ds, valid_ds, category="variance",
        on_validation_extras=extras,
    )


def make_variance_validation_extras(cfg, model, core, normalizers, valid_ds):
    """Objective metrics + figures on validation items: duration
    (RhythmCorrectness @5%, PhonemeDurationAccuracy @20%), sampled pitch
    (RawCurveAccuracy @0.5 semitones over voiced frames, pitch-vs-notes
    figure), and sampled variance curves (curve figures)
    (ref: training/variance_task.py:242-323, valid_metrics at :131-143)."""
    import jax.numpy as jnp

    from ..models.toplevel import VarianceModel
    from .metrics import PhonemeDurationAccuracy, RawCurveAccuracy, RhythmCorrectness
    from .variance import sample_variance_inference
    from ..utils.plot import curve_to_figure, dur_to_figure, pitch_notes_to_figure

    predict_dur = cfg.get("predict_dur", True)
    predict_pitch = cfg.get("predict_pitch", False)
    variance_list = model.variance_prediction_list

    def extras(trainer, step, key):
        rhythm = RhythmCorrectness(tolerance=0.05)
        ph_acc = PhonemeDurationAccuracy(tolerance=0.2)
        pitch_acc = RawCurveAccuracy(tolerance=0.5)
        params = {"params": jax.device_get(trainer.state.params)}
        n_plots = min(cfg.get("num_valid_plots", 10), len(valid_ds))
        for i in range(n_plots):
            batch = valid_ds.collate([i], pad_to_bucket=True)
            mask = np.asarray(batch["tokens"]) > 0
            spk_kwargs = (
                {"spk_id": jnp.asarray(batch["spk_ids"])}
                if cfg.get("use_spk_id", False) else {}
            )
            if predict_dur:
                _, dur_pred = model.apply(
                    params, jnp.asarray(batch["tokens"]), jnp.asarray(batch["midi"]),
                    jnp.asarray(batch["ph2word"]), ph_dur=jnp.asarray(batch["ph_dur"]),
                    infer=True, method=VarianceModel.encode, **spk_kwargs,
                )
                dur_pred_np = np.asarray(dur_pred)
                rhythm.update(dur_pred_np, batch["ph_dur"], batch["ph2word"], mask=mask)
                ph_acc.update(dur_pred_np, batch["ph_dur"], batch["ph2word"], mask=mask)
                if trainer.writer is not None and i < 3:
                    T_real = int(mask[0].sum())
                    fig = dur_to_figure(
                        batch["ph_dur"][0][:T_real], dur_pred_np[0][:T_real],
                        [str(t) for t in batch["tokens"][0][:T_real]],
                    )
                    trainer.writer.add_figure(f"validation/dur_{i}", fig, step)
            if not (predict_pitch or variance_list):
                continue
            # sampled pitch / variance curves with GT alignment + full retake
            # (ref: _validation_step runs run_model(infer=True) with the GT
            # sample; retake defaults to all-true at infer)
            frame_mask = np.asarray(batch["mel2ph"])[0] > 0
            T_real = int(frame_mask.sum())
            gt_pitch = np.asarray(batch["pitch"])
            key, k_item = jax.random.split(key)
            pred_pitch, variances_pred = sample_variance_inference(
                cfg, model, core, normalizers, params, batch, k_item,
                want_pitch=predict_pitch, want_variances=bool(variance_list),
            )
            if pred_pitch is not None:
                pred_pitch = np.asarray(pred_pitch)
                voiced = frame_mask & ~np.asarray(batch["uv"])[0]
                pitch_acc.update(pred_pitch, gt_pitch, mask=voiced[None])
                if trainer.writer is not None and i < 3:
                    fig = pitch_notes_to_figure(
                        gt_pitch[0][:T_real], pred_pitch[0][:T_real],
                        note_midi=np.asarray(batch["note_midi"])[0],
                        note_dur=np.asarray(batch["note_dur"])[0],
                        note_rest=np.asarray(batch["note_rest"])[0],
                    )
                    trainer.writer.add_figure(f"validation/pitch_{i}", fig, step)
            if trainer.writer is not None and i < 3:
                for v_name, v_pred in variances_pred.items():
                    fig = curve_to_figure(
                        np.asarray(batch[v_name])[0][:T_real],
                        np.asarray(v_pred)[0][:T_real], title=v_name,
                    )
                    trainer.writer.add_figure(f"validation/{v_name}_{i}", fig, step)
        parts = []
        scalars = {}
        if predict_dur:
            scalars["rhythm_corr"] = rhythm.compute()
            scalars["ph_dur_acc"] = ph_acc.compute()
        if predict_pitch:
            scalars["pitch_acc"] = pitch_acc.compute()
        for k, v in scalars.items():
            parts.append(f"{k}={v:.4f}")
            if trainer.writer is not None:
                trainer.writer.add_scalar(f"metrics/{k}", v, step)
        if parts:
            print(f"| metrics @ step {step}: " + " ".join(parts))

    return extras


TASKS = {
    "acoustic": build_acoustic_trainer,
    "variance": build_variance_trainer,
}


def build_trainer_from_config(cfg) -> Trainer:
    task_cls = cfg.get("task_cls", "")
    if "acoustic" in str(task_cls).lower():
        return build_acoustic_trainer(cfg)
    if "variance" in str(task_cls).lower():
        return build_variance_trainer(cfg)
    raise ValueError(f"Cannot infer task from task_cls={task_cls!r}")
