"""Variance task: model assembly + jittable training step.

Parity with ``/root/reference/training/variance_task.py``: random retake
masks during training (1/4 full-segment + continuous spans -> ~1/2 of frames
retaken), losses = lambda_dur * DurationLoss + lambda_pitch * diffusion/reflow
+ lambda_var * diffusion/reflow, all masked by ``mel2ph > 0``.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..models.diffusion.core import GaussianDiffusion, RectifiedFlow
from ..models.diffusion.schedule import DiffusionSchedule
from ..models.toplevel import VarianceModel, build_variance_normalizers
from . import losses
from .train_state import TrainState, build_optimizer


def build_variance(cfg, vocab_size: int, dtype=jnp.float32):
    model = VarianceModel.from_config(cfg, vocab_size, dtype=dtype)
    normalizers = build_variance_normalizers(cfg)
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
    return model, core, normalizers


def random_retake_masks(key: jax.Array, b: int, t: int) -> jnp.ndarray:
    """(ref: variance_task.py:71-77 + utils/__init__.py:41-51)."""
    k1, k2 = jax.random.split(key)
    full = jax.random.randint(k1, (b, 1), 0, 4) == 0
    ka, kb = jax.random.split(k2)
    ends = jnp.sort(jax.random.randint(ka, (b, 2), 0, t + 1), axis=1)
    idx = jnp.arange(t)[None, :]
    spans = (idx >= ends[:, :1]) & (idx < ends[:, 1:])
    return full | spans


def variance_losses(model, core, normalizers, cfg, params, batch, key,
                    deterministic=False):
    diffusion_type = cfg.get("diffusion_type", "ddpm")
    k_drop, k_retake, k_t, k_noise, k_vt, k_vnoise = jax.random.split(key, 6)
    rngs = {} if deterministic else {"dropout": k_drop}
    out: Dict[str, jnp.ndarray] = {}

    tokens = batch["tokens"]
    b = tokens.shape[0]
    predict_pitch = cfg.get("predict_pitch", True)
    prediction_list = model.variance_prediction_list

    encoder_out, dur_pred = model.apply(
        params, tokens, batch.get("midi"), batch.get("ph2word"),
        ph_dur=batch["ph_dur"], spk_id=batch.get("spk_ids"), infer=False,
        deterministic=deterministic, rngs=rngs, method=VarianceModel.encode,
    )
    if dur_pred is not None:
        dur_args = cfg.get("dur_prediction_args", {})
        out["dur_loss"] = cfg.get("lambda_dur_loss", 1.0) * losses.duration_loss(
            dur_pred, batch["ph_dur"], batch["ph2word"],
            offset=dur_args.get("log_offset", 1.0),
            loss_type=dur_args.get("loss_type", "mse"),
            lambda_pdur=dur_args.get("lambda_pdur_loss", 0.3),
            lambda_wdur=dur_args.get("lambda_wdur_loss", 1.0),
            lambda_sdur=dur_args.get("lambda_sdur_loss", 3.0),
        )

    if not predict_pitch and not prediction_list:
        return out

    mel2ph = batch["mel2ph"]
    t_frames = mel2ph.shape[1]
    non_padding = (mel2ph > 0).astype(jnp.float32)
    condition = model.apply(
        params, encoder_out, mel2ph, spk_id=batch.get("spk_ids"),
        rngs=rngs, method=VarianceModel.frame_condition,
    )

    def diffusion_branch(cond, gt_norm, kt, kn, denoise_method):
        noise = jax.random.normal(kn, gt_norm.shape, dtype=jnp.float32)
        if diffusion_type == "ddpm":
            t = core.sample_t(kt, b)
            x_t = core.q_sample(gt_norm, t, noise)
            pred = model.apply(params, x_t, t.astype(jnp.float32), cond,
                               rngs=rngs, method=denoise_method)
            return losses.diffusion_loss(
                pred, noise, non_padding, loss_type=cfg.get("main_loss_type", "l2")
            )
        t = core.sample_t(kt, b)
        x_t, v_gt = core.interpolate(noise, gt_norm, t)
        pred = model.apply(params, x_t, t * core.time_scale_factor, cond,
                           rngs=rngs, method=denoise_method)
        return losses.reflow_loss(
            pred, v_gt, t, non_padding,
            loss_type=cfg.get("main_loss_type", "l2"),
            log_norm=cfg.get("main_loss_log_norm", True),
        )

    if predict_pitch:
        k_retake, kr = jax.random.split(k_retake)
        pitch_retake = random_retake_masks(kr, b, t_frames)
        pitch_cond = model.apply(
            params, condition, mel2ph, batch["base_pitch"],
            pitch=batch["pitch"], pitch_retake=pitch_retake,
            note_midi=batch.get("note_midi"), note_rest=batch.get("note_rest"),
            note_dur=batch.get("note_dur"), note_glide=batch.get("note_glide"),
            mel2note=batch.get("mel2note"),
            deterministic=deterministic, rngs=rngs,
            method=VarianceModel.pitch_condition,
        )
        if cfg.get("use_melody_encoder", False):
            delta = batch["pitch"] - batch["base_pitch"]
        else:
            # the reference rebinds base_pitch = base*retake + pitch*~retake
            # before taking the target (toplevel.py:274-280), so non-retaken
            # frames — whose condition already embeds the GT pitch — train
            # toward a ~zero delta ("keep the given pitch")
            delta = (batch["pitch"] - batch["base_pitch"]) * pitch_retake
        gt_norm = normalizers["pitch"].norm(delta)
        out["pitch_loss"] = cfg.get("lambda_pitch_loss", 1.0) * diffusion_branch(
            pitch_cond, gt_norm, k_t, k_noise, VarianceModel.denoise_pitch
        )

    if prediction_list:
        retakes = {}
        for v in prediction_list:
            k_retake, kr = jax.random.split(k_retake)
            retakes[v] = random_retake_masks(kr, b, t_frames)
        variances = {v: batch[v] for v in prediction_list}
        var_cond = model.apply(
            params, condition, batch["pitch"], variances, variance_retake=retakes,
            rngs=rngs, method=VarianceModel.variance_condition,
        )
        gt_norm = normalizers["variances"].norm([batch[v] for v in prediction_list])
        out["var_loss"] = cfg.get("lambda_var_loss", 1.0) * diffusion_branch(
            var_cond, gt_norm, k_vt, k_vnoise, VarianceModel.denoise_variance
        )
    return out


def make_variance_train_step(model, core, normalizers, cfg):
    def train_step(state: TrainState, batch: Dict, key: jax.Array):
        def loss_fn(params):
            loss_dict = variance_losses(
                model, core, normalizers, cfg, {"params": params}, batch, key
            )
            total = sum(loss_dict.values())
            return total, loss_dict

        (total, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        return state, dict(loss_dict, total_loss=total)

    return train_step


def init_variance_state(model, cfg, vocab_size: int, key: jax.Array) -> TrainState:
    B, T_ph, T_f, T_n = 2, 8, 32, 4
    prediction_list = model.variance_prediction_list
    pargs = cfg.get("pitch_prediction_args", {})
    vargs = cfg.get("variances_prediction_args", {})
    kwargs = dict(
        x_pitch=jnp.zeros((B, 1, T_f, pargs.get("repeat_bins", 64))),
        t=jnp.zeros((B,)),
        note_midi=jnp.full((B, T_n), 60.0), note_rest=jnp.zeros((B, T_n), bool),
        note_dur=jnp.ones((B, T_n), jnp.int32),
        mel2note=jnp.ones((B, T_f), jnp.int32),
    )
    if cfg.get("use_glide_embed", False):
        kwargs["note_glide"] = jnp.zeros((B, T_n), jnp.int32)
    if prediction_list:
        bins = vargs.get("total_repeat_bins", 48) // len(prediction_list)
        kwargs["x_var"] = jnp.zeros((B, len(prediction_list), T_f, bins))
        kwargs["variances"] = {v: jnp.zeros((B, T_f)) for v in prediction_list}
    if cfg.get("use_spk_id", False):
        kwargs["spk_id"] = jnp.zeros((B,), jnp.int32)
    variables = model.init(
        key,
        jnp.ones((B, T_ph), jnp.int32), jnp.ones((B, T_ph), jnp.int32),
        jnp.ones((B, T_ph), jnp.int32), jnp.ones((B, T_ph), jnp.int32),
        jnp.zeros((B, T_f)), jnp.zeros((B, T_f)), jnp.ones((B, T_f), jnp.int32),
        **kwargs,
    )
    tx = build_optimizer(cfg)
    return TrainState.create(variables["params"], tx)


def sample_variance_inference(
    cfg, model, core, normalizers, params, batch, key,
    want_pitch: bool = True, want_variances: bool = False,
):
    """Sampled pitch/variance curves for a collated batch under the
    validation inference condition: GT duration alignment + full retake
    (ref: variance_task.py:246 run_model(infer=True) with retake unset).

    Returns ``(pred_pitch [B, T] or None, {name: curve [B, T]})`` —
    absolute pitch (base + sampled delta), denormalized curves.

    Shared by the trainer's validation extras and the offline eval CLI so
    both score the same sampling path.
    """
    mel2ph = jnp.asarray(batch["mel2ph"])
    spk_kwargs = (
        {"spk_id": jnp.asarray(batch["spk_ids"])}
        if cfg.get("use_spk_id", False) else {}
    )
    encoder_out, _ = model.apply(
        params, jnp.asarray(batch["tokens"]), jnp.asarray(batch["midi"]),
        jnp.asarray(batch["ph2word"]), ph_dur=jnp.asarray(batch["ph_dur"]),
        infer=True, method=VarianceModel.encode, **spk_kwargs,
    )
    condition = model.apply(
        params, encoder_out, mel2ph, method=VarianceModel.frame_condition,
        **spk_kwargs,
    )

    def _sample(method, cond, k, shape):
        def denoise(x, t):
            return model.apply(params, x, t, cond, method=method)

        if isinstance(core, GaussianDiffusion):
            return core.inference(
                denoise, k, shape,
                depth=cfg.get("K_step_infer", core.k_step),
                speedup=cfg.get("diff_speedup", 10),
                algorithm=cfg.get("diff_accelerator", "ddim"),
                solver_order=cfg.get("dpm_solver_order", 2),
                unipc_variant=cfg.get("unipc_variant", "bh2"),
            )
        return core.inference(
            denoise, k, shape, t_start=0.0,
            steps=cfg.get("sampling_steps", 20),
            algorithm=cfg.get("sampling_algorithm", "euler"),
        )

    pred_pitch = None
    if want_pitch and cfg.get("predict_pitch", False):
        pitch_cond = model.apply(
            params, condition, mel2ph, jnp.asarray(batch["base_pitch"]),
            note_midi=jnp.asarray(batch["note_midi"]),
            note_rest=jnp.asarray(batch["note_rest"]),
            note_dur=jnp.asarray(batch["note_dur"]),
            note_glide=jnp.asarray(batch["note_glide"])
            if batch.get("note_glide") is not None else None,
            mel2note=jnp.asarray(batch["mel2note"]),
            method=VarianceModel.pitch_condition,
        )
        pargs = cfg.get("pitch_prediction_args", {})
        shape = (mel2ph.shape[0], 1, mel2ph.shape[1], pargs.get("repeat_bins", 64))
        key, k_pitch = jax.random.split(key)
        delta = _sample(VarianceModel.denoise_pitch, pitch_cond, k_pitch, shape)
        pred_pitch = normalizers["pitch"].denorm(delta) + jnp.asarray(batch["base_pitch"])

    variances_out = {}
    prediction_list = model.variance_prediction_list
    if want_variances and prediction_list:
        var_cond = model.apply(
            params, condition, jnp.asarray(batch["pitch"]), {},
            method=VarianceModel.variance_condition,
        )
        vargs = cfg.get("variances_prediction_args", {})
        n_feats = len(prediction_list)
        shape = (mel2ph.shape[0], n_feats, mel2ph.shape[1],
                 vargs.get("total_repeat_bins", 48) // n_feats)
        key, k_var = jax.random.split(key)
        x = _sample(VarianceModel.denoise_variance, var_cond, k_var, shape)
        out = normalizers["variances"].denorm(x)
        if n_feats == 1:
            out = [out]
        variances_out = dict(zip(prediction_list, out))
    return pred_pitch, variances_out
