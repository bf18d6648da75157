"""Acoustic task: model assembly + jittable training step.

Parity with ``/root/reference/training/acoustic_task.py``: losses are
optional aux L1 (scaled by ``lambda_aux_mel_loss``, with the
``aux_decoder_grad`` gradient-scaling trick into the condition) plus the
DDPM noise-prediction or rectified-flow velocity loss, masked by
``mel2ph > 0``.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.diffusion.core import GaussianDiffusion, RectifiedFlow, SpecNormalizer
from ..models.diffusion.schedule import DiffusionSchedule
from ..models.toplevel import AcousticModel, VARIANCE_CHECKLIST
from . import losses
from .train_state import TrainState, build_optimizer


def build_acoustic(cfg, vocab_size: int, dtype=jnp.float32):
    """-> (model, diffusion_core, normalizer)."""
    model = AcousticModel.from_config(cfg, vocab_size, dtype=dtype)
    normalizer = SpecNormalizer(
        spec_min=[cfg.get("spec_min", [-12.0])],
        spec_max=[cfg.get("spec_max", [0.0])],
        num_feats=1,
    )
    diffusion_type = cfg.get("diffusion_type", "ddpm")
    if diffusion_type == "ddpm":
        schedule = DiffusionSchedule.create(
            cfg.get("schedule_type", "linear"), cfg.get("timesteps", 1000)
        )
        timesteps = cfg.get("timesteps", 1000)
        k_step = cfg.get("K_step", timesteps) if cfg.get("use_shallow_diffusion", False) \
            else timesteps
        core = GaussianDiffusion(schedule=schedule, timesteps=timesteps, k_step=k_step)
    elif diffusion_type == "reflow":
        t_start = cfg.get("T_start", 0.0) if cfg.get("use_shallow_diffusion", False) else 0.0
        core = RectifiedFlow(
            t_start=t_start, time_scale_factor=cfg.get("time_scale_factor", 1000),
        )
    else:
        raise NotImplementedError(diffusion_type)
    return model, core, normalizer


def required_variances(cfg) -> Tuple[str, ...]:
    return tuple(v for v in VARIANCE_CHECKLIST if cfg.get(f"use_{v}_embed", False))


def acoustic_losses(model: AcousticModel, core, normalizer: SpecNormalizer, cfg,
                    params, batch: Dict, key: jax.Array, deterministic: bool = False):
    """Single forward pass -> dict of scalar losses."""
    diffusion_type = cfg.get("diffusion_type", "ddpm")
    use_shallow = cfg.get("use_shallow_diffusion", False)
    shallow = cfg.get("shallow_diffusion_args", {})
    k_drop, k_t, k_noise = jax.random.split(key, 3)
    rngs = {} if deterministic else {"dropout": k_drop}

    variances = {v: batch[v] for v in required_variances(cfg)}
    cond = model.apply(
        params, batch["tokens"], batch["mel2ph"], batch["f0"],
        key_shift=batch.get("key_shift"), speed=batch.get("speed"),
        spk_embed_id=batch.get("spk_ids"), variances=variances,
        deterministic=deterministic, rngs=rngs,
        method=AcousticModel.condition,
    )
    out: Dict[str, jnp.ndarray] = {}
    non_padding = (batch["mel2ph"] > 0).astype(jnp.float32)
    norm_gt = normalizer.norm(batch["mel"])  # [B, 1, T, M]

    if use_shallow and shallow.get("train_aux_decoder", True):
        g = shallow.get("aux_decoder_grad", 0.1)
        aux_cond = cond * g + jax.lax.stop_gradient(cond) * (1 - g)
        aux_out = model.apply(
            params, aux_cond, deterministic=deterministic, rngs=rngs,
            method=AcousticModel.aux_out,
        )
        out["aux_mel_loss"] = cfg.get("lambda_aux_mel_loss", 0.2) * losses.aux_mel_loss(
            aux_out * non_padding[:, :, None], norm_gt[:, 0] * non_padding[:, :, None]
        )

    if (not use_shallow) or shallow.get("train_diffusion", True):
        b = batch["tokens"].shape[0]
        noise = jax.random.normal(k_noise, norm_gt.shape, dtype=jnp.float32)
        if diffusion_type == "ddpm":
            t = core.sample_t(k_t, b)
            x_t = core.q_sample(norm_gt, t, noise)
            eps_pred = model.apply(
                params, x_t, t.astype(jnp.float32), cond,
                deterministic=deterministic, rngs=rngs, method=AcousticModel.denoise,
            )
            out["mel_loss"] = losses.diffusion_loss(
                eps_pred, noise, non_padding, loss_type=cfg.get("main_loss_type", "l2")
            )
        else:
            t = core.sample_t(k_t, b)
            x_t, v_gt = core.interpolate(noise, norm_gt, t)
            v_pred = model.apply(
                params, x_t, t * core.time_scale_factor, cond,
                deterministic=deterministic, rngs=rngs, method=AcousticModel.denoise,
            )
            out["mel_loss"] = losses.reflow_loss(
                v_pred, v_gt, t, non_padding,
                loss_type=cfg.get("main_loss_type", "l2"),
                log_norm=cfg.get("main_loss_log_norm", False),
            )
    return out


def make_acoustic_train_step(model, core, normalizer, cfg):
    """-> ``train_step(state, batch, key) -> (state, metrics)`` (pure, jittable)."""

    def train_step(state: TrainState, batch: Dict, key: jax.Array):
        def loss_fn(params):
            loss_dict = acoustic_losses(
                model, core, normalizer, cfg, {"params": params}, batch, key
            )
            total = sum(loss_dict.values())
            return total, loss_dict

        (total, loss_dict), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        state = state.apply_gradients(grads)
        metrics = dict(loss_dict, total_loss=total)
        return state, metrics

    return train_step


def init_acoustic_state(model, cfg, vocab_size: int, key: jax.Array,
                        example: Optional[Dict] = None) -> TrainState:
    if example is None:
        B, T_ph, T_f = 2, 8, 32
        M = cfg["audio_num_mel_bins"]
        example = {
            "tokens": jnp.ones((B, T_ph), jnp.int32),
            "mel2ph": jnp.ones((B, T_f), jnp.int32),
            "f0": jnp.full((B, T_f), 220.0),
            "x": jnp.zeros((B, 1, T_f, M)),
            "t": jnp.zeros((B,)),
        }
    variances = {v: jnp.zeros_like(example["f0"]) for v in required_variances(cfg)}
    kwargs = {}
    if cfg.get("use_spk_id", False):
        kwargs["spk_embed_id"] = jnp.zeros((example["tokens"].shape[0],), jnp.int32)
    if cfg.get("use_key_shift_embed", False):
        kwargs["key_shift"] = jnp.zeros_like(example["f0"])
    if cfg.get("use_speed_embed", False):
        kwargs["speed"] = jnp.ones_like(example["f0"])
    variables = model.init(
        key, example["tokens"], example["mel2ph"], example["f0"],
        example["x"], example["t"], variances=variances, **kwargs,
    )
    tx = build_optimizer(cfg)
    return TrainState.create(variables["params"], tx)
