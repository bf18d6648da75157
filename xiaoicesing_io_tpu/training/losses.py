"""Loss functions (JAX).

Math parity with ``/root/reference/modules/losses/``:

* diffusion loss: l1/l2 on noise prediction, padding zeroed then plain mean
  (diff_loss.py:5-34 — note the mean is over *all* elements, padded included)
* rectified-flow loss with optional logit-normal time weighting
  (reflow_loss.py:26-50)
* duration loss: lambda-weighted log-domain phone/word/sentence terms
  (dur_loss.py:6-56 — plain means, word aggregation by segment sum)
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _elementwise(loss_type: str, pred, target):
    if loss_type == "l1":
        return jnp.abs(pred - target)
    if loss_type == "l2":
        return (pred - target) ** 2
    raise NotImplementedError(loss_type)


def _huber(pred, target, delta: float = 1.0):
    d = pred - target
    return jnp.where(jnp.abs(d) < delta, 0.5 * d * d, delta * (jnp.abs(d) - 0.5 * delta))


def diffusion_loss(
    x_recon: jnp.ndarray,
    noise: jnp.ndarray,
    non_padding: Optional[jnp.ndarray] = None,
    loss_type: str = "l2",
) -> jnp.ndarray:
    """x_recon/noise: [B, F, T, M]; non_padding: [B, T] or [B, T, M]."""
    if non_padding is not None:
        if non_padding.ndim == 2:
            mask = non_padding[:, None, :, None]
        else:
            mask = non_padding[:, None, :, :]
        mask = mask.astype(x_recon.dtype)
        x_recon = x_recon * mask
        noise = noise * mask
    return jnp.mean(_elementwise(loss_type, x_recon, noise))


def reflow_logit_normal_weights(t: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    t = jnp.clip(t.astype(jnp.float32), eps, 1 - eps)
    return 0.398942 / t / (1 - t) * jnp.exp(-0.5 * jnp.log(t / (1 - t)) ** 2) + eps


def reflow_loss(
    v_pred: jnp.ndarray,
    v_gt: jnp.ndarray,
    t: jnp.ndarray,
    non_padding: Optional[jnp.ndarray] = None,
    loss_type: str = "l2",
    log_norm: bool = True,
) -> jnp.ndarray:
    if non_padding is not None:
        if non_padding.ndim == 2:
            mask = non_padding[:, None, :, None]
        else:
            mask = non_padding[:, None, :, :]
        mask = mask.astype(v_pred.dtype)
        v_pred = v_pred * mask
        v_gt = v_gt * mask
    loss = _elementwise(loss_type, v_pred, v_gt)
    if log_norm:
        loss = reflow_logit_normal_weights(t)[:, None, None, None] * loss
    return jnp.mean(loss)


def aux_mel_loss(aux_out: jnp.ndarray, norm_gt: jnp.ndarray, loss_type: str = "l1"):
    """L1 on the normalized-domain aux mel (aux_decoder/__init__.py:10-12)."""
    return jnp.mean(_elementwise(loss_type, aux_out, norm_gt))


def duration_loss(
    dur_pred: jnp.ndarray,
    dur_gt: jnp.ndarray,
    ph2word: jnp.ndarray,
    offset: float = 1.0,
    loss_type: str = "mse",
    lambda_pdur: float = 0.3,
    lambda_wdur: float = 1.0,
    lambda_sdur: float = 3.0,
) -> jnp.ndarray:
    """dur_pred/dur_gt: [B, T_ph]; ph2word 1-based (0 = padding)."""
    base = {"mse": lambda p, g: (p - g) ** 2, "huber": _huber}[loss_type]
    log = lambda d: jnp.log(d + offset)
    dur_gt = dur_gt.astype(dur_pred.dtype)

    pdur = lambda_pdur * jnp.mean(base(log(dur_pred), log(dur_gt)))

    dur_pred = jnp.maximum(dur_pred, 0.0)
    num_words = ph2word.shape[1]
    seg = lambda d: jax.vmap(
        lambda dd, w: jax.ops.segment_sum(dd, w, num_segments=num_words + 1)
    )(d, ph2word)[:, 1:]
    # the reference aggregates into a [B, ph2word.max()] tensor and takes a
    # plain mean (dur_loss.py:38-46) — entries past the batch-max word index
    # are zero in both operands, so with static shapes the same mean is the
    # sum divided by B * max(ph2word)
    wdur_elems = base(log(seg(dur_pred)), log(seg(dur_gt)))
    wdur_denom = dur_pred.shape[0] * jnp.maximum(jnp.max(ph2word), 1)
    wdur = lambda_wdur * jnp.sum(wdur_elems) / wdur_denom.astype(wdur_elems.dtype)
    sdur = lambda_sdur * jnp.mean(
        base(log(jnp.sum(dur_pred, axis=1)), log(jnp.sum(dur_gt, axis=1)))
    )
    return pdur + wdur + sdur
