"""Train state: optimizer, gradient clipping, LR schedule.

Parity with the reference training setup (``configs/base.yaml:36-49``):
AdamW(beta1=0.9, beta2=0.98, weight_decay=0) + clip_grad_norm=1 + StepLR,
re-designed on optax.  The LR schedule is a pure function of the step so
checkpoints resume exactly (no scheduler-state replay needed).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .schedules import Schedule, build_lr_schedule


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params, opt_state=new_opt_state)

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation) -> "TrainState":
        return cls(
            step=jnp.asarray(0, jnp.int32), params=params,
            opt_state=tx.init(params), tx=tx,
        )


def build_optimizer(cfg, schedule: Optional[Schedule] = None) -> optax.GradientTransformation:
    """AdamW + global-norm clip from reference-style config blocks."""
    opt_args = cfg.get("optimizer_args", {})
    sch_args = cfg.get("lr_scheduler_args", {})
    if schedule is None:
        schedule = build_lr_schedule(opt_args, sch_args)
    clip = cfg.get("clip_grad_norm", 1.0)
    chain = []
    if clip:
        chain.append(optax.clip_by_global_norm(clip))
    chain.append(
        optax.adamw(
            learning_rate=schedule,
            b1=opt_args.get("beta1", 0.9),
            b2=opt_args.get("beta2", 0.98),
            eps=1e-8,
            weight_decay=opt_args.get("weight_decay", 0.0),
        )
    )
    tx = optax.chain(*chain)
    accum = cfg.get("accumulate_grad_batches", 1)
    if accum and accum > 1:
        # gradient accumulation (ref: Lightning accumulate_grad_batches)
        tx = optax.MultiSteps(tx, every_k_schedule=accum)
    return tx


def make_schedule_fn(cfg) -> Schedule:
    return build_lr_schedule(cfg.get("optimizer_args", {}), cfg.get("lr_scheduler_args", {}))
