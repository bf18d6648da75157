"""LR schedules (optax-style schedule functions).

Parity with the reference's config surface: ``torch.optim.lr_scheduler.StepLR``
(interval='step', ``basics/base_task.py:326-334``), the local
``RSQRTSchedule`` / ``WarmupCosineSchedule`` classes
(``utils/training_utils.py:23-69``), and composite Sequential/Chained
schedulers (``utils/__init__.py:278-314``).  Because these are pure functions
of the step, resume needs no state re-simulation (the reference replays the
scheduler step by step: ``utils/__init__.py:317-328``).
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax.numpy as jnp

Schedule = Callable[[int], float]
# NOTE: schedules must be traceable (they receive a jnp scalar inside jitted
# optimizer updates) — use jnp ops, no Python branching on the step.


def step_lr(base_lr: float, step_size: int, gamma: float) -> Schedule:
    def fn(step):
        return base_lr * gamma ** (step // step_size)

    return fn


def rsqrt(base_lr: float, warmup_steps: int = 10000, hidden_size: int = 256) -> Schedule:
    """lr * hidden^-0.5 * min(step*warmup^-1.5, step^-0.5) (training_utils.py:23-44)."""
    constant = base_lr * hidden_size ** -0.5

    def fn(step):
        step = jnp.maximum(step, 1).astype(jnp.float32)
        return constant * jnp.minimum(step * warmup_steps ** -1.5, step ** -0.5)

    return fn


def warmup_cosine(
    base_lr: float, warmup_steps: int, t_total: int, eta_min: float = 0.0
) -> Schedule:
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * step / max(1, warmup_steps)
        progress = (step - warmup_steps) / max(1, t_total - warmup_steps)
        progress = jnp.clip(progress, 0.0, 1.0)
        cos = eta_min + (base_lr - eta_min) * 0.5 * (1 + jnp.cos(math.pi * progress))
        return jnp.where(step < warmup_steps, warm, cos)

    return fn


def exponential_lr(base_lr: float, gamma: float) -> Schedule:
    def fn(step):
        return base_lr * gamma ** jnp.asarray(step, jnp.float32)

    return fn


def constant_lr(base_lr: float) -> Schedule:
    return lambda step: base_lr


def sequential(schedules: Sequence[Schedule], milestones: Sequence[int]) -> Schedule:
    """SequentialLR semantics: switch schedule at milestones, each schedule
    sees its local step count."""

    def fn(step):
        start = 0
        for i, m in enumerate(milestones):
            if step < m:
                return schedules[i](step - start)
            start = m
        return schedules[-1](step - start)

    return fn


_TORCH_NAME_MAP = {
    "StepLR": "step_lr",
    "ExponentialLR": "exponential_lr",
    "ConstantLR": "constant_lr",
}


def build_lr_schedule(optimizer_args: dict, scheduler_args: dict) -> Schedule:
    """Build a schedule from the reference-style config blocks."""
    base_lr = optimizer_args.get("lr", 1e-4)
    cls = scheduler_args.get("scheduler_cls", "torch.optim.lr_scheduler.StepLR")
    name = cls.rsplit(".", 1)[-1]
    if name == "StepLR":
        return step_lr(base_lr, scheduler_args.get("step_size", 50000),
                       scheduler_args.get("gamma", 0.5))
    if name == "ExponentialLR":
        return exponential_lr(base_lr, scheduler_args.get("gamma", 0.999))
    if name in ("ConstantLR", "LambdaLR"):
        return constant_lr(base_lr)
    if name == "RSQRTSchedule":
        return rsqrt(base_lr, scheduler_args.get("warmup_steps", 10000),
                     scheduler_args.get("hidden_size", 256))
    if name == "WarmupCosineSchedule":
        return warmup_cosine(base_lr, scheduler_args.get("warmup_steps", 10000),
                             scheduler_args.get("t_total", 160000),
                             scheduler_args.get("eta_min", 0.0))
    raise NotImplementedError(f"scheduler {cls} not supported")
