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


def multi_step_lr(base_lr: float, milestones: Sequence[int], gamma: float = 0.1) -> Schedule:
    """torch MultiStepLR: lr = base * gamma^(number of milestones passed)."""
    ms = tuple(int(m) for m in milestones)

    def fn(step):
        passed = sum((jnp.asarray(step) >= m).astype(jnp.float32) for m in ms)
        return base_lr * gamma ** passed

    return fn


def linear_lr(base_lr: float, start_factor: float = 1.0 / 3, end_factor: float = 1.0,
              total_iters: int = 5) -> Schedule:
    """torch LinearLR: factor ramps linearly start->end over total_iters."""

    def fn(step):
        p = jnp.clip(jnp.asarray(step, jnp.float32) / max(1, total_iters), 0.0, 1.0)
        return base_lr * (start_factor + (end_factor - start_factor) * p)

    return fn


def constant_factor_lr(base_lr: float, factor: float = 1.0 / 3,
                       total_iters: int = 5) -> Schedule:
    """torch ConstantLR: lr = base*factor while step < total_iters, then base."""

    def fn(step):
        return base_lr * jnp.where(jnp.asarray(step) < total_iters, factor, 1.0)

    return fn


def cosine_annealing_lr(base_lr: float, t_max: int, eta_min: float = 0.0) -> Schedule:
    def fn(step):
        p = jnp.asarray(step, jnp.float32) / max(1, t_max)
        return eta_min + (base_lr - eta_min) * 0.5 * (1 + jnp.cos(math.pi * p))

    return fn


def sequential(schedules: Sequence[Schedule], milestones: Sequence[int]) -> Schedule:
    """torch SequentialLR semantics: switch schedule at each milestone; each
    schedule sees a local step count restarting at 0 when it becomes active.
    Traceable (jnp.select over milestone boundaries)."""
    ms = tuple(int(m) for m in milestones)
    starts = (0,) + ms

    def fn(step):
        step = jnp.asarray(step)
        values = [jnp.asarray(s(step - st), jnp.float32)
                  for s, st in zip(schedules, starts)]
        conds = [step < m for m in ms]
        return jnp.select(conds, values[:-1], values[-1])

    return fn


def chained(schedules: Sequence[Schedule], base_lr: float) -> Schedule:
    """torch ChainedScheduler semantics: every scheduler steps each iteration;
    multiplicative factors compose. lr = base * prod(sched_i(step)/base)."""

    def fn(step):
        lr = jnp.asarray(1.0, jnp.float32)
        for s in schedules:
            lr = lr * (jnp.asarray(s(step), jnp.float32) / base_lr)
        return base_lr * lr

    return fn


def build_lr_schedule(optimizer_args: dict, scheduler_args: dict) -> Schedule:
    """Build a schedule from the reference-style config blocks.

    Mirrors the reference's recursive composite-scheduler construction
    (``utils/__init__.py:278-314``, documented in BestPractices "Composite LR
    schedulers"): sub-scheduler dicts carry a ``cls`` key and may be nested
    under ``schedulers:`` lists for SequentialLR / ChainedScheduler.
    """
    base_lr = optimizer_args.get("lr", 1e-4)
    return _build(scheduler_args, base_lr,
                  cls_key="scheduler_cls", allow_composite=True)


def _build(args: dict, base_lr: float, *, cls_key: str = "cls",
           allow_composite: bool = False) -> Schedule:
    cls = args.get(cls_key, "torch.optim.lr_scheduler.StepLR")
    name = cls.rsplit(".", 1)[-1]
    if name == "StepLR":
        return step_lr(base_lr, args.get("step_size", 50000),
                       args.get("gamma", 0.5))
    if name == "ExponentialLR":
        return exponential_lr(base_lr, args.get("gamma", 0.999))
    if name == "MultiStepLR":
        return multi_step_lr(base_lr, args.get("milestones", ()),
                             args.get("gamma", 0.1))
    if name == "LinearLR":
        return linear_lr(base_lr, args.get("start_factor", 1.0 / 3),
                         args.get("end_factor", 1.0),
                         args.get("total_iters", 5))
    if name == "ConstantLR":
        return constant_factor_lr(base_lr, args.get("factor", 1.0 / 3),
                                  args.get("total_iters", 5))
    if name == "CosineAnnealingLR":
        return cosine_annealing_lr(base_lr, args.get("T_max", 160000),
                                   args.get("eta_min", 0.0))
    if name == "LambdaLR":
        return constant_lr(base_lr)
    if name == "RSQRTSchedule":
        return rsqrt(base_lr, args.get("warmup_steps", 10000),
                     args.get("hidden_size", 256))
    if name == "WarmupCosineSchedule":
        return warmup_cosine(base_lr, args.get("warmup_steps", 10000),
                             args.get("t_total", 160000),
                             args.get("eta_min", 0.0))
    if name in ("SequentialLR", "ChainedScheduler"):
        subs = [_build(s, base_lr) for s in args.get("schedulers", ())]
        if not subs:
            raise ValueError(f"{name} requires a 'schedulers' list")
        for s in args.get("schedulers", ()):
            sub_name = s.get("cls", "").rsplit(".", 1)[-1]
            if sub_name in ("SequentialLR", "ChainedScheduler"):
                raise ValueError(
                    "nested SequentialLR/ChainedScheduler is not supported "
                    "(the reference forbids it too, BestPractices.md:566)")
        if name == "SequentialLR":
            milestones = args.get("milestones", ())
            if len(milestones) != len(subs) - 1:
                raise ValueError("SequentialLR needs len(schedulers)-1 milestones")
            return sequential(subs, milestones)
        return chained(subs, base_lr)
    raise NotImplementedError(f"scheduler {cls} not supported")
