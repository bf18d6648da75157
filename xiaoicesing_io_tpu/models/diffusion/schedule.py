"""DDPM noise schedules and derived coefficients.

Math parity with ``/root/reference/modules/core/ddpm.py:28-115``.  Note the
reference quirk: ``linear_beta_schedule`` is always called without the
configured ``max_beta``, so the linear schedule is linspace(1e-4, 0.01, T)
regardless of config — we reproduce that default but expose the parameter.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


def linear_beta_schedule(timesteps: int, max_beta: float = 0.01) -> np.ndarray:
    return np.linspace(1e-4, max_beta, timesteps)


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    steps = timesteps + 1
    x = np.linspace(0, steps, steps)
    alphas_cumprod = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, 0, 0.999)


beta_schedule = {"linear": linear_beta_schedule, "cosine": cosine_beta_schedule}


@dataclass(frozen=True)
class DiffusionSchedule:
    """All q/p coefficients precomputed as float64 numpy, cast at use site."""

    betas: np.ndarray
    alphas_cumprod: np.ndarray = field(init=False)
    alphas_cumprod_prev: np.ndarray = field(init=False)
    sqrt_alphas_cumprod: np.ndarray = field(init=False)
    sqrt_one_minus_alphas_cumprod: np.ndarray = field(init=False)
    sqrt_recip_alphas_cumprod: np.ndarray = field(init=False)
    sqrt_recipm1_alphas_cumprod: np.ndarray = field(init=False)
    posterior_variance: np.ndarray = field(init=False)
    posterior_log_variance_clipped: np.ndarray = field(init=False)
    posterior_mean_coef1: np.ndarray = field(init=False)
    posterior_mean_coef2: np.ndarray = field(init=False)

    def __post_init__(self):
        betas = np.asarray(self.betas, dtype=np.float64)
        alphas = 1.0 - betas
        ac = np.cumprod(alphas)
        acp = np.append(1.0, ac[:-1])
        pv = betas * (1.0 - acp) / (1.0 - ac)
        object.__setattr__(self, "alphas_cumprod", ac)
        object.__setattr__(self, "alphas_cumprod_prev", acp)
        object.__setattr__(self, "sqrt_alphas_cumprod", np.sqrt(ac))
        object.__setattr__(self, "sqrt_one_minus_alphas_cumprod", np.sqrt(1.0 - ac))
        object.__setattr__(self, "sqrt_recip_alphas_cumprod", np.sqrt(1.0 / ac))
        object.__setattr__(self, "sqrt_recipm1_alphas_cumprod", np.sqrt(1.0 / ac - 1.0))
        object.__setattr__(self, "posterior_variance", pv)
        object.__setattr__(
            self, "posterior_log_variance_clipped", np.log(np.maximum(pv, 1e-20))
        )
        object.__setattr__(
            self, "posterior_mean_coef1", betas * np.sqrt(acp) / (1.0 - ac)
        )
        object.__setattr__(
            self, "posterior_mean_coef2", (1.0 - acp) * np.sqrt(alphas) / (1.0 - ac)
        )

    @property
    def timesteps(self) -> int:
        return len(self.betas)

    @staticmethod
    def create(schedule_type: str = "linear", timesteps: int = 1000, **kwargs) -> "DiffusionSchedule":
        return DiffusionSchedule(betas=beta_schedule[schedule_type](timesteps, **kwargs))
