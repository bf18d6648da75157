"""Diffusion / rectified-flow cores: normalization, q-sampling, inference.

Functional re-design of ``/root/reference/modules/core/ddpm.py`` and
``reflow.py``: the cores hold only static schedule data and pure math; the
denoiser network lives in the linen toplevel modules and is passed in as a
``denoise_fn(x, t)`` closure, so the K-step samplers (``samplers.py``) compile
into single fused XLA loops.

Model-domain layout: ``x`` is ``[B, F, T, M]`` (mel bins / repeat bins last).
Value-domain layouts: mel ``[B, T, M]``; curves ``[B, T]`` per feature.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import samplers
from .schedule import DiffusionSchedule


class SpecNormalizer:
    """[value domain] <-> [-1, 1] model domain, with repeat-bins support.

    Parity: GaussianDiffusion.norm_spec/denorm_spec (ddpm.py:379-383),
    RepetitiveDiffusion (:386-421), PitchDiffusion clamps (:424-445),
    MultiVarianceDiffusion stacking/clamps (:448-505).
    """

    def __init__(
        self,
        spec_min: Sequence,
        spec_max: Sequence,
        num_feats: int = 1,
        repeat_bins: Optional[int] = None,
        clamps: Optional[List[Optional[Tuple[Optional[float], Optional[float]]]]] = None,
    ):
        self.num_feats = num_feats
        self.repeat_bins = repeat_bins
        self.clamps = clamps
        smin = np.asarray(spec_min, dtype=np.float32).reshape(num_feats, -1)
        smax = np.asarray(spec_max, dtype=np.float32).reshape(num_feats, -1)
        # broadcast over [B, F, T, M]
        self.spec_min = smin[None, :, None, :]
        self.spec_max = smax[None, :, None, :]

    def _clamp(self, xs: List[jnp.ndarray]) -> List[jnp.ndarray]:
        if self.clamps is None:
            return xs
        out = []
        for x, c in zip(xs, self.clamps):
            if c is None:
                out.append(x)
            else:
                out.append(jnp.clip(x, c[0], c[1]))
        return out

    def norm(self, x) -> jnp.ndarray:
        """Value domain -> model domain [B, F, T, M].

        * mel: x [B, T, M] (num_feats=1, repeat_bins=None)
        * curves: list of [B, T] per feature (repeat_bins=R)
        """
        if self.repeat_bins is None:
            x = jnp.asarray(x)[:, None, :, :]  # [B, 1, T, M]
        else:
            xs = [x] if not isinstance(x, (list, tuple)) else list(x)
            xs = self._clamp(xs)
            x = jnp.stack(xs, axis=1)  # [B, F, T]
            x = jnp.repeat(x[..., None], self.repeat_bins, axis=-1)  # [B, F, T, R]
        mn, mx = jnp.asarray(self.spec_min), jnp.asarray(self.spec_max)
        return (x - mn) / (mx - mn) * 2.0 - 1.0

    def denorm(self, x: jnp.ndarray):
        """Model domain [B, F, T, M] -> value domain."""
        mn, mx = jnp.asarray(self.spec_min), jnp.asarray(self.spec_max)
        x = (x + 1.0) / 2.0 * (mx - mn) + mn
        if self.repeat_bins is None:
            return x[:, 0]  # [B, T, M]
        x = jnp.mean(x, axis=-1)  # [B, F, T]
        xs = [x[:, i] for i in range(self.num_feats)]
        xs = self._clamp(xs)
        return xs[0] if self.num_feats == 1 else xs


@dataclass(frozen=True)
class GaussianDiffusion:
    """DDPM core (math parity: ddpm.py:55-351)."""

    schedule: DiffusionSchedule
    timesteps: int = 1000
    k_step: int = 1000

    def q_sample(self, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
        """Forward-noise x_start at integer step t [B]."""
        sac = jnp.asarray(self.schedule.sqrt_alphas_cumprod, jnp.float32)[t]
        s1m = jnp.asarray(self.schedule.sqrt_one_minus_alphas_cumprod, jnp.float32)[t]
        shape = (-1,) + (1,) * (x_start.ndim - 1)
        return sac.reshape(shape) * x_start + s1m.reshape(shape) * noise

    def sample_t(self, key: jax.Array, batch: int) -> jnp.ndarray:
        return jax.random.randint(key, (batch,), 0, self.k_step)

    def inference(
        self,
        denoise_fn: samplers.DenoiseFn,
        key: jax.Array,
        shape: Tuple[int, ...],  # [B, F, T, M]
        x_start: Optional[jnp.ndarray] = None,  # normed source spec (shallow)
        depth: Optional[int] = None,
        speedup: int = 1,
        algorithm: str = "ddim",
        solver_order: int = 2,
        unipc_variant: str = "bh2",
        noise: Optional[jnp.ndarray] = None,  # parity testing: external noise
    ) -> jnp.ndarray:
        """Run the sampling loop; returns model-domain x [B, F, T, M].

        Mirrors GaussianDiffusion.inference (ddpm.py:221-351): shallow start
        from q_sample(x_start, t_max-1) when t_max < timesteps.
        """
        depth = self.k_step if depth is None else depth
        t_max = min(depth, self.k_step)
        key, nkey = jax.random.split(key)
        if noise is None:
            noise = jax.random.normal(nkey, shape, dtype=jnp.float32)
        if t_max >= self.timesteps:
            x = noise
        elif t_max > 0:
            assert x_start is not None, "Missing shallow diffusion source."
            t = jnp.full((shape[0],), t_max - 1, dtype=jnp.int32)
            x = self.q_sample(x_start, t, noise)
        else:
            assert x_start is not None, "Missing shallow diffusion source."
            return x_start

        if speedup > 1:
            if algorithm == "ddim":
                x = samplers.sample_ddim(self.schedule, denoise_fn, x, t_max, speedup)
            elif algorithm == "pndm":
                x = samplers.sample_plms(self.schedule, denoise_fn, x, t_max, speedup)
            elif algorithm == "dpm-solver":
                x = samplers.sample_dpmpp(
                    self.schedule, denoise_fn, x, t_max, t_max // speedup,
                    order=solver_order,
                )
            elif algorithm == "unipc":
                x = samplers.sample_unipc_bh2(
                    self.schedule, denoise_fn, x, t_max, t_max // speedup,
                    variant=unipc_variant,
                )
            else:
                raise ValueError(f"Unsupported DDPM acceleration algorithm: {algorithm}")
        else:
            x = samplers.sample_ddpm(self.schedule, denoise_fn, x, t_max, key)
        return x


@dataclass(frozen=True)
class RectifiedFlow:
    """Rectified-flow core (math parity: reflow.py:13-138)."""

    t_start: float = 0.0
    time_scale_factor: float = 1000.0

    def sample_t(self, key: jax.Array, batch: int) -> jnp.ndarray:
        """Uniform t in [t_start, 1] (reflow.py:52)."""
        return self.t_start + (1.0 - self.t_start) * jax.random.uniform(key, (batch,))

    def interpolate(self, x_start: jnp.ndarray, x_end: jnp.ndarray, t: jnp.ndarray):
        """x_t = x0 + t (x1 - x0); target v = x1 - x0 (reflow.py:36-41)."""
        shape = (-1,) + (1,) * (x_end.ndim - 1)
        x_t = x_start + t.reshape(shape) * (x_end - x_start)
        return x_t, x_end - x_start

    def inference(
        self,
        velocity_fn: samplers.DenoiseFn,
        key: jax.Array,
        shape: Tuple[int, ...],
        x_end: Optional[jnp.ndarray] = None,
        t_start: Optional[float] = None,
        steps: int = 20,
        algorithm: str = "euler",
        noise: Optional[jnp.ndarray] = None,  # parity testing: external noise
    ) -> jnp.ndarray:
        t0 = self.t_start if t_start is None else t_start
        if noise is None:
            noise = jax.random.normal(key, shape, dtype=jnp.float32)
        if t0 > 0:
            assert x_end is not None, "Missing shallow diffusion source."
            if t0 >= 1.0:
                return x_end
            x = t0 * x_end + (1 - t0) * noise
        else:
            t0 = 0.0
            x = noise
        return samplers.sample_reflow(
            velocity_fn, x, t0, steps, time_scale_factor=self.time_scale_factor,
            algorithm=algorithm,
        )
