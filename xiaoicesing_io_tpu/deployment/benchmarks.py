"""Deployment latency micro-benchmarks.

Parity with ``/root/reference/deployment/benchmarks/``: timed loops for the
acoustic model (10 tokens / 100 frames / 20 runs, speedup 20 — the
reference's DirectML harness shape) and the vocoder (1000 frames / 20 runs),
here against the jitted TPU graphs.

NOTE (axon quirk): synchronization is via host fetch, so the loop enqueues
all runs and fetches once.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def bench_acoustic(cfg, params=None, tokens_n: int = 10, frames: int = 100,
                   runs: int = 20, steps: int = 20, vocab: int = 62):
    from ..models.toplevel import AcousticModel
    from ..training.acoustic import build_acoustic

    model, core, normalizer = build_acoustic(cfg, vocab, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(1, vocab, (1, tokens_n)).astype(np.int32))
    mel2ph = jnp.asarray(
        np.clip(np.sort(rng.integers(1, tokens_n + 1, (1, frames))), 1, tokens_n
                ).astype(np.int32))
    f0 = jnp.asarray(rng.uniform(100, 500, (1, frames)).astype(np.float32))
    M = cfg["audio_num_mel_bins"]
    if params is None:
        params = model.init(jax.random.PRNGKey(0), tokens, mel2ph, f0,
                            jnp.zeros((1, 1, frames, M)), jnp.zeros((1,)))

    from ..models.diffusion.core import GaussianDiffusion

    use_shallow = cfg.get("use_shallow_diffusion", False) and model.aux_decoder is not None

    def run(params, tokens, mel2ph, f0, key):
        cond = model.apply(params, tokens, mel2ph, f0, method=AcousticModel.condition)
        aux = None
        if use_shallow:
            aux = model.apply(params, cond, method=AcousticModel.aux_out)
            aux = aux.astype(jnp.float32)[:, None]

        def fn(x, t):
            return model.apply(params, x, t, cond,
                               method=AcousticModel.denoise).astype(jnp.float32)

        shape = (1, 1, frames, M)
        if isinstance(core, GaussianDiffusion):
            x = core.inference(
                fn, key, shape, x_start=aux,
                speedup=max(1, cfg.get("diff_speedup", 1000 // max(1, steps))),
                algorithm=cfg.get("diff_accelerator", "ddim"),
            )
        else:
            x = core.inference(
                fn, key, shape, x_end=aux,
                t_start=cfg.get("T_start_infer", 0.4) if use_shallow else 0.0,
                steps=steps,
            )
        return normalizer.denorm(x)

    f = jax.jit(run)
    key = jax.random.PRNGKey(1)
    np.asarray(f(params, tokens, mel2ph, f0, key).ravel()[:1])
    t0 = time.perf_counter()
    for i in range(runs):
        out = f(params, tokens, mel2ph, f0, jax.random.fold_in(key, i))
    np.asarray(out.ravel()[:1])
    dt = (time.perf_counter() - t0) / runs
    print(f"| acoustic: {tokens_n} tokens / {frames} frames / {steps} steps: "
          f"{dt * 1000:.2f} ms/run")
    return dt


def bench_vocoder(cfg=None, params=None, frames: int = 1000, runs: int = 20):
    from ..models.vocoders.nsf_hifigan import Generator, NsfHifiganConfig

    vcfg = NsfHifiganConfig()
    gen = Generator(vcfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((1, frames, vcfg.num_mels)).astype(np.float32))
    f0 = jnp.asarray(rng.uniform(100, 500, (1, frames)).astype(np.float32))
    if params is None:
        params = gen.init(jax.random.PRNGKey(0), mel, f0)
    f = jax.jit(lambda p, m, ff: gen.apply(p, m, ff))
    np.asarray(f(params, mel, f0).ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(runs):
        out = f(params, mel, f0)
    np.asarray(out.ravel()[:1])
    dt = (time.perf_counter() - t0) / runs
    audio_s = frames * vcfg.hop_size / vcfg.sampling_rate
    print(f"| vocoder: {frames} frames: {dt * 1000:.2f} ms/run "
          f"({audio_s / dt:.1f} audio-s/s)")
    return dt
