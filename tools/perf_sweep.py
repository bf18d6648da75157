"""On-chip perf sweep for the round-2 kernels (sampler layer v2, vocoder stage).

Timing method per docs/PerformanceNotes.md: the axon tunnel does not
synchronize on block_until_ready, so every timed region enqueues ``iters``
iterations and fetches one scalar at the end.

Usage:  python tools/perf_sweep.py sampler|vocoder|all
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update(
    "jax_compilation_cache_dir", str(Path(__file__).parent.parent / ".jax_cache")
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

B = 4
T_F = 2048
K = 50
VOCAB = 62


def _time(fn, iters=20, warmup=1):
    for _ in range(warmup):
        out = fn()
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    start = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - start) / iters


def sweep_sampler():
    from xiaoicesing_io_tpu.config import load_config
    from xiaoicesing_io_tpu.models.toplevel import AcousticModel
    from xiaoicesing_io_tpu.training.acoustic import build_acoustic
    from xiaoicesing_io_tpu.models.backbones.lynx_pallas import (
        lynx_cond_projections,
        lynx_denoiser_apply,
    )

    cfg = load_config(
        Path(__file__).parent.parent / "xiaoicesing_io_tpu/configs/acoustic.yaml"
    )
    cfg["sampling_steps"] = K
    model, core, normalizer = build_acoustic(cfg, VOCAB, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(1, VOCAB, size=(B, 64)).astype(np.int32))
    mel2ph = jnp.asarray(
        np.clip(np.sort(rng.integers(1, 65, size=(B, T_F))), 1, 64).astype(np.int32)
    )
    f0 = jnp.asarray(rng.uniform(100, 500, size=(B, T_F)).astype(np.float32))
    M = cfg["audio_num_mel_bins"]
    params = model.init(
        jax.random.PRNGKey(0), tokens, mel2ph, f0,
        jnp.zeros((B, 1, T_F, M)), jnp.zeros((B,)),
    )
    bargs = cfg["backbone_args"]
    key = jax.random.PRNGKey(1)

    def make_sample(mode, tile=256, dw_impl="slice", ablate="", chunks=1,
                    module_impl="v1"):
        def run(params, tokens, mel2ph, f0, key):
            cond = model.apply(params, tokens, mel2ph, f0,
                               method=AcousticModel.condition)
            aux = model.apply(params, cond, method=AcousticModel.aux_out)
            aux = aux * (mel2ph > 0)[:, :, None]
            if mode == "xla":
                def velocity_fn(x, t):
                    return model.apply(
                        params, x, t, cond, method=AcousticModel.denoise
                    ).astype(jnp.float32)
            else:
                cond_projs = lynx_cond_projections(
                    params, cond, num_layers=bargs["num_layers"]
                )

                def velocity_fn(x, t):
                    return lynx_denoiser_apply(
                        params, x, t,
                        num_layers=bargs["num_layers"],
                        strong_cond=bargs.get("strong_cond", False),
                        kernel_size=bargs.get("kernel_size", 31),
                        cond_projs=cond_projs,
                        tile=tile,
                        fused_layer=("v3" if mode == "v3" else mode == "v2"),
                        dw_impl=dw_impl,
                        ablate=ablate,
                        chunks=chunks,
                        module_impl=module_impl,
                    ).astype(jnp.float32)
            x = core.inference(
                velocity_fn, key, (B, 1, T_F, M),
                x_end=aux.astype(jnp.float32)[:, None],
                t_start=cfg.get("T_start_infer", 0.4),
                steps=K, algorithm="euler",
            )
            return normalizer.denorm(x)

        return jax.jit(run)

    which = sys.argv[2] if len(sys.argv) > 2 else "base"
    if which == "hybrid":
        # round-3: XLA matmul head + Pallas conv tail vs the v1 kernel
        configs = [
            ("v1", {"tile": 256}),
            ("v1", {"tile": 256, "module_impl": "hybrid"}),
            ("v1", {"tile": 512, "module_impl": "hybrid"}),
            ("v1", {"tile": 1024, "module_impl": "hybrid"}),
        ]
    elif which == "v3":
        configs = [
            ("v3", {"tile": 256}),
            ("v3", {"tile": 128}),
            ("v3", {"tile": 512}),
        ]
    elif which == "chunk":
        configs = [
            ("v2", {"tile": 256, "chunks": 2}),
            ("v2", {"tile": 256, "chunks": 4}),
            ("v2", {"tile": 128, "chunks": 4}),
            ("v2", {"tile": 128, "chunks": 8}),
        ]
    elif which == "ablate":
        # stage ablations of the v2 kernel: cost attribution, wrong results
        configs = [
            ("v2", {"tile": 256, "ablate": "dw"}),
            ("v2", {"tile": 256, "ablate": "swiglu"}),
            ("v2", {"tile": 256, "ablate": "ln"}),
            ("v2", {"tile": 256, "ablate": "dw,swiglu,ln"}),
        ]
    else:
        configs = [
            ("xla", {}),
            ("v1", {"tile": 256}),
            ("v2", {"tile": 256, "dw_impl": "slice"}),
            ("v2", {"tile": 256, "dw_impl": "roll"}),
            ("v2", {"tile": 512, "dw_impl": "roll"}),
            ("v2", {"tile": 512, "dw_impl": "slice"}),
        ]
    for mode, kw in configs:
        fn = make_sample(mode, **kw)
        try:
            t = _time(lambda: fn(params, tokens, mel2ph, f0, key), iters=10)
        except Exception as e:  # noqa: BLE001
            print(f"sampler {mode} {kw}: FAILED {type(e).__name__}: {e}")
            continue
        per_step = (t * 1000) / K
        print(
            f"sampler {mode} {kw}: {t*1000:.1f} ms total, {per_step:.2f} ms/step",
            flush=True,
        )


def sweep_vocoder():
    from xiaoicesing_io_tpu.models.vocoders.nsf_fast import FastNsfHifigan
    from xiaoicesing_io_tpu.models.vocoders.nsf_hifigan import (
        Generator,
        NsfHifiganConfig,
    )

    vcfg = NsfHifiganConfig()
    gen = Generator(vcfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((B, T_F, 128)).astype(np.float32))
    f0 = jnp.full((B, T_F), 220.0)
    vparams = gen.init(jax.random.PRNGKey(2), jnp.zeros((B, T_F, 128)),
                       jnp.full((B, T_F), 220.0))

    audio_s = B * T_F * 512 / 44100
    configs = [
        ((), 0),
        ((1,), 512), ((1,), 1024), ((1,), 2048),
        ((0,), 1024),
        ((0, 1), 1024),
        ((0, 1, 2), 1024),
    ]
    for stages, tile in configs:
        try:
            voc = FastNsfHifigan(vcfg, vparams, dtype=jnp.bfloat16,
                                 pallas_stages=stages, pallas_tile=tile or 1024)
            t = _time(lambda: voc(mel, f0), iters=10)
        except Exception as e:  # noqa: BLE001
            print(f"vocoder stages={stages} tile={tile}: FAILED "
                  f"{type(e).__name__}: {e}")
            continue
        print(
            f"vocoder stages={stages} tile={tile}: {t*1000:.1f} ms "
            f"({audio_s/t:.0f} audio-s/s)",
            flush=True,
        )


def sweep_wavenet():
    """XLA vs Pallas wavenet step at the acoustic WaveNet shape."""
    from xiaoicesing_io_tpu.models.backbones import build_backbone
    from xiaoicesing_io_tpu.models.backbones.wavenet_pallas import (
        wavenet_denoiser_apply,
    )

    M, H, C, L = 128, 256, 512, 20
    # dtype MUST be bf16 to match the Pallas kernel's compute_dtype — an
    # fp32 XLA baseline is not apples-to-apples (ADVICE r2)
    bb = build_backbone(M, 1, "wavenet",
                        {"num_layers": L, "num_channels": C,
                         "dilation_cycle_length": 4}, cond_dims=H,
                        dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    spec = jnp.asarray(rng.standard_normal((B, 1, T_F, M)).astype(np.float32))
    step = jnp.full((B,), 123.0)
    cond = jnp.asarray(rng.standard_normal((B, T_F, H)).astype(np.float32))
    params = bb.init(jax.random.PRNGKey(0), spec, step, cond)

    xla = jax.jit(lambda p, s, t, c: bb.apply(p, s, t, c))
    t = _time(lambda: xla(params, spec, step, cond), iters=20)
    print(f"wavenet xla: {t*1000:.2f} ms/step", flush=True)
    for tile, chunk in [(256, 1), (256, 4), (128, 4), (128, 8)]:
        fn = jax.jit(functools.partial(
            wavenet_denoiser_apply, num_layers=L, dilation_cycle_length=4,
            tile=tile, chunk=chunk,
        ))
        try:
            t = _time(lambda: fn(params, spec, step, cond), iters=20)
        except Exception as e:  # noqa: BLE001
            print(f"wavenet pallas tile={tile} chunk={chunk}: FAILED {e}")
            continue
        print(f"wavenet pallas tile={tile} chunk={chunk}: {t*1000:.2f} ms/step",
              flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("sampler", "all"):
        sweep_sampler()
    if which == "wavenet":
        sweep_wavenet()
    if which in ("vocoder", "all"):
        sweep_vocoder()
