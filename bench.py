"""Benchmark: full audio synthesis throughput on one chip.

Measures the complete synthesis pipeline — encoder condition + aux decoder +
K=50 scan-fused sampler steps (Pallas-fused LYNX denoiser) + time-folded
NSF-HiFiGAN vocoding to 44.1 kHz waveform — and reports audio-seconds
synthesized per wall-second per chip.

The FINAL line printed is the headline JSON:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.
``vs_baseline`` is the real-time factor (the reference publishes no numbers —
BASELINE.md — so 1x realtime is the anchor). Diagnostic JSON lines (the
XLA-vs-Pallas WaveNet margin check, per VERDICT r2 task 5) are printed
BEFORE the headline so the driver's last-JSON-line parse still sees the
headline.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import jax

# persistent compile cache: the axon remote-compile service is slow and
# variable; caching makes repeated bench runs start in seconds
jax.config.update("jax_compilation_cache_dir", str(Path(__file__).parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

# Defaults chosen by the round-3 shape sweep (docs/PerformanceNotes.md):
# B=4 x T=2048 is the measured sweet spot — the sweep found batch scaling
# NEGATIVE beyond it (B=8 x T=4096 collapses on HBM), so larger batches do
# NOT amortize better for this denoiser size.
B = 4
T_F = 2048  # frames per segment (~23.8 s audio at hop 512 / 44.1 kHz)
K = 50  # denoiser steps
VOCAB = 62
USE_PALLAS = True


def _time_enqueued(fn, iters=20, warmup=1):
    """Axon-safe timing: enqueue ``iters`` calls, one host fetch at the end.

    block_until_ready does not synchronize through the axon tunnel; a host
    fetch of one scalar is the only reliable sync point.
    """
    out = None
    for _ in range(warmup):
        out = fn()
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    start = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - start) / iters


def wavenet_margin_check(B, T_F):
    """Time BOTH the XLA and Pallas WaveNet denoiser steps (both bf16).

    Emits one diagnostic JSON line so BENCH_r*.json tracks the margin across
    sessions; if it inverts, the wavenet_use_pallas default is wrong
    (VERDICT r2 task 5 / ADVICE r2: the XLA baseline must be built at
    bf16 to match the Pallas kernel's compute dtype).
    """
    import functools

    from xiaoicesing_io_tpu.models.backbones import build_backbone
    from xiaoicesing_io_tpu.models.backbones.wavenet_pallas import (
        wavenet_denoiser_apply,
    )

    M, H, C, L = 128, 256, 512, 20
    bb = build_backbone(
        M, 1, "wavenet",
        {"num_layers": L, "num_channels": C, "dilation_cycle_length": 4},
        cond_dims=H, dtype=jnp.bfloat16,
    )
    rng = np.random.default_rng(0)
    spec = jnp.asarray(rng.standard_normal((B, 1, T_F, M)).astype(np.float32))
    step = jnp.full((B,), 123.0)
    cond = jnp.asarray(rng.standard_normal((B, T_F, H)).astype(np.float32))
    params = bb.init(jax.random.PRNGKey(0), spec, step, cond)

    xla = jax.jit(lambda p, s, t, c: bb.apply(p, s, t, c))
    t_xla = _time_enqueued(lambda: xla(params, spec, step, cond), iters=20)
    pallas = jax.jit(functools.partial(
        wavenet_denoiser_apply, num_layers=L, dilation_cycle_length=4))
    t_pal = _time_enqueued(lambda: pallas(params, spec, step, cond), iters=20)
    print(json.dumps({
        "metric": "wavenet_step_ms_bf16",
        "xla": round(t_xla * 1000, 2),
        "pallas": round(t_pal * 1000, 2),
        "pallas_wins": bool(t_pal < t_xla),
        "shape": f"B={B} T={T_F} C=512 L=20",
    }), flush=True)


def main(B=B, T_F=T_F, K=K, wavenet_check=True):
    from xiaoicesing_io_tpu.config import load_config
    from xiaoicesing_io_tpu.models.toplevel import AcousticModel
    from xiaoicesing_io_tpu.training.acoustic import build_acoustic

    cfg = load_config(Path(__file__).parent / "xiaoicesing_io_tpu/configs/acoustic.yaml")
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

    t_start = cfg.get("T_start_infer", 0.4)

    # params must be jit ARGUMENTS (closing over them would bake every weight
    # into the HLO as inline constants — a ~600 MB program).  The pipeline is
    # split into named stages so the bench can attribute the headline number
    # (VERDICT r3 task 4: session-to-session drift must be assignable to
    # encoder/sampler/vocoder); the HEADLINE still times the single fused
    # jit so no cross-stage fusion is lost to the diagnostic split.
    def cond_aux_fn(params, tokens, mel2ph, f0):
        cond = model.apply(params, tokens, mel2ph, f0, method=AcousticModel.condition)
        aux = model.apply(params, cond, method=AcousticModel.aux_out)
        aux = aux * (mel2ph > 0)[:, :, None]
        return cond, aux

    def sample_fn(params, cond, aux, mel2ph, key):
        if USE_PALLAS:
            from xiaoicesing_io_tpu.models.backbones.lynx_pallas import (
                lynx_cond_projections,
                lynx_denoiser_apply,
            )

            bargs = cfg["backbone_args"]
            # loop-invariant across the K sampler steps: compute once
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
                ).astype(jnp.float32)
        else:
            def velocity_fn(x, t):
                return model.apply(
                    params, x, t, cond, method=AcousticModel.denoise
                ).astype(jnp.float32)

        x = core.inference(
            velocity_fn, key, (B, 1, T_F, M),
            x_end=aux.astype(jnp.float32)[:, None], t_start=t_start,
            steps=K, algorithm="euler",
        )
        mel = normalizer.denorm(x)
        return mel * (mel2ph > 0)[:, :, None]

    def synthesize(params, tokens, mel2ph, f0, key):
        cond, aux = cond_aux_fn(params, tokens, mel2ph, f0)
        return sample_fn(params, cond, aux, mel2ph, key)

    # vocoder: time-folded NSF-HiFiGAN (random weights — identical compute
    # cost to trained ones)
    from xiaoicesing_io_tpu.models.vocoders.nsf_fast import FastNsfHifigan
    from xiaoicesing_io_tpu.models.vocoders.nsf_hifigan import (
        Generator,
        NsfHifiganConfig,
    )

    vcfg = NsfHifiganConfig()
    gen = Generator(vcfg, dtype=jnp.bfloat16)
    vparams = gen.init(
        jax.random.PRNGKey(2), jnp.zeros((B, T_F, M)), jnp.full((B, T_F), 220.0)
    )
    # stages 0-1 as fused whole-stage Pallas kernels: 110.7 -> 89.5 ms
    # (docs/PerformanceNotes.md round-2 sweep)
    fast_voc = FastNsfHifigan(vcfg, vparams, dtype=jnp.bfloat16,
                              pallas_stages=(0, 1), pallas_tile=1024)

    fn = jax.jit(synthesize)
    key = jax.random.PRNGKey(1)
    # warmup/compile; NOTE: on the axon tunnel block_until_ready does not
    # actually synchronize — a host fetch (np.asarray) is the only reliable
    # sync point, and it carries seconds of variable round-trip latency.
    # So: sync once, enqueue many iterations (device executes them
    # back-to-back on its stream), sync once, amortize.
    mel = fn(params, tokens, mel2ph, f0, key)
    np.asarray(fast_voc(mel, f0).ravel()[:1])

    iters = 20
    start = time.perf_counter()
    for i in range(iters):
        mel = fn(params, tokens, mel2ph, f0, jax.random.fold_in(key, i))
        wav = fast_voc(mel, f0)
    np.asarray(wav.ravel()[:1])
    elapsed = (time.perf_counter() - start) / iters

    # -- per-stage attribution (diagnostics; printed before the headline) ---
    # each stage is timed as its own jit on the same inputs; `residual` is
    # headline_total - sum(stages): jit-boundary/dispatch overhead plus any
    # fusion the split loses.  A drifting headline now names its stage.
    try:
        j_cond = jax.jit(cond_aux_fn)
        j_sample = jax.jit(sample_fn)
        cond_d, aux_d = j_cond(params, tokens, mel2ph, f0)
        t_cond = _time_enqueued(lambda: j_cond(params, tokens, mel2ph, f0), iters=20)
        t_sampler = _time_enqueued(
            lambda: j_sample(params, cond_d, aux_d, mel2ph, key), iters=10)
        t_voc = _time_enqueued(lambda: fast_voc(mel, f0), iters=10)
        def _cost(jitted, *args):
            """(flops, bytes_accessed) from XLA cost_analysis, 0.0 if absent.
            Pallas custom-calls are opaque to the analysis, so callers must
            prefer an XLA-built program computing the SAME math."""
            ca = jitted.lower(*args).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))

        # sampler flops: analyze ONE denoiser step and scale by K — XLA's
        # cost_analysis does not multiply a scan/while body by its trip count
        # (observed: whole-sampler "flops" ~1000x too small, MFU 0.0).  The
        # XLA AcousticModel.denoise step computes the same math as the timed
        # Pallas kernel (equivalence-tested in tests/test_lynx_pallas.py),
        # and the analysis can't see inside Pallas custom-calls, so the flop
        # count is always taken from the XLA build; `sampler_flops_source`
        # says whether the TIMED program was that same XLA step or the
        # Pallas kernel (then the MFU is an xla-estimated flop count over
        # the Pallas runtime).
        sampler_flops = None
        sampler_flops_source = None
        try:
            def _one_step(params, x, t, cond):
                return model.apply(params, x, t, cond,
                                   method=AcousticModel.denoise)

            x0 = jnp.zeros((B, 1, T_F, M), jnp.float32)
            t0 = jnp.zeros((B,), jnp.float32)
            step_flops, _ = _cost(jax.jit(_one_step), params, x0, t0, cond_d)
            if step_flops > 0:
                sampler_flops = step_flops * K
                sampler_flops_source = (
                    "xla-estimate-of-pallas-step" if USE_PALLAS else "timed-step"
                )
        except Exception:
            pass
        # v5e (TPU v5 lite) peak ~197 TFLOP/s bf16 — MFU is indicative only
        PEAK_FLOPS, PEAK_HBM = 197e12, 819e9
        mfu = (sampler_flops / t_sampler / PEAK_FLOPS) if sampler_flops else None

        # vocoder roofline (VERDICT r4 task 5): flops/bytes from the pure-XLA
        # generator (identical math to the time-folded/Pallas-staged fast
        # path), timed against the production fast path.  "bytes accessed"
        # is XLA's PRE-FUSION nominal traffic (every op's reads+writes), an
        # upper bound on real HBM bytes — so demand_x_peak > 1 at modest MFU
        # proves the stage sits on the bandwidth roof even after fusion
        # recovers part of the nominal traffic; compute headroom would show
        # as BOTH ratios being low.
        voc_mfu = voc_hbm = voc_bound = None
        try:
            j_voc_xla = jax.jit(lambda p, m, f: gen.apply(p, m, f))
            voc_flops, voc_bytes = _cost(j_voc_xla, vparams, mel, f0)
            if voc_flops > 0:
                voc_mfu = voc_flops / t_voc / PEAK_FLOPS
                voc_hbm = voc_bytes / t_voc / PEAK_HBM
                voc_bound = (
                    "bandwidth" if voc_hbm > max(1.0, voc_mfu) else
                    "compute" if voc_mfu > 0.5 else "mixed"
                )
        except Exception:
            pass
        print(json.dumps({
            "metric": "stage_breakdown_ms",
            "cond_aux": round(t_cond * 1e3, 2),
            "sampler": round(t_sampler * 1e3, 2),
            "sampler_ms_per_step": round(t_sampler * 1e3 / K, 3),
            "vocoder": round(t_voc * 1e3, 2),
            "stage_sum": round((t_cond + t_sampler + t_voc) * 1e3, 2),
            "headline_total": round(elapsed * 1e3, 2),
            "residual": round((elapsed - t_cond - t_sampler - t_voc) * 1e3, 2),
            "sampler_mfu_bf16_v5e": round(mfu, 3) if mfu else None,
            "sampler_flops_source": sampler_flops_source,
            "vocoder_mfu_bf16_v5e": round(voc_mfu, 3) if voc_mfu else None,
            "vocoder_hbm_demand_x_peak": round(voc_hbm, 3) if voc_hbm else None,
            "vocoder_bound": voc_bound,
        }), flush=True)
    except Exception as e:  # noqa: BLE001 - diagnostic must not kill the bench
        print(json.dumps({"metric": "stage_breakdown_ms", "error": str(e)}),
              flush=True)

    if wavenet_check:
        # margin diagnostic FIRST so the headline stays the last JSON line
        try:
            wavenet_margin_check(4, 2048)
        except Exception as e:  # noqa: BLE001 - diagnostic must not kill the bench
            print(json.dumps({"metric": "wavenet_step_ms_bf16", "error": str(e)}),
                  flush=True)

    audio_seconds = B * T_F * cfg["hop_size"] / cfg["audio_sample_rate"]
    throughput = audio_seconds / elapsed
    print(
        json.dumps(
            {
                "metric": "audio_seconds_synthesized_per_s_per_chip",
                "value": round(throughput, 2),
                "unit": f"audio_s/s/chip (full wav: B={B} T={T_F} K={K} reflow + NSF-HiFiGAN, bf16)",
                "vs_baseline": round(throughput, 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=B)
    ap.add_argument("--t", type=int, default=T_F)
    ap.add_argument("--k", type=int, default=K)
    ap.add_argument("--no-wavenet-check", action="store_true")
    args = ap.parse_args()
    main(B=args.b, T_F=args.t, K=args.k, wavenet_check=not args.no_wavenet_check)
