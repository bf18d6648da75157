"""Sampling-cost/quality sweep: mel MAE + MCD vs (algorithm, steps).

The reference ships `sampling_steps`/`sampling_algorithm` as free knobs
(ref configs/acoustic.yaml:73-94 — default 20 Euler steps) but publishes no
quality-vs-cost data.  This probe quantifies the tradeoff on a trained
checkpoint: every (algorithm, K) config is evaluated over the same held-out
items with the same per-item seeds (paired comparison), so orderings are
directly interpretable.  NFE = number of denoiser evaluations = K x stages
per step (euler 1, rk2 2, rk4 4) — the column to read against bench.py
throughput, whose sampler cost is linear in NFE.

Usage:
  python tools/ksweep_probe.py --exp <exp> [--limit N] [--seed S]
      [--out docs/convergence_r5/ksweep.json]

Writes per-config mean/per-item metrics plus a paired sign count of each
config vs the euler@50 anchor.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update(
    "jax_compilation_cache_dir", str(Path(__file__).resolve().parents[1] / ".jax_cache")
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

NFE_PER_STEP = {"euler": 1, "rk2": 2, "rk4": 4}

# (algorithm, steps): the headline anchor, the reference default, cheaper
# Euler budgets, and higher-order samplers at the reference-default NFE=20
# budget (rk2@10 and rk4@5 spend exactly euler@20's compute).
SWEEP = [
    ("euler", 50),
    ("euler", 20),
    ("euler", 10),
    ("euler", 5),
    ("rk2", 10),
    ("rk4", 5),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", required=True)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--ckpt", type=int, default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from xiaoicesing_io_tpu.config import load_config
    from xiaoicesing_io_tpu.data.dataset import AcousticDataset
    from xiaoicesing_io_tpu.eval.copy_synthesis import evaluate_acoustic

    # one padded shape for every item -> one sampler compile per config
    cfg0 = load_config(None, exp_name=args.exp, infer=True)
    ds = AcousticDataset(cfg0["binary_data_dir"], "valid", cfg0)
    n = len(ds) if args.limit is None else min(args.limit, len(ds))
    pad_f = max(ds[i]["mel"].shape[0] for i in range(n))
    pad_t = max(len(ds[i]["tokens"]) for i in range(n))
    del ds

    results = []
    for algo, steps in SWEEP:
        cfg = load_config(None, exp_name=args.exp, infer=True)
        cfg["sampling_algorithm"] = algo
        cfg["sampling_steps"] = steps
        report = evaluate_acoustic(
            cfg, dataset="valid", limit=args.limit, seed=args.seed,
            ckpt_steps=args.ckpt, pad_frames_to=pad_f, pad_tokens_to=pad_t,
        )
        row = {
            "algorithm": algo,
            "steps": steps,
            "nfe": steps * NFE_PER_STEP[algo],
            "mean_mel_mae": report["mean_mel_mae"],
            "mean_mcd_db": report["mean_mcd_db"],
            "items": [
                {"name": it["name"], "mel_mae": it["mel_mae"],
                 "mcd_db": it["mcd_db"]}
                for it in report["items"]
            ],
            "step": report["step"],
        }
        results.append(row)
        print(f"| {algo}@{steps} (NFE {row['nfe']}): "
              f"mae={row['mean_mel_mae']:.4f} mcd={row['mean_mcd_db']:.3f}dB",
              flush=True)

    # paired sign counts vs the euler@50 anchor (same items, same seeds)
    anchor = {it["name"]: it["mel_mae"] for it in results[0]["items"]}
    for row in results[1:]:
        wins = sum(1 for it in row["items"] if it["mel_mae"] < anchor[it["name"]])
        losses = sum(1 for it in row["items"] if it["mel_mae"] > anchor[it["name"]])
        row["vs_euler50_item_wins"] = wins
        row["vs_euler50_item_losses"] = losses
        print(f"| {row['algorithm']}@{row['steps']} vs euler@50: "
              f"{wins}W/{losses}L of {len(row['items'])}", flush=True)

    if args.out:
        out = Path(args.out)
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(json.dumps({
            "exp": args.exp, "seed": args.seed, "sweep": results,
        }, indent=2))
        print(f"| wrote {out}")


if __name__ == "__main__":
    main()
