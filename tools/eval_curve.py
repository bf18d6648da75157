"""Per-checkpoint metric curves in a single process.

Evaluates every (or selected) permanent checkpoint of an experiment with
the copy-synthesis evaluator, reusing the process's compiled programs
across checkpoints — on a remote/tunneled compiler this is ~N times
cheaper than N ``eval --ckpt`` CLI invocations.

Usage:
  python tools/eval_curve.py --exp E --out docs/convergence_r4 \
      [--steps 2000,4000,...] [--dataset valid] [--limit N] [--prefix ac]
"""

import argparse
import json
import pathlib
import re
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", default="",
                    help="comma-separated checkpoint steps (default: all)")
    ap.add_argument("--dataset", default="valid", choices=["valid", "train"])
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--prefix", default="",
                    help="output filename prefix (default: exp name)")
    args = ap.parse_args()

    sys.path.insert(0, str(REPO))
    import jax

    cache = REPO / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from xiaoicesing_io_tpu.config import load_config

    cfg = load_config(None, exp_name=args.exp, infer=True)
    work_dir = pathlib.Path(cfg["work_dir"])
    if args.steps:
        steps = [int(s) for s in args.steps.split(",")]
    else:
        steps = sorted(
            int(m.group(1))
            for p in work_dir.glob("model_ckpt_steps_*")
            if (m := re.search(r"(\d+)$", p.name))
        )
    out_dir = pathlib.Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)
    prefix = args.prefix or args.exp
    is_variance = "variance" in str(cfg.get("task_cls", "")).lower()
    from xiaoicesing_io_tpu.eval.copy_synthesis import (
        evaluate_acoustic, evaluate_variance,
    )

    for step in steps:
        if is_variance:
            report = evaluate_variance(
                cfg, dataset=args.dataset, limit=args.limit, ckpt_steps=step)
            line = " ".join(
                f"{k}={report[k]:.4f}" for k in
                ("rhythm_corr", "ph_dur_acc", "pitch_acc") if k in report)
        else:
            report = evaluate_acoustic(
                cfg, dataset=args.dataset, limit=args.limit, ckpt_steps=step)
            line = (f"mel_mae={report['mean_mel_mae']:.4f} "
                    f"mcd={report['mean_mcd_db']:.3f}dB")
            if "mean_aux_mae" in report:
                line += (f" aux_mae={report['mean_aux_mae']:.4f}"
                         f" aux_mcd={report.get('mean_aux_mcd_db', 0):.3f}dB")
        path = out_dir / f"{prefix}_{args.dataset}_{step}.json"
        path.write_text(json.dumps(report, indent=2))
        print(f"| step {step} {args.dataset}: {line} -> {path}", flush=True)


if __name__ == "__main__":
    main()
