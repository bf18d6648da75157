"""Why the L1-trained aux decoder beats the diffusion head on MAE/MCD —
and what the diffusion head is actually better at.

Three measurements on held-out items of a trained acoustic experiment:

1. **Sample dispersion**: MAE between two sampler runs (different seeds)
   of the SAME item. If it is on the order of the sample-vs-GT MAE, the
   full pipeline's MAE is dominated by stochastic dispersion, not bias —
   an L1 metric structurally favors the L1-optimal (conditional-median)
   aux decoder over ANY sample from a correctly learned distribution.
2. **Posterior-mean MAE**: averaging K sampler outputs approximates the
   posterior mean; its MAE isolates the bias term. If mean-of-samples
   MAE approaches the aux MAE, the diffusion head is calibrated and its
   per-sample MAE gap IS the dispersion.
3. **Sharpness / detail match**: mel local contrast (mean |Δ| along time
   and along the mel axis) for GT, aux, and diffusion samples. L1-optimal
   predictors are over-smoothed (contrast below GT); a good diffusion
   sample should match GT contrast. This is the quantity MAE cannot see.

Usage: python tools/sharpness_probe.py --exp E [--ckpt N] [--items 4]
       [--seeds 4] [--out out.json]
"""

import argparse
import json
import pathlib
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]


def local_contrast(mel: np.ndarray) -> dict:
    """Mean absolute difference along time and mel axes (sharpness proxy)."""
    return {
        "dt": float(np.mean(np.abs(np.diff(mel, axis=0)))),
        "df": float(np.mean(np.abs(np.diff(mel, axis=1)))),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", required=True)
    ap.add_argument("--ckpt", type=int, default=None)
    ap.add_argument("--items", type=int, default=4)
    ap.add_argument("--seeds", type=int, default=4)
    ap.add_argument("--dataset", default="valid")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    sys.path.insert(0, str(REPO))
    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from xiaoicesing_io_tpu.config import load_config
    from xiaoicesing_io_tpu.data.dataset import AcousticDataset
    from xiaoicesing_io_tpu.eval.copy_synthesis import _batch_from_item
    from xiaoicesing_io_tpu.eval.metrics import mel_mae
    from xiaoicesing_io_tpu.inference.acoustic import DiffSingerAcousticInfer
    from xiaoicesing_io_tpu.models.toplevel import AcousticModel

    cfg = load_config(None, exp_name=args.exp, infer=True)
    ds = AcousticDataset(cfg["binary_data_dir"], args.dataset, cfg)
    infer = DiffSingerAcousticInfer(cfg, load_vocoder=False,
                                    ckpt_steps=args.ckpt)

    rows = []
    for i in range(min(args.items, len(ds))):
        b = ds.collate([i], pad_to_bucket=True)
        gt = np.asarray(b["mel"], np.float64)
        mask = np.asarray(b["mel2ph"])[0] > 0
        batch = _batch_from_item(cfg, infer, b)

        samples = []
        for s in range(args.seeds):
            pred = infer.forward_model(batch, seed=s)  # production path
            samples.append(np.asarray(pred, np.float64)[0][mask])

        kwargs = {}
        if "spk_mix_id" in batch:
            table = infer.params["params"]["fs2"]["spk_embed"]["embedding"]
            emb = jnp.take(jnp.asarray(table), jnp.asarray(batch["spk_mix_id"]),
                           axis=0)
            kwargs["spk_mix_embed"] = jnp.sum(
                emb * jnp.asarray(batch["spk_mix_value"])[..., None], axis=2)
        cond = infer.model.apply(
            infer.params, jnp.asarray(batch["tokens"]),
            jnp.asarray(batch["mel2ph"]), jnp.asarray(batch["f0"]),
            method=AcousticModel.condition, **kwargs,
        )
        aux = infer.model.apply(infer.params, cond, method=AcousticModel.aux_out)
        aux = np.asarray(infer.normalizer.denorm(aux[:, None]), np.float64)
        aux = aux[0][mask]
        gt_m = gt[0][mask]
        disp = [mel_mae(samples[a], samples[b])
                for a in range(len(samples)) for b in range(a + 1, len(samples))]
        post_mean = np.mean(samples, axis=0)
        rows.append({
            "item": i,
            "mae_sample_gt": float(np.mean([mel_mae(s, gt_m) for s in samples])),
            "mae_aux_gt": float(mel_mae(aux, gt_m)),
            "mae_between_samples": float(np.mean(disp)),
            "mae_postmean_gt": float(mel_mae(post_mean, gt_m)),
            "contrast_gt": local_contrast(gt_m),
            "contrast_aux": local_contrast(aux),
            "contrast_sample": local_contrast(samples[0]),
        })
        print(f"| item {i}: sample->gt {rows[-1]['mae_sample_gt']:.4f}  "
              f"aux->gt {rows[-1]['mae_aux_gt']:.4f}  "
              f"sample<->sample {rows[-1]['mae_between_samples']:.4f}  "
              f"mean-of-{args.seeds}->gt {rows[-1]['mae_postmean_gt']:.4f}",
              flush=True)

    def _avg(path):
        vals = [r for r in rows]
        for k in path.split("."):
            vals = [v[k] for v in vals]
        return float(np.mean(vals))

    # per-item win counts + two-sided binomial sign test (VERDICT r4 task
    # 1b: a mean carried by one item is not a crossover — report whether
    # the posterior mean beats the aux decoder ITEM-WISE, with the p-value
    # of the sign test against a 50/50 null)
    from math import comb

    n = len(rows)

    def _sign_test(wins):
        m = min(wins, n - wins)
        return min(1.0, 2 * sum(comb(n, k) for k in range(m + 1)) / 2 ** n)

    postmean_wins = sum(
        1 for r in rows if r["mae_postmean_gt"] < r["mae_aux_gt"])
    single_wins = sum(
        1 for r in rows if r["mae_sample_gt"] < r["mae_aux_gt"])

    report = {
        "exp": args.exp, "ckpt": args.ckpt, "items": len(rows),
        "seeds": args.seeds,
        "postmean_wins_items": postmean_wins,
        "postmean_sign_test_p": _sign_test(postmean_wins),
        "single_sample_wins_items": single_wins,
        "single_sample_sign_test_p": _sign_test(single_wins),
        "mean_mae_sample_gt": _avg("mae_sample_gt"),
        "mean_mae_aux_gt": _avg("mae_aux_gt"),
        "mean_mae_between_samples": _avg("mae_between_samples"),
        "mean_mae_postmean_gt": _avg("mae_postmean_gt"),
        "contrast": {
            "gt_dt": _avg("contrast_gt.dt"), "gt_df": _avg("contrast_gt.df"),
            "aux_dt": _avg("contrast_aux.dt"), "aux_df": _avg("contrast_aux.df"),
            "sample_dt": _avg("contrast_sample.dt"),
            "sample_df": _avg("contrast_sample.df"),
        },
        "rows": rows,
    }
    print(json.dumps({k: v for k, v in report.items() if k != "rows"},
                     indent=2))
    if args.out:
        p = pathlib.Path(args.out)
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
