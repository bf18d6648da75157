"""Matched reference run: does the REFERENCE show the same aux-vs-diffusion
L1 ordering on held-out data?

The round-4 convergence study found that a single diffusion sample loses to
the L1-trained aux decoder on held-out mel MAE/MCD (dispersion dominates;
the posterior mean crosses). This probe trains the REFERENCE's own
`DiffSingerAcoustic` (torch, CPU, imported read-only as an oracle exactly
like tests/test_reference_parity.py — no reference code ships here) at a
small matched config on the SAME binarized corpus, and evaluates aux vs
sampled mel on the SAME held-out items. If the reference shows the same
ordering, the ordering is a property of the objective/metric, not of this
framework's implementation.

Matched config (both frameworks): hidden 64, enc_layers 2, LYNXNet 96x2
(strong_cond), ConvNeXt aux 48x1, reflow T_start 0.4, l2 main loss,
lambda_aux 0.2, Adam 4e-4, same step count, frame-budget batches.

Round 5 extends the probe per VERDICT task 3: converge the run (5-10k
steps), evaluate every ``--eval-every`` steps (partial JSON written after
each eval so an interrupted run still leaves committed evidence), sample
``--seeds`` seeds per item (dispersion + 4-sample posterior mean), and
record the temporal-contrast (sharpness) metric on the reference outputs —
the same three measurements tools/sharpness_probe.py makes on our side.

Usage:
  python tools/ref_ordering_probe.py --binary .work/corpus_r4/binary \
      --steps 6000 --eval-every 1500 --out docs/convergence_r5/ref_ordering.json
"""

import argparse
import json
import pathlib
import sys
import time
import types

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
REFERENCE = pathlib.Path("/root/reference")

HPARAMS = {
    "hidden_size": 64,
    "enc_layers": 2,
    "enc_ffn_kernel_size": 3,
    "ffn_act": "gelu",
    "dropout": 0.0,
    "num_heads": 2,
    "use_pos_embed": True,
    "rel_pos": True,
    "use_rope": True,
    "use_spk_id": False,
    "use_energy_embed": False,
    "use_breathiness_embed": False,
    "use_voicing_embed": False,
    "use_tension_embed": False,
    "use_key_shift_embed": False,
    "use_speed_embed": False,
    "audio_num_mel_bins": 128,
    "diffusion_type": "reflow",
    "T_start": 0.4,
    "T_start_infer": 0.4,
    "time_scale_factor": 1000,
    "sampling_algorithm": "euler",
    "sampling_steps": 20,
    "spec_min": [-12],
    "spec_max": [0],
    "backbone_type": "lynxnet",
    "backbone_args": {
        "num_channels": 96, "num_layers": 2, "kernel_size": 31,
        "strong_cond": True,
    },
    "use_shallow_diffusion": True,
    "shallow_diffusion_args": {
        "train_aux_decoder": True,
        "train_diffusion": True,
        "val_gt_start": False,
        "aux_decoder_arch": "convnext",
        "aux_decoder_args": {
            "num_channels": 48, "num_layers": 1, "kernel_size": 7,
            "dropout_rate": 0.0,
        },
        "aux_decoder_grad": 0.1,
    },
    "main_loss_type": "l2",
    "main_loss_log_norm": False,
    "lambda_aux_mel_loss": 0.2,
    "infer": False,  # reference tqdm gate read inside sampling loops
}


def _install_lightning_stub():
    from unittest import mock

    if "lightning" in sys.modules:
        return

    class _StubModule(types.ModuleType):
        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)
            if name == "rank_zero_info":
                return print
            if name == "rank_zero_only":
                return lambda f: f
            if name[0].isupper():
                return type(name, (), {"__init__": lambda self, *a, **k: None})
            return mock.MagicMock()

    for mod in [
        "lightning", "lightning.pytorch", "lightning.pytorch.callbacks",
        "lightning.pytorch.loggers", "lightning.pytorch.utilities",
        "lightning.pytorch.utilities.rank_zero", "lightning.fabric",
        "lightning.fabric.loggers", "lightning.fabric.loggers.tensorboard",
    ]:
        sys.modules[mod] = _StubModule(mod)
    sys.modules["lightning.fabric.loggers.tensorboard"]._TENSORBOARD_AVAILABLE = False


def _batches(items, budget, max_items, rng):
    order = rng.permutation(len(items))
    order = order[np.argsort([len(items[i]["f0"]) for i in order], kind="stable")]
    batches, cur, cur_max = [], [], 0
    for i in order:
        t = len(items[i]["f0"])
        if cur and (max(cur_max, t) * (len(cur) + 1) > budget or len(cur) >= max_items):
            batches.append(cur)
            cur, cur_max = [], 0
        cur.append(int(i))
        cur_max = max(cur_max, t)
    if cur:
        batches.append(cur)
    rng.shuffle(batches)
    return batches


def local_contrast(mel):
    """Mean |Δ| along time/mel axes — same sharpness proxy as sharpness_probe."""
    return {
        "dt": float(np.mean(np.abs(np.diff(mel, axis=0)))),
        "df": float(np.mean(np.abs(np.diff(mel, axis=1)))),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--binary", required=True)
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--eval-every", type=int, default=0)
    ap.add_argument("--seeds", type=int, default=4)
    ap.add_argument("--limit-train", type=int, default=160)
    ap.add_argument("--limit-valid", type=int, default=9)
    ap.add_argument("--budget", type=int, default=9000)
    ap.add_argument("--save-model", default=None)
    ap.add_argument("--init-from", default=None,
                    help="state_dict .pt to continue from (with --start-step)")
    ap.add_argument("--start-step", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    sys.path.insert(0, str(REPO))
    sys.path.insert(0, str(REFERENCE))
    _install_lightning_stub()
    import torch

    torch.manual_seed(0)
    from utils.hparams import hparams  # reference global config

    hparams.clear()
    hparams.update(HPARAMS)
    from modules.losses.reflow_loss import RectifiedFlowLoss
    from modules.toplevel import DiffSingerAcoustic

    from xiaoicesing_io_tpu.data.indexed_dataset import IndexedDataset
    from xiaoicesing_io_tpu.eval.metrics import mcd, mel_mae

    binary = pathlib.Path(args.binary)
    train_ds = IndexedDataset(binary, "train")
    valid_ds = IndexedDataset(binary, "valid")
    n_train = min(args.limit_train, len(train_ds))
    train_items = [
        {k: np.asarray(v) for k, v in train_ds[i].items()} for i in range(n_train)
    ]
    valid_items = [
        {k: np.asarray(v) for k, v in valid_ds[i].items()}
        for i in range(min(args.limit_valid, len(valid_ds)))
    ]
    vocab = int(max(int(it["tokens"].max()) for it in train_items + valid_items)) + 1

    model = DiffSingerAcoustic(vocab_size=vocab, out_dims=128)
    n_params = sum(p.numel() for p in model.parameters())
    print(f"| reference model: {n_params/1e6:.2f} M params, vocab {vocab}")
    if args.init_from:
        model.load_state_dict(torch.load(args.init_from, weights_only=True))
        print(f"| resumed weights from {args.init_from} "
              f"(step {args.start_step})")
    opt = torch.optim.Adam(model.parameters(), lr=4e-4)
    aux_loss_fn = torch.nn.L1Loss()
    mel_loss_fn = RectifiedFlowLoss("l2", log_norm=False)

    def collate(idx):
        T = max(len(train_items[i]["f0"]) for i in idx)
        B = len(idx)
        tok_len = max(len(train_items[i]["tokens"]) for i in idx)
        tokens = np.zeros((B, tok_len), np.int64)
        mel2ph = np.zeros((B, T), np.int64)
        f0 = np.zeros((B, T), np.float32)
        mel = np.zeros((B, T, 128), np.float32)
        for j, i in enumerate(idx):
            it = train_items[i]
            t = len(it["f0"])
            tokens[j, : len(it["tokens"])] = it["tokens"]
            mel2ph[j, :t] = it["mel2ph"]
            f0[j, :t] = it["f0"]
            mel[j, :t] = it["mel"]
        return (torch.from_numpy(tokens), torch.from_numpy(mel2ph),
                torch.from_numpy(f0), torch.from_numpy(mel))

    def evaluate(step):
        """Multi-seed held-out eval: MAE/MCD + dispersion + posterior mean +
        temporal contrast — mirrors tools/sharpness_probe.py measurements."""
        model.eval()
        rows = []
        for i, it in enumerate(valid_items):
            T = len(it["f0"])
            tokens = torch.from_numpy(it["tokens"][None].astype(np.int64))
            mel2ph = torch.from_numpy(it["mel2ph"][None].astype(np.int64))
            f0 = torch.from_numpy(it["f0"][None].astype(np.float32))
            mask = it["mel2ph"] > 0
            gt_m = it["mel"][:T][mask]
            samples, aux = [], None
            for s in range(max(1, args.seeds)):
                torch.manual_seed(1000 * i + s)
                with torch.no_grad():
                    out = model(tokens, mel2ph=mel2ph, f0=f0, infer=True)
                samples.append(out.diff_out[0].numpy()[:T][mask])
                if aux is None:
                    aux = out.aux_out[0].numpy()[:T][mask]
            post_mean = np.mean(samples, axis=0)
            row = {
                "item": i,
                "full_mae": float(np.mean([mel_mae(s, gt_m) for s in samples])),
                "full_mcd": float(np.mean([mcd(s, gt_m) for s in samples])),
                "seed0_mae": float(mel_mae(samples[0], gt_m)),
                "post_mean_mae": float(mel_mae(post_mean, gt_m)),
                "post_mean_mcd": float(mcd(post_mean, gt_m)),
                "aux_mae": float(mel_mae(aux, gt_m)),
                "aux_mcd": float(mcd(aux, gt_m)),
                "dispersion_mae": float(mel_mae(samples[0], samples[1]))
                if len(samples) > 1 else None,
                "contrast_gt": local_contrast(it["mel"][:T][mask]),
                "contrast_aux": local_contrast(aux),
                "contrast_sample": local_contrast(samples[0]),
            }
            rows.append(row)
            print(f"| step {step} valid {i}: full {row['full_mae']:.4f}/"
                  f"{row['full_mcd']:.2f}dB aux {row['aux_mae']:.4f}/"
                  f"{row['aux_mcd']:.2f}dB post {row['post_mean_mae']:.4f}"
                  f" disp {row['dispersion_mae']}", flush=True)
        model.train()

        def _avg(key):
            vals = [r[key] for r in rows if r[key] is not None]
            return float(np.mean(vals)) if vals else None

        def _avgc(key, ax):
            return float(np.mean([r[key][ax] for r in rows]))

        return {
            "step": step,
            "mean_full_mae": _avg("full_mae"),
            "mean_full_mcd": _avg("full_mcd"),
            "mean_post_mean_mae": _avg("post_mean_mae"),
            "mean_post_mean_mcd": _avg("post_mean_mcd"),
            "mean_aux_mae": _avg("aux_mae"),
            "mean_aux_mcd": _avg("aux_mcd"),
            "mean_dispersion_mae": _avg("dispersion_mae"),
            "post_mean_wins_items": sum(
                1 for r in rows if r["post_mean_mae"] < r["aux_mae"]),
            "contrast": {
                "gt_dt": _avgc("contrast_gt", "dt"),
                "gt_df": _avgc("contrast_gt", "df"),
                "aux_dt": _avgc("contrast_aux", "dt"),
                "aux_df": _avgc("contrast_aux", "df"),
                "sample_dt": _avgc("contrast_sample", "dt"),
                "sample_df": _avgc("contrast_sample", "df"),
            },
            "rows": rows,
        }

    evals = []

    def write_report(final_steps):
        report = {
            "framework": "reference-torch-cpu",
            "steps": final_steps,
            "seeds": args.seeds,
            "train_items": n_train,
            "params_m": n_params / 1e6,
            "evals": evals,
        }
        if evals:
            last = evals[-1]
            for k in ("mean_full_mae", "mean_full_mcd", "mean_post_mean_mae",
                      "mean_aux_mae", "mean_aux_mcd", "mean_dispersion_mae"):
                report[k] = last[k]
            report["aux_wins_mae"] = last["mean_aux_mae"] < last["mean_full_mae"]
            report["aux_wins_mcd"] = last["mean_aux_mcd"] < last["mean_full_mcd"]
            report["contrast"] = last["contrast"]
        print(json.dumps({k: v for k, v in report.items() if k != "evals"},
                         indent=2), flush=True)
        if args.out:
            p = pathlib.Path(args.out)
            p.parent.mkdir(parents=True, exist_ok=True)
            p.write_text(json.dumps(report, indent=2))

    rng = np.random.default_rng(args.start_step)
    step = args.start_step
    t0 = time.time()
    model.train()
    while step < args.steps:
        for idx in _batches(train_items, args.budget, 12, rng):
            if step >= args.steps:
                break
            tokens, mel2ph, f0, mel = collate(idx)
            out = model(tokens, mel2ph=mel2ph, f0=f0, gt_mel=mel, infer=False)
            norm_gt = model.aux_decoder.norm_spec(mel)
            aux_l = HPARAMS["lambda_aux_mel_loss"] * aux_loss_fn(out.aux_out, norm_gt)
            v_pred, v_gt, t = out.diff_out
            non_padding = (mel2ph > 0).unsqueeze(-1).float()
            mel_l = mel_loss_fn(v_pred, v_gt, t=t, non_padding=non_padding)
            loss = aux_l + mel_l
            opt.zero_grad()
            loss.backward()
            opt.step()
            step += 1
            if step % 100 == 0:
                rate = (time.time() - t0) / max(step - args.start_step, 1)
                print(f"| step {step}: aux {float(aux_l.detach()):.4f}"
                      f" mel {float(mel_l.detach()):.4f}"
                      f" ({rate:.2f} s/step)", flush=True)
            if args.eval_every and step % args.eval_every == 0 and step < args.steps:
                evals.append(evaluate(step))
                write_report(step)
                if args.save_model:
                    torch.save(model.state_dict(), args.save_model)

    evals.append(evaluate(step))
    write_report(step)
    if args.save_model:
        torch.save(model.state_dict(), args.save_model)


if __name__ == "__main__":
    main()
