"""Copy-synthesis evaluation: run a trained acoustic model over its binarized
validation (or train) set with ground-truth alignment/f0 and report mel MAE.

The reference has no objective offline eval (SURVEY §4 — quality assurance is
TensorBoard inspection); this productizes the BASELINE.json "mel MAE" metric:

    python scripts/eval.py --exp my_exp [--dataset valid] [--limit N]

Each item goes through ``DiffSingerAcousticInfer``'s jitted synthesis
function — the exact production path (checkpoint loading incl. torch
conversion, dictionary work-dir fallback, Pallas kernels, sampler dispatch) —
with the dataset's ground-truth mel2ph/f0/variances as conditioning, and the
result is compared to the stored GT mel over non-padding frames.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from .metrics import mel_mae


def _checkpoint_step(work_dir) -> int:
    from ..training.checkpoint import latest_checkpoint

    ck = latest_checkpoint(work_dir)
    if ck is None:  # reference torch single-file checkpoints
        cks = sorted(Path(work_dir).glob("model_ckpt_steps_*.ckpt"))
        ck = cks[-1] if cks else None
    if ck is None:
        return -1
    m = re.search(r"(\d+)", Path(ck).name)
    return int(m.group(1)) if m else -1


def _batch_from_item(cfg, infer, b: Dict[str, np.ndarray]) -> Dict:
    """Map an AcousticDataset.collate batch (B=1) onto the synthesis-fn
    input contract (inference/acoustic.py preprocess_input layout)."""
    batch = {"tokens": b["tokens"], "mel2ph": b["mel2ph"], "f0": b["f0"]}
    for v in infer.variances_to_embed:
        batch[v] = b[v]
    if cfg.get("use_key_shift_embed", False):
        batch["key_shift"] = b["key_shift"]
    if cfg.get("use_speed_embed", False):
        batch["speed"] = b["speed"]
    if cfg.get("use_spk_id", False):
        # single-speaker "mix": the item's own speaker at weight 1
        batch["spk_mix_id"] = b["spk_ids"].reshape(1, 1, 1).astype(np.int32)
        batch["spk_mix_value"] = np.ones((1, 1, 1), np.float32)
    return batch


def evaluate_acoustic(
    cfg, dataset: str = "valid", limit: Optional[int] = None, seed: int = 0,
) -> Dict:
    """Returns {"items": [{name, frames, mel_mae, aux_mae}...],
    "mean_mel_mae": float[, "mean_aux_mae": float], "step": int}."""
    from ..data.dataset import AcousticDataset
    from ..inference.acoustic import DiffSingerAcousticInfer
    from ..models.toplevel import AcousticModel

    infer = DiffSingerAcousticInfer(cfg, load_vocoder=False)
    ds = AcousticDataset(cfg["binary_data_dir"], dataset, cfg)

    use_shallow = cfg.get("use_shallow_diffusion", False)
    names = ds.metadata.get("names", [str(i) for i in range(len(ds))])
    n = len(ds) if limit is None else min(limit, len(ds))
    if n <= 0:
        raise ValueError(
            f"nothing to evaluate: dataset '{dataset}' has {len(ds)} items, limit={limit}"
        )
    items = []
    for i in range(n):
        b = ds.collate([i], pad_to_bucket=True)
        gt = np.asarray(b["mel"])
        mask = np.asarray(b["mel2ph"])[0] > 0
        batch = _batch_from_item(cfg, infer, b)

        pred = infer.forward_model(batch, seed=seed + i)  # jitted production path
        mae = mel_mae(pred[0][mask], gt[0][mask])

        aux_mae = None
        if use_shallow:
            kwargs = {}
            if "key_shift" in batch:
                kwargs["key_shift"] = jnp.asarray(batch["key_shift"])
            if "speed" in batch:
                kwargs["speed"] = jnp.asarray(batch["speed"])
            if "spk_mix_id" in batch:
                table = infer.params["params"]["fs2"]["spk_embed"]["embedding"]
                emb = jnp.take(jnp.asarray(table), jnp.asarray(batch["spk_mix_id"]), axis=0)
                kwargs["spk_mix_embed"] = jnp.sum(
                    emb * jnp.asarray(batch["spk_mix_value"])[..., None], axis=2
                )
            variances = {v: jnp.asarray(batch[v]) for v in infer.variances_to_embed}
            if variances:
                kwargs["variances"] = variances
            cond = infer.model.apply(
                infer.params, jnp.asarray(batch["tokens"]),
                jnp.asarray(batch["mel2ph"]), jnp.asarray(batch["f0"]),
                method=AcousticModel.condition, **kwargs,
            )
            aux = infer.model.apply(infer.params, cond, method=AcousticModel.aux_out)
            aux = aux * (jnp.asarray(batch["mel2ph"]) > 0)[:, :, None]
            aux_val = np.asarray(infer.normalizer.denorm(aux[:, None]))
            aux_mae = mel_mae(aux_val[0][mask], gt[0][mask])

        items.append({
            "name": str(names[i]) if i < len(names) else str(i),
            "frames": int(mask.sum()),
            "mel_mae": float(mae),
            "aux_mae": None if aux_mae is None else float(aux_mae),
        })

    out = {
        "step": _checkpoint_step(cfg["work_dir"]),
        "dataset": dataset,
        "items": items,
        "mean_mel_mae": float(np.mean([it["mel_mae"] for it in items])),
    }
    if use_shallow:
        out["mean_aux_mae"] = float(np.mean([it["aux_mae"] for it in items]))
    return out
