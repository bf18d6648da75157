"""Copy-synthesis evaluation: run a trained acoustic model over its binarized
validation (or train) set with ground-truth alignment/f0 and report mel MAE.

The reference has no objective offline eval (SURVEY §4 — quality assurance is
TensorBoard inspection); this productizes the BASELINE.json "mel MAE" metric:

    python scripts/eval.py --exp my_exp [--dataset valid] [--limit N]

Per item: condition(GT mel2ph, GT f0) -> aux decoder -> shallow start ->
sampler -> denorm, compared to the stored GT mel over non-padding frames.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .metrics import mel_mae


def evaluate_acoustic(
    cfg, dataset: str = "valid", limit: Optional[int] = None, seed: int = 0,
) -> Dict:
    """Returns {"items": [{name, frames, mel_mae, aux_mae}...],
    "mean_mel_mae": float, "mean_aux_mae": float}."""
    from ..data.dataset import AcousticDataset
    from ..models.toplevel import AcousticModel
    from ..training.acoustic import build_acoustic, init_acoustic_state
    from ..training.checkpoint import CheckpointManager
    from ..utils.phonemes import PhonemeDictionary
    from ..utils.text_encoder import TokenTextEncoder

    phdict = PhonemeDictionary.load(cfg["dictionary"])
    enc = TokenTextEncoder(phdict.phoneme_list)
    ds = AcousticDataset(cfg["binary_data_dir"], dataset, cfg)

    model, core, normalizer = build_acoustic(cfg, enc.vocab_size)
    state = init_acoustic_state(model, cfg, enc.vocab_size, jax.random.PRNGKey(0))
    mgr = CheckpointManager(
        cfg["work_dir"], category="acoustic",
        num_ckpt_keep=cfg.get("num_ckpt_keep", 5),
    )
    state, step, _ = mgr.restore_latest(state, with_meta=True)
    if step == 0:
        raise FileNotFoundError(f"no checkpoint found in {cfg['work_dir']}")
    params = {"params": state.params}

    use_shallow = cfg.get("use_shallow_diffusion", False)
    names = ds.metadata.get("names", [str(i) for i in range(len(ds))])
    n = len(ds) if limit is None else min(limit, len(ds))
    items = []
    for i in range(n):
        b = ds.collate([i], pad_to_bucket=True)
        tokens = jnp.asarray(b["tokens"])
        mel2ph = jnp.asarray(b["mel2ph"])
        f0 = jnp.asarray(b["f0"])
        gt = np.asarray(b["mel"])

        kwargs = {}
        if cfg.get("use_spk_id", False):
            kwargs["spk_embed_id"] = jnp.asarray(b["spk_id"])
        variances = {
            k: jnp.asarray(b[k])
            for k in ("energy", "breathiness", "voicing", "tension")
            if k in b and cfg.get(f"use_{k}_embed", False)
        }
        if variances:
            kwargs["variances"] = variances
        if cfg.get("use_key_shift_embed", False) and "key_shift" in b:
            kwargs["key_shift"] = jnp.asarray(b["key_shift"])
        if cfg.get("use_speed_embed", False) and "speed" in b:
            kwargs["speed"] = jnp.asarray(b["speed"])

        cond = model.apply(params, tokens, mel2ph, f0,
                           method=AcousticModel.condition, **kwargs)
        mask = np.asarray(mel2ph)[0] > 0
        shape = (1, 1, gt.shape[1], gt.shape[2])
        x_end = None
        aux_mae = None
        if use_shallow:
            aux = model.apply(params, cond, method=AcousticModel.aux_out)
            aux = aux * (mel2ph > 0)[:, :, None]
            aux_val = np.asarray(normalizer.denorm(aux[:, None]))
            aux_mae = mel_mae(aux_val[0][mask], gt[0][mask])
            x_end = aux.astype(jnp.float32)[:, None]

        def denoise_fn(x, t):
            return model.apply(params, x, t, cond,
                               method=AcousticModel.denoise).astype(jnp.float32)

        key = jax.random.fold_in(jax.random.PRNGKey(seed & 0xFFFFFFFF), i)
        if cfg.get("diffusion_type", "reflow") == "ddpm":
            x = core.inference(
                denoise_fn, key, shape, x_start=x_end,
                depth=cfg.get("K_step_infer", core.k_step),
                speedup=cfg.get("diff_speedup", 10),
                algorithm=cfg.get("diff_accelerator", "ddim"),
            )
        else:
            x = core.inference(
                denoise_fn, key, shape, x_end=x_end,
                t_start=cfg.get("T_start_infer", cfg.get("T_start", 0.0)),
                steps=int(cfg.get("sampling_steps", 20)),
                algorithm=cfg.get("sampling_algorithm", "euler"),
            )
        pred = np.asarray(normalizer.denorm(x))[0]
        mae = mel_mae(pred[mask], gt[0][mask])
        items.append({
            "name": str(names[i]) if i < len(names) else str(i),
            "frames": int(mask.sum()),
            "mel_mae": float(mae),
            "aux_mae": None if aux_mae is None else float(aux_mae),
        })

    out = {
        "step": int(step),
        "dataset": dataset,
        "items": items,
        "mean_mel_mae": float(np.mean([it["mel_mae"] for it in items])),
    }
    if use_shallow:
        out["mean_aux_mae"] = float(np.mean([it["aux_mae"] for it in items]))
    return out
