"""Finetuning and parameter freezing.

Parity with ``/root/reference/basics/base_task.py:93-166``:
* ``frozen_params``: freeze parameters whose dotted path starts with any of
  the given prefixes (realized as zeroed gradients via an optax mask)
* ``finetune_ckpt_path`` + ``finetune_ignored_params`` blacklist +
  ``finetune_strict_shapes``: load a pretrain checkpoint, skipping
  blacklisted prefixes and (optionally) shape-mismatched tensors.

Prefix convention: reference paths look like ``model.fs2.encoder....``; the
leading ``model.`` is stripped and dots map to our pytree levels.
"""

from __future__ import annotations

from pathlib import Path
from typing import List

import flax
import numpy as np
import optax


def _path_str(key_tuple) -> str:
    return ".".join(str(k) for k in key_tuple)


def _norm_prefix(p: str) -> str:
    return p.removeprefix("model.")


def freeze_mask(params, frozen_prefixes: List[str]):
    """Pytree of 'frozen'/'trainable' labels for optax.multi_transform."""
    flat = flax.traverse_util.flatten_dict(params)
    prefixes = [_norm_prefix(p) for p in frozen_prefixes]
    labels = {
        k: "frozen" if any(_path_str(k).startswith(p) for p in prefixes) else "trainable"
        for k in flat
    }
    return flax.traverse_util.unflatten_dict(labels)


def wrap_optimizer_with_freezing(tx, params, frozen_prefixes: List[str]):
    if not frozen_prefixes:
        return tx
    labels = freeze_mask(params, frozen_prefixes)
    n_frozen = sum(
        1 for v in flax.traverse_util.flatten_dict(labels).values() if v == "frozen"
    )
    print(f"| freezing {n_frozen} parameter tensors (prefixes: {frozen_prefixes})")
    return optax.multi_transform(
        {"trainable": tx, "frozen": optax.set_to_zero()}, labels
    )


def load_finetune_params(params, cfg, model_category: str):
    """Merge a pretrain checkpoint into freshly initialized params."""
    ckpt_path = Path(cfg["finetune_ckpt_path"])
    blacklist = [_norm_prefix(b) for b in (cfg.get("finetune_ignored_params") or [])]
    strict_shapes = cfg.get("finetune_strict_shapes", True)

    if ckpt_path.is_dir():
        from .checkpoint import _checkpointer
        import json

        with open(ckpt_path / "meta.json") as f:
            meta = json.load(f)
        if meta.get("category") not in (None, model_category):
            raise ValueError(
                f"Finetune checkpoint category {meta.get('category')!r} != {model_category!r}"
            )
        restored = _checkpointer().restore(ckpt_path.resolve())
        src = restored["params"]
    else:
        # torch reference checkpoint
        from ..utils.torch_ckpt import convert_acoustic, convert_variance, load_torch_file

        ckpt = load_torch_file(ckpt_path)
        if ckpt.get("category") not in (None, model_category):
            raise ValueError(
                f"Finetune checkpoint category {ckpt.get('category')!r} != {model_category!r}"
            )
        conv = convert_variance if model_category == "variance" else convert_acoustic
        src = conv(ckpt.get("state_dict", ckpt), cfg)["params"]

    dst = flax.traverse_util.flatten_dict(params)
    src_flat = flax.traverse_util.flatten_dict(src)
    merged = dict(dst)
    loaded, skipped, mismatched = 0, 0, 0
    for k, v in src_flat.items():
        path = _path_str(k)
        if any(path.startswith(b) for b in blacklist):
            skipped += 1
            continue
        if k not in dst:
            continue
        if np.shape(dst[k]) != np.shape(v):
            if strict_shapes:
                raise ValueError(
                    f"Shape mismatch for {path}: {np.shape(dst[k])} vs {np.shape(v)} "
                    "(set finetune_strict_shapes: false to skip)"
                )
            print(f"| Unmatched keys: {path} {np.shape(dst[k])} {np.shape(v)}")
            mismatched += 1
            continue
        merged[k] = np.asarray(v, dtype=np.asarray(dst[k]).dtype)
        loaded += 1
    print(f"| finetune load: {loaded} tensors loaded, {skipped} blacklisted, "
          f"{mismatched} shape-mismatched")
    return flax.traverse_util.unflatten_dict(merged)
