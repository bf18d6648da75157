"""Checkpoint save/load with the reference's retention semantics.

Parity targets:
* ``model_ckpt_steps_{N}`` naming, keep top-``num_ckpt_keep`` by step, plus
  permanent checkpoints every ``permanent_ckpt_interval`` after
  ``permanent_ckpt_start`` exempt from deletion
  (ref: ``utils/training_utils.py:203-283``)
* category stamping ('acoustic'/'variance') checked on load
  (ref: ``basics/base_module.py:9-18``, ``base_task.py:472-475``)
* resume from the latest checkpoint (ref: ``base_task.py:468``,
  ``get_latest_checkpoint_path`` ``utils/training_utils.py:286-303``)
* loading torch reference checkpoints through the converter
  (``utils/torch_ckpt.py``) for parity evaluation.

Storage: orbax StandardCheckpointer (async-capable, multi-host safe) + a
sidecar ``meta.json``.
"""

from __future__ import annotations

import json
import re
import shutil
from pathlib import Path
from typing import Dict, List, Optional

import jax
import numpy as np

CKPT_RE = re.compile(r"model_ckpt_steps_(\d+)$")


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def list_checkpoints(work_dir, complete_only: bool = True) -> List[Path]:
    """Checkpoint dirs sorted by step.  A dir without ``meta.json`` is an
    incomplete save (the stall watchdog can execve() between orbax finalizing
    the dir and the meta write) — by default such dirs are excluded, so
    resume falls back to the previous complete checkpoint instead of
    crashing on every restart."""
    work_dir = Path(work_dir)
    if not work_dir.exists():
        return []
    out = [p for p in work_dir.iterdir() if p.is_dir() and CKPT_RE.search(p.name)]
    if complete_only:
        out = [p for p in out if (p / "meta.json").exists()]
    return sorted(out, key=lambda p: int(CKPT_RE.search(p.name).group(1)))


def latest_checkpoint(work_dir) -> Optional[Path]:
    ckpts = list_checkpoints(work_dir)
    return ckpts[-1] if ckpts else None


class CheckpointManager:
    def __init__(
        self,
        work_dir,
        category: str,
        num_ckpt_keep: int = 5,
        permanent_ckpt_start: int = 0,
        permanent_ckpt_interval: int = -1,
    ):
        self.work_dir = Path(work_dir)
        self.category = category
        self.num_ckpt_keep = num_ckpt_keep
        self.permanent_ckpt_start = permanent_ckpt_start
        self.permanent_ckpt_interval = permanent_ckpt_interval
        self.work_dir.mkdir(parents=True, exist_ok=True)

    def _is_permanent(self, step: int) -> bool:
        return (
            self.permanent_ckpt_interval > 0
            and step >= self.permanent_ckpt_start
            and (step - self.permanent_ckpt_start) % self.permanent_ckpt_interval == 0
        )

    def save(self, state, step: int, extra_meta: Optional[Dict] = None) -> Path:
        """Write ``model_ckpt_steps_{step}``.

        Multi-process: orbax's save is a COLLECTIVE (internal cross-host
        barriers even for host-local numpy payloads), so EVERY process must
        call this together; only the primary host mutates the filesystem
        (shared-storage layout, same as the reference's rank-zero
        checkpoint callback)."""
        path = self.work_dir / f"model_ckpt_steps_{step}"
        ckptr = _checkpointer()
        payload = {
            "params": jax.tree.map(np.asarray, state.params),
            "opt_state": jax.tree.map(np.asarray, state.opt_state),
        }
        multi = jax.process_count() > 1
        primary = jax.process_index() == 0
        if multi:
            from jax.experimental import multihost_utils

            if path.exists() and primary:
                shutil.rmtree(path)
            multihost_utils.sync_global_devices(f"ckpt_pre_{step}")
        elif path.exists():
            shutil.rmtree(path)
        ckptr.save(path.resolve(), payload)
        ckptr.wait_until_finished()
        if primary:
            meta = {"step": step, "category": self.category}
            meta.update(extra_meta or {})
            with open(path / "meta.json", "w") as f:
                json.dump(meta, f)
            self._cleanup()
        if multi:
            # non-primary hosts must not race ahead (e.g. into a resume)
            # before meta.json lands
            multihost_utils.sync_global_devices(f"ckpt_post_{step}")
        return path

    def _cleanup(self):
        # stale incomplete dirs (no meta.json — an earlier save was cut short
        # mid-finalize) are never loadable: remove them so they cannot shadow
        # a step or accumulate.  _cleanup only runs after THIS save's meta
        # write, so the dir just written is never in this list.
        complete = set(list_checkpoints(self.work_dir))
        for p in list_checkpoints(self.work_dir, complete_only=False):
            if p not in complete:
                shutil.rmtree(p, ignore_errors=True)
        ckpts = list_checkpoints(self.work_dir)
        deletable = [
            p for p in ckpts if not self._is_permanent(int(CKPT_RE.search(p.name).group(1)))
        ]
        for p in deletable[: max(0, len(deletable) - self.num_ckpt_keep)]:
            shutil.rmtree(p)

    def restore_latest(self, state, with_meta: bool = False) -> tuple:
        """-> (state, step[, meta]) — state unchanged if no checkpoint exists."""
        path = latest_checkpoint(self.work_dir)
        if path is None:
            return (state, 0, {}) if with_meta else (state, 0)
        state, meta = load_checkpoint(path, state, expected_category=self.category)
        return (state, meta["step"], meta) if with_meta else (state, meta["step"])


def load_checkpoint(path, state, expected_category: Optional[str] = None):
    path = Path(path)
    with open(path / "meta.json") as f:
        meta = json.load(f)
    if expected_category is not None and meta.get("category") != expected_category:
        raise ValueError(
            f"Checkpoint at {path} has category {meta.get('category')!r}, "
            f"expected {expected_category!r} (ref: basics/base_module.py:9-18)"
        )
    ckptr = _checkpointer()
    template = {
        "params": jax.tree.map(np.asarray, state.params),
        "opt_state": jax.tree.map(np.asarray, state.opt_state),
    }
    restored = ckptr.restore(path.resolve(), template)
    import jax.numpy as jnp

    state = state.replace(
        step=jnp.asarray(meta["step"], jnp.int32),
        params=restored["params"],
        opt_state=restored["opt_state"],
    )
    return state, meta


def load_params_for_inference(work_dir, cfg, ckpt_steps: Optional[int] = None):
    """Load model params only.  Accepts both our orbax layout and reference
    torch ``model_ckpt_steps_N.ckpt`` files (converted on the fly;
    ref load path: ``utils/__init__.py:166-222``)."""
    work_dir = Path(work_dir)
    # torch reference checkpoints are single files
    torch_ckpts = sorted(
        work_dir.glob("model_ckpt_steps_*.ckpt"),
        key=lambda p: int(re.search(r"(\d+)", p.stem).group(1)),
    )
    if ckpt_steps is not None:
        ours = work_dir / f"model_ckpt_steps_{ckpt_steps}"
        # exact step match (a substring test would let step 2000 load 12000)
        torch_ckpts = [
            p for p in torch_ckpts
            if int(re.search(r"(\d+)", p.stem).group(1)) == int(ckpt_steps)
        ]
    else:
        ours = latest_checkpoint(work_dir)
    if ours is not None and Path(ours).exists() and (Path(ours) / "meta.json").exists():
        ckptr = _checkpointer()
        restored = ckptr.restore(Path(ours).resolve())
        return {"params": restored["params"]}
    if torch_ckpts:
        from ..utils.torch_ckpt import convert_acoustic, convert_variance, load_torch_file

        ckpt = load_torch_file(torch_ckpts[-1])
        sd = ckpt.get("state_dict", ckpt)
        category = ckpt.get("category")
        if category is None:
            category = "variance" if any("pitch_predictor" in k for k in sd) else "acoustic"
        conv = convert_variance if category == "variance" else convert_acoustic
        return conv(sd, cfg)
    raise FileNotFoundError(f"No checkpoint found in {work_dir}")
