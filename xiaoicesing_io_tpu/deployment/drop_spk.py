"""Speaker-embedding scrubbing for privacy.

Parity with ``/root/reference/scripts/drop_spk.py``: drop or retain specific
speaker ids in a checkpoint's spk_embed table with zeros / random / mean /
cyclic fill.  Works on both our orbax checkpoints and torch reference ones
(converted in memory first).
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Set

import numpy as np


def modify_spk_embed(
    spk_embed: np.ndarray,
    drop_ids: Optional[Set[int]] = None,
    retain_ids: Optional[Set[int]] = None,
    fill: str = "zeros",
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    num_spk, hidden = spk_embed.shape
    all_ids = set(range(num_spk))
    if drop_ids is not None:
        drop = set(drop_ids).intersection(all_ids)
    else:
        assert retain_ids is not None, "Either drop_ids or retain_ids must be given."
        drop = all_ids - set(retain_ids)
    out = np.array(spk_embed, copy=True)
    rng = rng or np.random.default_rng()
    if fill == "zeros":
        fills = [np.zeros(hidden, out.dtype) for _ in drop]
    elif fill == "random":
        fills = [rng.standard_normal(hidden).astype(out.dtype) for _ in drop]
    elif fill == "mean":
        mean = out.mean(axis=0)
        fills = [mean for _ in drop]
    elif fill == "cyclic":
        retain = sorted(all_ids - drop)
        assert retain, "cyclic fill requires at least one retained speaker"
        fills = [out[retain[i % len(retain)]] for i in range(len(drop))]
    else:
        raise ValueError(f"unknown fill method {fill}")
    for spk_id, f in zip(sorted(drop), fills):
        out[spk_id] = f
    return out


def drop_speakers(exp: str, spk: List[str], fill: str = "zeros",
                  work_dir_root: str = "checkpoints", retain: bool = False,
                  out: str = None, overwrite: bool = False):
    """Scrub speakers (by name via spk_map, or numeric id) in the latest
    checkpoint of an experiment.  ``retain=True`` inverts the selection: the
    listed speakers are KEPT and all others scrubbed (ref:
    scripts/drop_spk.py --retain).  With ``out`` the scrubbed checkpoint is
    written to a new directory (the reference's input/output file pair,
    scripts/drop_spk.py:33-45); otherwise the checkpoint is edited in place,
    which requires ``overwrite=True``."""
    import json

    from ..training.checkpoint import latest_checkpoint, _checkpointer

    work_dir = Path(work_dir_root) / exp
    path = latest_checkpoint(work_dir)
    assert path is not None, f"no checkpoint found in {work_dir}"
    spk_map = {}
    if (work_dir / "spk_map.json").exists():
        with open(work_dir / "spk_map.json") as f:
            spk_map = json.load(f)
    ids = {
        spk_map[s] if s in spk_map else int(s) for s in spk
    }
    drop_ids = None if retain else ids
    ckptr = _checkpointer()
    restored = ckptr.restore(Path(path).resolve())
    params = restored["params"]
    changed = False
    for holder in (params.get("fs2", {}), params):
        if "spk_embed" in holder and "embedding" in holder["spk_embed"]:
            holder["spk_embed"]["embedding"] = modify_spk_embed(
                np.asarray(holder["spk_embed"]["embedding"]), drop_ids=drop_ids,
                retain_ids=ids if retain else None,
                fill=fill,
            )
            changed = True
    assert changed, "checkpoint has no speaker embedding table"
    import shutil

    meta = None
    if (path / "meta.json").exists():
        meta = (path / "meta.json").read_text()
    if out is not None:
        dest = Path(out)
        if dest.exists():
            assert overwrite, f"{dest} exists; pass --overwrite to replace it"
            shutil.rmtree(dest)
        ckptr.save(dest.resolve(), restored)
        ckptr.wait_until_finished()
    else:
        assert overwrite, (
            f"refusing to edit {path} in place without --overwrite "
            f"(pass --out to write elsewhere)"
        )
        dest = path
        # write the scrubbed checkpoint NEXT TO the original and swap only
        # after the save succeeded, so a failure mid-save cannot destroy the
        # experiment's only checkpoint
        tmp = path.with_name(path.name + ".scrub_tmp")
        if tmp.exists():
            shutil.rmtree(tmp)
        ckptr.save(tmp.resolve(), restored)
        ckptr.wait_until_finished()
        shutil.rmtree(path)
        tmp.rename(path)
    if meta is not None:
        (dest / "meta.json").write_text(meta)
    what = f"all speakers except {sorted(ids)}" if retain else f"speakers {sorted(ids)}"
    print(f"| scrubbed {what} -> {dest}")
