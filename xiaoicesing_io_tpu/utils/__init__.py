"""Core utilities shared across the framework."""

from __future__ import annotations

import importlib
import inspect
import re
from typing import Any, Callable, Dict, List, Sequence

import numpy as np


def filter_kwargs(kwargs: Dict[str, Any], fn: Callable) -> Dict[str, Any]:
    """Keep only kwargs accepted by ``fn``'s signature.

    Capability parity with the reference's ``utils.filter_kwargs``
    (``/root/reference/utils/__init__.py:149-163``).
    """
    sig = inspect.signature(fn)
    if any(p.kind == inspect.Parameter.VAR_KEYWORD for p in sig.parameters.values()):
        return dict(kwargs)
    return {k: v for k, v in kwargs.items() if k in sig.parameters}


def build_object_from_class_name(cls_path: str, base_cls=None, *args, **kwargs):
    """Instantiate ``pkg.mod.Class`` by dotted path, filtering kwargs.

    Mirrors ``/root/reference/utils/__init__.py:266-276``; used for optimizer /
    scheduler / task / binarizer factories configured by class path.
    """
    mod_name, cls_name = cls_path.rsplit(".", 1)
    cls = getattr(importlib.import_module(mod_name), cls_name)
    if base_cls is not None and not issubclass(cls, base_cls):
        raise TypeError(f"{cls_path} is not a subclass of {base_cls}")
    return cls(*args, **filter_kwargs(kwargs, cls.__init__))


def collate_nd(
    arrays: Sequence[np.ndarray],
    pad_value=0,
    max_len: int | None = None,
    dtype=None,
    rows: int | None = None,
) -> np.ndarray:
    """Pad a list of nd-arrays along dim 0 to a common length and stack.

    NumPy equivalent of ``/root/reference/utils/__init__.py:29-38``, with two
    host-throughput extensions used by the training collate (the feed thread
    shares 2 vCPUs with everything else, so avoidable copies starve the TPU):
    ``dtype`` casts during the single placement write instead of a separate
    full-array ``astype`` copy, and ``rows`` over-allocates the batch axis so
    fixed-shape batching needs no second concatenate/pad pass.
    """
    tgt = max(a.shape[0] for a in arrays) if max_len is None else max_len
    arr0 = np.asarray(arrays[0])
    n = max(len(arrays), rows or 0)
    shape = (n, tgt, *arr0.shape[1:])
    dt = np.dtype(dtype) if dtype is not None else arr0.dtype
    if pad_value == 0:
        out = np.zeros(shape, dtype=dt)  # calloc: untouched pages stay lazy
    else:
        out = np.full(shape, pad_value, dtype=dt)
    for i, a in enumerate(arrays):
        out[i, : a.shape[0]] = a
    return out


def random_continuous_masks(B: int, T: int, rng: np.random.Generator) -> np.ndarray:
    """Random continuous True spans, one per row ([start, end) True).

    Equivalent behavior to ``/root/reference/utils/__init__.py:41-51`` which
    draws two sorted cut points per row.
    """
    ends = rng.integers(0, T + 1, size=(B, 2))
    ends.sort(axis=1)
    idx = np.arange(T)[None, :]
    return (idx >= ends[:, :1]) & (idx < ends[:, 1:])


def batch_by_size(
    indices: np.ndarray,
    num_frames_fn: Callable[[int], int],
    max_batch_frames: int = 80000,
    max_batch_size: int = 48,
) -> List[List[int]]:
    """Group dataset indices into batches capped by total frames and item count.

    Behavior parity with ``/root/reference/utils/__init__.py:64-115``: greedy
    packing in the given order; a batch closes when adding the next item would
    exceed ``max_batch_frames`` (with every item padded to the running max
    length) or ``max_batch_size``.
    """
    batches: List[List[int]] = []
    cur: List[int] = []
    cur_max = 0
    for idx in indices:
        idx = int(idx)
        n = num_frames_fn(idx)
        if n > max_batch_frames:
            raise ValueError(
                f"item {idx} has {n} frames which exceeds max_batch_frames={max_batch_frames}"
            )
        new_max = max(cur_max, n)
        if cur and (len(cur) + 1 > max_batch_size or new_max * (len(cur) + 1) > max_batch_frames):
            batches.append(cur)
            cur, cur_max = [], 0
            new_max = n
        cur.append(idx)
        cur_max = new_max
    if cur:
        batches.append(cur)
    return batches


_size_pat = re.compile(r"model_ckpt_steps_(\d+)")


def key_from_seed(seed: "int | None", salt: int = 0):
    """Canonical seed -> jax PRNG key recipe (32-bit masked, salted with
    fold_in so diffusion noise and NSF source noise draw distinct streams).
    Returns None for seed=None so callers can express 'no randomness'."""
    if seed is None:
        return None
    import jax

    key = jax.random.PRNGKey(int(seed) & 0xFFFFFFFF)
    return jax.random.fold_in(key, salt) if salt else key


def fresh_seed() -> int:
    """Entropy for unseeded runs (the reference's seed=-1 leaves the torch
    global RNG unseeded, so every invocation differs)."""
    import os

    return int.from_bytes(os.urandom(4), "little")


def parse_ckpt_step(name: str) -> int | None:
    m = _size_pat.search(str(name))
    return int(m.group(1)) if m else None
