"""Random-access binary dataset over HDF5.

Byte-format parity with ``/root/reference/utils/indexed_datasets.py``: one
group per item number, one dataset per attribute, builder filters to an
``allowed_attr`` whitelist and auto-increments item ids — so datasets
binarized by the reference load directly (and vice versa).  Returns numpy
arrays instead of torch tensors.
"""

from __future__ import annotations

import pathlib
import threading
from collections import deque
from typing import Dict, Iterable, Optional

import h5py
import numpy as np


class IndexedDataset:
    def __init__(self, path, prefix: str, num_cache: int = 0):
        self.path = pathlib.Path(path) / f"{prefix}.data"
        if not self.path.exists():
            raise FileNotFoundError(f"IndexedDataset not found: {self.path}")
        self.dset = None
        self.cache = deque(maxlen=num_cache)
        self.num_cache = num_cache
        self._open_lock = threading.Lock()

    def _ensure_open(self):
        # the trainer's prefetch thread pool can race two threads through the
        # first access; without the lock both would open the file and one
        # handle would leak (reads themselves are serialized by h5py)
        if self.dset is None:
            with self._open_lock:
                if self.dset is None:
                    self.dset = h5py.File(self.path, "r")

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        self._ensure_open()
        if i < 0 or i >= len(self.dset):
            raise IndexError("index out of range")
        if self.num_cache > 0:
            for c in self.cache:
                if c[0] == i:
                    return c[1]
        item = {
            k: (v[()].item() if v.shape == () else np.asarray(v[()]))
            for k, v in self.dset[str(i)].items()
        }
        if self.num_cache > 0:
            self.cache.appendleft((i, item))
        return item

    def __len__(self):
        self._ensure_open()
        return len(self.dset)

    def close(self):
        if self.dset is not None:
            self.dset.close()
            self.dset = None


class IndexedDatasetBuilder:
    def __init__(self, path, prefix: str, allowed_attr: Optional[Iterable[str]] = None,
                 auto_increment: bool = True):
        self.path = pathlib.Path(path) / f"{prefix}.data"
        self.prefix = prefix
        self.dset = h5py.File(self.path, "w")
        self.counter = 0
        self.auto_increment = auto_increment
        self.allowed_attr = set(allowed_attr) if allowed_attr is not None else None

    def add_item(self, item: Dict, item_no: Optional[int] = None) -> int:
        if (self.auto_increment and item_no is not None) or (
            not self.auto_increment and item_no is None
        ):
            raise ValueError("auto_increment and provided item_no are mutually exclusive")
        if self.allowed_attr is not None:
            item = {k: item[k] for k in self.allowed_attr if k in item}
        if self.auto_increment:
            item_no = self.counter
            self.counter += 1
        for k, v in item.items():
            if v is None:
                continue
            self.dset.create_dataset(f"{item_no}/{k}", data=v)
        return item_no

    def finalize(self):
        self.dset.close()
