"""Data-parallel batched synthesis for high-throughput serving.

The reference serves segments one at a time on one device
(``inference/ds_acoustic.py:189-246``).  On a TPU slice the same jitted
synthesis function scales out instead: segments are bucketed to shared frame
lengths, stacked into batches, and the batch axis is sharded over the ``dp``
mesh — every chip denoises its shard of segments, parameters stay replicated,
and no collectives are needed at all (inference is embarrassingly parallel
over segments).

Notes
-----
* Per-segment PRNG parity with the sequential path is intentionally NOT kept:
  the stacked batch draws its noise from one key (per group).  Serving wants
  throughput; bit-exact single-segment reproduction stays on
  ``DiffSingerAcousticInfer.forward_model``.
* Batch rows padded to the mesh size use token 0 / mel2ph 0, which the model
  masks out end-to-end.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import batch_sharding, make_mesh, replicated_sharding
from ..utils import key_from_seed
from .acoustic import DiffSingerAcousticInfer, _bucket


def _pad_rows(v: np.ndarray, target_len: int, mode: str = "constant") -> np.ndarray:
    """Pad [1, T, ...] time axis to target_len."""
    if v.ndim >= 2 and v.shape[1] != target_len:
        pad = [(0, 0), (0, target_len - v.shape[1])] + [(0, 0)] * (v.ndim - 2)
        return np.pad(v, pad, mode=mode)
    return v


class DataParallelSynthesizer:
    """Run many .ds segments through the acoustic model, sharded over a mesh.

    >>> infer = DiffSingerAcousticInfer(cfg, load_vocoder=True)
    >>> dp = DataParallelSynthesizer(infer)
    >>> mels, f0s = dp.synthesize_mels(segments)
    >>> wavs = dp.vocode(mels, f0s)
    """

    def __init__(self, infer: DiffSingerAcousticInfer, mesh=None):
        self.infer = infer
        self.mesh = mesh if mesh is not None else make_mesh()
        self._jitted: Dict[int, callable] = {}

    # -- core ---------------------------------------------------------------

    def _fn(self):
        # one jitted wrapper; jax.jit specializes per input shape internally
        fn = self._jitted.get("fn")
        if fn is None:
            repl = replicated_sharding(self.mesh)
            data = batch_sharding(self.mesh)
            fn = jax.jit(
                self.infer._make_synthesis_fn(),
                in_shardings=(repl, data, repl),
                out_shardings=data,
            )
            self._jitted["fn"] = fn
        return fn

    def synthesize_mels(
        self, segments: Sequence[dict], seed: int = 0,
        max_group_size: Optional[int] = None, batches: Optional[List[dict]] = None,
    ):
        """segments: .ds segment dicts.  Returns (mels, f0s) in input order;
        mels[i] is [T_i, M], f0s[i] is [T_i].  Pass ``batches`` to reuse
        already-preprocessed inputs."""
        n_dev = self.mesh.devices.size
        if batches is None:
            batches = [
                self.infer.preprocess_input(p, idx=i) for i, p in enumerate(segments)
            ]
        lengths = [int(b["mel2ph"].shape[1]) for b in batches]

        groups: Dict[int, List[int]] = defaultdict(list)
        for i, ln in enumerate(lengths):
            groups[_bucket(ln)].append(i)

        mels: List[Optional[np.ndarray]] = [None] * len(segments)
        f0s: List[Optional[np.ndarray]] = [None] * len(segments)

        def _drain(chunk, dev_out):
            out = np.asarray(dev_out)
            for row, i in enumerate(chunk):
                mels[i] = out[row, : lengths[i]]
                f0s[i] = np.asarray(batches[i]["f0"])[0, : lengths[i]]

        # deferred fetches: keep a few chunks in flight so async dispatch
        # pipelines the device, but bound the window — every pending chunk
        # holds its output batch in HBM
        MAX_IN_FLIGHT = 4
        pending = []  # (chunk, device_out)
        for padded_len, idxs in sorted(groups.items()):
            # frame-budget chunking (~48k frames per call, same spirit as the
            # training sampler) instead of a fixed tiny batch
            cap = max_group_size or min(64, max(n_dev, 49152 // padded_len))
            for chunk_no, lo in enumerate(range(0, len(idxs), cap)):
                chunk = idxs[lo : lo + cap]
                pad_b = (-len(chunk)) % n_dev
                stacked: Dict[str, jnp.ndarray] = {}
                for k in batches[chunk[0]]:
                    # time axis is padded to the bucket; length-1 axes are
                    # broadcast dims (static speaker mixes) and must NOT be
                    # padded — same rule as forward_model
                    rows = [
                        _pad_rows(
                            np.asarray(batches[i][k]), padded_len,
                            # speaker-mix weights continue their edge value so
                            # padded frames keep the conditioning (the conv
                            # receptive field reaches back into real frames)
                            mode="edge" if k == "spk_mix_value" else "constant",
                        )
                        if k not in ("tokens", "spk_mix_id")
                        and np.asarray(batches[i][k]).ndim >= 2
                        and np.asarray(batches[i][k]).shape[1] != 1
                        else np.asarray(batches[i][k])
                        for i in chunk
                    ]
                    # ragged token / speaker-mix axes within a group: pad
                    # every non-batch axis to the widest (weight 0 / id 0)
                    if rows[0].ndim > 1:
                        wid = tuple(
                            max(r.shape[d] for r in rows)
                            for d in range(1, rows[0].ndim)
                        )
                        if k == "spk_mix_value":
                            # a static mix [1, 1, N] meeting a dynamic one
                            # [1, T, N] in the same chunk must BROADCAST over
                            # time, not zero-pad (zero weights would mute the
                            # speaker conditioning from frame 1 on)
                            rows = [
                                np.repeat(r, wid[0], axis=1)
                                if r.shape[1] == 1 and wid[0] > 1 else r
                                for r in rows
                            ]
                        rows = [
                            np.pad(r, [(0, 0)] + [
                                (0, w - s) for w, s in zip(wid, r.shape[1:])
                            ]) if tuple(r.shape[1:]) != wid else r
                            for r in rows
                        ]
                    cat = np.concatenate(rows, axis=0)
                    if pad_b:
                        cat = np.concatenate(
                            [cat, np.zeros((pad_b,) + cat.shape[1:], cat.dtype)], axis=0
                        )
                    stacked[k] = jnp.asarray(cat)
                fn = self._fn()
                key = jax.random.fold_in(
                    jax.random.PRNGKey(seed & 0xFFFFFFFF),
                    padded_len * 4099 + chunk_no,
                )
                # enqueue only — JAX async dispatch lets chunk c+1's host-side
                # stacking overlap chunk c's device execution, and on a
                # high-latency link (the dev tunnel) deferring the fetches
                # collapses one round-trip per chunk into one total
                pending.append((chunk, fn(self.infer.params, stacked, key)))
                if len(pending) >= MAX_IN_FLIGHT:
                    _drain(*pending.pop(0))
        for item in pending:
            _drain(*item)
        return mels, f0s

    def vocode(self, mels: Sequence[np.ndarray], f0s: Sequence[np.ndarray],
               seed: Optional[int] = None):
        """Batch same-length mels through the vocoder; returns wavs in order.
        `seed` drives the NSF source noise (one key per length bucket)."""
        assert self.infer.vocoder is not None, "built with load_vocoder=False"
        groups: Dict[int, List[int]] = defaultdict(list)
        for i, m in enumerate(mels):
            groups[m.shape[0]].append(i)
        wavs: List[Optional[np.ndarray]] = [None] * len(mels)
        for ln, idxs in sorted(groups.items()):
            mel = np.stack([mels[i] for i in idxs])
            f0 = np.stack([f0s[i] for i in idxs])
            out = self.infer.vocoder.spec2wav(
                mel, f0, key=key_from_seed(seed, salt=ln)
            )
            for row, i in enumerate(idxs):
                wavs[i] = out[row]
        return wavs
