"""Device mesh + sharding rules for data-parallel training.

The reference's only parallelism is DDP (``SURVEY.md`` §2.10;
``utils/training_utils.py:367-445`` + NCCL config).  The TPU-native
equivalent: one ``dp`` mesh axis spanning all chips (ICI within a slice, DCN
across hosts), batch sharded over ``dp``, parameters/optimizer state
replicated, gradient reduction inserted automatically by the GSPMD
partitioner from the sharding annotations — no explicit collectives needed
at this model scale (10-60 M params).

Multi-host entry: call :func:`init_distributed` once per process, then every
host builds the same global mesh over ``jax.devices()``.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator: Optional[str] = None, num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """jax.distributed bring-up for multi-host pods (no-op if single-process)."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator, num_processes=num_processes,
            process_id=process_id,
        )


def make_mesh(devices=None, axis: str = "dp") -> Mesh:
    devices = jax.devices() if devices is None else devices
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Leading (batch) dim sharded over dp; everything else replicated."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "dp"):
    """Place a GLOBAL batch pytree onto the mesh, sharded on dim 0.

    Multi-process: every host must pass the SAME global array (device_put
    asserts value equality across processes); each host's devices keep their
    addressable rows.  For per-host disjoint data use
    :func:`shard_host_local_batch`."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def shard_host_local_batch(batch, mesh: Mesh, axis: str = "dp"):
    """Assemble a global dp-sharded batch from PER-HOST disjoint shards.

    Each process passes only ITS OWN rows (the sampler's per-rank batch);
    the global array is their concatenation in process order — the
    multi-host trainer feed (DDP semantics: every host contributes its local
    batch, jax.make_array_from_process_local_data stitches the global view).
    All hosts must pass the same local SHAPE (the trainer synchronizes
    shapes via Trainer._global_shape_targets).  Single-process: plain
    device_put."""
    if jax.process_count() == 1:
        return shard_batch(batch, mesh, axis)
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch,
    )


def make_train_step(loss_fn, mesh: Mesh, axis: str = "dp", donate: bool = True):
    """Wrap a ``loss_fn(state, batch, key) -> (state, metrics)`` style update
    into a pjit-compiled step with DP shardings.

    ``loss_fn`` must be the *full* update: grads + optimizer apply.  With the
    batch sharded over ``dp`` and params replicated, XLA inserts the gradient
    all-reduce (psum over ICI) automatically.
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(axis))

    return jax.jit(
        loss_fn,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )
