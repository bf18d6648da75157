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
    """Place a host-local batch pytree onto the mesh, sharded on dim 0."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


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
