"""Worker for the multi-host RSS-watchdog COORDINATION test.

Each OS process plays one host of a 2-host pod (2 virtual CPU devices each)
and runs the REAL ``Trainer.fit()`` on a pre-binarized tiny corpus.  Only
rank 1 gets an over-limit ``max_host_rss_mb`` (1 MB — always exceeded);
rank 0's limit is effectively infinite.  The trainer's allgather'd
exceeded-flag (``training/trainer.py`` RSS watchdog) must therefore trip
BOTH ranks at the same step boundary: without the coordination, rank 0
would sail on into the next sharded collective and deadlock waiting for the
departed rank 1 — exactly the failure the round-3 ADVICE predicted.

Invoked by tests/test_multiprocess_dp.py::test_rss_watchdog_multihost_coordination:

    python multiproc_rss_worker.py <pid> <nproc> <port> <outdir> <cfg_yaml> [mode]

``mode`` is ``rss`` (default: rank 1 gets the 1 MB limit) or ``plain`` (no
limit — run the REAL multi-process Trainer.fit() to completion; used by
test_two_process_trainer_fit to check the per-rank-disjoint feed keeps the
replicated parameters bitwise identical across hosts).

Writes outdir/rss_result_<pid>.json with the step the trainer stopped at,
the latest checkpoint's meta (written by rank 0 only), and a post-run
parameter digest.
"""

import hashlib
import json
import os
import sys
from pathlib import Path

pid, nproc, port, outdir, cfg_yaml = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], Path(sys.argv[4]),
    sys.argv[5],
)
mode = sys.argv[6] if len(sys.argv) > 6 else "rss"

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).parent.parent))

from xiaoicesing_io_tpu.parallel.mesh import init_distributed  # noqa: E402

init_distributed(coordinator=f"localhost:{port}", num_processes=nproc,
                 process_id=pid)

from xiaoicesing_io_tpu.config import load_config  # noqa: E402
from xiaoicesing_io_tpu.training.checkpoint import latest_checkpoint  # noqa: E402
from xiaoicesing_io_tpu.training.tasks import build_trainer_from_config  # noqa: E402

cfg = load_config(cfg_yaml)
if mode == "rss":
    # rank 1 is "leaking": a 1 MB limit is always exceeded; rank 0 never is.
    cfg["max_host_rss_mb"] = 1 if pid == 1 else 10**6
else:
    cfg["max_host_rss_mb"] = 0

trainer = build_trainer_from_config(cfg)
trainer.fit()  # multi-host: _exec_restart is a no-op, fit() returns

step = int(jax.device_get(trainer.state.step))
ckpt = latest_checkpoint(cfg["work_dir"])
meta = None
if ckpt is not None:
    meta = json.loads((ckpt / "meta.json").read_text())

import numpy as np  # noqa: E402

params_local = jax.tree.map(
    lambda x: np.asarray(jax.device_get(x)), trainer.state.params
)
digest = hashlib.sha256()
for leaf in jax.tree.leaves(params_local):
    digest.update(np.ascontiguousarray(leaf).tobytes())

outdir.mkdir(parents=True, exist_ok=True)
(outdir / f"rss_result_{pid}.json").write_text(json.dumps({
    "pid": pid,
    "stopped_at_step": step,
    "ckpt_meta": meta,
    "params_sha": digest.hexdigest(),
}))
print(f"rss worker {pid}/{nproc} done at step {step}", flush=True)
