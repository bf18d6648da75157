"""Worker process for the REAL multi-process data-parallel test.

Each OS process plays one "host" of a pod: it brings up
``jax.distributed.initialize`` (the same call `parallel/mesh.py`
``init_distributed`` makes on a real multi-host TPU slice), owns 2 virtual
CPU devices, builds the global dp mesh over all processes' devices, runs the
REAL acoustic train step through ``make_train_step`` on its host-local batch
shard, and reduces a per-host scalar with ``process_allgather`` (the
trainer's validation-loss reduction).

Invoked by tests/test_multiprocess_dp.py:

    python multiproc_dp_worker.py <pid> <nproc> <port> <outdir> [model]

``model`` is ``acoustic`` (default) or ``variance`` — the variance step
exercises the retake masks and multi-head (dur/pitch/variance) losses
through the gradient psum as well.

Writes outdir/result_<pid>.json with device counts, the sampler's batch
assignment for this rank, a post-step parameter digest, metrics, and the
allgather result.
"""

import hashlib
import json
import os
import sys
from pathlib import Path

pid, nproc, port, outdir = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], Path(sys.argv[4])
)
model_kind = sys.argv[5] if len(sys.argv) > 5 else "acoustic"

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).parent.parent))

from xiaoicesing_io_tpu.parallel.mesh import (  # noqa: E402
    init_distributed, make_mesh, make_train_step, replicated_sharding,
    shard_batch,
)

if nproc > 1:
    init_distributed(
        coordinator=f"localhost:{port}", num_processes=nproc, process_id=pid
    )

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

result = {
    "pid": pid,
    "local_devices": jax.local_device_count(),
    "global_devices": jax.device_count(),
    "process_count": jax.process_count(),
}

# --- the REAL frame-budget sampler's per-rank assignment -------------------
from xiaoicesing_io_tpu.data.sampler import DistributedBatchSampler  # noqa: E402


class _SizedDataset:
    def __init__(self, sizes):
        self.sizes = list(sizes)

    def __len__(self):
        return len(self.sizes)

    def num_frames(self, idx):
        return self.sizes[idx]


sizes = (np.arange(37) % 11 + 3) * 17  # deterministic synthetic item sizes
sampler = DistributedBatchSampler(
    _SizedDataset(sizes), max_batch_frames=600, max_batch_size=8,
    num_replicas=nproc, rank=pid, seed=123,
)
sampler.set_epoch(1)
result["batches"] = [list(map(int, b)) for b in sampler]

# --- one REAL dp train step on the global mesh ------------------------------
from pathlib import Path as _P  # noqa: E402

from xiaoicesing_io_tpu.config import Config, load_config  # noqa: E402
from xiaoicesing_io_tpu.ops.seq import length_regulator  # noqa: E402
from xiaoicesing_io_tpu.training.acoustic import (  # noqa: E402
    build_acoustic, init_acoustic_state, make_acoustic_train_step,
)

# deterministic GLOBAL batch, identical on every process; B divisible by the
# global device count.  Each host passes the same global array; device_put
# scatters the addressable shards (per-host disjoint rows), exactly like the
# per-host trainer feed.
B, T_ph, T_f = 8, 8, 64
rng = np.random.default_rng(5)
dur = rng.integers(2, 9, size=(B, T_ph))
mel2ph = np.asarray(length_regulator(jnp.asarray(dur), out_len=T_f))

if model_kind == "acoustic":
    cfg = load_config(
        _P(__file__).parent.parent / "xiaoicesing_io_tpu/configs/acoustic.yaml"
    )
    cfg.update(
        enc_layers=1, precision="fp32",
        backbone_args=Config(num_channels=32, num_layers=1, kernel_size=31,
                             strong_cond=True),
    )
    cfg["shallow_diffusion_args"]["aux_decoder_args"].update(
        num_channels=32, num_layers=1
    )
    model, core, normalizer = build_acoustic(cfg, 12)
    state = init_acoustic_state(model, cfg, 12, jax.random.PRNGKey(0))
    M = cfg["audio_num_mel_bins"]
    batch_np = {
        "tokens": rng.integers(1, 12, size=(B, T_ph)).astype(np.int32),
        "mel2ph": mel2ph.astype(np.int32),
        "f0": rng.uniform(100, 400, size=(B, T_f)).astype(np.float32),
        "mel": rng.uniform(-10, -1, size=(B, T_f, M)).astype(np.float32),
    }
    step_fn_factory = lambda: make_acoustic_train_step(  # noqa: E731
        model, core, normalizer, cfg)
else:
    from xiaoicesing_io_tpu.training.variance import (  # noqa: E402
        build_variance, init_variance_state, make_variance_train_step,
    )

    cfg = load_config(
        _P(__file__).parent.parent / "xiaoicesing_io_tpu/configs/variance.yaml"
    )
    cfg.update(
        enc_layers=1, hidden_size=64, precision="fp32",
        predict_dur=True, predict_pitch=True,
        predict_energy=True, predict_breathiness=True,
    )
    cfg["dur_prediction_args"].update(hidden_size=32, num_layers=1)
    cfg["pitch_prediction_args"].update(repeat_bins=8)
    cfg["pitch_prediction_args"]["backbone_args"].update(
        num_layers=1, num_channels=16)
    cfg["variances_prediction_args"].update(total_repeat_bins=8)
    cfg["variances_prediction_args"]["backbone_args"].update(
        num_layers=1, num_channels=16)
    model, core, normalizer = build_variance(cfg, 12)
    state = init_variance_state(model, cfg, 12, jax.random.PRNGKey(0))
    batch_np = {
        "tokens": rng.integers(1, 12, size=(B, T_ph)).astype(np.int32),
        "midi": rng.integers(50, 70, size=(B, T_ph)).astype(np.int32),
        "ph2word": np.cumsum(rng.integers(0, 2, size=(B, T_ph)), axis=1
                             ).astype(np.int32) + 1,
        "ph_dur": dur.astype(np.int32),
        "mel2ph": mel2ph.astype(np.int32),
        "base_pitch": rng.uniform(50, 70, size=(B, T_f)).astype(np.float32),
        "pitch": rng.uniform(50, 70, size=(B, T_f)).astype(np.float32),
        "energy": rng.uniform(-60, -20, size=(B, T_f)).astype(np.float32),
        "breathiness": rng.uniform(-60, -20, size=(B, T_f)).astype(np.float32),
    }
    step_fn_factory = lambda: make_variance_train_step(  # noqa: E731
        model, core, normalizer, cfg)

mesh = make_mesh()
step_fn = step_fn_factory()
dp_step = make_train_step(step_fn, mesh, donate=False)
state_dp = jax.device_put(state, replicated_sharding(mesh))
batch_dp = shard_batch(batch_np, mesh)
key = jax.device_put(jax.random.PRNGKey(7), replicated_sharding(mesh))
state_dp, metrics = dp_step(state_dp, batch_dp, key)

params_local = jax.tree.map(
    lambda x: np.asarray(jax.device_get(x)), state_dp.params
)
digest = hashlib.sha256()
for leaf in jax.tree.leaves(params_local):
    digest.update(np.ascontiguousarray(leaf).tobytes())
result["params_sha"] = digest.hexdigest()
result["params_l2"] = float(
    np.sqrt(sum(float((l.astype(np.float64) ** 2).sum())
                for l in jax.tree.leaves(params_local)))
)
result["metrics"] = {k: float(v) for k, v in metrics.items()}

# --- the trainer's cross-host validation reduction --------------------------
from jax.experimental import multihost_utils  # noqa: E402

vec = np.asarray([float(pid + 1)], np.float32)  # host-local scalar
gathered = multihost_utils.process_allgather(vec)
result["allgather_sum"] = float(np.sum(gathered))

outdir.mkdir(parents=True, exist_ok=True)
(outdir / f"result_{pid}.json").write_text(json.dumps(result))
print(f"worker {pid}/{nproc} done", flush=True)
