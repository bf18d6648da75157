"""Training driver: the TPU-native equivalent of the reference's Lightning
Trainer wiring (``basics/base_task.py:395-520``).

Features with reference parity:
* frame-budget distributed batch sampler, per-epoch reshuffling
* jitted DP train step over a ``jax.sharding.Mesh`` (grads all-reduced by the
  GSPMD partitioner), bf16-mixed compute via model dtype
* ``val_check_interval``-step validation: losses (batch-size weighted means),
  objective metrics, TensorBoard figures/audio
* step checkpoints with top-k + permanent retention, resume from latest
* stdout + TensorBoard logging with lr reporting, ``max_updates`` stop
* param freezing by prefix and finetune loading (``frozen_params`` /
  ``finetune_*`` config keys, ref: base_task.py:93-166)

The per-host data layout mirrors DsBatchSampler's rank assignment: each host
forms its own batch list with ``rank = jax.process_index()``.
"""

from __future__ import annotations

import math
import time
from pathlib import Path
from typing import Callable, Dict, Optional

import jax
import numpy as np

from ..data.sampler import DistributedBatchSampler
from ..parallel.mesh import (
    make_mesh,
    replicated_sharding,
    shard_batch,
    shard_host_local_batch,
)
from .checkpoint import CheckpointManager
from .train_state import TrainState
from .schedules import build_lr_schedule


def _host_rss_mb() -> int:
    """Current process resident set size in MB (0 if unavailable)."""
    try:
        with open("/proc/self/status") as f:
            for ln in f:
                if ln.startswith("VmRSS"):
                    return int(ln.split()[1]) // 1024
    except OSError:
        pass
    return 0


def _host_mem_total_mb() -> int:
    try:
        with open("/proc/meminfo") as f:
            for ln in f:
                if ln.startswith("MemTotal"):
                    return int(ln.split()[1]) // 1024
    except OSError:
        pass
    return 0


def _narrow_batch(batch: Dict[str, np.ndarray], plan: Dict[str, np.dtype]) -> Dict[str, np.ndarray]:
    """Host-side wire narrowing: f32 -> f16, i32/i64 -> i16 where the values
    fit.  Mel magnitudes are ln-compressed (|x| < 20) and index fields are
    bounded by sequence lengths, so f16/i16 are lossless enough for TRAINING
    inputs (f16 roundoff ~5e-4 relative); widened back on device by
    ``_widen_batch``.

    The narrowing decision is pinned PER FIELD in ``plan`` on first sight so
    a field whose values hover near the i16 bound cannot flip dtype between
    batches (each flip would be a fresh jitted train_step compilation).  If a
    later batch no longer fits the pinned narrow dtype the plan is promoted
    back to the wide dtype — a monotone, at-most-once change per field.  The
    f32 path gets the same finite-range guard as the int path (f16 overflows
    silently to inf above 65504)."""
    out = {}
    for k, v in batch.items():
        tgt = plan.get(k)
        if tgt is None:
            if v.dtype == np.float32:
                tgt = np.float16 if (
                    not v.size or float(np.abs(v).max()) < 60000.0
                ) else np.float32
            elif v.dtype in (np.int32, np.int64) and v.size and \
                    int(v.max()) < 32000 and int(v.min()) > -32000:
                tgt = np.int16
            else:
                tgt = v.dtype
            plan[k] = tgt
        elif tgt == np.float16 and v.size and float(np.abs(v).max()) >= 60000.0:
            tgt = plan[k] = np.float32
        elif tgt == np.int16 and v.size and not (
            int(v.max()) < 32000 and int(v.min()) > -32000
        ):
            tgt = plan[k] = v.dtype
        out[k] = v.astype(tgt) if v.dtype != tgt else v
    return out


def fixed_batch_rows(n_items: int, t_pad: int, max_batch_frames: int,
                     max_batch_size: int, n_local: int) -> int:
    """Row count for a fixed-shape train batch: budget // t_pad (clamped to
    ``max_batch_size``, never below ``n_items``), rounded UP to a multiple of
    lcm(8, n_local) — divisible by the local device count (the batch dim is
    sharded) AND quantized to 8-row steps to bound the shape-class count.

    Without the rounding, the sampler packing MORE items than budget//t_pad
    makes the row count jitter per batch AND per epoch (54/55, 42/43 rows
    measured on a diverse-length corpus) — every variant is a fresh XLA
    program at 30s-10min per remote compile on a tunneled backend (22 shape
    classes measured vs 8 frame buckets). Rounding costs a few zero rows
    (masked: no loss or audio-seconds contribution) and collapses each
    bucket's row variants to at most two.

    ``max_batch_size`` is honored by rounding the cap DOWN to the quantum
    first (so the round-up cannot silently exceed the user's memory cap);
    when the cap is smaller than one 8-row quantum, only device
    divisibility is enforced.  ``n_items`` still wins over the cap — the
    sampler already bounded it, and every packed item needs a row.
    """
    mult = math.lcm(8, n_local)
    if max_batch_size < mult:
        mult = n_local  # cap below one quantum: keep only shard divisibility
    rows = max(n_items, max_batch_frames // max(t_pad, 1))
    rows = min(rows, max(max_batch_size // mult * mult, mult))
    rows = max(rows, n_items)
    return -(-rows // mult) * mult


def _stall_guard_loop(trainer, stall_min: float, poll_s: float = 15.0):
    """Body of the stall-watchdog daemon thread: re-exec the trainer when
    no train/val step completed for ``stall_min`` minutes (see fit())."""
    while True:
        time.sleep(poll_s)
        stale = time.time() - trainer._heartbeat
        if stale > stall_min * 60:
            print(
                f"| stall watchdog: no step completed for {stale/60:.1f} min "
                f"(> {stall_min:g}) — re-exec and resume from the last "
                "checkpoint", flush=True,
            )
            trainer._exec_restart(-1, save=False)


def _widen_batch(batch):
    import jax.numpy as jnp

    def w(x):
        if x.dtype == jnp.float16:
            return x.astype(jnp.float32)
        if x.dtype == jnp.int16:
            return x.astype(jnp.int32)
        return x

    return {k: w(v) for k, v in batch.items()}


class Trainer:
    def __init__(
        self,
        cfg,
        state: TrainState,
        train_step: Callable,
        val_losses_fn: Callable,  # (params, batch, key) -> dict of scalars
        train_dataset,
        valid_dataset,
        category: str,
        collate_fn: Optional[Callable] = None,
        on_validation_extras: Optional[Callable] = None,
    ):
        self.cfg = cfg
        self.state = state
        self.category = category
        self.train_dataset = train_dataset
        self.valid_dataset = valid_dataset
        self.collate = collate_fn or train_dataset.collate
        self.on_validation_extras = on_validation_extras

        self.mesh = make_mesh()
        self.num_replicas = jax.process_count()
        self.rank = jax.process_index()
        # feed-path attribution (VERDICT r2 task 4): collate/transfer run in
        # the prefetch thread (hidden behind device compute); `starve` is the
        # only feed cost the device actually waits on
        self._feed_stats = {"collate_s": 0.0, "dispatch_s": 0.0, "starve_s": 0.0}

        repl = replicated_sharding(self.mesh)
        from jax.sharding import NamedSharding, PartitionSpec as P

        data = NamedSharding(self.mesh, P("dp"))
        # compact feed wire format: train batches cross host->device as
        # f16/i16 (halves transfer bytes over a slow link) and are widened
        # back to f32/i32 on device as the first op of the jitted step.
        # Training-only: validation/eval batches stay full-precision.
        # Single-process only: the narrowing decision is VALUE-dependent per
        # host, so multi-process hosts could disagree on a field's wire dtype
        # (= different global array dtypes = shape-mismatched lockstep jit)
        self.compact_feed = bool(cfg.get("compact_feed", True)) \
            and jax.process_count() == 1
        # per-field wire-dtype plan (see _narrow_batch); shared across the
        # prefetch threads — dict writes are atomic and changes are monotone
        self._narrow_plan: Dict[str, np.dtype] = {}
        if self.compact_feed:
            def _widened_step(state, batch, key):
                return train_step(state, _widen_batch(batch), key)
            step_fn = _widened_step
        else:
            step_fn = train_step
        self.train_step = jax.jit(
            step_fn, in_shardings=(repl, data, repl), out_shardings=(repl, repl),
            donate_argnums=(0,),
        )
        self.val_losses_fn = jax.jit(val_losses_fn, in_shardings=(repl, data, repl),
                                     out_shardings=repl)

        work_dir = Path(cfg["work_dir"])
        self.ckpt = CheckpointManager(
            work_dir, category=category,
            num_ckpt_keep=cfg.get("num_ckpt_keep", 5),
            permanent_ckpt_start=cfg.get("permanent_ckpt_start", 0),
            permanent_ckpt_interval=cfg.get("permanent_ckpt_interval", -1),
        )
        self.writer = None
        if self.rank == 0:
            from tensorboardX import SummaryWriter

            (work_dir / "lightning_logs" / "lastest").mkdir(parents=True, exist_ok=True)
            self.writer = SummaryWriter(str(work_dir / "lightning_logs" / "lastest"))
        self.lr_schedule = build_lr_schedule(
            cfg.get("optimizer_args", {}), cfg.get("lr_scheduler_args", {})
        )

        # n_total: all mesh devices (val batches are replicated-content and
        # sharded over the whole dp axis); n_local: this PROCESS's devices
        # (each host contributes its own rows to the global train batch, so
        # per-host row counts need only local divisibility)
        self.n_total = len(self.mesh.devices.flatten())
        self.n_local = jax.local_device_count()
        # max_updates / val_check_interval / lr schedule count OPTIMIZER steps
        # (the reference's Lightning max_steps semantics); with gradient
        # accumulation each optimizer step consumes `accum` micro-batches
        self.accum = max(1, cfg.get("accumulate_grad_batches", 1))
        self.max_updates = cfg.get("max_updates", 160000)
        self.log_interval = cfg.get("log_interval", 100)
        self.val_check_interval = cfg.get("val_check_interval", 2000)
        self.num_devices = len(jax.devices())

    def _global_shape_targets(self, sampler, step_idx: int):
        """Cross-process shape agreement for train step ``step_idx`` — NO
        communication needed.

        Every jit call on a multi-host mesh must be entered by every process
        with identical global shapes.  The sampler's per-rank assignment is
        deterministic in (seed, epoch) and the ``.meta`` sidecar carries
        every item's per-attribute lengths, so each host computes the maxima
        over ALL ranks' step-``step_idx`` batches locally and pads its own
        shard to them.  Returns None in single-process runs."""
        if self.num_replicas == 1:
            return None
        ds = self.train_dataset
        all_b = sampler.batches_at_step(step_idx)
        items = [i for b in all_b for i in b]
        targets = {
            "items": max((len(b) for b in all_b), default=0),
            "frames": max((ds.num_frames(i) for i in items), default=0),
        }
        meta = getattr(ds, "metadata", {})
        if "tokens" in meta:
            targets["tokens"] = max(ds.attr_len("tokens", i) for i in items)
        if "note_midi" in meta:
            targets["notes"] = max(ds.attr_len("note_midi", i) for i in items)
        return targets

    def _collate_train(self, indices, shape_targets=None):
        """Form a train batch with a BOUNDED set of compiled shapes.

        With raw frame-budget batching every distinct item count is its own
        XLA program (round-1 measured 2.4-3x below the jitted-step ceiling,
        largely first-epoch compiles + padding).  Here the batch row count is
        a FUNCTION of the padded frame length: B_target = budget // T_pad
        (clamped to max_batch_size, rounded to the local device count), so
        the shape-class count equals the number of frame buckets.  The extra
        rows are ZERO rows — mel2ph == 0 everywhere, so they carry no loss
        (masked, same .mean() semantics as the reference's DiffusionLoss)
        and no audio-seconds in the throughput metric.

        Disable with ``fixed_shape_batches: false`` to get the raw
        duplicate-item padding (reference DsBatchSampler semantics) —
        single-process only: multi-process runs always use the fixed-shape
        path padded to the cross-rank ``shape_targets`` (all hosts must
        enter the jitted step with one global shape).
        """
        if not self.cfg.get("fixed_shape_batches", True) and shape_targets is None:
            return self.collate(self._pad_indices(indices))
        ds = self.train_dataset
        from ..data.dataset import FRAME_BUCKET, _round_up

        frames = max(ds.num_frames(i) for i in indices)
        n_items = len(indices)
        extra = {}
        if shape_targets is not None:
            frames = max(frames, shape_targets["frames"])
            n_items = max(n_items, shape_targets["items"])
            if "tokens" in shape_targets:
                extra["pad_tokens_to"] = shape_targets["tokens"]
            if "notes" in shape_targets:
                extra["pad_notes_to"] = shape_targets["notes"]
            extra["pad_frames_to"] = frames
        t_pad = _round_up(int(frames), FRAME_BUCKET)
        b_target = fixed_batch_rows(
            n_items, t_pad,
            int(self.cfg.get("max_batch_frames", 50000)),
            int(self.cfg.get("max_batch_size", 64)),
            self.n_local,
        )
        return self.collate(indices, pad_batch_to=b_target, **extra)

    def _prefetch(self, sampler, depth: Optional[int] = None):
        """Collate AND device_put batches on a small thread pool so host-side
        data prep and host->device transfer overlap device steps (the
        reference overlaps via ``ds_workers`` DataLoader worker processes
        with ``dataloader_prefetch_factor`` batches in flight each).  One
        producer thread's serial collate+transfer cycle can exceed the device
        step on a weak host, so ``dataloader_num_threads`` (default 2) batches
        are prepared concurrently — collate is numpy memcpy (GIL released)
        and device_put transfers overlap each other.  Futures are consumed in
        submission order, so batch order is deterministic regardless of
        thread completion order.

        Yields ``(device_batch, real_frames)`` — the non-padding frame count
        is computed host-side before the transfer.

        Feed-attribution caveat: collate/xfer are summed across concurrent
        workers (thread-time, not wall); ``starve`` remains the consumer's
        actual wait.
        """
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        if depth is None:
            depth = max(1, int(self.cfg.get("dataloader_prefetch_factor", 2)))
        workers = max(1, int(self.cfg.get("dataloader_num_threads", 2)))
        stats = self._feed_stats

        def produce(indices, shape_targets):
            t0 = time.perf_counter()
            batch_np = self._collate_train(indices, shape_targets)
            real_frames = (
                int((batch_np["mel2ph"] > 0).sum())
                if "mel2ph" in batch_np else 0
            )
            t1 = time.perf_counter()
            if self.compact_feed:
                batch_np = _narrow_batch(batch_np, self._narrow_plan)
            # step i's compute overlaps batch i+k's host->device copy.
            # multi-process: each host contributes its OWN rows of the
            # global batch (shapes pre-agreed via shape_targets)
            dev = shard_host_local_batch(batch_np, self.mesh)
            t2 = time.perf_counter()
            stats["collate_s"] += t1 - t0
            stats["dispatch_s"] += t2 - t1
            return dev, real_frames

        window = max(depth, workers)
        ex = ThreadPoolExecutor(max_workers=workers)
        pending: deque = deque()
        try:
            for step_idx, indices in enumerate(sampler):
                targets = self._global_shape_targets(sampler, step_idx)
                pending.append(ex.submit(produce, indices, targets))
                if len(pending) < window:
                    continue
                t0 = time.perf_counter()
                item = pending.popleft().result()
                # time the consumer spent starved of data: the only part of
                # the feed path NOT hidden behind device compute
                stats["starve_s"] += time.perf_counter() - t0
                yield item
            while pending:
                t0 = time.perf_counter()
                item = pending.popleft().result()
                stats["starve_s"] += time.perf_counter() - t0
                yield item
        finally:
            for f in pending:
                f.cancel()
            ex.shutdown(wait=False)

    def _pad_indices(self, indices):
        """The batch dim is sharded over the mesh, so it must be a multiple of
        the local device count; pad by cycling samples (same spirit as the
        reference sampler's duplicate-batch padding, training_utils.py:157-165).
        Pads to the TOTAL device count — used for replicated-content val
        batches sharded over the whole dp axis."""
        n = self.n_total
        if len(indices) % n == 0:
            return indices
        out = list(indices)
        i = 0
        while len(out) % n != 0:
            out.append(indices[i % len(indices)])
            i += 1
        return out

    # -- loops --------------------------------------------------------------

    def _make_sampler(self, epoch: int) -> DistributedBatchSampler:
        s = DistributedBatchSampler(
            self.train_dataset,
            max_batch_frames=self.cfg.get("max_batch_frames", 50000),
            max_batch_size=self.cfg.get("max_batch_size", 64),
            num_replicas=self.num_replicas,
            rank=self.rank,
            required_batch_count_multiple=self.cfg.get("accumulate_grad_batches", 1),
            frame_count_grid=self.cfg.get("sampler_frame_count_grid", 6),
            shuffle_sample=True,
            sort_by_similar_size=self.cfg.get("sort_by_len", True),
            seed=self.cfg.get("seed", 0),
        )
        s.set_epoch(epoch)
        return s

    def fit(self):
        self.state, start_step, meta = self.ckpt.restore_latest(self.state, with_meta=True)
        step = start_step  # optimizer steps
        micro = step * self.accum
        if step > 0:
            print(f"| resumed from step {step}")
        self.state = jax.device_put(self.state, replicated_sharding(self.mesh))
        key = jax.random.PRNGKey(self.cfg.get("seed", 0))

        # graceful preemption: SIGTERM/SIGINT request a checkpoint at the next
        # step boundary, then exit cleanly (resume picks up from that step).
        # The reference only resumes from the last periodic checkpoint; on
        # preemptible TPU pods saving on demand loses no progress.
        import signal

        stop_requested = {"flag": False}

        def _request_stop(signum, frame):
            if stop_requested["flag"]:  # second signal: let it kill us
                raise KeyboardInterrupt
            print(f"| received signal {signum}: checkpointing at next step "
                  "boundary, then exiting")
            stop_requested["flag"] = True

        prev_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                prev_handlers[sig] = signal.signal(sig, _request_stop)
            except ValueError:  # non-main thread (tests)
                pass
        # sanity validation before training (ref: num_sanity_val_steps)
        if step == 0 and self.cfg.get("num_sanity_val_steps", 1) > 0:
            print("| running sanity validation")
            self.validate(0, key, sanity=True)
        epoch = int(meta.get("epoch", 0))
        t_log = time.time()
        frames_since_log = 0
        last_validated = -1
        # host-RSS watchdog: some backend clients (e.g. the tunneled axon
        # TPU plugin) leak host memory per host->device transfer (~25 MB per
        # batch measured — docs/PerformanceNotes.md round 3), which OOM-kills
        # long runs. When RSS crosses the threshold the trainer checkpoints
        # at a step boundary and re-execs itself in place; resume continues
        # from that exact step. Default threshold: 70% of MemTotal; set
        # max_host_rss_mb: 0 to disable.
        rss_limit = self.cfg.get("max_host_rss_mb", None)
        if rss_limit is None:
            rss_limit = int(_host_mem_total_mb() * 0.7)
        rss_limit = int(rss_limit or 0)
        # stall watchdog: a wedged tunnel RPC blocks the MAIN thread
        # indefinitely (observed on the axon backend: a dispatch never
        # returned, 0 CPU, RSS frozen), where neither the RSS watchdog nor
        # SIGTERM's step-boundary checkpoint can run. A daemon thread
        # re-execs the trainer in place when no train/val step has completed
        # for stall_restart_minutes (resume loses at most
        # val_check_interval steps; compiles via the persistent cache make
        # the restart cheap). Off by default: first-epoch remote compiles
        # legitimately take up to ~10 min per program.
        stall_min = float(self.cfg.get("stall_restart_minutes", 0) or 0)
        self._heartbeat = time.time()
        if stall_min > 0 and self.num_replicas == 1:
            import threading

            threading.Thread(
                target=_stall_guard_loop, args=(self, stall_min),
                daemon=True, name="stall-watchdog",
            ).start()
        steps_this_process = 0
        restart_requested = False
        # optional jax.profiler capture over the first N steps after (re)start
        # (config: profile_trace_steps; trace lands in <work_dir>/trace)
        trace_steps = int(self.cfg.get("profile_trace_steps", 0) or 0)
        trace_stop_at = step + trace_steps if trace_steps > 0 else -1
        if trace_steps > 0 and self.rank == 0:
            trace_dir = str(Path(self.cfg["work_dir"]) / "trace")
            jax.profiler.start_trace(trace_dir)
            print(f"| capturing profiler trace for {trace_steps} steps -> {trace_dir}")
        while step < self.max_updates:
            sampler = self._make_sampler(epoch)
            for batch_idx, (batch, real_frames) in enumerate(self._prefetch(sampler)):
                if step >= self.max_updates:
                    break
                # real (non-padding) frames only, so the audio-seconds
                # metric is not inflated by bucket/batch padding
                frames_since_log += real_frames
                key, sub = jax.random.split(key)
                self.state, metrics = self.train_step(self.state, batch, sub)
                self._heartbeat = time.time()
                micro += 1
                if micro % self.accum != 0:
                    continue  # mid-accumulation: no optimizer step happened
                step += 1
                if step == trace_stop_at:
                    jax.block_until_ready(metrics)
                    if self.rank == 0:
                        jax.profiler.stop_trace()
                        print("| profiler trace capture complete")
                    trace_stop_at = -1
                if step % self.log_interval == 0:
                    metrics = {k: float(v) for k, v in metrics.items()}
                    lr = float(self.lr_schedule(step))
                    dt = time.time() - t_log
                    t_log = time.time()
                    sps = self.log_interval * self.accum / max(dt, 1e-9)
                    # BASELINE north-star unit: audio-seconds trained/s/chip
                    audio_sps = (
                        frames_since_log * self.cfg.get("hop_size", 512)
                        / self.cfg.get("audio_sample_rate", 44100)
                        / max(dt, 1e-9) / self.num_devices
                    )
                    frames_since_log = 0
                    fs = self._feed_stats
                    n_it = self.log_interval * self.accum
                    feed = (
                        f" | feed: collate {fs['collate_s']/n_it*1e3:.1f}"
                        f" xfer {fs['dispatch_s']/n_it*1e3:.1f}"
                        f" starve {fs['starve_s']/n_it*1e3:.1f} ms/it"
                    )
                    for k in fs:
                        fs[k] = 0.0
                    if self.rank == 0:
                        # train metrics are replicated (the loss averages the
                        # global sharded batch under jit), so rank-0 logging
                        # is complete — same as the reference's rank-zero bar
                        print(
                            f"| step {step} | "
                            + " ".join(f"{k}={v:.4f}" for k, v in metrics.items())
                            + f" | lr={lr:.2e} | {sps:.2f} it/s"
                            + f" | {audio_sps:.1f} audio-s/s/chip"
                            + feed
                        )
                    if self.writer:
                        for k, v in metrics.items():
                            self.writer.add_scalar(f"training/{k}", v, step)
                        self.writer.add_scalar("training/lr", lr, step)
                        self.writer.add_scalar(
                            "training/audio_s_per_s_per_chip", audio_sps, step
                        )
                steps_this_process += 1
                if step % self.val_check_interval == 0:
                    self.validate(step, key)
                    last_validated = step
                    # ALL ranks enter save() — orbax's save is a collective;
                    # only the primary host touches the filesystem
                    self.ckpt.save(
                        jax.device_get(self.state), step,
                        extra_meta={"epoch": epoch},
                    )
                # --- coordinated exit decisions -------------------------------
                # RSS: require some progress first so a too-low threshold
                # cannot cause an exec storm.  Both RSS and SIGTERM are
                # PER-HOST local state, but the decision must be GLOBAL: on
                # multi-host runs every rank reaches the log boundary in
                # lockstep, so the flags are allgathered — if ANY rank is
                # over its limit (or was signalled) all ranks break together
                # at the SAME step (no rank left behind to deadlock in the
                # next sharded collective) and the checkpoint save below is
                # entered collectively.
                rss_eligible = (
                    rss_limit
                    and step < self.max_updates
                    and step % self.log_interval == 0
                    and steps_this_process >= 2 * self.log_interval
                )
                if self.num_replicas > 1:
                    if step % self.log_interval == 0:
                        from jax.experimental import multihost_utils

                        exceeded = bool(rss_eligible) and _host_rss_mb() > rss_limit
                        flags = np.asarray(multihost_utils.process_allgather(
                            np.array([exceeded, stop_requested["flag"]], np.int32)
                        )).reshape(-1, 2)
                        if bool(flags[:, 0].any()):
                            print(
                                f"| host RSS {_host_rss_mb()} MB (limit {rss_limit} "
                                "MB, exceeded on >=1 rank): checkpointing and "
                                "restarting (backend host-memory leak workaround)"
                            )
                            restart_requested = True
                            break
                        if bool(flags[:, 1].any()):
                            stop_requested["flag"] = True
                            break
                else:
                    if rss_eligible and _host_rss_mb() > rss_limit:
                        print(
                            f"| host RSS {_host_rss_mb()} MB (limit {rss_limit} MB): "
                            "checkpointing and restarting "
                            "(backend host-memory leak workaround)"
                        )
                        restart_requested = True
                        break
                    if stop_requested["flag"]:
                        break
            if stop_requested["flag"] or restart_requested:
                break
            epoch += 1
        for sig, h in prev_handlers.items():
            signal.signal(sig, h)
        if trace_stop_at > 0 and self.rank == 0:  # ended before capture window
            jax.profiler.stop_trace()
        if stop_requested["flag"] or restart_requested:
            if last_validated != step:
                self.ckpt.save(jax.device_get(self.state), step,
                               extra_meta={"epoch": epoch})
            if restart_requested:
                self._exec_restart(step)  # multi-host: returns; see below
                print(f"| training stopped at step {step} for restart "
                      "(checkpoint saved) — relaunch to continue")
            else:
                print(f"| training preempted at step {step} (checkpoint saved)")
            return
        # final validation + checkpoint (skip if the last step just validated)
        if last_validated != step:
            self.validate(step, key)
            self.ckpt.save(jax.device_get(self.state), step, extra_meta={"epoch": epoch})
        print(f"| training finished at step {step}")

    def _exec_restart(self, step: int, save: bool = True):
        """Replace this process with a fresh invocation of the same command
        (single-process runs only — a multi-host rank cannot restart alone,
        so there this is a no-op and the trainer exits preempt-style for the
        job supervisor to relaunch all ranks).

        ``save=False`` is the stall-watchdog path: the main thread is wedged
        in a backend call, so flushing/clearing the backend from this thread
        could wedge too — exec the fresh image directly and resume from the
        last checkpoint."""
        if self.num_replicas > 1:
            return
        import os
        import sys

        if save:
            if self.writer:
                self.writer.flush()
            try:  # release the device/tunnel before the new image acquires it
                jax.clear_backends()
            except Exception:
                pass
        # replay through the canonical CLI module: the scripts/*.py shims
        # rewrite sys.argv (inserting the subcommand), so re-exec'ing argv[0]
        # verbatim would double-insert it
        import xiaoicesing_io_tpu

        pkg_root = str(Path(xiaoicesing_io_tpu.__file__).resolve().parent.parent)
        env = dict(os.environ)
        env["PYTHONPATH"] = pkg_root + os.pathsep + env.get("PYTHONPATH", "")
        argv = [sys.executable, "-m", "xiaoicesing_io_tpu.cli.main"] + sys.argv[1:]
        print(f"| re-exec at step {step}: {' '.join(argv)}", flush=True)
        os.execve(sys.executable, argv, env)

    def validate(self, step: int, key: jax.Array, sanity: bool = False):
        """Validation runs the FULL valid set on every host in lockstep:
        each jitted loss call is a global-mesh program, so all processes
        must enter it together with identical shapes — the simplest correct
        multi-host layout is identical (replicated-content) batches sharded
        over the dp axis.  Totals are therefore already global: no cross-
        host reduction is needed (the result equals the reference's
        sync_dist=True weighted mean, ref: basics/base_task.py:292).
        Validation is rare and small, so forgoing cross-host data splitting
        costs little and removes a collective-ordering hazard."""
        val_sampler = DistributedBatchSampler(
            self.valid_dataset,
            max_batch_frames=self.cfg.get("max_val_batch_frames", 60000),
            max_batch_size=self.cfg.get("max_val_batch_size", 1),
            num_replicas=1, rank=0,
            shuffle_sample=False, sort_by_similar_size=False,
            # ref val sampler: no duplicated-batch padding
            # (basics/base_task.py:359-369)
            disallow_empty_batch=False, pad_batch_assignment=False,
        )
        val_sampler.set_epoch(0)
        totals: Dict[str, float] = {}
        weights = 0.0
        batches_iter = list(val_sampler)
        if sanity:
            batches_iter = batches_iter[: max(1, self.cfg.get("num_sanity_val_steps", 1))]
        for indices in batches_iter:
            batch_np = self.valid_dataset.collate(self._pad_indices(indices))
            batch = shard_batch(batch_np, self.mesh)
            key, sub = jax.random.split(key)
            out = self.val_losses_fn(self.state.params, batch, sub)
            self._heartbeat = time.time()
            bs = len(indices)
            for k, v in out.items():
                totals[k] = totals.get(k, 0.0) + float(v) * bs
            weights += bs
        losses = {k: v / max(weights, 1e-9) for k, v in totals.items()}
        total = sum(losses.values())
        if self.rank == 0:
            print(f"| validation @ step {step}: total={total:.4f} " +
                  " ".join(f"{k}={v:.4f}" for k, v in losses.items()))
        if self.writer:
            self.writer.add_scalar("validation/total_loss", total, step)
            for k, v in losses.items():
                self.writer.add_scalar(f"validation/{k}", v, step)
        # extras (plots/audio) run model applies OUTSIDE the lockstep jits;
        # on a multi-process mesh a rank-0-only apply over global arrays
        # would hang the other ranks, so extras are single-process only
        if (self.on_validation_extras is not None and not sanity
                and self.rank == 0 and jax.process_count() == 1):
            try:
                self.on_validation_extras(self, step, key)
            except Exception as e:  # extras (plots/audio) must not kill training
                print(f"| WARN: validation extras failed: {e}")
        return losses
