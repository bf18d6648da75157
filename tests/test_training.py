"""Training-loop smoke tests: overfit a few steps on a synthetic binarized
dataset, checkpoint, resume."""

from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy tier: run fast tier with -m 'not slow'

from xiaoicesing_io_tpu.config import Config, load_config
from xiaoicesing_io_tpu.utils.audio import save_wav

SR = 44100


@pytest.fixture(scope="module")
def tiny_binary(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_ds")
    (root / "raw/wavs").mkdir(parents=True)
    rng = np.random.default_rng(0)
    rows = ["name,ph_seq,ph_dur,ph_num,note_seq,note_dur"]
    silences = ["SP", "AP", "SP", "AP"]
    for i in range(4):
        name = f"item{i}"
        f0_hz = 200.0 + 30 * i
        dur = 0.8 + 0.15 * i
        n = int(SR * dur)
        t = np.arange(n) / SR
        y = 0.3 * np.sin(2 * np.pi * f0_hz * t) + 0.01 * rng.standard_normal(n)
        save_wav(y.astype(np.float32), root / f"raw/wavs/{name}.wav", SR)
        third = dur / 3
        rows.append(
            f"{name},{silences[i]} a b,{third:.3f} {third:.3f} {third:.3f},"
            f"1 2,rest A3,{third:.3f} {2*third:.3f}"
        )
    (root / "raw/transcriptions.csv").write_text("\n".join(rows) + "\n")
    (root / "dictionary.txt").write_text("x\ta b\n")
    return root


def _acoustic_cfg(root, work_dir):
    cfg = load_config(
        Path(__file__).parent.parent / "xiaoicesing_io_tpu/configs/acoustic.yaml"
    )
    cfg.update(
        raw_data_dir=[str(root / "raw")], binary_data_dir=str(root / "binary_ac"),
        dictionary=str(root / "dictionary.txt"), speakers=["s"],
        test_prefixes=["item0"], work_dir=str(work_dir),
        enc_layers=1, max_updates=6, log_interval=2, val_check_interval=3,
        accumulate_grad_batches=1, max_batch_frames=2000, max_batch_size=4,
        precision="fp32",
        backbone_args=Config(num_channels=32, num_layers=1, kernel_size=31,
                             strong_cond=True),
    )
    cfg["shallow_diffusion_args"]["aux_decoder_args"].update(num_channels=32, num_layers=1)
    return cfg


def test_acoustic_training_loop(tiny_binary, tmp_path):
    root = tiny_binary
    cfg = _acoustic_cfg(root, tmp_path / "exp")
    if not (root / "binary_ac/train.data").exists():
        from xiaoicesing_io_tpu.preprocessing.acoustic_binarizer import AcousticBinarizer

        AcousticBinarizer(cfg).process()
    from xiaoicesing_io_tpu.training.tasks import build_acoustic_trainer

    trainer = build_acoustic_trainer(cfg)
    trainer.fit()
    # checkpoint written and loss finite
    from xiaoicesing_io_tpu.training.checkpoint import list_checkpoints

    ckpts = list_checkpoints(cfg["work_dir"])
    assert len(ckpts) >= 1
    # resume: a fresh trainer restores the step and continues
    cfg2 = _acoustic_cfg(root, tmp_path / "exp")
    cfg2["max_updates"] = 8
    trainer2 = build_acoustic_trainer(cfg2)
    trainer2.fit()
    steps = [int(p.name.rsplit("_", 1)[-1]) for p in list_checkpoints(cfg2["work_dir"])]
    assert max(steps) >= 8


def test_variance_training_loop(tiny_binary, tmp_path):
    root = tiny_binary
    cfg = load_config(
        Path(__file__).parent.parent / "xiaoicesing_io_tpu/configs/variance.yaml"
    )
    cfg.update(
        raw_data_dir=[str(root / "raw")], binary_data_dir=str(root / "binary_var"),
        dictionary=str(root / "dictionary.txt"), speakers=["s"],
        test_prefixes=["item0"], work_dir=str(tmp_path / "exp_var"),
        enc_layers=1, max_updates=4, log_interval=2, val_check_interval=2,
        max_batch_frames=2000, max_batch_size=4, precision="fp32",
        predict_energy=True, predict_breathiness=True,
    )
    cfg["dur_prediction_args"].update(hidden_size=32, num_layers=1)
    cfg["pitch_prediction_args"].update(repeat_bins=8)
    cfg["pitch_prediction_args"]["backbone_args"].update(num_layers=2, num_channels=16)
    cfg["variances_prediction_args"].update(total_repeat_bins=8)
    cfg["variances_prediction_args"]["backbone_args"].update(num_layers=2, num_channels=16)

    from xiaoicesing_io_tpu.preprocessing.variance_binarizer import VarianceBinarizer

    VarianceBinarizer(cfg).process()

    from xiaoicesing_io_tpu.training.tasks import build_variance_trainer

    trainer = build_variance_trainer(cfg)
    trainer.fit()
    from xiaoicesing_io_tpu.training.checkpoint import list_checkpoints

    assert len(list_checkpoints(cfg["work_dir"])) >= 1


def test_acoustic_training_multispeaker_reflow(tiny_binary, tmp_path):
    """BASELINE config 4: rectified-flow acoustic + multi-speaker embedding.

    Splits the synthetic corpus into two speaker dirs, binarizes with spk ids,
    and trains the reflow acoustic model with a trainable speaker table."""
    import shutil

    root = tiny_binary
    two = tmp_path / "two_spk"
    for spk, items in (("alice", (0, 1)), ("bob", (2, 3))):
        d = two / spk / "wavs"
        d.mkdir(parents=True)
        lines = (root / "raw/transcriptions.csv").read_text().splitlines()
        keep = [lines[0]] + [l for l in lines[1:] if int(l.split(",")[0][4:]) in items]
        (two / spk / "transcriptions.csv").write_text("\n".join(keep) + "\n")
        for i in items:
            shutil.copy(root / f"raw/wavs/item{i}.wav", d / f"item{i}.wav")

    cfg = _acoustic_cfg(root, tmp_path / "exp_ms")
    cfg.update(
        raw_data_dir=[str(two / "alice"), str(two / "bob")],
        binary_data_dir=str(tmp_path / "binary_ms"),
        speakers=["alice", "bob"], use_spk_id=True, num_spk=2,
        diffusion_type="reflow",
    )
    from xiaoicesing_io_tpu.preprocessing.acoustic_binarizer import AcousticBinarizer

    AcousticBinarizer(cfg).process()
    import json

    spk_map = json.loads((Path(cfg["binary_data_dir"]) / "spk_map.json").read_text())
    assert spk_map == {"alice": 0, "bob": 1}

    from xiaoicesing_io_tpu.training.tasks import build_acoustic_trainer

    trainer = build_acoustic_trainer(cfg)
    trainer.fit()
    from xiaoicesing_io_tpu.training.checkpoint import list_checkpoints

    assert len(list_checkpoints(cfg["work_dir"])) >= 1

    # copy-synthesis eval must handle the multi-speaker path (spk_ids ->
    # single-speaker mix) and report finite numbers
    from xiaoicesing_io_tpu.eval.copy_synthesis import evaluate_acoustic

    report = evaluate_acoustic(cfg, dataset="valid", limit=1)
    assert np.isfinite(report["mean_mel_mae"])
    assert report["items"][0]["frames"] > 0


def test_sigterm_checkpoints_and_exits_cleanly(tiny_binary, tmp_path):
    """Preemption: SIGTERM mid-training saves a checkpoint at the next step
    boundary and exits 0; resume continues from it."""
    import os
    import signal
    import subprocess
    import sys
    import time

    root = tiny_binary
    cfg = _acoustic_cfg(root, tmp_path / "exp_sig")
    if not (root / "binary_ac/train.data").exists():
        from xiaoicesing_io_tpu.preprocessing.acoustic_binarizer import AcousticBinarizer

        AcousticBinarizer(cfg).process()
    cfg.update(max_updates=100000, val_check_interval=100000,
               log_interval=1, num_sanity_val_steps=0)
    import yaml as _yaml

    cfg_path = tmp_path / "sig.yaml"
    def _plain(x):
        if isinstance(x, dict):
            return {k: _plain(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return [_plain(v) for v in x]
        return x

    with open(cfg_path, "w") as f:
        _yaml.safe_dump(_plain(dict(cfg)), f)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    repo = Path(__file__).parent.parent
    proc = subprocess.Popen(
        [sys.executable, str(repo / "scripts/train.py"), "--config", str(cfg_path),
         "--exp_name", "sig_test", "--work_dir", str(tmp_path / "ckpts")],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=str(tmp_path),
    )
    # wait until it has taken at least one step (log_interval=1)
    deadline = time.time() + 300
    lines = []
    for line in proc.stdout:
        lines.append(line)
        if "| step " in line or time.time() > deadline:
            break
    proc.send_signal(signal.SIGTERM)
    out_rest, _ = proc.communicate(timeout=300)
    lines.append(out_rest)
    out = "".join(lines)
    assert proc.returncode == 0, out[-2000:]
    assert "preempted" in out, out[-2000:]
    from xiaoicesing_io_tpu.training.checkpoint import list_checkpoints

    ckpts = list_checkpoints(tmp_path / "ckpts" / "sig_test")
    assert len(ckpts) >= 1, out[-2000:]


def test_lr_schedule_matches_torch_composites():
    """Golden test: our schedule functions reproduce torch LR trajectories,
    including the recursive SequentialLR / ChainedScheduler composites the
    reference builds from config (utils/__init__.py:278-314)."""
    import torch

    from xiaoicesing_io_tpu.training.schedules import build_lr_schedule

    base_lr = 0.1

    def torch_traj(make_sched, n=40):
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=base_lr)
        sched = make_sched(opt)
        lrs = []
        for _ in range(n):
            lrs.append(opt.param_groups[0]["lr"])
            opt.step()
            sched.step()
        return np.array(lrs)

    cases = [
        (
            {"scheduler_cls": "torch.optim.lr_scheduler.StepLR",
             "step_size": 7, "gamma": 0.5},
            lambda o: torch.optim.lr_scheduler.StepLR(o, step_size=7, gamma=0.5),
        ),
        (
            {"scheduler_cls": "torch.optim.lr_scheduler.MultiStepLR",
             "milestones": [5, 12, 30], "gamma": 0.3},
            lambda o: torch.optim.lr_scheduler.MultiStepLR(
                o, milestones=[5, 12, 30], gamma=0.3),
        ),
        (
            {"scheduler_cls": "torch.optim.lr_scheduler.LinearLR",
             "start_factor": 0.25, "total_iters": 10},
            lambda o: torch.optim.lr_scheduler.LinearLR(
                o, start_factor=0.25, total_iters=10),
        ),
        (
            {"scheduler_cls": "torch.optim.lr_scheduler.ConstantLR",
             "factor": 0.5, "total_iters": 8},
            lambda o: torch.optim.lr_scheduler.ConstantLR(
                o, factor=0.5, total_iters=8),
        ),
        (
            # the exact composite example from the reference's BestPractices
            {"scheduler_cls": "torch.optim.lr_scheduler.SequentialLR",
             "schedulers": [
                 {"cls": "torch.optim.lr_scheduler.ExponentialLR", "gamma": 0.5},
                 {"cls": "torch.optim.lr_scheduler.LinearLR"},
                 {"cls": "torch.optim.lr_scheduler.MultiStepLR",
                  "milestones": [10, 20]},
             ],
             "milestones": [10, 20]},
            lambda o: torch.optim.lr_scheduler.SequentialLR(
                o,
                [torch.optim.lr_scheduler.ExponentialLR(o, gamma=0.5),
                 torch.optim.lr_scheduler.LinearLR(o),
                 torch.optim.lr_scheduler.MultiStepLR(o, milestones=[10, 20])],
                milestones=[10, 20]),
        ),
        (
            {"scheduler_cls": "torch.optim.lr_scheduler.ChainedScheduler",
             "schedulers": [
                 {"cls": "torch.optim.lr_scheduler.ConstantLR",
                  "factor": 0.4, "total_iters": 6},
                 {"cls": "torch.optim.lr_scheduler.ExponentialLR", "gamma": 0.9},
             ]},
            lambda o: torch.optim.lr_scheduler.ChainedScheduler(
                [torch.optim.lr_scheduler.ConstantLR(o, factor=0.4, total_iters=6),
                 torch.optim.lr_scheduler.ExponentialLR(o, gamma=0.9)]),
        ),
    ]

    for args, make_sched in cases:
        want = torch_traj(make_sched)
        sched = build_lr_schedule({"lr": base_lr}, args)
        got = np.array([float(sched(k)) for k in range(len(want))])
        np.testing.assert_allclose(
            got, want, rtol=1e-5,
            err_msg=f"LR trajectory mismatch for {args['scheduler_cls']}")


def test_profiler_trace_capture(tiny_binary, tmp_path):
    """profile_trace_steps captures a jax.profiler trace into work_dir/trace."""
    root = tiny_binary
    cfg = _acoustic_cfg(root, tmp_path / "exp_trace")
    if not (root / "binary_ac/train.data").exists():
        from xiaoicesing_io_tpu.preprocessing.acoustic_binarizer import AcousticBinarizer

        AcousticBinarizer(cfg).process()
    cfg.update(max_updates=2, val_check_interval=10, num_sanity_val_steps=0,
               profile_trace_steps=2)
    from xiaoicesing_io_tpu.training.tasks import build_acoustic_trainer

    build_acoustic_trainer(cfg).fit()
    trace_dir = tmp_path / "exp_trace" / "trace"
    assert trace_dir.exists()
    assert any(trace_dir.rglob("*"))  # plugin wrote event/trace files


def test_grad_accumulation_counts_optimizer_steps(tiny_binary, tmp_path):
    """max_updates counts OPTIMIZER steps (Lightning max_steps semantics):
    with accumulate_grad_batches=2, reaching step N must consume 2N
    micro-batches, and the step-2 checkpoint reflects 2 real updates."""
    root = tiny_binary
    cfg = _acoustic_cfg(root, tmp_path / "exp_accum")
    cfg.update(max_updates=2, accumulate_grad_batches=2, val_check_interval=2,
               max_batch_size=1, num_sanity_val_steps=0)
    if not (root / "binary_ac/train.data").exists():
        from xiaoicesing_io_tpu.preprocessing.acoustic_binarizer import AcousticBinarizer

        AcousticBinarizer(cfg).process()
    from xiaoicesing_io_tpu.training.tasks import build_acoustic_trainer

    trainer = build_acoustic_trainer(cfg)
    consumed = {"n": 0}
    inner = trainer.collate

    def counting_collate(items, **kw):
        consumed["n"] += 1
        return inner(items, **kw)

    trainer.collate = counting_collate
    trainer.fit()
    assert consumed["n"] == 4  # 2 optimizer steps x accum 2
    from xiaoicesing_io_tpu.training.checkpoint import list_checkpoints

    steps = [int(p.name.rsplit("_", 1)[-1]) for p in list_checkpoints(cfg["work_dir"])]
    assert max(steps) == 2
    # MultiSteps actually applied 2 optimizer updates
    def find_gradient_step(o):
        if hasattr(o, "gradient_step"):
            return int(o.gradient_step)
        if isinstance(o, tuple):
            for x in o:
                r = find_gradient_step(x)
                if r is not None:
                    return r
        return None

    assert find_gradient_step(trainer.state.opt_state) == 2


def test_prefetch_propagates_collate_errors(tiny_binary, tmp_path):
    """A failing collate must fail the run, not silently end every epoch."""
    root = tiny_binary
    cfg = _acoustic_cfg(root, tmp_path / "exp_err")
    if not (root / "binary_ac/train.data").exists():
        from xiaoicesing_io_tpu.preprocessing.acoustic_binarizer import AcousticBinarizer

        AcousticBinarizer(cfg).process()
    cfg.update(max_updates=2, num_sanity_val_steps=0)
    from xiaoicesing_io_tpu.training.tasks import build_acoustic_trainer

    trainer = build_acoustic_trainer(cfg)

    def broken_collate(items, **kw):
        raise KeyError("corrupt item")

    trainer.collate = broken_collate
    with pytest.raises(KeyError, match="corrupt item"):
        trainer.fit()


def test_resume_restores_epoch(tiny_binary, tmp_path):
    """The saved epoch is restored on resume, so the sampler does not replay
    the epoch-0 shuffle order after preemption."""
    root = tiny_binary
    cfg = _acoustic_cfg(root, tmp_path / "exp_epoch")
    if not (root / "binary_ac/train.data").exists():
        from xiaoicesing_io_tpu.preprocessing.acoustic_binarizer import AcousticBinarizer

        AcousticBinarizer(cfg).process()
    cfg.update(max_updates=12, val_check_interval=4, num_sanity_val_steps=0)
    from xiaoicesing_io_tpu.training.tasks import build_acoustic_trainer

    trainer = build_acoustic_trainer(cfg)
    trainer.fit()  # 4 items, batch budget -> multiple epochs
    state, step, meta = trainer.ckpt.restore_latest(trainer.state, with_meta=True)
    assert step == 12
    assert meta.get("epoch", 0) > 0


def test_rss_watchdog_checkpoint_and_reexec(tiny_binary, tmp_path):
    """Host-RSS watchdog regression (VERDICT r3 task 3a): with a 1 MB
    threshold the trainer must checkpoint, re-exec itself in place at least
    once, and the resumed image must still complete at the expected final
    step with exit code 0 (the round-3 behavior was only verified manually)."""
    import os
    import subprocess
    import sys

    import yaml as _yaml

    root = tiny_binary
    cfg = _acoustic_cfg(root, tmp_path / "ckpts" / "rss_test")
    if not (root / "binary_ac/train.data").exists():
        from xiaoicesing_io_tpu.preprocessing.acoustic_binarizer import AcousticBinarizer

        AcousticBinarizer(cfg).process()
    # log_interval=1: the watchdog checks every step once >=2 steps have run
    # in this process image, so max_updates=4 yields exactly one re-exec
    # cycle (trigger at step 2; the resumed image runs 3..4 and finishes —
    # step 4 is exempt because step < max_updates gates the check)
    cfg.update(max_updates=4, val_check_interval=100000, log_interval=1,
               num_sanity_val_steps=0, max_host_rss_mb=1)

    def _plain(x):
        if isinstance(x, dict):
            return {k: _plain(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return [_plain(v) for v in x]
        return x

    cfg_path = tmp_path / "rss.yaml"
    with open(cfg_path, "w") as f:
        _yaml.safe_dump(_plain(dict(cfg)), f)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    repo = Path(__file__).parent.parent
    proc = subprocess.run(
        [sys.executable, str(repo / "scripts/train.py"), "--config", str(cfg_path),
         "--exp_name", "rss_test", "--work_dir", str(tmp_path / "ckpts")],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=str(tmp_path), timeout=600,
    )
    out = proc.stdout
    assert proc.returncode == 0, out[-3000:]
    assert out.count("| re-exec at step") >= 1, out[-3000:]
    assert "| resumed from step" in out, out[-3000:]
    assert "| training finished at step 4" in out, out[-3000:]
    from xiaoicesing_io_tpu.training.checkpoint import list_checkpoints

    steps = [int(p.name.rsplit("_", 1)[-1])
             for p in list_checkpoints(tmp_path / "ckpts" / "rss_test")]
    assert 4 in steps, steps


def test_compact_feed_loss_parity(tiny_binary, tmp_path):
    """Compact-feed regression (VERDICT r3 task 3b): the f16/i16 wire format
    must reproduce the fp32-feed per-step loss trajectory within the
    documented tolerance (round 3 claimed 4-decimal agreement from a one-off
    manual run; this enforces it)."""
    root = tiny_binary
    if not (root / "binary_ac/train.data").exists():
        from xiaoicesing_io_tpu.preprocessing.acoustic_binarizer import AcousticBinarizer

        AcousticBinarizer(_acoustic_cfg(root, tmp_path / "unused")).process()

    from xiaoicesing_io_tpu.training.tasks import build_acoustic_trainer

    def run(compact, work_dir):
        cfg = _acoustic_cfg(root, work_dir)
        cfg.update(max_updates=4, val_check_interval=100000, log_interval=1,
                   num_sanity_val_steps=0, compact_feed=compact)
        trainer = build_acoustic_trainer(cfg)
        records = []
        orig = trainer.train_step

        def recording_step(state, batch, key):
            state, metrics = orig(state, batch, key)
            records.append({k: float(v) for k, v in metrics.items()})
            return state, metrics

        trainer.train_step = recording_step
        trainer.fit()
        return records

    wide = run(False, tmp_path / "exp_wide")
    compact = run(True, tmp_path / "exp_compact")
    assert len(wide) == len(compact) >= 4
    diffs = [abs(w["total_loss"] - c["total_loss"])
             for w, c in zip(wide, compact)]
    assert max(diffs) < 1e-3, (diffs, wide, compact)


def test_fixed_batch_rows_bounds_shape_classes():
    """fixed_batch_rows must yield a SMALL, epoch-stable set of (t_pad, rows)
    shape classes: on a remote/tunneled compiler every distinct train-batch
    shape is a 30s-10min XLA compile, and before the multiple-of-8 rounding a
    diverse-length corpus produced 22 classes over 12 epochs (rows jittering
    54/55, 42/43...) vs 8 frame buckets."""
    from xiaoicesing_io_tpu.data.dataset import FRAME_BUCKET, _round_up
    from xiaoicesing_io_tpu.data.sampler import DistributedBatchSampler
    from xiaoicesing_io_tpu.training.trainer import fixed_batch_rows

    rng = np.random.default_rng(7)
    sizes = rng.integers(650, 1600, size=800)  # ~8-18s items at hop 512

    class _DS:
        def __init__(self):
            self.sizes = sizes

        def __len__(self):
            return len(sizes)

        def num_frames(self, i):
            return int(sizes[i])

    budget, mbs = 50000, 64
    shapes = set()
    for epoch in range(12):
        sampler = DistributedBatchSampler(_DS(), budget, mbs, seed=epoch)
        for batch in sampler:
            t_pad = _round_up(int(max(sizes[i] for i in batch)), FRAME_BUCKET)
            rows = fixed_batch_rows(len(batch), t_pad, budget, mbs, n_local=1)
            assert rows >= len(batch)
            assert rows % 8 == 0
            # <=7 zero rows on top of the clamped frame-budget target
            assert rows <= min(max(len(batch), budget // t_pad), mbs) + 7
            shapes.add((t_pad, rows))
    n_buckets = len({s[0] for s in shapes})
    # at most ~2 row variants per frame bucket, not one-per-batch jitter
    assert len(shapes) <= 2 * n_buckets, sorted(shapes)


def test_stall_guard_reexecs_on_stale_heartbeat():
    """The stall watchdog must re-exec (save=False: the main thread may be
    wedged inside a backend call) once the heartbeat is stale, and must NOT
    fire while steps keep completing."""
    import time as _time

    from xiaoicesing_io_tpu.training.trainer import _stall_guard_loop

    class _Stub:
        def __init__(self):
            self._heartbeat = _time.time()
            self.calls = []

        def _exec_restart(self, step, save=True):
            self.calls.append(save)
            raise SystemExit  # stop the loop in the test

    # fresh heartbeat: one poll passes without firing
    t = _Stub()
    t._heartbeat = _time.time() + 3600  # never stale during this test
    import threading

    th = threading.Thread(
        target=_stall_guard_loop, args=(t, 1e-9, 0.01), daemon=True
    )
    th.start()
    _time.sleep(0.1)
    assert t.calls == []

    # stale heartbeat: fires with save=False
    t2 = _Stub()
    t2._heartbeat = _time.time() - 120
    try:
        _stall_guard_loop(t2, stall_min=1.0, poll_s=0.01)
    except SystemExit:
        pass
    assert t2.calls == [False]


def test_variance_multispeaker_eval(tiny_binary, tmp_path):
    """Multi-speaker variance: encode() needs spk_id in every sampling path
    (trainer validation extras, offline eval) — round 4 regression: all three
    call sites omitted it and crashed with 'NoneType has no dtype' on any
    use_spk_id corpus."""
    import shutil

    root = tiny_binary
    two = tmp_path / "two_spk_var"
    for spk, items in (("alice", (0, 1)), ("bob", (2, 3))):
        d = two / spk / "wavs"
        d.mkdir(parents=True)
        lines = (root / "raw/transcriptions.csv").read_text().splitlines()
        keep = [lines[0]] + [l for l in lines[1:] if int(l.split(",")[0][4:]) in items]
        (two / spk / "transcriptions.csv").write_text("\n".join(keep) + "\n")
        for i in items:
            shutil.copy(root / f"raw/wavs/item{i}.wav", d / f"item{i}.wav")

    cfg = load_config(
        Path(__file__).parent.parent / "xiaoicesing_io_tpu/configs/variance.yaml"
    )
    cfg.update(
        raw_data_dir=[str(two / "alice"), str(two / "bob")],
        binary_data_dir=str(tmp_path / "binary_var_ms"),
        dictionary=str(root / "dictionary.txt"),
        speakers=["alice", "bob"], use_spk_id=True, num_spk=2,
        test_prefixes=["item0"], work_dir=str(tmp_path / "exp_var_ms"),
        enc_layers=1, max_updates=2, log_interval=1, val_check_interval=2,
        max_batch_frames=2000, max_batch_size=4, precision="fp32",
        predict_dur=True, predict_pitch=True, num_valid_plots=1,
    )
    cfg["dur_prediction_args"].update(hidden_size=32, num_layers=1)
    cfg["pitch_prediction_args"].update(repeat_bins=8)
    cfg["pitch_prediction_args"]["backbone_args"].update(num_layers=2, num_channels=16)

    from xiaoicesing_io_tpu.preprocessing.variance_binarizer import VarianceBinarizer

    VarianceBinarizer(cfg).process()

    from xiaoicesing_io_tpu.training.tasks import build_variance_trainer

    trainer = build_variance_trainer(cfg)
    extras_errors = []
    orig = trainer.on_validation_extras

    def checked_extras(tr, step, key):
        try:
            orig(tr, step, key)
        except Exception as e:  # the trainer swallows these with a WARN
            extras_errors.append(e)
            raise

    trainer.on_validation_extras = checked_extras
    trainer.fit()
    assert not extras_errors, extras_errors

    from xiaoicesing_io_tpu.eval.copy_synthesis import evaluate_variance

    report = evaluate_variance(cfg, dataset="valid", limit=1)
    assert np.isfinite(report["pitch_acc"])
    assert np.isfinite(report["rhythm_corr"])


def test_fixed_batch_rows_divisibility_and_cap():
    """ADVICE r4: rows must be divisible by the LOCAL DEVICE COUNT for any
    n_local (lcm(8, n_local), not max(8, n_local) — 3/5/6 local devices do
    not divide 8), and the round-up must not silently exceed a
    non-multiple-of-8 max_batch_size (the user's memory cap)."""
    from xiaoicesing_io_tpu.training.trainer import fixed_batch_rows

    for n_local in (1, 2, 3, 4, 5, 6, 8):
        for t_pad in (256, 512, 1024, 2048):
            rows = fixed_batch_rows(10, t_pad, 50000, 64, n_local)
            assert rows % n_local == 0, (n_local, t_pad, rows)
            assert rows >= 10
            assert rows <= 64

    # cap not a multiple of 8: round-up must stay under it
    rows = fixed_batch_rows(4, 512, 50000, 61, n_local=1)
    assert rows <= 61 and rows % 8 == 0
    # cap smaller than one 8-row quantum: only shard divisibility enforced
    rows = fixed_batch_rows(2, 512, 50000, 4, n_local=2)
    assert rows <= 4 and rows % 2 == 0
    # n_items always wins over the cap (every packed item needs a row)
    assert fixed_batch_rows(9, 512, 50000, 8, n_local=1) >= 9


def test_incomplete_checkpoint_skipped_and_cleaned(tmp_path):
    """ADVICE r4 (medium): a checkpoint dir without meta.json — the stall
    watchdog can execve() between orbax finalizing the renamed dir and the
    meta write — must not break resume.  restore_latest falls back to the
    previous complete checkpoint, and the next save cleans the stale dir."""
    from xiaoicesing_io_tpu.training.checkpoint import (
        CheckpointManager,
        latest_checkpoint,
    )

    class _FakeState:
        def __init__(self, params, opt_state, step=0):
            self.params, self.opt_state, self.step = params, opt_state, step

        def replace(self, **kw):
            d = dict(params=self.params, opt_state=self.opt_state,
                     step=self.step)
            d.update(kw)
            return _FakeState(**d)

    state = _FakeState({"w": np.ones((3,), np.float32)},
                       {"m": np.zeros((3,), np.float32)})
    mgr = CheckpointManager(tmp_path, category="acoustic", num_ckpt_keep=5)
    mgr.save(state, 10)
    mgr.save(state, 20)
    incomplete = mgr.save(state, 30)
    (incomplete / "meta.json").unlink()  # simulate mid-save exec

    assert latest_checkpoint(tmp_path).name == "model_ckpt_steps_20"
    restored, step = mgr.restore_latest(state)
    assert step == 20  # fell back, did not crash on the incomplete dir

    mgr.save(state, 40)  # cleanup removes the stale partial
    assert not incomplete.exists()
    assert latest_checkpoint(tmp_path).name == "model_ckpt_steps_40"
