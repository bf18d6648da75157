"""Subprocess-driven end-to-end test of the six ``scripts/*.py`` CLI wrappers.

Covers the full user workflow on a synthetic 4-item corpus:
binarize -> train (4 steps, validation with TB audio) -> infer (mel + wav,
seeded determinism) -> vocode -> drop_spk guard.  Everything the reference
exposes as a script entry point (ref: scripts/{binarize,train,infer,vocode,
drop_spk,export}.py) is executed as an actual child process, so command
dispatch, argument parsing, cwd-relative exp resolution, and artifact layout
are all exercised exactly as a user would hit them.
"""

import json
import math
import os
import subprocess
import sys
import wave
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy tier: run fast tier with -m 'not slow'

REPO = Path(__file__).resolve().parent.parent
SCRIPTS = REPO / "scripts"
REFERENCE = Path("/root/reference")


def _run(args, cwd, check=True, timeout=600):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=str(REPO))
    p = subprocess.run(
        [sys.executable, *args], cwd=cwd, env=env, timeout=timeout,
        capture_output=True, text=True,
    )
    if check and p.returncode != 0:
        raise AssertionError(
            f"{args} failed rc={p.returncode}\nstdout:\n{p.stdout[-3000:]}"
            f"\nstderr:\n{p.stderr[-3000:]}"
        )
    return p


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Sine-wav corpus + tiny config; returns its root dir."""
    root = tmp_path_factory.mktemp("cli_e2e")
    wav_dir = root / "raw/tinyspk/wavs"
    wav_dir.mkdir(parents=True)
    sr = 44100
    rng = np.random.default_rng(0)
    rows = ["name,ph_seq,ph_dur"]
    specs = [
        ("item1", "SP a b SP", [0.1, 0.25, 0.25, 0.1], 220.0),
        ("item2", "AP a b a", [0.12, 0.2, 0.2, 0.18], 260.0),
        ("item3", "SP b a AP", [0.1, 0.3, 0.2, 0.1], 300.0),
        ("item4", "AP b a SP", [0.15, 0.2, 0.25, 0.1], 196.0),
    ]
    for name, ph_seq, ph_dur, f0 in specs:
        n = int(sum(ph_dur) * sr)
        t = np.arange(n) / sr
        x = 0.4 * np.sin(2 * math.pi * f0 * t) * (0.6 + 0.4 * np.sin(2 * math.pi * 3 * t))
        x += 0.01 * rng.standard_normal(n)
        with wave.open(str(wav_dir / f"{name}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes((np.clip(x, -1, 1) * 32767).astype(np.int16).tobytes())
        rows.append(f"{name},{ph_seq},{' '.join(map(str, ph_dur))}")
    (root / "raw/tinyspk/transcriptions.csv").write_text("\n".join(rows) + "\n")
    (root / "dict.txt").write_text("x\ta b\ny\tb a\n")

    (root / "cfg.yaml").write_text(f"""
base_config: [acoustic.yaml]
dictionary: {root}/dict.txt
raw_data_dir: [{root}/raw/tinyspk]
speakers: [tinyspk]
binary_data_dir: {root}/binary
test_prefixes: [item1]
binarization_args:
  num_workers: 0
hidden_size: 32
enc_layers: 1
enc_ffn_kernel_size: 3
backbone_args:
  num_channels: 16
  num_layers: 2
shallow_diffusion_args:
  aux_decoder_args:
    num_channels: 16
    num_layers: 1
max_updates: 4
val_check_interval: 2
num_valid_plots: 1
precision: fp32
sampling_steps: 3
max_batch_frames: 2000
max_batch_size: 4
vocoder_ckpt: {root}/vocoder/model.ckpt
""")

    seg = {
        "offset": 0.0,
        "text": "x",
        "ph_seq": "SP a b SP",
        "ph_dur": "0.1 0.3 0.3 0.1",
        "f0_seq": " ".join(["220.0"] * 70),
        "f0_timestep": "0.0116099773",
    }
    (root / "song.ds").write_text(json.dumps([seg]))
    return root


def _make_vocoder_ckpt(root: Path) -> bool:
    """Fabricate a tiny NSF-HiFiGAN torch checkpoint using the reference
    Generator as a weight source (oracle only; skipped when absent)."""
    if not REFERENCE.exists():
        return False
    code = f"""
import sys, json, types
class _Any(types.ModuleType):
    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        if name[:1].isupper():
            return type(name, (), {{}})
        return lambda *a, **k: (a[0] if a else None)
for m in ["lightning", "lightning.pytorch", "lightning.pytorch.utilities",
          "lightning.pytorch.utilities.rank_zero"]:
    sys.modules[m] = _Any(m)
sys.path.insert(0, "{REFERENCE}")
import torch
from pathlib import Path
from modules.nsf_hifigan.env import AttrDict
from modules.nsf_hifigan.models import Generator
h = dict(num_mels=128, sampling_rate=44100, hop_size=512, n_fft=2048,
         win_size=2048, fmin=40, fmax=16000,
         upsample_rates=[8, 8, 2, 2, 2], upsample_kernel_sizes=[16, 16, 4, 4, 4],
         upsample_initial_channel=32, resblock="1",
         resblock_kernel_sizes=[3], resblock_dilation_sizes=[[1, 3, 5]],
         mini_nsf=False)
torch.manual_seed(0)
g = Generator(AttrDict(h)).eval()
g.remove_weight_norm()
out = Path("{root}/vocoder"); out.mkdir(exist_ok=True)
torch.save({{"generator": g.state_dict()}}, out / "model.ckpt")
(out / "config.json").write_text(json.dumps(h))
"""
    p = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
    return p.returncode == 0


@pytest.mark.parametrize(
    "script", ["binarize", "train", "infer", "vocode", "export", "drop_spk", "eval"]
)
def test_script_wrapper_dispatch(script, tmp_path):
    """Every scripts/*.py wrapper must dispatch to a real CLI command
    (regression: click renamed drop_spk -> drop-spk and the wrapper broke)."""
    p = _run([SCRIPTS / f"{script}.py", "--help"], cwd=tmp_path, timeout=180)
    assert "Usage" in p.stdout


def test_cli_e2e_acoustic(corpus):
    have_vocoder = _make_vocoder_ckpt(corpus)

    _run([SCRIPTS / "binarize.py", "--config", "cfg.yaml"], cwd=corpus)
    for artifact in ["train.data", "train.meta", "valid.data", "valid.meta",
                     "spk_map.json", "dictionary.txt", "phoneme_distribution.jpg"]:
        assert (corpus / "binary" / artifact).exists(), artifact

    p = _run([SCRIPTS / "train.py", "--config", "cfg.yaml", "--exp_name", "E"],
             cwd=corpus, timeout=900)
    assert "training finished at step 4" in p.stdout
    assert "validation @ step 4" in p.stdout
    wd = corpus / "checkpoints/E"
    assert (wd / "model_ckpt_steps_4").exists()
    for archived in ["config.yaml", "dictionary.txt", "spk_map.json"]:
        assert (wd / archived).exists(), archived
    if have_vocoder:  # validation extras vocode + log TB audio
        events = list((wd / "lightning_logs").rglob("events*"))
        assert any(b"wav_diff" in e.read_bytes() for e in events)

    _run([SCRIPTS / "infer.py", "acoustic", "song.ds", "--exp", "E",
          "--mel", "--out", "out"], cwd=corpus, timeout=900)
    mel = np.load(corpus / "out/song.mel.npz")
    assert mel["seg0_mel"].shape[-1] == 128

    # bad exp prefix -> clean error, not a traceback into internals
    p = _run([SCRIPTS / "infer.py", "acoustic", "song.ds", "--exp", "BOGUS"],
             cwd=corpus, check=False)
    assert p.returncode != 0 and "no matching exp" in (p.stdout + p.stderr)

    # copy-synthesis eval over the binarized valid set
    p = _run([SCRIPTS / "eval.py", "--exp", "E"], cwd=corpus, timeout=900)
    assert "mean_mel_mae=" in p.stdout and "step 4 valid" in p.stdout
    assert "mean_mcd=" in p.stdout

    if not have_vocoder:
        pytest.skip("reference repo unavailable: wav/vocode legs skipped")

    # eval with waveform PESQ (vocodes predicted + GT mels)
    p = _run([SCRIPTS / "eval.py", "--exp", "E", "--pesq"], cwd=corpus,
             timeout=900)
    assert "mean_pesq=" in p.stdout

    for title in ["run1", "run2"]:
        _run([SCRIPTS / "infer.py", "acoustic", "song.ds", "--exp", "E",
              "--out", "out", "--seed", "42", "--title", title],
             cwd=corpus, timeout=900)
    w1 = (corpus / "out/run1.wav").read_bytes()
    w2 = (corpus / "out/run2.wav").read_bytes()
    assert w1 == w2, "same seed must give byte-identical wavs"
    n_frames = mel["seg0_f0"].shape[-1]
    assert len(w1) - 44 == n_frames * 512 * 2  # PCM16: frames*hop samples

    # unseeded mode draws fresh entropy per invocation (reference leaves the
    # torch RNG unseeded), so two runs without --seed must differ
    for title in ["fresh1", "fresh2"]:
        _run([SCRIPTS / "infer.py", "acoustic", "song.ds", "--exp", "E",
              "--out", "out", "--title", title], cwd=corpus, timeout=900)
    assert (corpus / "out/fresh1.wav").read_bytes() != \
        (corpus / "out/fresh2.wav").read_bytes()

    # vocode: seeded -> byte-identical; the NSF source noise rides the seed
    for title in ["voc", "voc2"]:
        _run([SCRIPTS / "vocode.py", "out/song.mel.npz", "--exp", "E",
              "--out", "out", "--title", title, "--seed", "5"],
             cwd=corpus, timeout=600)
    vb = (corpus / "out/voc.wav").read_bytes()
    assert vb == (corpus / "out/voc2.wav").read_bytes()
    assert len(vb) == len(w1)

    # drop_spk: single-speaker model -> clear "no speaker embedding" error
    p = _run([SCRIPTS / "drop_spk.py", "E", "--spk", "0", "--out", "scrub"],
             cwd=corpus, check=False)
    assert p.returncode != 0 and "no speaker embedding table" in (p.stdout + p.stderr)


@pytest.fixture(scope="module")
def variance_corpus(tmp_path_factory):
    """Score-annotated corpus (ph_num/note_seq/note_dur) + variance config."""
    root = tmp_path_factory.mktemp("cli_e2e_var")
    wav_dir = root / "raw/wavs"
    wav_dir.mkdir(parents=True)
    sr = 44100
    rng = np.random.default_rng(1)
    rows = ["name,ph_seq,ph_dur,ph_num,note_seq,note_dur"]
    silences = {"v1": "SP", "v2": "AP", "v3": "SP", "v4": "AP"}
    for i, (name, f0) in enumerate([("v1", 220.0), ("v2", 247.0),
                                    ("v3", 294.0), ("v4", 196.0)]):
        dur = 1.2
        n = int(sr * dur)
        t = np.arange(n) / sr
        x = 0.3 * np.sin(2 * math.pi * f0 * t) + 0.01 * rng.standard_normal(n)
        with wave.open(str(wav_dir / f"{name}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes((np.clip(x, -1, 1) * 32767).astype(np.int16).tobytes())
        third = dur / 3
        ph = "a b" if i % 2 == 0 else "b a"
        rows.append(
            f"{name},{silences[name]} {ph},{third:.3f} {third:.3f} {third:.3f},"
            f"1 2,rest A3,{third:.3f} {2 * third:.3f}"
        )
    (root / "raw/transcriptions.csv").write_text("\n".join(rows) + "\n")
    (root / "dict.txt").write_text("x\ta b\ny\tb a\n")

    (root / "cfg.yaml").write_text(f"""
base_config: [variance.yaml]
dictionary: {root}/dict.txt
raw_data_dir: [{root}/raw]
speakers: [tinyspk]
binary_data_dir: {root}/binary
test_prefixes: [v1]
binarization_args:
  num_workers: 0
hidden_size: 32
enc_layers: 1
enc_ffn_kernel_size: 3
predict_energy: true
dur_prediction_args:
  hidden_size: 16
  num_layers: 1
pitch_prediction_args:
  repeat_bins: 8
  backbone_args:
    num_channels: 16
    num_layers: 2
variances_prediction_args:
  total_repeat_bins: 8
  backbone_args:
    num_channels: 16
    num_layers: 2
max_updates: 4
val_check_interval: 2
num_valid_plots: 1
precision: fp32
sampling_steps: 3
max_batch_frames: 2000
max_batch_size: 4
""")

    seg = {
        "offset": 0.0,
        "text": "x",
        "ph_seq": "SP a b",
        "ph_num": "1 2",
        "note_seq": "rest A3",
        "note_dur": "0.4 0.8",
        "note_slur": "0 0",
    }
    (root / "song.ds").write_text(json.dumps([seg]))
    return root


def test_cli_e2e_variance(variance_corpus):
    root = variance_corpus
    _run([SCRIPTS / "binarize.py", "--config", "cfg.yaml"], cwd=root)
    assert (root / "binary/train.data").exists()

    p = _run([SCRIPTS / "train.py", "--config", "cfg.yaml", "--exp_name", "V"],
             cwd=root, timeout=900)
    assert "training finished at step 4" in p.stdout
    assert (root / "checkpoints/V/model_ckpt_steps_4").exists()
    # validation metrics cover duration AND sampled pitch
    # (ref: variance_task.py valid_metrics rhythm_corr/ph_dur_acc/pitch_acc)
    assert "rhythm_corr=" in p.stdout and "pitch_acc=" in p.stdout

    # duration + sampled-pitch metric eval over the binarized valid set
    p = _run([SCRIPTS / "eval.py", "--exp", "V"], cwd=root, timeout=900)
    assert "rhythm_corr=" in p.stdout and "ph_dur_acc=" in p.stdout
    assert "pitch_acc=" in p.stdout

    # explicit --predict energy: dur/pitch are predicted internally as
    # prerequisites (score-only .ds) but only energy is written back
    # (ref: ds_variance.py write-back gating on the requested predictions)
    _run([SCRIPTS / "infer.py", "variance", "song.ds", "--exp", "V",
          "--predict", "energy", "--out", "out", "--seed", "7"],
         cwd=root, timeout=900)
    seg = json.loads((root / "out/song.ds").read_text())[0]
    assert "energy" in seg and "energy_timestep" in seg
    assert "ph_dur" not in seg and "f0_seq" not in seg

    # auto-completion mode (no --predict): every attribute the model can
    # predict and the .ds is missing gets filled in
    _run([SCRIPTS / "infer.py", "variance", "song.ds", "--exp", "V",
          "--out", "out_auto", "--seed", "7"], cwd=root, timeout=900)
    seg = json.loads((root / "out_auto/song.ds").read_text())[0]
    assert "ph_dur" in seg and len(seg["ph_dur"].split()) == 3
    assert "f0_seq" in seg and "f0_timestep" in seg
    assert "energy" in seg and "energy_timestep" in seg
    assert all(float(x) > 0 for x in seg["f0_seq"].split())
