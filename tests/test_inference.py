"""End-to-end acoustic inference smoke test on the sample .ds corpus."""

import json
from pathlib import Path

import jax
import numpy as np
import pytest

from xiaoicesing_io_tpu.config import Config, load_config
from xiaoicesing_io_tpu.training.acoustic import build_acoustic, init_acoustic_state
from xiaoicesing_io_tpu.training.checkpoint import CheckpointManager

SAMPLES = Path(__file__).parent.parent / "samples"
DICT = Path(__file__).parent.parent / "dictionaries/opencpop-extension.txt"


@pytest.fixture(scope="module")
def work_dir(tmp_path_factory):
    wd = tmp_path_factory.mktemp("exp_acoustic")
    return wd


def _tiny_cfg(work_dir):
    cfg = load_config(
        Path(__file__).parent.parent / "xiaoicesing_io_tpu/configs/acoustic.yaml"
    )
    cfg.update(
        work_dir=str(work_dir),
        dictionary=str(DICT),
        enc_layers=1,
        backbone_args=Config(num_channels=32, num_layers=1, kernel_size=31,
                             strong_cond=True),
        sampling_steps=4,
    )
    cfg["shallow_diffusion_args"]["aux_decoder_args"].update(
        num_channels=32, num_layers=1
    )
    return cfg


def test_acoustic_infer_on_sample(work_dir):
    from xiaoicesing_io_tpu.inference.acoustic import DiffSingerAcousticInfer

    cfg = _tiny_cfg(work_dir)
    # create and save a random-initialized checkpoint in our native format
    from xiaoicesing_io_tpu.utils.phonemes import PhonemeDictionary
    from xiaoicesing_io_tpu.utils.text_encoder import TokenTextEncoder

    phdict = PhonemeDictionary.load(DICT)
    enc = TokenTextEncoder(phdict.phoneme_list)
    model, core, normalizer = build_acoustic(cfg, enc.vocab_size)
    state = init_acoustic_state(model, cfg, enc.vocab_size, jax.random.PRNGKey(0))
    mgr = CheckpointManager(work_dir, category="acoustic")
    mgr.save(state, step=100)

    infer = DiffSingerAcousticInfer(cfg, load_vocoder=False)
    with open(sorted(SAMPLES.glob("*.ds"))[0], encoding="utf8") as f:
        params = json.load(f)
    seg = params[0]
    batch = infer.preprocess_input(seg)
    assert batch["tokens"].shape[0] == 1
    T = batch["mel2ph"].shape[1]
    assert batch["f0"].shape == (1, T)
    mel = infer.forward_model(batch, seed=42)
    assert mel.shape == (1, T, cfg["audio_num_mel_bins"])
    assert np.isfinite(mel).all()
    # masked frames are forced to zero
    pad = np.asarray(batch["mel2ph"]) == 0
    assert np.allclose(mel[0][pad[0]], 0.0)
    # determinism given the same seed
    mel2 = infer.forward_model(batch, seed=42)
    np.testing.assert_allclose(mel, mel2, atol=1e-6)


def test_checkpoint_retention(tmp_path):
    cfg = _tiny_cfg(tmp_path)
    from xiaoicesing_io_tpu.utils.phonemes import PhonemeDictionary
    from xiaoicesing_io_tpu.utils.text_encoder import TokenTextEncoder

    phdict = PhonemeDictionary.load(DICT)
    enc = TokenTextEncoder(phdict.phoneme_list)
    model, core, normalizer = build_acoustic(cfg, enc.vocab_size)
    state = init_acoustic_state(model, cfg, enc.vocab_size, jax.random.PRNGKey(0))
    mgr = CheckpointManager(
        tmp_path, category="acoustic", num_ckpt_keep=2,
        permanent_ckpt_start=200, permanent_ckpt_interval=200,
    )
    for step in [100, 200, 300, 400, 500]:
        mgr.save(state, step=step)
    from xiaoicesing_io_tpu.training.checkpoint import list_checkpoints

    kept = [p.name for p in list_checkpoints(tmp_path)]
    # 200 and 400 are permanent; last 2 non-permanent kept: 300? no — deletable
    # are [100, 300, 500], keep last 2 -> [300, 500]
    assert kept == [
        "model_ckpt_steps_200", "model_ckpt_steps_300",
        "model_ckpt_steps_400", "model_ckpt_steps_500",
    ]
    # resume restores the latest step
    state2, step = mgr.restore_latest(state)
    assert step == 500
    # category guard
    mgr_bad = CheckpointManager(tmp_path, category="variance")
    with pytest.raises(ValueError):
        mgr_bad.restore_latest(state)


@pytest.mark.slow
def test_preprocess_entire_sample_corpus(tmp_path):
    """Every segment of every acoustic-ready sample .ds must preprocess:
    exercises dynamic gender/velocity curves, energy/breathiness curves and
    long multi-segment projects across the full shipped corpus."""
    from xiaoicesing_io_tpu.inference.acoustic import DiffSingerAcousticInfer
    from xiaoicesing_io_tpu.utils.phonemes import PhonemeDictionary
    from xiaoicesing_io_tpu.utils.text_encoder import TokenTextEncoder

    # gender/velocity default when absent (ref ds_acoustic.py:114-154); a
    # model with energy/breathiness embeds requires curves in the .ds (the
    # reference hard-fails the same way, ds_acoustic.py:104-112), so those
    # embeds are only enabled for the sample that carries the curves
    cfg = _tiny_cfg(tmp_path)
    cfg.update(use_key_shift_embed=True, use_speed_embed=True)
    cfg_var = _tiny_cfg(tmp_path)
    cfg_var.update(use_key_shift_embed=True, use_speed_embed=True,
                   use_energy_embed=True, use_breathiness_embed=True)
    phdict = PhonemeDictionary.load(DICT)
    enc = TokenTextEncoder(phdict.phoneme_list)
    model, core, normalizer = build_acoustic(cfg, enc.vocab_size)
    state = init_acoustic_state(model, cfg, enc.vocab_size, jax.random.PRNGKey(0))
    CheckpointManager(tmp_path, category="acoustic").save(state, step=100)
    infer = DiffSingerAcousticInfer(cfg, load_vocoder=False)
    infer_var = DiffSingerAcousticInfer(cfg_var, load_vocoder=False)
    n_segments = 0
    for path in sorted(SAMPLES.glob("*.ds")):
        with open(path, encoding="utf8") as f:
            segments = json.load(f)
        if "ph_dur" not in segments[0]:
            continue  # variance-input project (covered by the variance test)
        for idx, seg in enumerate(segments):
            active = infer_var if "energy" in seg else infer
            batch = active.preprocess_input(seg, idx=idx)
            T = batch["mel2ph"].shape[1]
            assert T > 0
            assert batch["tokens"].shape[0] == 1
            assert batch["f0"].shape == (1, T)
            for k in ("energy", "breathiness", "key_shift", "speed"):
                if k in batch and np.asarray(batch[k]).ndim >= 2 \
                        and np.asarray(batch[k]).shape[1] != 1:
                    assert np.asarray(batch[k]).shape[1] == T, (path.name, idx, k)
            assert np.isfinite(np.asarray(batch["f0"])).all(), (path.name, idx)
            n_segments += 1
    assert n_segments >= 130  # the seven acoustic-ready sample songs
