"""Data-parallel serving: sharded batched synthesis == single-device result."""

import json
from pathlib import Path

import jax
import numpy as np
import pytest

from xiaoicesing_io_tpu.config import Config, load_config
from xiaoicesing_io_tpu.parallel.mesh import make_mesh
from xiaoicesing_io_tpu.training.acoustic import build_acoustic, init_acoustic_state
from xiaoicesing_io_tpu.training.checkpoint import CheckpointManager

SAMPLES = Path(__file__).parent.parent / "samples"
DICT = Path(__file__).parent.parent / "dictionaries/opencpop-extension.txt"


@pytest.fixture(scope="module")
def infer(tmp_path_factory):
    wd = tmp_path_factory.mktemp("exp_serving")
    cfg = load_config(
        Path(__file__).parent.parent / "xiaoicesing_io_tpu/configs/acoustic.yaml"
    )
    cfg.update(
        work_dir=str(wd), dictionary=str(DICT), enc_layers=1,
        backbone_args=Config(num_channels=32, num_layers=1, kernel_size=31,
                             strong_cond=True),
        sampling_steps=2,
    )
    cfg["shallow_diffusion_args"]["aux_decoder_args"].update(
        num_channels=32, num_layers=1
    )
    from xiaoicesing_io_tpu.inference.acoustic import DiffSingerAcousticInfer
    from xiaoicesing_io_tpu.utils.phonemes import PhonemeDictionary
    from xiaoicesing_io_tpu.utils.text_encoder import TokenTextEncoder

    enc = TokenTextEncoder(PhonemeDictionary.load(DICT).phoneme_list)
    model, core, normalizer = build_acoustic(cfg, enc.vocab_size)
    state = init_acoustic_state(model, cfg, enc.vocab_size, jax.random.PRNGKey(0))
    CheckpointManager(wd, category="acoustic").save(state, step=100)
    return DiffSingerAcousticInfer(cfg, load_vocoder=False)


def _segments(n=3):
    segs = []
    for f in sorted(SAMPLES.glob("*.ds")):
        with open(f, encoding="utf8") as fh:
            segs.extend(json.load(fh))
        if len(segs) >= n:
            break
    return segs[:n]


def test_dp_serving_matches_single_device(infer):
    from xiaoicesing_io_tpu.inference.serving import DataParallelSynthesizer

    segs = _segments(3)
    dp = DataParallelSynthesizer(infer, mesh=make_mesh())  # 8-dev CPU mesh
    single = DataParallelSynthesizer(infer, mesh=make_mesh([jax.devices()[0]]))

    mels, f0s = dp.synthesize_mels(segs, seed=7)
    ref_mels, ref_f0s = single.synthesize_mels(segs, seed=7)

    assert len(mels) == len(segs)
    for m, f0, rm, rf0 in zip(mels, f0s, ref_mels, ref_f0s):
        assert m.ndim == 2 and m.shape[0] == f0.shape[0]
        assert np.isfinite(m).all()
        np.testing.assert_allclose(m, rm, atol=1e-5)
        np.testing.assert_allclose(f0, rf0)


def test_dp_serving_order_and_masking(infer):
    from xiaoicesing_io_tpu.inference.serving import DataParallelSynthesizer

    segs = _segments(2)
    dp = DataParallelSynthesizer(infer, mesh=make_mesh())
    mels, _ = dp.synthesize_mels(segs, seed=1)
    # per-segment lengths follow each segment's own ph_dur sum
    batches = [infer.preprocess_input(p, idx=i) for i, p in enumerate(segs)]
    for m, b in zip(mels, batches):
        assert m.shape[0] == b["mel2ph"].shape[1]
