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


@pytest.fixture(scope="module")
def ms_infer(tmp_path_factory):
    """Multi-speaker variant of the serving fixture."""
    wd = tmp_path_factory.mktemp("exp_serving_ms")
    cfg = load_config(
        Path(__file__).parent.parent / "xiaoicesing_io_tpu/configs/acoustic.yaml"
    )
    cfg.update(
        work_dir=str(wd), dictionary=str(DICT), enc_layers=1,
        use_spk_id=True, num_spk=2,
        backbone_args=Config(num_channels=32, num_layers=1, kernel_size=31,
                             strong_cond=True),
        sampling_steps=2,
    )
    cfg["shallow_diffusion_args"]["aux_decoder_args"].update(
        num_channels=32, num_layers=1
    )
    from xiaoicesing_io_tpu.inference.acoustic import DiffSingerAcousticInfer
    from xiaoicesing_io_tpu.training.checkpoint import CheckpointManager
    from xiaoicesing_io_tpu.utils.phonemes import PhonemeDictionary
    from xiaoicesing_io_tpu.utils.text_encoder import TokenTextEncoder
    import json

    enc = TokenTextEncoder(PhonemeDictionary.load(DICT).phoneme_list)
    model, core, normalizer = build_acoustic(cfg, enc.vocab_size)
    state = init_acoustic_state(model, cfg, enc.vocab_size, jax.random.PRNGKey(3))
    CheckpointManager(wd, category="acoustic").save(state, step=100)
    with open(Path(wd) / "spk_map.json", "w") as f:
        json.dump({"alice": 0, "bob": 1}, f)
    return DiffSingerAcousticInfer(cfg, load_vocoder=False)


def test_dp_serving_static_spk_mix_conditions_all_frames(ms_infer):
    """Static speaker mixes are [1, 1, N] broadcast dims; padding them over
    time would zero the speaker conditioning beyond frame 0 (regression)."""
    from xiaoicesing_io_tpu.inference.serving import DataParallelSynthesizer

    seg = dict(_segments(1)[0])
    seg_a = {**seg, "spk_mix": {"alice": 1.0}}
    seg_b = {**seg, "spk_mix": {"bob": 1.0}}
    dp = DataParallelSynthesizer(ms_infer, mesh=make_mesh())
    (mel_a, mel_b), _ = dp.synthesize_mels([seg_a, seg_b], seed=11)
    # same content + same batch noise, different speakers: later frames must
    # still differ (speaker embedding reaches every frame)
    tail_diff = np.abs(mel_a[1:] - mel_b[1:]).mean()
    assert tail_diff > 1e-4, tail_diff


def test_dp_serving_ragged_spk_mix_cardinality(ms_infer):
    """Mixing a 2-speaker segment with a solo segment in one group must not
    crash stacking (regression: ragged N axis)."""
    from xiaoicesing_io_tpu.inference.serving import DataParallelSynthesizer

    seg = dict(_segments(1)[0])
    seg_duet = {**seg, "spk_mix": {"alice": 0.5, "bob": 0.5}}
    seg_solo = {**seg, "spk_mix": {"alice": 1.0}}
    dp = DataParallelSynthesizer(ms_infer, mesh=make_mesh())
    mels, _ = dp.synthesize_mels([seg_duet, seg_solo], seed=4)
    assert all(np.isfinite(m).all() for m in mels)


def test_dp_serving_distinct_noise_across_chunks(infer):
    """Identical segments forced into different chunks must not reuse the
    same PRNG key (regression: per-bucket key reuse)."""
    from xiaoicesing_io_tpu.inference.serving import DataParallelSynthesizer

    seg = _segments(1)[0]
    dp = DataParallelSynthesizer(infer, mesh=make_mesh([jax.devices()[0]]))
    mels, _ = dp.synthesize_mels([seg, seg], seed=9, max_group_size=1)
    assert not np.allclose(mels[0], mels[1])


def test_dp_serving_static_spk_mix_survives_dynamic_neighbor(ms_infer):
    """A static mix [1,1,N] sharing a chunk with a dynamic mix [1,T,N] must
    be BROADCAST over time, not zero-padded (regression: frames >= 1 lost
    their speaker conditioning).  Row 0 gets identical noise for identical
    batch shapes, so its mel must not depend on its neighbor's mix kind."""
    from xiaoicesing_io_tpu.inference.serving import DataParallelSynthesizer

    seg = dict(_segments(1)[0])
    n_f0 = len(seg["f0_seq"].split())
    timestep = float(seg["f0_timestep"])
    seg_static = {**seg, "spk_mix": {"alice": 1.0}}
    seg_static2 = {**seg, "spk_mix": {"bob": 1.0}}
    seg_dynamic = {
        **seg,
        # two speakers with string proportions -> dynamic [1, T, N] mix that
        # resolves to pure bob (alice weight 0 everywhere)
        "spk_mix": {"bob": " ".join(["1.0"] * n_f0),
                    "alice": " ".join(["0.0"] * n_f0)},
        "spk_mix_timestep": str(timestep),
    }
    dp = DataParallelSynthesizer(ms_infer, mesh=make_mesh())
    (ref_mel, ref_mel2), _f0 = dp.synthesize_mels([seg_static, seg_static2], seed=11)
    (got_mel, dyn_mel), _f0b = dp.synthesize_mels([seg_static, seg_dynamic], seed=11)
    np.testing.assert_allclose(got_mel, ref_mel, atol=1e-5)
    # the all-bob dynamic row must match the static bob row (same noise row)
    np.testing.assert_allclose(dyn_mel, ref_mel2, atol=1e-5)
