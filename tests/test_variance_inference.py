"""End-to-end variance inference smoke test on the sample .ds corpus."""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xiaoicesing_io_tpu.config import Config, load_config
from xiaoicesing_io_tpu.training.checkpoint import CheckpointManager
from xiaoicesing_io_tpu.utils.music import hz_to_midi, midi_to_hz, note_to_midi

SAMPLES = Path(__file__).parent.parent / "samples"
DICT = Path(__file__).parent.parent / "dictionaries/opencpop-extension.txt"


def test_note_to_midi_librosa_semantics():
    assert note_to_midi("A4") == 69
    assert note_to_midi("C4") == 60
    assert note_to_midi("C#4") == 61
    assert note_to_midi("Db4") == 61
    assert note_to_midi("G#3") == 56
    np.testing.assert_allclose(midi_to_hz(69), 440.0)
    np.testing.assert_allclose(hz_to_midi(440.0), 69.0)


@pytest.fixture(scope="module")
def infer(tmp_path_factory):
    wd = tmp_path_factory.mktemp("exp_variance")
    cfg = load_config(
        Path(__file__).parent.parent / "xiaoicesing_io_tpu/configs/variance.yaml"
    )
    cfg.update(
        work_dir=str(wd), dictionary=str(DICT),
        enc_layers=1, predict_energy=True, predict_breathiness=True,
        sampling_steps=2,
    )
    cfg["dur_prediction_args"].update(hidden_size=32, num_layers=1)
    cfg["pitch_prediction_args"].update(repeat_bins=8)
    cfg["pitch_prediction_args"]["backbone_args"].update(num_layers=2, num_channels=16)
    cfg["variances_prediction_args"].update(total_repeat_bins=8)
    cfg["variances_prediction_args"]["backbone_args"].update(num_layers=2, num_channels=16)

    from xiaoicesing_io_tpu.models.toplevel import VarianceModel
    from xiaoicesing_io_tpu.training.train_state import TrainState, build_optimizer
    from xiaoicesing_io_tpu.utils.phonemes import PhonemeDictionary
    from xiaoicesing_io_tpu.utils.text_encoder import TokenTextEncoder

    phdict = PhonemeDictionary.load(DICT)
    enc = TokenTextEncoder(phdict.phoneme_list)
    model = VarianceModel.from_config(cfg, enc.vocab_size)
    B, T_ph, T_f = 1, 4, 16
    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.ones((B, T_ph), jnp.int32), jnp.ones((B, T_ph), jnp.int32),
        jnp.ones((B, T_ph), jnp.int32), jnp.ones((B, T_ph), jnp.int32),
        jnp.zeros((B, T_f)), jnp.zeros((B, T_f)), jnp.ones((B, T_f), jnp.int32),
        x_pitch=jnp.zeros((B, 1, T_f, 8)), t=jnp.zeros((B,)),
        x_var=jnp.zeros((B, 2, T_f, 4)),
        variances={"energy": jnp.zeros((B, T_f)), "breathiness": jnp.zeros((B, T_f))},
        note_midi=jnp.full((B, 3), 60.0), note_rest=jnp.zeros((B, 3), bool),
        note_dur=jnp.ones((B, 3), jnp.int32), mel2note=jnp.ones((B, T_f), jnp.int32),
    )
    state = TrainState.create(variables["params"], build_optimizer(cfg))
    CheckpointManager(wd, category="variance").save(state, step=100)

    from xiaoicesing_io_tpu.inference.variance import DiffSingerVarianceInfer

    return DiffSingerVarianceInfer(cfg, predictions=set())


@pytest.fixture(scope="module")
def sample_segment():
    with open(sorted(SAMPLES.glob("*.ds"))[1], encoding="utf8") as f:
        return json.load(f)[0]


def test_variance_preprocess(infer, sample_segment):
    flags = infer.segment_flags(sample_segment)
    # sample has ph_dur and f0_seq -> auto-completion predicts only variances
    assert flags == (False, False, True)
    batch = infer.preprocess_input(
        sample_segment, load_dur=not flags[0] and (flags[1] or flags[2]),
        load_pitch=not flags[1] and flags[2],
    )
    T_s = batch["mel2note"].shape[1]
    assert batch["base_pitch"].shape == (1, T_s)
    assert batch["mel2ph"] is not None and batch["mel2ph"].shape == (1, T_s)
    assert batch["pitch"].shape == (1, T_s)
    assert np.isfinite(batch["base_pitch"]).all()
    assert (batch["midi"] >= 0).all() and (batch["midi"] < 128).all()


def test_variance_forward_auto_completion(infer, sample_segment):
    flags = infer.segment_flags(sample_segment)
    batch = infer.preprocess_input(
        sample_segment, load_dur=True, load_pitch=True
    )
    dur, pitch, variances = infer.forward_model(batch, flags, seed=7)
    assert dur is None and pitch is None
    assert set(variances.keys()) == {"energy", "breathiness"}
    T_s = batch["mel2note"].shape[1]
    for v in variances.values():
        assert np.asarray(v).shape == (1, T_s)
        assert np.isfinite(np.asarray(v)).all()


def test_variance_full_prediction(infer, sample_segment):
    seg = dict(sample_segment)
    seg.pop("ph_dur", None)
    seg.pop("f0_seq", None)
    flags = infer.segment_flags(seg)
    assert flags == (True, True, True)
    batch = infer.preprocess_input(seg, load_dur=False, load_pitch=False)
    dur, pitch, variances = infer.forward_model(batch, flags, seed=7)
    T_ph = batch["tokens"].shape[1]
    T_s = batch["mel2note"].shape[1]
    assert np.asarray(dur).shape == (1, T_ph)
    assert (np.asarray(dur) >= 0).all()
    assert np.asarray(pitch).shape == (1, T_s)
    assert np.isfinite(np.asarray(pitch)).all()
    # (word-sum preservation of the rhythm regulator is covered by
    # test_seq_ops; at random init predicted durations clamp to ~0 so the
    # sum check would be vacuous here)


def test_variance_run_inference_roundtrip(infer, sample_segment, tmp_path):
    infer.run_inference([sample_segment], tmp_path, "test_out", seed=3)
    out_file = tmp_path / "test_out.ds"
    assert out_file.exists()
    with open(out_file, encoding="utf8") as f:
        result = json.load(f)
    assert len(result) == 1
    seg = result[0]
    # variances written back with timesteps
    assert "energy" in seg and "energy_timestep" in seg
    assert "breathiness" in seg
    assert len(seg["energy"].split()) == len(seg["breathiness"].split())


@pytest.mark.slow
def test_variance_preprocess_entire_corpus(infer):
    """Every segment of every sample .ds parses through variance
    preprocessing (notes, slurs, ph_num word grouping, rest interpolation),
    including the phoneme-input project without ph_dur/f0."""
    n = 0
    for path in sorted(SAMPLES.glob("*.ds")):
        with open(path, encoding="utf8") as f:
            segments = json.load(f)
        for idx, seg in enumerate(segments):
            has_dur = "ph_dur" in seg
            has_pitch = "f0_seq" in seg
            batch = infer.preprocess_input(
                seg, idx=idx, load_dur=has_dur, load_pitch=has_pitch
            )
            T_ph = batch["tokens"].shape[1]
            assert T_ph > 0
            assert batch["ph2word"].shape == (1, T_ph)
            assert int(batch["ph2word"].max()) >= 1
            n_notes = batch["note_midi"].shape[1]
            assert batch["note_rest"].shape == (1, n_notes)
            assert np.isfinite(np.asarray(batch["note_midi"])).all(), (path.name, idx)
            if has_dur:
                assert batch["mel2ph"].shape[1] > 0
            n += 1
    assert n >= 190  # all eight sample songs


def test_variance_dur_only_is_rhythm_aligned(infer, sample_segment):
    """--predict dur alone must still pass through the rhythm regulator:
    per-word sums of the predicted ph_dur equal the word durations
    (regression: the dur-only early return skipped rr)."""
    import flax

    seg = dict(sample_segment)
    seg.pop("ph_dur", None)
    batch = infer.preprocess_input(seg, load_dur=False, load_pitch=False)
    # bias the dur predictor so raw predictions are strictly positive (at
    # random init exp(0)-offset clamps to 0 and rr has nothing to rescale)
    flat = flax.traverse_util.flatten_dict(infer.params)
    saved = dict(flat)
    for k in flat:
        if "dur_predictor" in ".".join(k) and k[-2:] == ("linear", "bias"):
            flat[k] = np.ones_like(np.asarray(flat[k]))
    infer.params = flax.traverse_util.unflatten_dict(flat)
    infer._jitted.clear()
    try:
        dur, pitch, variances = infer.forward_model(batch, (True, False, False), seed=7)
    finally:
        infer.params = flax.traverse_util.unflatten_dict(saved)
        infer._jitted.clear()
    assert pitch is None and variances == {}
    dur = np.asarray(dur)[0]
    ph2word = np.asarray(batch["ph2word"])[0][: len(dur)]
    word_dur = np.asarray(batch["word_dur"])[0]
    assert dur.sum() > 0
    sums = np.zeros(word_dur.shape[0] + 1, np.float64)
    np.add.at(sums, ph2word, dur)
    np.testing.assert_allclose(sums[1:], word_dur, rtol=1e-3, atol=0.5)
