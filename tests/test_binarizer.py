"""End-to-end binarization test on a synthetic 2-item dataset."""

import pickle
from pathlib import Path

import numpy as np
import pytest

from xiaoicesing_io_tpu.config import Config, load_config
from xiaoicesing_io_tpu.utils.audio import save_wav

SR = 44100


def _make_dataset(root: Path):
    """Two short sung-vowel-ish wavs + transcriptions + tiny dictionary."""
    (root / "raw/wavs").mkdir(parents=True)
    rng = np.random.default_rng(0)
    rows = ["name,ph_seq,ph_dur"]
    silences = {"item1": "SP", "item2": "AP"}
    for name, f0_hz, dur in [("item1", 220.0, 1.2), ("item2", 300.0, 1.0)]:
        n = int(SR * dur)
        t = np.arange(n) / SR
        vib = f0_hz * (1 + 0.01 * np.sin(2 * np.pi * 5 * t))
        phase = 2 * np.pi * np.cumsum(vib) / SR
        y = 0.35 * np.sin(phase) + 0.1 * np.sin(2 * phase) + 0.01 * rng.standard_normal(n)
        save_wav(y.astype(np.float32), root / f"raw/wavs/{name}.wav", SR)
        third = dur / 3
        rows.append(f"{name},{silences[name]} a b,{third:.3f} {third:.3f} {third:.3f}")
    (root / "raw/transcriptions.csv").write_text("\n".join(rows) + "\n")
    (root / "dictionary.txt").write_text("x\ta b\n")
    return root


@pytest.fixture(scope="module")
def binarized(tmp_path_factory):
    root = _make_dataset(tmp_path_factory.mktemp("dataset"))
    cfg = load_config(
        Path(__file__).parent.parent / "xiaoicesing_io_tpu/configs/acoustic.yaml"
    )
    cfg.update(
        raw_data_dir=[str(root / "raw")],
        binary_data_dir=str(root / "binary"),
        dictionary=str(root / "dictionary.txt"),
        speakers=["testsinger"],
        test_prefixes=["item1"],
        use_energy_embed=True,
        use_breathiness_embed=True,
        use_voicing_embed=True,
        use_tension_embed=True,
    )
    cfg["binarization_args"]["shuffle"] = False
    from xiaoicesing_io_tpu.preprocessing.acoustic_binarizer import AcousticBinarizer

    AcousticBinarizer(cfg).process()
    return root / "binary", cfg


def test_binarize_outputs_exist(binarized):
    bin_dir, cfg = binarized
    for f in ["train.data", "train.meta", "valid.data", "valid.meta",
              "spk_map.json", "dictionary.txt"]:
        assert (bin_dir / f).exists(), f


def test_binarized_items_load(binarized):
    bin_dir, cfg = binarized
    from xiaoicesing_io_tpu.data.indexed_dataset import IndexedDataset

    ds = IndexedDataset(bin_dir, "valid")
    assert len(ds) == 1
    item = ds[0]
    T = item["mel"].shape[0]
    assert item["mel"].shape == (T, 128)
    assert item["mel2ph"].shape == (T,)
    assert item["f0"].shape == (T,)
    assert (item["f0"] > 0).all()  # interp_uv
    assert item["tokens"].shape == (3,)
    for v in ["energy", "breathiness", "voicing", "tension"]:
        assert item[v].shape == (T,), v
        assert np.isfinite(item[v]).all(), v
    # energies are dB, mostly negative and above the configured floor
    assert item["energy"].min() >= -96.0
    # mel2ph covers all three phonemes
    assert set(np.unique(item["mel2ph"])) >= {1, 2, 3}


def test_meta_contents(binarized):
    bin_dir, cfg = binarized
    with open(bin_dir / "valid.meta", "rb") as f:
        meta = pickle.load(f)
    assert meta["names"] == ["item1"]
    assert meta["spk_names"] == ["testsinger"]
    assert len(meta["lengths"]) == 1
    with open(bin_dir / "train.meta", "rb") as f:
        meta_train = pickle.load(f)
    assert "names" not in meta_train  # dropped for train (ref parity)
    assert len(meta_train["lengths"]) == 1


def test_coverage_error(tmp_path):
    """A phoneme missing from the data must hard-fail (ref parity)."""
    root = _make_dataset(tmp_path / "ds")
    (root / "dictionary.txt").write_text("x\ta b\ny\tc d\n")
    cfg = load_config(
        Path(__file__).parent.parent / "xiaoicesing_io_tpu/configs/acoustic.yaml"
    )
    cfg.update(
        raw_data_dir=[str(root / "raw")], binary_data_dir=str(root / "binary2"),
        dictionary=str(root / "dictionary.txt"), speakers=["s"],
        test_prefixes=["item1"],
    )
    from xiaoicesing_io_tpu.preprocessing.acoustic_binarizer import AcousticBinarizer
    from xiaoicesing_io_tpu.preprocessing.base_binarizer import BinarizationError

    with pytest.raises(BinarizationError):
        AcousticBinarizer(cfg).process()


def test_augmentation_items(tmp_path):
    """Pitch-shift / time-stretch augmentation fan-out: augmented copies are
    written with key_shift/speed attrs and the documented f0 / duration
    transforms (ref: augmentation/spec_stretch.py, acoustic_binarizer.py:211-331)."""
    import random

    random.seed(0)
    root = _make_dataset(tmp_path / "ds_aug")
    cfg = load_config(
        Path(__file__).parent.parent / "xiaoicesing_io_tpu/configs/acoustic.yaml"
    )
    cfg.update(
        raw_data_dir=[str(root / "raw")], binary_data_dir=str(root / "binary_aug"),
        dictionary=str(root / "dictionary.txt"), speakers=["s"],
        test_prefixes=["item1"],
        use_key_shift_embed=True, use_speed_embed=True,
    )
    cfg["binarization_args"]["shuffle"] = False
    cfg["augmentation_args"] = {
        "random_pitch_shifting": {"enabled": True, "range": [-5.0, 5.0], "scale": 2.0},
        "random_time_stretching": {"enabled": True, "range": [0.5, 2.0], "scale": 1.0},
    }
    from xiaoicesing_io_tpu.data.indexed_dataset import IndexedDataset
    from xiaoicesing_io_tpu.preprocessing.acoustic_binarizer import AcousticBinarizer

    AcousticBinarizer(cfg).process()
    ds = IndexedDataset(root / "binary_aug", "train")
    # 1 raw train item (item2) + 2 pitch-shift copies; the time-stretch pass
    # may either add its own copy or attach speed to an existing aug task
    # (reference semantics: acoustic_binarizer.py:300-320)
    assert len(ds) in (3, 4)

    items = [ds[i] for i in range(len(ds))]
    is_orig = [
        float(it["key_shift"]) == 0 and abs(float(it["speed"]) - 1) < 1e-9
        for it in items
    ]
    orig = [it for it, o in zip(items, is_orig) if o]
    augmented = [it for it, o in zip(items, is_orig) if not o]
    assert len(orig) == 1 and len(augmented) == len(items) - 1
    stretched = [it for it in augmented if abs(float(it["speed"]) - 1) > 1e-9]
    assert len(stretched) >= 1  # the time-stretch pass ran

    base = orig[0]
    for it in augmented:
        ks, speed = float(it["key_shift"]), float(it["speed"])
        assert -5.0 <= ks <= 5.0
        assert 0.5 <= speed <= 2.0
        # consistent per-item lengths
        assert it["mel2ph"].shape[0] == it["mel"].shape[0] == it["f0"].shape[0]
        if abs(speed - 1) < 1e-9:
            # pure pitch shift: same frame count, f0 multiplied by 2^(ks/12)
            assert it["mel"].shape == base["mel"].shape
            np.testing.assert_allclose(
                it["f0"] / base["f0"], 2 ** (ks / 12), rtol=1e-4
            )
        else:
            # duration scales inversely with speed (mel re-extracted)
            assert abs(it["mel"].shape[0] - base["mel"].shape[0] / speed) <= 2
