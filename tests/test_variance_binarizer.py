"""Variance binarizer e2e test on a synthetic dataset."""

from pathlib import Path

import numpy as np
import pytest

from xiaoicesing_io_tpu.config import load_config
from xiaoicesing_io_tpu.utils.audio import save_wav

SR = 44100


def _make_dataset(root: Path):
    (root / "raw/wavs").mkdir(parents=True)
    rng = np.random.default_rng(0)
    rows = ["name,ph_seq,ph_dur,ph_num,note_seq,note_dur"]
    silences = {"item1": "SP", "item2": "AP"}
    for name, f0_hz in [("item1", 220.0), ("item2", 260.0)]:
        dur = 1.2
        n = int(SR * dur)
        t = np.arange(n) / SR
        y = 0.3 * np.sin(2 * np.pi * f0_hz * t) + 0.01 * rng.standard_normal(n)
        save_wav(y.astype(np.float32), root / f"raw/wavs/{name}.wav", SR)
        third = dur / 3
        # 3 phones, 2 words (SP)(a b); notes: rest + A3
        rows.append(
            f'{name},{silences[name]} a b,{third:.3f} {third:.3f} {third:.3f},'
            f'1 2,rest A3,{third:.3f} {2*third:.3f}'
        )
    (root / "raw/transcriptions.csv").write_text("\n".join(rows) + "\n")
    (root / "dictionary.txt").write_text("x\ta b\n")
    return root


@pytest.fixture(scope="module")
def binarized(tmp_path_factory):
    root = _make_dataset(tmp_path_factory.mktemp("vds"))
    cfg = load_config(
        Path(__file__).parent.parent / "xiaoicesing_io_tpu/configs/variance.yaml"
    )
    cfg.update(
        raw_data_dir=[str(root / "raw")],
        binary_data_dir=str(root / "binary"),
        dictionary=str(root / "dictionary.txt"),
        speakers=["testsinger"],
        test_prefixes=["item1"],
        predict_energy=True, predict_breathiness=True,
    )
    cfg["binarization_args"]["shuffle"] = False
    from xiaoicesing_io_tpu.preprocessing.variance_binarizer import VarianceBinarizer

    VarianceBinarizer(cfg).process()
    return root / "binary", cfg


def test_variance_binarized_item(binarized):
    bin_dir, cfg = binarized
    from xiaoicesing_io_tpu.data.indexed_dataset import IndexedDataset

    ds = IndexedDataset(bin_dir, "valid")
    item = ds[0]
    T_ph = 3
    assert item["tokens"].shape == (T_ph,)
    assert item["ph_dur"].shape == (T_ph,)
    T_s = item["mel2ph"].shape[0]
    assert item["ph2word"].shape == (T_ph,)
    np.testing.assert_array_equal(item["ph2word"], [1, 2, 2])
    assert item["midi"].shape == (T_ph,)
    assert item["note_midi"].shape == (2,)
    # rest note interpolated to nearest (A3 = 57)
    np.testing.assert_allclose(item["note_midi"], [57.0, 57.0])
    np.testing.assert_array_equal(item["note_rest"], [True, False])
    assert item["mel2note"].shape == (T_s,)
    assert item["base_pitch"].shape == (T_s,)
    assert item["pitch"].shape == (T_s,)
    assert item["uv"].shape == (T_s,)
    assert item["energy"].shape == (T_s,)
    assert item["breathiness"].shape == (T_s,)
    # pitch in semitones should be near A3 (57) in voiced regions
    voiced = ~item["uv"]
    assert voiced.any()
    med = np.median(item["pitch"][voiced])
    assert 54 < med < 60
    # ph_dur sums to length up to the +0.5 rounding offset (mel2ph is
    # cropped/padded to length; same off-by-one tolerance as the reference)
    assert abs(int(item["ph_dur"].sum()) - T_s) <= 1
