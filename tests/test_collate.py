"""Feed-path primitives: collate_nd dtype/rows extensions and the compact
f16/i16 wire format (narrow on host / widen on device).

These back the round-3 training-throughput work (docs/PerformanceNotes.md):
the collators must produce identical values to the naive
full-copy-then-astype-then-pad path, and narrow->widen must be exact for
index fields and within f16 roundoff for curves.
"""

import numpy as np

from xiaoicesing_io_tpu.training.trainer import _narrow_batch, _widen_batch
from xiaoicesing_io_tpu.utils import collate_nd


def test_collate_nd_matches_naive_reference():
    rng = np.random.default_rng(0)
    arrays = [rng.standard_normal((n, 7)).astype(np.float64) for n in (3, 9, 5)]
    out = collate_nd(arrays, max_len=12, dtype=np.float32, rows=5)
    assert out.shape == (5, 12, 7) and out.dtype == np.float32
    naive = np.full((3, 12, 7), 0, dtype=np.float64)
    for i, a in enumerate(arrays):
        naive[i, : a.shape[0]] = a
    naive = naive.astype(np.float32)
    naive = np.pad(naive, ((0, 2), (0, 0), (0, 0)))
    np.testing.assert_array_equal(out, naive)


def test_collate_nd_nonzero_pad_value_fills_extra_rows_too():
    arrays = [np.ones(2, np.float32)]
    out = collate_nd(arrays, pad_value=-1.0, max_len=4, rows=3)
    assert out[0].tolist() == [1, 1, -1, -1]
    # padding ROWS take the pad value as well (a -1 "rest" row is fully
    # masked downstream, unlike the old two-pass np.pad which zero-filled)
    assert (out[1:] == -1).all()


def test_collate_nd_defaults_unchanged():
    arrays = [np.arange(3), np.arange(5)]
    out = collate_nd(arrays)
    assert out.shape == (2, 5) and out[0, 3] == 0 and out[1, 4] == 4


def test_narrow_widen_roundtrip_exact_for_index_fields():
    batch = {
        "tokens": np.array([[1, 2, 61]], np.int32),
        "mel2ph": np.arange(2048, dtype=np.int32)[None],
        "big": np.array([[70000]], np.int64),  # does NOT fit i16: untouched
        "uv": np.array([[True, False]]),
    }
    narrow = _narrow_batch(batch, {})
    assert narrow["tokens"].dtype == np.int16
    assert narrow["mel2ph"].dtype == np.int16
    assert narrow["big"].dtype == np.int64
    assert narrow["uv"].dtype == np.bool_
    wide = _widen_batch({k: np.asarray(v) for k, v in narrow.items()})
    np.testing.assert_array_equal(np.asarray(wide["tokens"]), batch["tokens"])
    np.testing.assert_array_equal(np.asarray(wide["mel2ph"]), batch["mel2ph"])


def test_narrow_plan_pins_dtype_across_batches():
    # a field near the i16 bound must NOT flip dtype batch to batch (each
    # flip would trigger a fresh jitted-step compilation); the plan pins the
    # first decision and only ever PROMOTES to the wide dtype
    plan = {}
    b1 = _narrow_batch({"idx": np.array([[100]], np.int32)}, plan)
    assert b1["idx"].dtype == np.int16
    # later batch exceeds the bound: promoted to the original wide dtype...
    b2 = _narrow_batch({"idx": np.array([[40000]], np.int32)}, plan)
    assert b2["idx"].dtype == np.int32
    # ...and STAYS wide even when a later batch would fit again (no flip-flop)
    b3 = _narrow_batch({"idx": np.array([[100]], np.int32)}, plan)
    assert b3["idx"].dtype == np.int32


def test_narrow_float_range_guard():
    # |values| beyond f16 range must not silently become inf
    plan = {}
    big = np.array([[1e5]], np.float32)
    out = _narrow_batch({"x": big}, plan)
    assert out["x"].dtype == np.float32 and np.isfinite(out["x"]).all()
    # promotion path: pinned f16 first, then an out-of-range batch arrives
    plan2 = {}
    _narrow_batch({"y": np.array([[1.0]], np.float32)}, plan2)
    out2 = _narrow_batch({"y": big}, plan2)
    assert out2["y"].dtype == np.float32 and np.isfinite(out2["y"]).all()


def test_narrow_float_roundoff_bounded():
    rng = np.random.default_rng(1)
    mel = rng.uniform(-12, 2, size=(2, 256, 128)).astype(np.float32)
    f0 = rng.uniform(40, 1100, size=(2, 256)).astype(np.float32)
    n = _narrow_batch({"mel": mel, "f0": f0}, {})
    assert n["mel"].dtype == np.float16
    back = n["mel"].astype(np.float32)
    assert np.max(np.abs(back - mel)) < 6e-3  # f16 abs err at |x|<=12
    rel = np.abs(n["f0"].astype(np.float32) - f0) / f0
    assert rel.max() < 5e-4
