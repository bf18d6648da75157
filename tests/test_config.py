"""Config-system semantics: base_config chains, precedence, overrides, reset.

Mirrors the reference's ``set_hparams`` behavior (utils/hparams.py:30-146):
deep-first recursive base merge, saved work-dir config precedence unless
--reset, typed k=v override coercion.
"""

import pytest
import yaml

from xiaoicesing_io_tpu.config import (
    coerce_value,
    deep_merge,
    load_config,
    parse_overrides,
)


def _write(path, data):
    path.write_text(yaml.safe_dump(data))
    return path


def test_base_config_chain_deep_first(tmp_path):
    _write(tmp_path / "grand.yaml", {"a": 1, "nest": {"x": 1, "y": 1}, "only_g": "g"})
    _write(tmp_path / "base.yaml", {
        "base_config": ["grand.yaml"], "a": 2, "nest": {"y": 2}, "only_b": "b",
    })
    _write(tmp_path / "leaf.yaml", {"base_config": ["base.yaml"], "nest": {"y": 3}})
    cfg = load_config(tmp_path / "leaf.yaml")
    assert cfg["a"] == 2            # base overrides grandparent
    assert cfg["nest"]["y"] == 3    # leaf overrides base (dict values refine)
    assert cfg["nest"]["x"] == 1    # untouched grandparent key survives
    assert cfg["only_g"] == "g" and cfg["only_b"] == "b"


def test_base_config_multiple_parents_in_order(tmp_path):
    _write(tmp_path / "p1.yaml", {"k": "p1", "a": 1})
    _write(tmp_path / "p2.yaml", {"k": "p2", "b": 2})
    _write(tmp_path / "leaf.yaml", {"base_config": ["p1.yaml", "p2.yaml"]})
    cfg = load_config(tmp_path / "leaf.yaml")
    assert cfg["k"] == "p2"  # later parents win
    assert cfg["a"] == 1 and cfg["b"] == 2


def test_base_config_cycle_raises(tmp_path):
    _write(tmp_path / "a.yaml", {"base_config": ["b.yaml"]})
    _write(tmp_path / "b.yaml", {"base_config": ["a.yaml"]})
    with pytest.raises(ValueError, match="cycle"):
        load_config(tmp_path / "a.yaml")


def test_builtin_base_resolution(tmp_path):
    # user configs may inherit the packaged defaults by bare name
    _write(tmp_path / "user.yaml", {"base_config": ["acoustic.yaml"], "hidden_size": 7})
    cfg = load_config(tmp_path / "user.yaml")
    assert cfg["hidden_size"] == 7
    assert cfg["audio_num_mel_bins"] == 128  # from the packaged chain


def test_saved_config_precedence_and_reset(tmp_path):
    _write(tmp_path / "cfg.yaml", {"lr": 1, "tag": "file"})
    work_root = tmp_path / "ckpts"
    (work_root / "exp").mkdir(parents=True)
    _write(work_root / "exp" / "config.yaml", {"lr": 2, "saved_only": True})

    cfg = load_config(tmp_path / "cfg.yaml", exp_name="exp", work_dir_root=work_root)
    assert cfg["lr"] == 2 and cfg["saved_only"] is True  # saved config wins
    assert cfg["tag"] == "file"

    cfg = load_config(tmp_path / "cfg.yaml", exp_name="exp",
                      work_dir_root=work_root, reset=True)
    assert cfg["lr"] == 1 and "saved_only" not in cfg    # --reset ignores it


def test_overrides_win_over_everything(tmp_path):
    _write(tmp_path / "cfg.yaml", {"lr": 1, "nest": {"x": 1}})
    cfg = load_config(tmp_path / "cfg.yaml", overrides="lr=9,nest.x=[1,2],flag=true,s=hi")
    assert cfg["lr"] == 9
    assert cfg["nest"]["x"] == [1, 2]   # bracket-aware comma splitting
    assert cfg["flag"] is True
    assert cfg["s"] == "hi"
    assert cfg["infer"] is False


def test_coerce_value_types():
    assert coerce_value("1") == 1
    assert coerce_value("2.5") == 2.5
    assert coerce_value("True") is True
    assert coerce_value("false") is False
    assert coerce_value("none") is None
    assert coerce_value("[1, 'a']") == [1, "a"]
    assert coerce_value("plain/path.txt") == "plain/path.txt"


def test_deep_merge_replaces_non_dicts():
    base = {"a": {"b": 1}, "l": [1, 2]}
    deep_merge(base, {"a": {"c": 2}, "l": [3]})
    assert base == {"a": {"b": 1, "c": 2}, "l": [3]}


def test_parse_overrides_nested_and_mapping():
    assert parse_overrides({"a": 1}) == {"a": 1}
    assert parse_overrides("a.b.c=3")["a"]["b"]["c"] == 3
    with pytest.raises(ValueError):
        parse_overrides("novalue")


def test_legacy_key_migration(tmp_path):
    # g2p_dictionary aliases dictionary (ref utils/phoneme_utils.py:25-30);
    # pl_trainer_precision aliases precision (ref configs/base.yaml:77)
    _write(tmp_path / "cfg.yaml", {"g2p_dictionary": "dict.txt",
                                   "pl_trainer_precision": "bf16-mixed"})
    cfg = load_config(tmp_path / "cfg.yaml")
    assert cfg["dictionary"] == "dict.txt"
    assert cfg["precision"] == "bf16-mixed"

    # an explicit `dictionary` takes priority over the legacy alias
    _write(tmp_path / "cfg2.yaml", {"dictionary": "a.txt", "g2p_dictionary": "b.txt"})
    assert load_config(tmp_path / "cfg2.yaml")["dictionary"] == "a.txt"
