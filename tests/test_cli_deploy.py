"""CLI, speaker-mix parsing, drop_spk, and StableHLO export tests."""

import json
from pathlib import Path

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy tier: run fast tier with -m 'not slow'
from click.testing import CliRunner

from xiaoicesing_io_tpu.config import Config, load_config
from xiaoicesing_io_tpu.utils.spk_mix import parse_commandline_spk_mix

DICT = Path(__file__).parent.parent / "dictionaries/opencpop-extension.txt"


def test_parse_spk_mix():
    assert parse_commandline_spk_mix("opencpop") == {"opencpop": 1.0}
    m = parse_commandline_spk_mix("a|b")
    assert m == {"a": 0.5, "b": 0.5}
    m = parse_commandline_spk_mix("a:0.5|b:0.5")
    assert m == {"a": 0.5, "b": 0.5}
    m = parse_commandline_spk_mix("a:2|b:2")
    assert m == {"a": 0.5, "b": 0.5}
    with pytest.raises(AssertionError):
        parse_commandline_spk_mix("a|a")


def test_cli_help():
    from xiaoicesing_io_tpu.cli.main import cli

    r = CliRunner().invoke(cli, ["--help"])
    assert r.exit_code == 0
    for cmd in ["train", "binarize", "infer", "vocode", "drop_spk", "export"]:
        assert cmd in r.output


def test_modify_spk_embed():
    from xiaoicesing_io_tpu.deployment.drop_spk import modify_spk_embed

    rng = np.random.default_rng(0)
    table = rng.standard_normal((4, 8)).astype(np.float32)
    out = modify_spk_embed(table, drop_ids={1, 3}, fill="zeros")
    assert np.allclose(out[1], 0) and np.allclose(out[3], 0)
    assert np.allclose(out[0], table[0]) and np.allclose(out[2], table[2])
    out = modify_spk_embed(table, retain_ids={0}, fill="mean")
    np.testing.assert_allclose(out[1], table.mean(axis=0), rtol=1e-6)
    out = modify_spk_embed(table, drop_ids={1, 3}, fill="cyclic")
    np.testing.assert_allclose(out[1], table[0])
    np.testing.assert_allclose(out[3], table[2])


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    wd = tmp_path_factory.mktemp("exp_export")
    cfg = load_config(
        Path(__file__).parent.parent / "xiaoicesing_io_tpu/configs/acoustic.yaml"
    )
    cfg.update(
        work_dir=str(wd), dictionary=str(DICT), exp_name="export_test",
        enc_layers=1, use_spk_id=True, num_spk=2,
        backbone_args=Config(num_channels=32, num_layers=1, kernel_size=31,
                             strong_cond=True),
    )
    cfg["shallow_diffusion_args"]["aux_decoder_args"].update(num_channels=32, num_layers=1)
    from xiaoicesing_io_tpu.training.acoustic import build_acoustic, init_acoustic_state
    from xiaoicesing_io_tpu.training.checkpoint import CheckpointManager
    from xiaoicesing_io_tpu.utils.phonemes import PhonemeDictionary
    from xiaoicesing_io_tpu.utils.text_encoder import TokenTextEncoder

    enc = TokenTextEncoder(PhonemeDictionary.load(DICT).phoneme_list)
    model, core, normalizer = build_acoustic(cfg, enc.vocab_size)
    state = init_acoustic_state(model, cfg, enc.vocab_size, jax.random.PRNGKey(0))
    CheckpointManager(wd, category="acoustic").save(state, step=50)
    with open(wd / "spk_map.json", "w") as f:
        json.dump({"alice": 0, "bob": 1}, f)
    return cfg, wd


def test_export_acoustic(tiny_ckpt, tmp_path):
    cfg, wd = tiny_ckpt
    from xiaoicesing_io_tpu.deployment.export import export_acoustic

    out = export_acoustic(cfg, out_dir=str(tmp_path / "artifacts"))
    assert (out / "fs2_aux.stablehlo").exists()
    assert (out / "diffusion_step.stablehlo").exists()
    assert (out / "dsconfig.yaml").exists()
    assert (out / "phonemes.txt").exists()
    assert (out / "dictionary.txt").exists()
    assert (out / "alice.emb").exists() and (out / "bob.emb").exists()
    emb = np.frombuffer((out / "alice.emb").read_bytes(), np.float32)
    assert emb.shape == (cfg["hidden_size"],)
    # exported graph round-trips through jax.export deserialize + call
    from jax import export as jexport

    exported = jexport.deserialize((out / "diffusion_step.stablehlo").read_bytes())
    B, T_f, M, H = 1, 512, cfg["audio_num_mel_bins"], cfg["hidden_size"]
    y = exported.call(
        np.zeros((B, 1, T_f, M), np.float32), np.zeros((B,), np.float32),
        np.zeros((B, T_f, H), np.float32),
    )
    assert np.asarray(y).shape == (B, 1, T_f, M)


def test_drop_spk_roundtrip(tiny_ckpt):
    cfg, wd = tiny_ckpt
    from xiaoicesing_io_tpu.deployment.drop_spk import drop_speakers
    from xiaoicesing_io_tpu.training.checkpoint import (
        _checkpointer,
        latest_checkpoint,
    )

    drop_speakers(wd.name, ["bob"], fill="zeros", work_dir_root=str(wd.parent),
                  overwrite=True)
    path = latest_checkpoint(wd)
    restored = _checkpointer().restore(Path(path).resolve())
    table = np.asarray(restored["params"]["fs2"]["spk_embed"]["embedding"])
    assert np.allclose(table[1], 0)
    assert not np.allclose(table[0], 0)


def test_export_acoustic_savedmodel(tiny_ckpt, tmp_path):
    cfg, wd = tiny_ckpt
    tf = pytest.importorskip("tensorflow")
    from xiaoicesing_io_tpu.deployment.export import export_acoustic

    out = export_acoustic(cfg, out_dir=str(tmp_path / "sm"), fmt="savedmodel")
    assert (out / "diffusion_step.savedmodel").exists()
    mod = tf.saved_model.load(str(out / "diffusion_step.savedmodel"))
    B, T_f, M, H = 1, 512, cfg["audio_num_mel_bins"], cfg["hidden_size"]
    y = mod.f(
        tf.zeros((B, 1, T_f, M), tf.float32), tf.zeros((B,), tf.float32),
        tf.zeros((B, T_f, H), tf.float32),
    )
    assert tuple(y.shape) == (B, 1, T_f, M)

    # SavedModel output must match the jax graph on the same inputs
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, 1, T_f, M)).astype(np.float32)
    t = np.full((B,), 0.5, np.float32)
    cond = rng.standard_normal((B, T_f, H)).astype(np.float32) * 0.1
    from jax import export as jexport

    shlo_out = export_acoustic(cfg, out_dir=str(tmp_path / "shlo"))
    ref = np.asarray(
        jexport.deserialize(
            (shlo_out / "diffusion_step.stablehlo").read_bytes()
        ).call(x, t, cond)
    )
    got = mod.f(tf.constant(x), tf.constant(t), tf.constant(cond)).numpy()
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_export_acoustic_input_surface_and_freeze(tmp_path):
    """Models with key_shift/speed/variance embeds export those as graph
    inputs; freeze options bake constants instead."""
    wd = tmp_path / "exp_ks"
    wd.mkdir()
    cfg = load_config(
        Path(__file__).parent.parent / "xiaoicesing_io_tpu/configs/acoustic.yaml"
    )
    cfg.update(
        work_dir=str(wd), dictionary=str(DICT), exp_name="export_ks",
        enc_layers=1, use_spk_id=True, num_spk=2,
        use_key_shift_embed=True, use_speed_embed=True, use_energy_embed=True,
        backbone_args=Config(num_channels=32, num_layers=1, kernel_size=31,
                             strong_cond=True),
    )
    cfg["shallow_diffusion_args"]["aux_decoder_args"].update(num_channels=32, num_layers=1)
    from xiaoicesing_io_tpu.training.acoustic import build_acoustic, init_acoustic_state
    from xiaoicesing_io_tpu.training.checkpoint import CheckpointManager
    from xiaoicesing_io_tpu.utils.phonemes import PhonemeDictionary
    from xiaoicesing_io_tpu.utils.text_encoder import TokenTextEncoder

    enc = TokenTextEncoder(PhonemeDictionary.load(DICT).phoneme_list)
    model, core, normalizer = build_acoustic(cfg, enc.vocab_size)
    state = init_acoustic_state(model, cfg, enc.vocab_size, jax.random.PRNGKey(0))
    CheckpointManager(wd, category="acoustic").save(state, step=10)
    with open(wd / "spk_map.json", "w") as f:
        json.dump({"alice": 0, "bob": 1}, f)

    from xiaoicesing_io_tpu.deployment.export import export_acoustic
    import yaml

    out = export_acoustic(cfg, out_dir=str(tmp_path / "a"))
    manifest = yaml.safe_load((out / "dsconfig.yaml").read_text())
    assert manifest["acoustic_inputs"] == [
        "tokens", "mel2ph", "f0", "energy", "key_shift", "speed", "spk_mix_embed",
    ]
    assert manifest["frozen"] == []

    out2 = export_acoustic(
        cfg, out_dir=str(tmp_path / "b"),
        freeze_gender=0.2, freeze_velocity=1.0, freeze_spk="alice:0.6|bob:0.4",
    )
    manifest2 = yaml.safe_load((out2 / "dsconfig.yaml").read_text())
    assert manifest2["acoustic_inputs"] == ["tokens", "mel2ph", "f0", "energy"]
    assert manifest2["frozen"] == ["key_shift", "speed", "spk_mix_embed"]

    # frozen graph runs with only the remaining inputs
    from jax import export as jexport

    exported = jexport.deserialize((out2 / "fs2_aux.stablehlo").read_bytes())
    B, T_ph, T_f = 1, 64, 512
    outs = exported.call(
        np.zeros((B, T_ph), np.int32), np.zeros((B, T_f), np.int32),
        np.full((B, T_f), 220.0, np.float32), np.zeros((B, T_f), np.float32),
    )
    assert np.asarray(outs[0]).shape == (B, T_f, cfg["hidden_size"])


def test_export_variance_graphs(tmp_path):
    wd = tmp_path / "exp_var"
    wd.mkdir()
    cfg = load_config(
        Path(__file__).parent.parent / "xiaoicesing_io_tpu/configs/variance.yaml"
    )
    cfg.update(
        work_dir=str(wd), dictionary=str(DICT), exp_name="export_var",
        enc_layers=1, predict_dur=True, predict_pitch=True,
        predict_energy=True, predict_breathiness=True,
    )
    cfg["dur_prediction_args"].update(hidden_size=32, num_layers=1)
    cfg["pitch_prediction_args"].update(repeat_bins=8)
    cfg["pitch_prediction_args"]["backbone_args"].update(num_layers=1, num_channels=16)
    cfg["variances_prediction_args"].update(total_repeat_bins=8)
    cfg["variances_prediction_args"]["backbone_args"].update(num_layers=1, num_channels=16)

    from xiaoicesing_io_tpu.training.checkpoint import CheckpointManager
    from xiaoicesing_io_tpu.training.variance import build_variance, init_variance_state
    from xiaoicesing_io_tpu.utils.phonemes import PhonemeDictionary
    from xiaoicesing_io_tpu.utils.text_encoder import TokenTextEncoder

    enc = TokenTextEncoder(PhonemeDictionary.load(DICT).phoneme_list)
    model, core, normalizers = build_variance(cfg, enc.vocab_size)
    state = init_variance_state(model, cfg, enc.vocab_size, jax.random.PRNGKey(0))
    CheckpointManager(wd, category="variance").save(state, step=10)

    from xiaoicesing_io_tpu.deployment.export import export_variance
    import yaml

    out = export_variance(cfg, out_dir=str(tmp_path / "v"))
    manifest = yaml.safe_load((out / "dsconfig.yaml").read_text())
    for g in ("linguistic", "frame_condition", "pitch_pre", "pitch",
              "variance_pre", "variance"):
        assert g in manifest["graphs"], g
        assert (out / manifest["graphs"][g]).exists(), g
    assert manifest["pitch_post"]["repeat_bins"] == 8
    assert set(manifest["variance_post"]["ranges"]) == {"energy", "breathiness"}
    # consumers need the loop parameters and per-graph input names
    assert manifest["sampling"]["type"] in ("ddpm", "reflow")
    assert "algorithm" in manifest["sampling"]
    assert manifest["graph_inputs"]["pitch"] == ["x", "t", "condition"]
    # word mode (predict_dur): linguistic takes word_dur — the quantity the
    # consumer knows from the score — not ph_dur (the thing being predicted)
    assert manifest["graph_inputs"]["linguistic"] == [
        "tokens", "midi", "ph2word", "word_dur"
    ]
    from jax import export as _jexport

    ling = _jexport.deserialize((out / "linguistic_dur.stablehlo").read_bytes())
    _B, _T = 1, 64
    enc_out, dur = ling.call(
        np.ones((_B, _T), np.int32), np.full((_B, _T), 60, np.int32),
        np.ones((_B, _T), np.int32), np.ones((_B, _T), np.int32),
    )
    assert np.asarray(enc_out).shape == (_B, _T, cfg["hidden_size"])
    assert np.asarray(dur).shape == (_B, _T)

    # chain frame_condition -> pitch_pre -> pitch_step on the exported graphs
    from jax import export as jexport

    B, T_ph, T_f, T_n, H = 1, 64, 512, 32, cfg["hidden_size"]
    fc = jexport.deserialize((out / "frame_condition.stablehlo").read_bytes())
    cond = fc.call(np.zeros((B, T_ph, H), np.float32), np.ones((B, T_f), np.int32))
    pp = jexport.deserialize((out / "pitch_pre.stablehlo").read_bytes())
    pcond = pp.call(
        np.asarray(cond), np.ones((B, T_f), np.int32),
        np.full((B, T_f), 60.0, np.float32), np.ones((B, T_f), np.float32),
        np.full((B, T_n), 60.0, np.float32), np.zeros((B, T_n), bool),
        np.ones((B, T_n), np.int32), np.zeros((B, T_n), np.int32),
        np.ones((B, T_f), np.int32),
    )
    ps = jexport.deserialize((out / "pitch_step.stablehlo").read_bytes())
    y = ps.call(np.zeros((B, 1, T_f, 8), np.float32), np.zeros((B,), np.float32),
                np.asarray(pcond))
    assert np.asarray(y).shape == (B, 1, T_f, 8)

    # frozen expr/glide variant drops those inputs
    out2 = export_variance(cfg, out_dir=str(tmp_path / "v2"),
                           freeze_expr=0.8, freeze_glide=True)
    m2 = yaml.safe_load((out2 / "dsconfig.yaml").read_text())
    assert m2["frozen"] == ["expr", "glide"]
    pp2 = jexport.deserialize((out2 / "pitch_pre.stablehlo").read_bytes())
    pcond2 = pp2.call(
        np.asarray(cond), np.ones((B, T_f), np.int32),
        np.full((B, T_f), 60.0, np.float32),
        np.full((B, T_n), 60.0, np.float32), np.zeros((B, T_n), bool),
        np.ones((B, T_n), np.int32), np.ones((B, T_f), np.int32),
    )
    assert np.asarray(pcond2).shape == np.asarray(pcond).shape


def test_export_spk_mix_attachments_and_freeze(tiny_ckpt, tmp_path):
    cfg, wd = tiny_ckpt
    from xiaoicesing_io_tpu.deployment.export import export_acoustic

    out = export_acoustic(
        cfg, out_dir=str(tmp_path / "mix"),
        export_spk=["duet=alice:0.6|bob:0.4"], freeze_spk="alice",
    )
    emb = np.frombuffer((out / "duet.emb").read_bytes(), np.float32)
    from xiaoicesing_io_tpu.training.checkpoint import load_params_for_inference

    params = load_params_for_inference(cfg["work_dir"], cfg, None)
    table = np.asarray(params["params"]["fs2"]["spk_embed"]["embedding"], np.float32)
    np.testing.assert_allclose(emb, 0.6 * table[0] + 0.4 * table[1], rtol=1e-6)
    # frozen spk -> graph has only tokens/mel2ph/f0 inputs
    import yaml

    manifest = yaml.safe_load((out / "dsconfig.yaml").read_text())
    assert "spk_mix_embed" not in manifest["acoustic_inputs"]
    assert "spk_mix_embed" in manifest["frozen"]


def test_drop_speakers_retain_mode(tiny_ckpt):
    """--retain must complete without error and keep only the listed rows
    (regression: TypeError on the final log line)."""
    cfg, wd = tiny_ckpt
    from xiaoicesing_io_tpu.deployment.drop_spk import drop_speakers
    from xiaoicesing_io_tpu.training.checkpoint import (
        _checkpointer,
        latest_checkpoint,
    )

    drop_speakers(wd.name, ["alice"], fill="zeros",
                  work_dir_root=str(wd.parent), retain=True, overwrite=True)
    restored = _checkpointer().restore(Path(latest_checkpoint(wd)).resolve())
    table = np.asarray(restored["params"]["fs2"]["spk_embed"]["embedding"])
    assert not np.allclose(table[0], 0)  # alice kept
    assert np.allclose(table[1], 0)      # bob scrubbed


def test_modify_spk_embed_retain():
    from xiaoicesing_io_tpu.deployment.drop_spk import modify_spk_embed

    table = np.arange(12, dtype=np.float32).reshape(4, 3)
    out = modify_spk_embed(table, retain_ids={1}, fill="zeros")
    assert np.allclose(out[1], table[1])
    for i in (0, 2, 3):
        assert np.allclose(out[i], 0)


def test_drop_spk_out_path_and_overwrite_guard(tiny_ckpt, tmp_path):
    """--out writes a new checkpoint leaving the source untouched; in-place
    edits and clobbering an existing --out both require --overwrite
    (ref: scripts/drop_spk.py:33-45)."""
    cfg, wd = tiny_ckpt
    from xiaoicesing_io_tpu.deployment.drop_spk import drop_speakers
    from xiaoicesing_io_tpu.training.checkpoint import (
        _checkpointer,
        latest_checkpoint,
    )

    with pytest.raises(AssertionError):
        drop_speakers(wd.name, ["bob"], fill="zeros",
                      work_dir_root=str(wd.parent))  # in place w/o overwrite

    src_path = Path(latest_checkpoint(wd)).resolve()
    src_before = np.asarray(
        _checkpointer().restore(src_path)["params"]["fs2"]["spk_embed"]["embedding"]
    )
    dest = tmp_path / "scrubbed_ckpt"
    drop_speakers(wd.name, ["alice"], fill="random",
                  work_dir_root=str(wd.parent), out=str(dest))
    table = np.asarray(
        _checkpointer().restore(dest.resolve())["params"]["fs2"]["spk_embed"]["embedding"]
    )
    assert not np.allclose(table[0], src_before[0])  # alice scrubbed in dest

    src_after = np.asarray(
        _checkpointer().restore(src_path)["params"]["fs2"]["spk_embed"]["embedding"]
    )
    assert np.allclose(src_after, src_before)  # source untouched

    with pytest.raises(AssertionError):
        drop_speakers(wd.name, ["alice"], fill="zeros",
                      work_dir_root=str(wd.parent), out=str(dest))  # exists
    drop_speakers(wd.name, ["alice"], fill="zeros",
                  work_dir_root=str(wd.parent), out=str(dest), overwrite=True)


def test_bench_acoustic_runs_for_ddpm_and_no_aux(tmp_path):
    """bench_acoustic must dispatch per core type: ddpm cores take
    x_start/speedup (not x_end/t_start), and configs without a shallow aux
    decoder must not call aux_out (regression: TypeError on both)."""
    cfg = load_config(
        Path(__file__).parent.parent / "xiaoicesing_io_tpu/configs/acoustic.yaml"
    )
    cfg.update(
        enc_layers=1, diffusion_type="ddpm", use_shallow_diffusion=False,
        timesteps=8, diff_speedup=4,
        backbone_args=Config(num_channels=16, num_layers=1, kernel_size=31,
                             strong_cond=True),
    )
    from xiaoicesing_io_tpu.deployment.benchmarks import bench_acoustic

    dt = bench_acoustic(cfg, tokens_n=4, frames=32, runs=1, steps=2)
    assert dt > 0


def test_export_acoustic_onnx(tiny_ckpt, tmp_path):
    """--format onnx produces real .onnx graphs that execute to parity with
    the StableHLO export (the reference's deployment product is ONNX,
    ref: deployment/exporters/acoustic_exporter.py:333-390)."""
    cfg, wd = tiny_ckpt
    from xiaoicesing_io_tpu.deployment.export import export_acoustic
    from xiaoicesing_io_tpu.deployment.onnx_proto import parse_model
    from xiaoicesing_io_tpu.deployment.onnx_run import run_model_bytes

    out = export_acoustic(cfg, out_dir=str(tmp_path / "onnx"), fmt="onnx")
    assert (out / "fs2_aux.onnx").exists()
    assert (out / "diffusion_step.onnx").exists()
    assert (out / "dsconfig.yaml").exists()

    data = (out / "diffusion_step.onnx").read_bytes()
    graph, meta = parse_model(data)
    assert meta["opset"] >= 16  # ScatterElements(reduction=add) needs 16
    B, T_f, M = 1, 512, cfg["audio_num_mel_bins"]
    H = cfg["hidden_size"]
    rng = np.random.default_rng(0)
    feeds = {
        graph.inputs[0][0]: rng.standard_normal((B, 1, T_f, M)).astype(np.float32),
        graph.inputs[1][0]: np.asarray([0.4], np.float32),
        graph.inputs[2][0]: rng.standard_normal((B, T_f, H)).astype(np.float32),
    }
    y = run_model_bytes(data, feeds)
    (out_name, _, out_shape), = graph.outputs
    assert y[out_name].shape == (B, 1, T_f, M)

    # parity vs the StableHLO export of the same checkpoint
    from jax import export as jexport

    shlo = export_acoustic(cfg, out_dir=str(tmp_path / "shlo"))
    exported = jexport.deserialize(
        (shlo / "diffusion_step.stablehlo").read_bytes()
    )
    ref = np.asarray(exported.call(*feeds.values()))
    np.testing.assert_allclose(y[out_name], ref, atol=2e-4)

    # the merged loop-bearing artifact (ref: acoustic_exporter.py:363-390):
    # ONE acoustic.onnx driven by depth/steps, fs2 inputs -> mel
    import yaml

    manifest = yaml.safe_load((out / "dsconfig.yaml").read_text())
    assert manifest["acoustic_merged"] == "acoustic.onnx"
    assert manifest["acoustic_merged_inputs"][-2:] == ["depth", "steps"]
    mdata = (out / "acoustic.onnx").read_bytes()
    mgraph, _ = parse_model(mdata)
    assert any(n.op_type == "Loop" for n in mgraph.nodes)
    mfeeds = {
        "tokens": rng.integers(1, 8, (B, 64)).astype(np.int32),
        "mel2ph": np.clip(np.sort(rng.integers(1, 65, (B, T_f))), 1, 64).astype(np.int32),
        "f0": rng.uniform(100, 400, (B, T_f)).astype(np.float32),
        "spk_mix_embed": rng.standard_normal((B, 1, H)).astype(np.float32),
        "depth": np.asarray(0.6, np.float32),
        "steps": np.asarray(2, np.int64),
    }
    got = run_model_bytes(mdata, mfeeds)
    assert got["mel"].shape == (B, T_f, M)
    assert np.isfinite(got["mel"]).all()


def test_export_variance_onnx(tmp_path):
    """variance partial graphs and the NSF-HiFiGAN generator export as ONNX
    and execute through the numpy verifier."""
    wd = tmp_path / "exp_var_onnx"
    wd.mkdir()
    cfg = load_config(
        Path(__file__).parent.parent / "xiaoicesing_io_tpu/configs/variance.yaml"
    )
    cfg.update(
        work_dir=str(wd), dictionary=str(DICT), exp_name="export_var_onnx",
        enc_layers=1, predict_dur=True, predict_pitch=True,
        predict_energy=True, predict_breathiness=True,
    )
    cfg["dur_prediction_args"].update(hidden_size=32, num_layers=1)
    cfg["pitch_prediction_args"].update(repeat_bins=8)
    cfg["pitch_prediction_args"]["backbone_args"].update(num_layers=1, num_channels=16)
    cfg["variances_prediction_args"].update(total_repeat_bins=8)
    cfg["variances_prediction_args"]["backbone_args"].update(num_layers=1, num_channels=16)

    from xiaoicesing_io_tpu.training.checkpoint import CheckpointManager
    from xiaoicesing_io_tpu.training.variance import build_variance, init_variance_state
    from xiaoicesing_io_tpu.utils.phonemes import PhonemeDictionary
    from xiaoicesing_io_tpu.utils.text_encoder import TokenTextEncoder

    enc = TokenTextEncoder(PhonemeDictionary.load(DICT).phoneme_list)
    model, core, normalizers = build_variance(cfg, enc.vocab_size)
    state = init_variance_state(model, cfg, enc.vocab_size, jax.random.PRNGKey(0))
    CheckpointManager(wd, category="variance").save(state, step=10)

    import yaml

    from xiaoicesing_io_tpu.deployment.export import export_variance
    from xiaoicesing_io_tpu.deployment.onnx_proto import parse_model
    from xiaoicesing_io_tpu.deployment.onnx_run import run_model_bytes

    out = export_variance(cfg, out_dir=str(tmp_path / "v_onnx"), fmt="onnx")
    manifest = yaml.safe_load((out / "dsconfig.yaml").read_text())
    for g in ("linguistic", "frame_condition", "pitch_pre", "pitch",
              "variance_pre", "variance"):
        p = out / manifest["graphs"][g]
        assert p.suffix == ".onnx" and p.exists(), g
    # execute the linguistic graph
    data = (out / manifest["graphs"]["linguistic"]).read_bytes()
    graph, _ = parse_model(data)
    rng = np.random.default_rng(0)
    feeds = {}
    for name, et, shape in graph.inputs:
        if et == 7:  # int64
            feeds[name] = rng.integers(1, 4, shape).astype(np.int64)
        elif et == 6:
            feeds[name] = rng.integers(1, 4, shape).astype(np.int32)
        else:
            feeds[name] = rng.standard_normal(shape).astype(np.float32)
    y = run_model_bytes(data, feeds)
    assert all(np.isfinite(v).all() for v in y.values())
    # (the NSF-HiFiGAN generator's ONNX export is covered by
    # tests/test_onnx_export.py::test_real_vocoder_graph)

    # the merged loop-bearing predictor artifacts: pre-conditioning +
    # sampler Loop + repeat-bin denorm/clamp in ONE graph each
    for gname, outs in (("pitch_merged", ["pitd"]),
                        ("variance_merged", ["energy", "breathiness"])):
        data = (out / manifest["graphs"][gname]).read_bytes()
        graph, _ = parse_model(data)
        assert any(n.op_type == "Loop" for n in graph.nodes), gname
        feeds = {}
        for name, et, shape in graph.inputs:
            if name == "depth":
                feeds[name] = np.asarray(1.0, np.float32)
            elif name == "steps":
                feeds[name] = np.asarray(2, np.int64)
            elif et == 7:
                feeds[name] = rng.integers(1, 4, shape).astype(np.int64)
            elif et == 6:
                feeds[name] = np.clip(np.sort(
                    rng.integers(1, 5, shape)), 1, None).astype(np.int32)
            elif et == 9:
                feeds[name] = np.zeros(shape, bool)
            else:
                feeds[name] = rng.standard_normal(shape).astype(np.float32)
        got = run_model_bytes(data, feeds)
        for o in outs:
            assert got[o].shape == (1, 512), (gname, o)
            assert np.isfinite(got[o]).all()


def test_variance_onnx_graph_passes_applied(tmp_path, monkeypatch):
    """VERDICT r4 task 6: the default-on simplify passes (hoist-loop-
    invariants / fold-constants / DCE) must cover the ddpm-loop pitch.onnx
    and variance.onnx artifacts too, not just the reflow acoustic graph:
    vs an export with the passes disabled, the optimized artifacts must
    shed Loop-body nodes (the per-step conditioner projections leave the
    loop) AND produce identical outputs under a fixed noise stream."""
    wd = tmp_path / "exp_var_gp"
    wd.mkdir()
    cfg = load_config(
        Path(__file__).parent.parent / "xiaoicesing_io_tpu/configs/variance.yaml"
    )
    cfg.update(
        work_dir=str(wd), dictionary=str(DICT), exp_name="export_var_gp",
        enc_layers=1, predict_dur=True, predict_pitch=True,
        predict_energy=True, predict_breathiness=True,
        diffusion_type="ddpm", timesteps=20, K_step=20,
    )
    cfg["dur_prediction_args"].update(hidden_size=32, num_layers=1)
    cfg["pitch_prediction_args"].update(repeat_bins=8)
    cfg["pitch_prediction_args"]["backbone_args"].update(num_layers=1, num_channels=16)
    cfg["variances_prediction_args"].update(total_repeat_bins=8)
    cfg["variances_prediction_args"]["backbone_args"].update(num_layers=1, num_channels=16)

    from xiaoicesing_io_tpu.training.checkpoint import CheckpointManager
    from xiaoicesing_io_tpu.training.variance import build_variance, init_variance_state
    from xiaoicesing_io_tpu.utils.phonemes import PhonemeDictionary
    from xiaoicesing_io_tpu.utils.text_encoder import TokenTextEncoder

    enc = TokenTextEncoder(PhonemeDictionary.load(DICT).phoneme_list)
    model, core, normalizers = build_variance(cfg, enc.vocab_size)
    state = init_variance_state(model, cfg, enc.vocab_size, jax.random.PRNGKey(0))
    CheckpointManager(wd, category="variance").save(state, step=10)

    import yaml

    from xiaoicesing_io_tpu.deployment import graph_passes
    from xiaoicesing_io_tpu.deployment.export import export_variance
    from xiaoicesing_io_tpu.deployment.onnx_proto import parse_model
    from xiaoicesing_io_tpu.deployment.onnx_run import run_graph

    out_opt = export_variance(cfg, out_dir=str(tmp_path / "opt"), fmt="onnx")
    monkeypatch.setattr(graph_passes, "simplify_graph",
                        lambda g, verbose=False: g)
    out_raw = export_variance(cfg, out_dir=str(tmp_path / "raw"), fmt="onnx")

    manifest = yaml.safe_load((out_opt / "dsconfig.yaml").read_text())
    for gname, outs in (("pitch_merged", ["pitd"]),
                        ("variance_merged", ["energy", "breathiness"])):
        rel = manifest["graphs"][gname]
        g_opt, _ = parse_model((out_opt / rel).read_bytes())
        g_raw, _ = parse_model((out_raw / rel).read_bytes())

        def body(g):
            return next(n for n in g.nodes if n.op_type == "Loop").attrs["body"]

        def heavy(b):
            return sum(1 for n in b.nodes
                       if n.op_type in ("MatMul", "Conv", "Gemm"))

        # node-count budget: the loop body sheds nodes, including at least
        # one matmul/conv (the conditioner projections now run ONCE)
        assert len(body(g_opt).nodes) < len(body(g_raw).nodes), gname
        assert heavy(body(g_opt)) < heavy(body(g_raw)), gname

        rng = np.random.default_rng(3)
        feeds = {}
        for name, et, shape in g_raw.inputs:
            if name == "depth":
                feeds[name] = np.asarray(1.0, np.float32)
            elif name == "steps":
                feeds[name] = np.asarray(2, np.int64)
            elif et == 7:
                feeds[name] = rng.integers(1, 4, shape).astype(np.int64)
            elif et == 6:
                feeds[name] = np.clip(np.sort(
                    rng.integers(1, 5, shape)), 1, None).astype(np.int32)
            elif et == 9:
                feeds[name] = np.zeros(shape, bool)
            else:
                feeds[name] = rng.standard_normal(shape).astype(np.float32)
        got_raw = run_graph(g_raw, feeds, rng=np.random.default_rng(7))
        got_opt = run_graph(g_opt, feeds, rng=np.random.default_rng(7))
        for o in outs:
            np.testing.assert_allclose(got_opt[o], got_raw[o],
                                       atol=1e-5, rtol=1e-5, err_msg=(gname, o))
