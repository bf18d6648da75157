"""Command-line interface.

Capability parity with the reference's ``scripts/`` entry points:
``train.py``, ``binarize.py``, ``infer.py`` (acoustic/variance subcommands
with key transposition, spk-mix parsing, seed/depth/steps overrides),
``vocode.py``, ``drop_spk.py``, ``export.py``.
"""

from __future__ import annotations

import importlib
import json
import pathlib
import sys

import click

from ..config import load_config


def _find_exp(exp: str) -> str:
    """Exact or unique-prefix experiment lookup (ref: scripts/infer.py:40-60)."""
    base = pathlib.Path("checkpoints")
    if not (base / exp).exists():
        matches = sorted(
            d.name for d in base.iterdir() if d.is_dir() and d.name.startswith(exp)
        ) if base.exists() else []
        assert matches, f"| There are no matching exp starting with '{exp}' in 'checkpoints' folder."
        if len(matches) > 1:
            print(f"| There are more than one matching exp, pick the first one: {matches}")
        exp = matches[0]
    print(f"| found ckpt by prefix: {exp}")
    return exp


@click.group()
def cli():
    # honor JAX_PLATFORMS even under platform plugins that ignore the env var
    # (e.g. tunneled TPU backends): the config path always works
    import os

    import jax

    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)
    # persistent XLA compile cache: remote/tunneled compilers take 30 s -
    # 10 min per program, and the RSS-watchdog re-exec path re-pays every
    # bucket-shape compile on each restart without it (PerformanceNotes).
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if not cache:
        # repo-root .jax_cache for a source checkout; for an installed
        # package parents[2] lands in/next to site-packages (unwritable or
        # polluting), so fall back to a user cache dir
        root = pathlib.Path(__file__).resolve().parents[2]
        if (root / "pytest.ini").exists() or (root / ".git").exists() \
                or (root / ".jax_cache").is_dir():
            cache = str(root / ".jax_cache")
        else:
            cache = str(pathlib.Path.home() / ".cache" / "xiaoicesing_io_tpu"
                        / "jax_cache")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@cli.command(help="Train a model (acoustic or variance)")
@click.option("--config", required=False, help="Path to the configuration file")
@click.option("--exp_name", required=True, help="Experiment name")
@click.option("--work_dir", required=False, default="checkpoints", help="Work directory root")
@click.option("--hparams", "hparams_str", required=False, default="", help="k=v overrides")
@click.option("--reset", is_flag=True, help="Ignore the saved work-dir config")
@click.option("--coordinator", required=False,
              help="Multi-host: coordinator address host:port")
@click.option("--num_processes", type=int, required=False,
              help="Multi-host: total process count")
@click.option("--process_id", type=int, required=False,
              help="Multi-host: this process's index")
def train(config, exp_name, work_dir, hparams_str, reset,
          coordinator, num_processes, process_id):
    if num_processes and num_processes > 1:
        from ..parallel.mesh import init_distributed

        init_distributed(coordinator, num_processes, process_id)
    cfg = load_config(
        config, exp_name=exp_name, work_dir_root=work_dir,
        overrides=hparams_str, reset=reset, save=True,
    )
    from ..training.tasks import build_trainer_from_config

    trainer = build_trainer_from_config(cfg)
    trainer.fit()


@cli.command(help="Vocoder copy-synthesis evaluation on wav files")
@click.argument("wavs", nargs=-1, required=True)
@click.option("--config", required=True)
@click.option("--out", default="copysyn_out")
def val_vocoder(wavs, config, out):
    cfg = load_config(config, infer=True)
    from ..inference.val_vocoder import copy_synthesis

    copy_synthesis(list(wavs), cfg, out)


@cli.command("eval", help="Copy-synthesis eval: mel MAE over a binarized set")
@click.option("--exp", required=True)
@click.option("--dataset", default="valid", type=click.Choice(["valid", "train"]))
@click.option("--limit", type=int, required=False, help="Evaluate at most N items")
@click.option("--seed", type=int, default=0)
@click.option("--json", "json_path", type=click.Path(), required=False,
              help="Also write the full report as JSON to this path")
@click.option("--pesq", "with_pesq", is_flag=True, default=False,
              help="Also vocode predicted + GT mels and report waveform PESQ")
@click.option("--ckpt", "ckpt_steps", type=int, required=False,
              help="Evaluate a specific checkpoint step (default: latest)")
def eval_cmd(exp, dataset, limit, seed, json_path, with_pesq, ckpt_steps):
    def _dump(report):
        if json_path:
            p = pathlib.Path(json_path)
            if p.parent != pathlib.Path("."):
                p.parent.mkdir(parents=True, exist_ok=True)
            p.write_text(json.dumps(report, indent=2))
            print(f"| save report: {json_path}")

    exp = _find_exp(exp)
    cfg = load_config(None, exp_name=exp, infer=True)
    if "variance" in str(cfg.get("task_cls", "")).lower():
        from ..eval.copy_synthesis import evaluate_variance

        report = evaluate_variance(cfg, dataset=dataset, limit=limit,
                                   ckpt_steps=ckpt_steps)
        metrics = " ".join(
            f"{k}={report[k]:.4f}"
            for k in ("rhythm_corr", "ph_dur_acc", "pitch_acc") if k in report
        )
        print(f"| step {report['step']} {report['dataset']} "
              f"({report['items_evaluated']} items): {metrics}")
        _dump(report)
        return
    from ..eval.copy_synthesis import evaluate_acoustic

    report = evaluate_acoustic(cfg, dataset=dataset, limit=limit, seed=seed,
                               with_pesq=with_pesq, ckpt_steps=ckpt_steps)
    for it in report["items"]:
        aux = "" if it["aux_mae"] is None else f"  aux_mae={it['aux_mae']:.4f}"
        pq = "" if it.get("pesq") is None else f"  pesq={it['pesq']:.2f}"
        print(f"| {it['name']}: frames={it['frames']} "
              f"mel_mae={it['mel_mae']:.4f} mcd={it['mcd_db']:.3f}dB{aux}{pq}")
    aux = ("" if "mean_aux_mae" not in report
           else f"  mean_aux_mae={report['mean_aux_mae']:.4f}")
    pq = ("" if "mean_pesq" not in report
          else f"  mean_pesq={report['mean_pesq']:.2f}")
    print(f"| step {report['step']} {report['dataset']}: "
          f"mean_mel_mae={report['mean_mel_mae']:.4f} "
          f"mean_mcd={report['mean_mcd_db']:.3f}dB{aux}{pq}")
    _dump(report)


@cli.command(help="Binarize a raw dataset")
@click.option("--config", required=True)
@click.option("--hparams", "hparams_str", required=False, default="")
def binarize(config, hparams_str):
    cfg = load_config(config, overrides=hparams_str)
    binarizer_cls = cfg["binarizer_cls"]
    mod_name, cls_name = binarizer_cls.rsplit(".", 1)
    cls = getattr(importlib.import_module(mod_name), cls_name)
    print(f"| Binarizer: {cls}")
    cls(cfg).process()


@cli.group(help="Run inference")
def infer():
    pass


def _load_ds(proj: str):
    name = pathlib.Path(proj).stem
    with open(proj, "r", encoding="utf-8") as f:
        params = json.load(f)
    if not isinstance(params, list):
        params = [params]
    return name, params


def _trans_key(params, key: int):
    """Transpose note_seq and f0_seq by semitones (ref: utils/infer_utils.py:13-39)."""
    from ..utils.music import midi_to_note, note_to_midi

    warned = False
    for seg in params:
        if "note_seq" in seg:
            seg["note_seq"] = " ".join(
                n if n == "rest" else midi_to_note(note_to_midi(n, round_midi=True) + key)
                for n in seg["note_seq"].split()
            )
        if seg.get("f0_seq"):
            seg["f0_seq"] = " ".join(
                str(round(float(x) * 2 ** (key / 12), 1)) for x in seg["f0_seq"].split()
            )
        else:
            warned = True
    if warned:
        print("Warning: parts of f0_seq do not exist, please freeze the pitch "
              "line in the editor.\r\n")
    return params


@infer.command(help="Acoustic inference: .ds -> .wav")
@click.argument("proj")
@click.option("--exp", required=True)
@click.option("--ckpt", type=int, required=False)
@click.option("--spk", required=False, help="Speaker mix, e.g. 'a|b:0.5'")
@click.option("--out", required=False)
@click.option("--title", required=False)
@click.option("--num", type=int, default=1)
@click.option("--key", type=int, default=0, help="Transpose key in semitones")
@click.option("--gender", type=float, required=False,
              help="Static formant shifting (gender) in [-1, 1]")
@click.option("--seed", type=int, default=-1)
@click.option("--depth", type=float, required=False)
@click.option("--steps", type=int, required=False)
@click.option("--mel", is_flag=True, help="Save mel instead of waveform")
@click.option("--dp", is_flag=True,
              help="Shard segment batches over all devices (serving mode; "
                   "per-segment seeds are replaced by one key per batch group)")
def acoustic(proj, exp, ckpt, spk, out, title, num, key, gender, seed, depth,
             steps, mel, dp):
    exp = _find_exp(exp)
    name, params = _load_ds(proj)
    if key != 0:
        params = _trans_key(params, key)
    if gender is not None:
        assert -1.0 <= gender <= 1.0, "--gender must be in [-1, 1]"
        for seg in params:
            seg["gender"] = gender
    cfg = load_config(None, exp_name=exp, infer=True)
    from ..compat import migrate_sampling_keys

    migrate_sampling_keys(cfg, depth=depth, steps=steps)
    if spk:
        from ..utils.spk_mix import parse_commandline_spk_mix

        for seg in params:
            seg["spk_mix"] = parse_commandline_spk_mix(spk)
    from ..inference.acoustic import DiffSingerAcousticInfer

    runner = DiffSingerAcousticInfer(cfg, load_vocoder=not mel, ckpt_steps=ckpt)
    out_dir = pathlib.Path(out) if out else pathlib.Path(proj).parent
    runner.run_inference(
        params, out_dir=out_dir, title=title or name, num_runs=num,
        seed=seed, save_mel=mel, data_parallel=dp,
    )


@infer.command(help="Variance inference: .ds -> .ds with predictions")
@click.argument("proj")
@click.option("--exp", required=True)
@click.option("--ckpt", type=int, required=False)
@click.option("--predict", multiple=True,
              help="dur / pitch / energy / breathiness / voicing / tension")
@click.option("--spk", required=False, help="Speaker mix, e.g. 'a|b:0.5'")
@click.option("--out", required=False)
@click.option("--title", required=False)
@click.option("--num", type=int, default=1)
@click.option("--key", type=int, default=0, help="Transpose key in semitones")
@click.option("--expr", type=float, required=False,
              help="Static expressiveness control in [0, 1] (pitch retake mix)")
@click.option("--seed", type=int, default=-1)
@click.option("--steps", type=int, required=False)
def variance(proj, exp, ckpt, predict, spk, out, title, num, key, expr, seed, steps):
    exp = _find_exp(exp)
    name, params = _load_ds(proj)
    if key != 0:
        params = _trans_key(params, key)
    if expr is not None:
        assert 0.0 <= expr <= 1.0, "--expr must be in [0, 1]"
        for seg in params:
            seg["expr"] = expr
    cfg = load_config(None, exp_name=exp, infer=True)
    from ..compat import migrate_sampling_keys

    migrate_sampling_keys(cfg, steps=steps)
    if spk:
        from ..utils.spk_mix import parse_commandline_spk_mix

        mix = parse_commandline_spk_mix(spk)
        for seg in params:
            # both the token-level (encoder/dur/pitch) and frame-level mixes
            # (ref: scripts/infer.py:351 sets ph_spk_mix AND spk_mix)
            seg["ph_spk_mix"] = seg["spk_mix"] = mix
    from ..inference.variance import DiffSingerVarianceInfer

    runner = DiffSingerVarianceInfer(cfg, predictions=set(predict), ckpt_steps=ckpt)
    out_dir = pathlib.Path(out) if out else pathlib.Path(proj).parent
    runner.run_inference(params, out_dir=out_dir, title=title or name,
                         num_runs=num, seed=seed)


@cli.command(help="Vocode saved mel files (.mel.npz) to waveform")
@click.argument("mel_path")
@click.option("--exp", required=False)
@click.option("--config", required=False)
@click.option("--cls", "--class", "vocoder_cls", required=False,
              help="Vocoder class override (e.g. NsfHifiGAN, DDSP)")
@click.option("--ckpt", "vocoder_ckpt", required=False,
              help="Vocoder checkpoint path override")
@click.option("--out", required=False)
@click.option("--title", required=False)
@click.option("--seed", type=int, default=-1,
              help="Seed for the NSF source noise; <0 = fresh randomness "
                   "per run (the reference's unseeded behavior)")
def vocode(mel_path, exp, config, vocoder_cls, vocoder_ckpt, out, title, seed):
    import numpy as np

    from ..utils import fresh_seed, key_from_seed
    from ..utils.curves import cross_fade
    from ..utils.audio import save_wav

    if exp:
        cfg = load_config(None, exp_name=_find_exp(exp), infer=True)
    else:
        cfg = load_config(config, infer=True)
    from ..models.vocoders import get_vocoder_cls
    from ..models.vocoders import wrapper  # noqa: F401 — registers classes

    cls = get_vocoder_cls(vocoder_cls or cfg.get("vocoder", "NsfHifiGAN"))
    vocoder = cls(cfg, model_path=vocoder_ckpt)
    data = np.load(mel_path)
    segs = {}
    for k in data.files:
        seg_name, attr = k.split("_", 1)
        segs.setdefault(seg_name, {})[attr] = data[k]
    sr = cfg["audio_sample_rate"]
    result = np.zeros(0)
    current_length = 0
    base_seed = seed if seed >= 0 else fresh_seed()
    for i, seg_name in enumerate(
        sorted(segs, key=lambda s: int(s.removeprefix("seg")))
    ):
        seg = segs[seg_name]
        wav = vocoder.spec2wav(
            seg["mel"], seg["f0"], key=key_from_seed(base_seed + i, salt=1)
        )
        silent = round(float(seg.get("offset", 0.0)) * sr) - current_length
        if silent >= 0:
            result = np.append(result, np.zeros(silent))
            result = np.append(result, wav)
        else:
            result = cross_fade(result, wav, current_length + silent)
        current_length = current_length + silent + wav.shape[0]
    # default output next to the input mel, like the reference (vocode.py:55)
    out_path = pathlib.Path(out) if out else pathlib.Path(mel_path).parent
    out_path = out_path / (
        (title or pathlib.Path(mel_path).stem.removesuffix(".mel")) + ".wav"
    )
    out_path.parent.mkdir(parents=True, exist_ok=True)
    save_wav(result, out_path, sr)
    print(f"| save audio: {out_path}")


@cli.command("drop_spk", help="Scrub speaker embeddings in a checkpoint (privacy)")
@click.argument("exp")
@click.option("--spk", multiple=True, required=True, help="Speaker names or ids to drop")
@click.option("--fill", type=click.Choice(["zeros", "random", "mean", "cyclic"]),
              default="zeros")
@click.option("--retain", is_flag=True,
              help="Invert: KEEP the listed speakers and scrub all others")
@click.option("--out", type=click.Path(), default=None,
              help="Write the scrubbed checkpoint here instead of in place")
@click.option("--overwrite", is_flag=True,
              help="Allow replacing an existing checkpoint (required for in-place edits)")
def drop_spk(exp, spk, fill, retain, out, overwrite):
    from ..deployment.drop_spk import drop_speakers

    drop_speakers(_find_exp(exp), list(spk), fill, retain=retain,
                  out=out, overwrite=overwrite)


@cli.group(help="Export models for deployment")
def export():
    pass


_format_opt = click.option(
    "--format", "fmt", type=click.Choice(["stablehlo", "savedmodel", "onnx"]),
    default="stablehlo", show_default=True,
    help="Graph format: portable StableHLO, or a TF SavedModel "
         "(convertible offline to ONNX via tf2onnx)")


@export.command("acoustic", help="Export acoustic model (partial graphs + manifest)")
@click.option("--exp", required=True)
@click.option("--ckpt", type=int, required=False)
@click.option("--out", required=False)
@click.option("--freeze_gender", type=float, required=False,
              help="Bake a static gender value [-1, 1] instead of a key_shift input")
@click.option("--freeze_velocity", type=float, required=False,
              is_flag=False, flag_value=1.0,
              help="Bake a static velocity instead of a speed input "
                   "(bare flag = default velocity 1.0, like the reference)")
@click.option("--freeze_spk", required=False,
              help="Bake a static speaker mix, e.g. 'alice' or 'alice:0.6|bob:0.4'")
@_format_opt
@click.option("--export_spk", multiple=True,
              help="Write named speaker-mix .emb attachments, e.g. "
                   "'duet=alice:0.6|bob:0.4' (repeatable)")
def export_acoustic(exp, ckpt, out, freeze_gender, freeze_velocity, freeze_spk,
                    export_spk, fmt):
    from ..deployment.export import export_acoustic as _export

    cfg = load_config(None, exp_name=_find_exp(exp), infer=True)
    _export(cfg, out_dir=out, ckpt_steps=ckpt, fmt=fmt,
            freeze_gender=freeze_gender, freeze_velocity=freeze_velocity,
            freeze_spk=freeze_spk, export_spk=list(export_spk))


@export.command("variance", help="Export variance model (partial graphs + manifest)")
@click.option("--exp", required=True)
@click.option("--ckpt", type=int, required=False)
@click.option("--out", required=False)
@click.option("--freeze_expr", type=float, required=False,
              is_flag=False, flag_value=1.0,
              help="Bake a static expressiveness factor instead of an input "
                   "(bare flag = default 1.0, like the reference)")
@click.option("--freeze_glide", is_flag=True,
              help="Bake the default (none) glide embedding; drops the note_glide input")
@click.option("--freeze_spk", required=False,
              help="Bake a static speaker mix, e.g. 'alice:0.6|bob:0.4'")
@click.option("--export_spk", multiple=True,
              help="Write named speaker-mix .emb attachments (repeatable)")
@_format_opt
def export_variance(exp, ckpt, out, freeze_expr, freeze_glide, freeze_spk,
                    export_spk, fmt):
    from ..deployment.export import export_variance as _export

    cfg = load_config(None, exp_name=_find_exp(exp), infer=True)
    _export(cfg, out_dir=out, ckpt_steps=ckpt, fmt=fmt, freeze_expr=freeze_expr,
            freeze_glide=freeze_glide, freeze_spk=freeze_spk,
            export_spk=list(export_spk))


@export.command("nsf-hifigan", help="Export NSF-HiFiGAN vocoder graph + vocoder.yaml")
@click.option("--exp", required=False, help="Experiment whose config names the vocoder ckpt")
@click.option("--config", "config_path", required=False, help="Config YAML (alternative to --exp)")
@click.option("--ckpt", "ckpt_path", required=False, help="Vocoder model.ckpt path override")
@click.option("--out", required=False)
@_format_opt
def export_nsf_hifigan(exp, config_path, ckpt_path, out, fmt):
    from ..deployment.export import export_nsf_hifigan as _export

    cfg = load_config(config_path, exp_name=_find_exp(exp) if exp else None,
                      infer=True)
    _export(cfg, out_dir=out, ckpt_path=ckpt_path, fmt=fmt)


if __name__ == "__main__":
    cli()
