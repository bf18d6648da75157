"""Synthesize committable audio artifacts from a trained acoustic experiment.

The reference's whole validation story is "a human can listen"
(``/root/reference/training/acoustic_task.py:197-218`` logs GT/aux/diff
audio to TensorBoard); this produces the offline equivalent for held-out
items: for each selected validation item it writes

* ``<name>_orig.wav``      — the original corpus waveform (trimmed)
* ``<name>_diffusion.wav`` — the diffusion mel, Griffin-Lim inverted
* ``<name>_aux.wav``       — the aux decoder's mel, Griffin-Lim inverted

All mel->wav conversions share the same Griffin-Lim map (no trained neural
vocoder exists in this environment), so A/B differences between the
diffusion and aux clips are differences in the MELS, not the vocoder.
Clips are trimmed to ``--seconds`` and written 16-bit PCM at the corpus
rate so they stay committable.

Usage:
  python tools/make_audio_artifacts.py --exp conv_r4_ac --ckpt 14700 \
      --items alto0000,soprano0002 --raw .work/corpus_r4/raw \
      --seconds 4 --out docs/audio_r5
"""

import argparse
import pathlib
import sys
import wave

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]


def write_wav(path, wav, sr):
    wav = np.clip(np.asarray(wav, np.float32), -1.0, 1.0)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((wav * 32767).astype(np.int16).tobytes())
    print(f"| wrote {path} ({path.stat().st_size/1024:.0f} KB)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", required=True)
    ap.add_argument("--ckpt", type=int, default=None)
    ap.add_argument("--items", required=True,
                    help="comma-separated item names from the valid split")
    ap.add_argument("--raw", default=None,
                    help="corpus raw/ root holding <spk>/wavs/<name>.wav")
    ap.add_argument("--dataset", default="valid")
    ap.add_argument("--seconds", type=float, default=4.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    sys.path.insert(0, str(REPO))
    import jax

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from xiaoicesing_io_tpu.config import load_config
    from xiaoicesing_io_tpu.data.dataset import AcousticDataset
    from xiaoicesing_io_tpu.eval.copy_synthesis import _batch_from_item
    from xiaoicesing_io_tpu.eval.metrics import griffin_lim_from_logmel
    from xiaoicesing_io_tpu.inference.acoustic import DiffSingerAcousticInfer
    from xiaoicesing_io_tpu.models.toplevel import AcousticModel
    from xiaoicesing_io_tpu.ops.mel import MelConfig

    cfg = load_config(None, exp_name=args.exp, infer=True)
    sr = cfg["audio_sample_rate"]
    hop = cfg["hop_size"]
    ds = AcousticDataset(cfg["binary_data_dir"], args.dataset, cfg)
    names = [str(n) for n in ds.metadata.get("names", [])]
    infer = DiffSingerAcousticInfer(cfg, load_vocoder=False,
                                    ckpt_steps=args.ckpt)
    mel_cfg = MelConfig.from_config(cfg)
    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    n_samp = int(args.seconds * sr)
    n_frames = n_samp // hop
    for name in args.items.split(","):
        i = names.index(name)
        b = ds.collate([i], pad_to_bucket=True)
        mask = np.asarray(b["mel2ph"])[0] > 0
        batch = _batch_from_item(cfg, infer, b)

        pred = np.asarray(infer.forward_model(batch, seed=args.seed))

        kwargs = {}
        if "spk_mix_id" in batch:
            table = infer.params["params"]["fs2"]["spk_embed"]["embedding"]
            emb = jnp.take(jnp.asarray(table), jnp.asarray(batch["spk_mix_id"]),
                           axis=0)
            kwargs["spk_mix_embed"] = jnp.sum(
                emb * jnp.asarray(batch["spk_mix_value"])[..., None], axis=2)
        cond = infer.model.apply(
            infer.params, jnp.asarray(batch["tokens"]),
            jnp.asarray(batch["mel2ph"]), jnp.asarray(batch["f0"]),
            method=AcousticModel.condition, **kwargs)
        aux = infer.model.apply(infer.params, cond, method=AcousticModel.aux_out)
        aux = np.asarray(infer.normalizer.denorm(aux[:, None]))

        for tag, mel in (("diffusion", pred[0]), ("aux", aux[0])):
            m = mel[mask][:n_frames]
            wav = griffin_lim_from_logmel(m, mel_cfg, seed=args.seed)
            write_wav(out / f"{name}_{tag}.wav", wav[:n_samp], sr)

        if args.raw:
            raws = list(pathlib.Path(args.raw).glob(f"*/wavs/{name}.wav"))
            if raws:
                with wave.open(str(raws[0]), "rb") as w:
                    data = np.frombuffer(
                        w.readframes(w.getnframes()), np.int16
                    ).astype(np.float32) / 32767.0
                write_wav(out / f"{name}_orig.wav", data[:n_samp], sr)


if __name__ == "__main__":
    main()
