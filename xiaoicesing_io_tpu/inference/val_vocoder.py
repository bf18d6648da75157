"""Vocoder copy-synthesis evaluation.

Parity with ``/root/reference/inference/val_nsf_hifigan.py``: extract GT mel
and f0 from wav files, vocode them back, and write the reconstructions for
listening / objective checks (uses the built-in pitch tracker instead of
torchcrepe).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from ..dsp.pitch import get_pitch
from ..ops.mel import MelConfig, MelSpectrogram
from ..utils.audio import load_wav, save_wav


def copy_synthesis(wav_paths, cfg, out_dir, vocoder=None):
    if vocoder is None:
        from ..models.vocoders.wrapper import NsfHifiGAN

        vocoder = NsfHifiGAN(cfg)
    mel_extractor = MelSpectrogram(MelConfig.from_config(cfg))
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    results = []
    for p in wav_paths:
        p = Path(p)
        wav, sr = load_wav(p, sr=cfg["audio_sample_rate"], mono=True)
        mel = mel_extractor.numpy(wav)
        f0, _ = get_pitch(
            wav, sr, mel.shape[0], hop_size=cfg["hop_size"],
            f0_min=cfg["f0_min"], f0_max=cfg["f0_max"], interp_uv=True,
        )
        rec = vocoder.spec2wav(mel, f0)
        out_path = out_dir / f"{p.stem}_copysyn.wav"
        save_wav(rec, out_path, cfg["audio_sample_rate"])
        # objective scores: log-mel reconstruction error + waveform PESQ.
        # On TPU the GT/reconstruction pair is scored through the batched
        # on-device mel path (fused Pallas kernel; docs/PerformanceNotes.md)
        import jax

        if jax.default_backend() == "tpu":
            m = min(len(wav), len(rec))
            pair = mel_extractor.device(np.stack([wav[:m], rec[:m]]))
            n = len(mel)
            mel_gt_n, mel_rec = pair[0][:n], pair[1][:n]
            mae = float(np.abs(mel_gt_n - mel_rec).mean())
        else:
            mel_rec = mel_extractor.numpy(rec[: len(wav)])
            n = min(len(mel), len(mel_rec))
            mae = float(np.abs(mel[:n] - mel_rec[:n]).mean())
        from ..eval.metrics import pesq_approx

        m = min(len(wav), len(rec))
        pesq = pesq_approx(wav[:m], rec[:m], cfg["audio_sample_rate"])
        results.append({
            "file": str(p), "out": str(out_path),
            "mel_mae": mae, "pesq": pesq,
        })
        print(f"| {p.name}: mel MAE {mae:.4f} PESQ* {pesq:.2f} -> {out_path}")
    return results
