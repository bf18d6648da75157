"""Vocoder wrappers: load checkpoints, validate mel parameters, spec2wav.

Capability parity with ``/root/reference/modules/vocoders/nsf_hifigan.py``:
mel-parameter mismatch warnings, log10 -> ln mel-base conversion, f0-driven
synthesis.  Weights come from the torch ``model.ckpt`` + ``config.json`` pair
through the converter.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ...utils.torch_ckpt import convert_nsf_hifigan, load_torch_file
from . import register_vocoder
from .nsf_hifigan import Generator, NsfHifiganConfig


@register_vocoder
class NsfHifiGAN:
    def __init__(self, cfg, model_path=None):
        self.cfg = cfg
        model_path = Path(model_path or cfg["vocoder_ckpt"])
        if not model_path.exists():
            raise FileNotFoundError(
                f"NSF-HiFiGAN vocoder model is not found at '{model_path}'. "
                "Please follow instructions in docs/BestPractices.md#vocoders to get one."
            )
        with open(model_path.with_name("config.json")) as f:
            self.h = json.load(f)
        self.vcfg = NsfHifiganConfig.from_json(self.h)
        ckpt = load_torch_file(model_path)
        sd = ckpt.get("generator", ckpt)
        self.generator = Generator(self.vcfg, dtype=jnp.bfloat16)
        self.params = convert_nsf_hifigan(sd, self.vcfg)
        self._check_params()
        if cfg.get("use_folded_vocoder", True):
            # lane-packed folded layout (see nsf_fast.py) — same weights,
            # several-fold faster on TPU; stages 0-1 additionally run as
            # fused whole-stage Pallas kernels on TPU backends
            # (vocoder_pallas_stages: [] to disable)
            from .nsf_fast import FastNsfHifigan

            on_tpu = jax.devices()[0].platform != "cpu"
            stages = cfg.get(
                "vocoder_pallas_stages", (0, 1) if on_tpu else ()
            )
            fast = FastNsfHifigan(
                self.vcfg, self.params, dtype=jnp.bfloat16,
                pallas_stages=tuple(stages),
                pallas_tile=int(cfg.get("vocoder_pallas_tile", 1024)),
            )
            self._spec2wav = lambda params, mel, f0, key: fast(mel, f0, key)
        else:
            def _stock(params, mel, f0, key):
                sine_key = noise_key = None
                if key is not None:
                    sine_key, noise_key = jax.random.split(key)
                return self.generator.apply(
                    params, mel, f0, sine_key=sine_key, noise_key=noise_key
                )

            self._spec2wav = jax.jit(_stock)

    def _check_params(self):
        pairs = [
            ("audio_sample_rate", "sampling_rate"), ("audio_num_mel_bins", "num_mels"),
            ("fft_size", "n_fft"), ("win_size", "win_size"), ("hop_size", "hop_size"),
            ("fmin", "fmin"), ("fmax", "fmax"),
        ]
        for ck, vk in pairs:
            if ck in self.cfg and vk in self.h and self.cfg[ck] != self.h[vk]:
                print(
                    f"Mismatch parameters: cfg['{ck}']={self.cfg[ck]} != "
                    f"{self.h[vk]} (vocoder)"
                )

    def spec2wav(self, mel: np.ndarray, f0: np.ndarray, key=None) -> np.ndarray:
        """mel: [T, M] or [B, T, M] natural-log (or log10 per cfg mel_base);
        f0: [T] or [B, T].  -> wav [T*hop] or [B, T*hop].

        ``key`` seeds the NSF source randomness (SineGen per-harmonic initial
        phases + additive noise, ref models.py:143-165) — the reference draws
        these from the torch global RNG on every call; pass a key derived from
        the inference seed for the same behavior, or None for a deterministic
        noise-free source (used by parity tests and validation logging)."""
        mel = np.asarray(mel, np.float32)
        f0 = np.asarray(f0, np.float32)
        squeeze = mel.ndim == 2
        if squeeze:
            mel, f0 = mel[None], f0[None]
        mel_base = self.cfg.get("mel_base", 10)
        if mel_base != "e":
            assert mel_base in (10, "10"), "mel_base must be 'e', '10' or 10."
            mel = 2.30259 * mel  # log10 -> ln
        wav = np.asarray(
            self._spec2wav(self.params, jnp.asarray(mel), jnp.asarray(f0), key),
            np.float32,
        )
        return wav[0] if squeeze else wav


@register_vocoder
class DDSP:
    """pc-ddsp vocoder (TorchScript; ref: modules/vocoders/ddsp.py).

    The reference ships this as an opaque TorchScript archive — there is no
    source to port, so synthesis runs the jitted module on CPU torch (a
    frozen third-party tool, exactly as the reference treats it).
    """

    def __init__(self, cfg, model_path=None):
        import torch
        import yaml

        self.cfg = cfg
        model_path = Path(model_path or cfg["vocoder_ckpt"])
        if not model_path.exists():
            raise FileNotFoundError(f"DDSP model is not found at '{model_path}'")
        with open(model_path.with_name("config.yaml")) as f:
            self.args = yaml.safe_load(f)
        for ck, vk in [("audio_sample_rate", "sampling_rate"),
                       ("audio_num_mel_bins", "n_mels"), ("hop_size", "block_size")]:
            data = self.args.get("data", self.args)
            if ck in cfg and vk in data and cfg[ck] != data[vk]:
                print(f"Mismatch parameters: cfg['{ck}']={cfg[ck]} != "
                      f"{data[vk]} (vocoder)")
        self.model = torch.jit.load(str(model_path), map_location="cpu")
        self.model.eval()

    def spec2wav(self, mel: np.ndarray, f0: np.ndarray, key=None) -> np.ndarray:
        # `key` accepted for interface uniformity; the jitted pc-ddsp module
        # has no externally seedable randomness
        import torch

        mel = np.asarray(mel, np.float32)
        f0 = np.asarray(f0, np.float32)
        squeeze = mel.ndim == 2
        if squeeze:
            mel, f0 = mel[None], f0[None]
        mel_base = self.cfg.get("mel_base", 10)
        mel_t = torch.from_numpy(mel)
        if mel_base != "e":
            mel_t = 2.30259 * mel_t
        with torch.no_grad():
            signal, _, (_, _) = self.model(mel_t, torch.from_numpy(f0)[..., None])
        wav = signal.numpy()
        return wav[0] if squeeze else wav
