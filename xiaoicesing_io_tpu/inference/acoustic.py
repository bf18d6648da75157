"""Acoustic inference: .ds segments -> mel -> waveform.

Capability parity with ``/root/reference/inference/ds_acoustic.py``:
``preprocess_input`` (tokens, mel2ph from cumsum-rounded ph_dur, resampled
f0/variances, gender -> key_shift static/dynamic mapping, velocity -> speed),
speaker-mix embedding, per-segment seeding, vocoder, offset placement with
zero fill or crossfade, mel-only export.

TPU-first differences: segments are padded to frame buckets so every unique
compiled program shape is reused; the whole condition + aux + K-step sampler
runs as one jitted call; the vocoder is a second jitted call.
"""

from __future__ import annotations

from collections import OrderedDict
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..models.diffusion.core import GaussianDiffusion
from ..models.toplevel import AcousticModel, VARIANCE_CHECKLIST
from ..ops.seq import length_regulator
from ..training.acoustic import build_acoustic
from ..training.checkpoint import load_params_for_inference
from ..utils import fresh_seed, key_from_seed
from ..utils.curves import cross_fade, resample_align_curve
from ..utils.phonemes import PhonemeDictionary, locate_dictionary
from ..utils.text_encoder import TokenTextEncoder
from .base import BaseSVSInfer

BUCKET = 256  # frame bucket size for static-shape padding


def _bucket(n: int) -> int:
    return max(BUCKET, ((n + BUCKET - 1) // BUCKET) * BUCKET)


class DiffSingerAcousticInfer(BaseSVSInfer):
    def __init__(self, cfg: Config, load_vocoder: bool = True, ckpt_steps=None):
        super().__init__(cfg)
        self.variances_to_embed = {
            v for v in VARIANCE_CHECKLIST if cfg.get(f"use_{v}_embed", False)
        }
        phdict = PhonemeDictionary.load(
            locate_dictionary(cfg.get("dictionary"), cfg.get("work_dir"))
        )
        self.ph_encoder = TokenTextEncoder(phdict.phoneme_list)
        self.model, self.core, self.normalizer = build_acoustic(
            cfg, self.ph_encoder.vocab_size
        )
        self.params = load_params_for_inference(cfg["work_dir"], cfg, ckpt_steps)
        self.vocoder = None
        if load_vocoder:
            from ..models.vocoders.wrapper import NsfHifiGAN

            self.vocoder = NsfHifiGAN(cfg)
        self._jitted: Dict[int, callable] = {}

    # -- preprocessing (parity: ds_acoustic.py:68-158) ----------------------

    def preprocess_input(self, param: dict, idx: int = 0) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        batch: Dict[str, np.ndarray] = {}
        summary = OrderedDict()
        tokens = np.asarray([self.ph_encoder.encode(param["ph_seq"])], np.int32)
        batch["tokens"] = tokens

        ph_dur = np.array(param["ph_dur"].split(), np.float32)
        ph_acc = np.round(np.cumsum(ph_dur) / self.timestep + 0.5).astype(np.int64)
        durations = np.diff(ph_acc, prepend=0)[None]  # [1, T_txt]
        durations = durations * (tokens != 0)
        length = int(durations.sum())
        mel2ph = np.asarray(length_regulator(jnp.asarray(durations), out_len=length))
        batch["mel2ph"] = mel2ph

        summary["tokens"] = tokens.shape[1]
        summary["frames"] = length
        summary["seconds"] = "%.2f" % (length * self.timestep)

        if cfg.get("use_spk_id", False):
            spk_mix_id, spk_mix_value = self.load_speaker_mix(
                param_src=param, summary_dst=summary, mix_mode="frame", mix_length=length
            )
            batch["spk_mix_id"] = spk_mix_id
            batch["spk_mix_value"] = spk_mix_value

        batch["f0"] = resample_align_curve(
            np.array(param["f0_seq"].split(), np.float32),
            original_timestep=float(param["f0_timestep"]),
            target_timestep=self.timestep,
            align_length=length,
        )[None]

        for v_name in VARIANCE_CHECKLIST:
            if v_name in self.variances_to_embed:
                batch[v_name] = resample_align_curve(
                    np.array(param[v_name].split(), np.float32),
                    original_timestep=float(param[f"{v_name}_timestep"]),
                    target_timestep=self.timestep,
                    align_length=length,
                )[None]
                summary[v_name] = "manual"

        if cfg.get("use_key_shift_embed", False):
            shift_min, shift_max = cfg["augmentation_args"]["random_pitch_shifting"]["range"]
            gender = param.get("gender", 0.0)
            if gender is None:
                gender = 0.0
            if isinstance(gender, (int, float, bool)):
                summary["gender"] = f"static({gender:.3f})"
                val = gender * shift_max if gender >= 0 else gender * abs(shift_min)
                batch["key_shift"] = np.full((1, length), val, np.float32)
            else:
                summary["gender"] = "dynamic"
                gender_seq = resample_align_curve(
                    np.array(gender.split(), np.float32),
                    original_timestep=float(param["gender_timestep"]),
                    target_timestep=self.timestep,
                    align_length=length,
                )
                mask = gender_seq >= 0
                key_shift = gender_seq * (mask * shift_max + (1 - mask) * abs(shift_min))
                batch["key_shift"] = np.clip(key_shift, shift_min, shift_max)[None]

        if cfg.get("use_speed_embed", False):
            if param.get("velocity") is None:
                summary["velocity"] = "default"
                batch["speed"] = np.full((1, length), 1.0, np.float32)
            else:
                summary["velocity"] = "manual"
                speed_min, speed_max = cfg["augmentation_args"]["random_time_stretching"]["range"]
                speed = resample_align_curve(
                    np.array(param["velocity"].split(), np.float32),
                    original_timestep=float(param["velocity_timestep"]),
                    target_timestep=self.timestep,
                    align_length=length,
                )
                batch["speed"] = np.clip(speed, speed_min, speed_max)[None]

        print(f"[{idx}]\t" + ", ".join(f"{k}: {v}" for k, v in summary.items()))
        return batch

    # -- model forward ------------------------------------------------------

    def _make_synthesis_fn(self):
        cfg = self.cfg
        model = self.model
        core = self.core
        normalizer = self.normalizer
        use_shallow = cfg.get("use_shallow_diffusion", False)

        def synthesize(params, batch, key):
            spk_mix_embed = None
            if cfg.get("use_spk_id", False):
                table = params["params"]["fs2"]["spk_embed"]["embedding"]
                emb = jnp.take(jnp.asarray(table), batch["spk_mix_id"], axis=0)  # [1,1,N,H]
                spk_mix_embed = jnp.sum(
                    emb * batch["spk_mix_value"][..., None], axis=2
                )  # [1, T|1, H]
            variances = {v: batch[v] for v in self.variances_to_embed}
            cond = model.apply(
                params, batch["tokens"], batch["mel2ph"], batch["f0"],
                key_shift=batch.get("key_shift"), speed=batch.get("speed"),
                spk_mix_embed=spk_mix_embed, variances=variances,
                method=AcousticModel.condition,
            )
            mask = (batch["mel2ph"] > 0)[:, :, None]
            shape = (cond.shape[0], 1, cond.shape[1], cfg["audio_num_mel_bins"])
            if use_shallow:
                aux = model.apply(params, cond, method=AcousticModel.aux_out)
                aux = aux * mask
                x_src = aux.astype(jnp.float32)[:, None]
            else:
                x_src = None

            backbone_type = cfg.get("backbone_type")
            # wavenet kernel default-OFF: the round-2 default-on rested on an
            # fp32-XLA-vs-bf16-Pallas comparison; at matched bf16 the margin
            # re-measured in every bench run (bench.py wavenet_margin_check)
            # shows parity-to-loss (round 3: XLA 7.89 vs Pallas 7.98 ms/step),
            # so XLA is the default and `wavenet_use_pallas: true` opts in.
            # NOTE: the Pallas kernel computes in bf16 — opting in also
            # selects bf16 denoiser compute.
            # Mosaic needs lane-aligned channel dims; tiny (test-scale) models
            # fall back to the XLA path
            _nc = cfg.get("backbone_args", {}).get("num_channels", 1024)
            use_pallas = (
                cfg.get("use_pallas_kernels", True)
                and (
                    (backbone_type == "lynxnet"
                     and cfg.get("backbone_args", {}).get("activation", "PReLU") == "PReLU")
                    or (backbone_type == "wavenet"
                        and cfg.get("wavenet_use_pallas", False))
                )
                and _nc >= 128 and _nc % 128 == 0
                and jax.default_backend() != "cpu"  # pallas needs TPU (or interpret)
            )
            if use_pallas and backbone_type == "lynxnet":
                from ..models.backbones.lynx_pallas import (
                    lynx_cond_projections,
                    lynx_denoiser_apply,
                )

                bargs = cfg.get("backbone_args", {})
                # conditioner projections are invariant across sampler steps:
                # compute once here, pass as scan constants (~1/7 of the
                # denoiser's per-step FLOPs saved)
                cond_projs = lynx_cond_projections(
                    params, cond, num_layers=bargs.get("num_layers", 6)
                )

                def denoise_fn(x, t):
                    return lynx_denoiser_apply(
                        params, x, t,
                        num_layers=bargs.get("num_layers", 6),
                        strong_cond=bargs.get("strong_cond", False),
                        kernel_size=bargs.get("kernel_size", 31),
                        cond_projs=cond_projs,
                    ).astype(jnp.float32)
            elif use_pallas and backbone_type == "wavenet":
                from ..models.backbones.wavenet_pallas import wavenet_denoiser_apply

                bargs = cfg.get("backbone_args", {})

                def denoise_fn(x, t):
                    return wavenet_denoiser_apply(
                        params, x, t, cond,
                        num_layers=bargs.get("num_layers", 20),
                        dilation_cycle_length=bargs.get("dilation_cycle_length", 4),
                    ).astype(jnp.float32)
            else:
                def denoise_fn(x, t):
                    return model.apply(
                        params, x, t, cond, method=AcousticModel.denoise
                    ).astype(jnp.float32)

            if isinstance(core, GaussianDiffusion):
                x = core.inference(
                    denoise_fn, key, shape, x_start=x_src,
                    depth=cfg.get("K_step_infer", core.k_step),
                    speedup=cfg.get("diff_speedup", 10),
                    algorithm=cfg.get("diff_accelerator", "ddim"),
                    solver_order=cfg.get("dpm_solver_order", 2),
                    unipc_variant=cfg.get("unipc_variant", "bh2"),
                )
            else:
                x = core.inference(
                    denoise_fn, key, shape, x_end=x_src,
                    t_start=cfg.get("T_start_infer", core.t_start),
                    steps=cfg.get("sampling_steps", 20),
                    algorithm=cfg.get("sampling_algorithm", "euler"),
                )
            mel = normalizer.denorm(x)
            return mel * mask

        return synthesize

    def forward_model(self, batch: Dict[str, np.ndarray], seed: int = 0) -> np.ndarray:
        """Pad to a frame bucket, run the jitted synthesis, crop."""
        length = batch["mel2ph"].shape[1]
        padded_len = _bucket(length)
        jb = {}
        for k, v in batch.items():
            v = np.asarray(v)
            if k == "tokens" or v.ndim < 2 or v.shape[1] in (1,) or k == "spk_mix_id":
                jb[k] = jnp.asarray(v)
            elif v.shape[1] == length:
                pad = [(0, 0), (0, padded_len - length)] + [(0, 0)] * (v.ndim - 2)
                mode = "edge" if k == "spk_mix_value" else "constant"
                jb[k] = jnp.asarray(np.pad(v, pad, mode=mode))
            else:
                jb[k] = jnp.asarray(v)
        fn = self._jitted.get(padded_len)
        if fn is None:
            fn = jax.jit(self._make_synthesis_fn())
            self._jitted[padded_len] = fn
        key = jax.random.PRNGKey(seed & 0xFFFFFFFF)
        mel = np.asarray(fn(self.params, jb, key))
        return mel[:, :length]

    def run_vocoder(
        self, mel: np.ndarray, f0: np.ndarray, seed: Optional[int] = None
    ) -> np.ndarray:
        """Vocode one segment; `seed` drives the NSF source noise (the
        reference's SineGen draws from the globally seeded torch RNG)."""
        return self.vocoder.spec2wav(mel[0], f0[0], key=key_from_seed(seed, salt=1))

    # -- driver (parity: ds_acoustic.py:189-246) ----------------------------

    def run_inference(
        self, params: List[dict], out_dir: Path, title: str,
        num_runs: int = 1, seed: int = -1, save_mel: bool = False,
        data_parallel: bool = False,
    ):
        """``data_parallel=True`` shards segment batches over all devices
        (serving mode; per-segment seeds are replaced by one key per batch
        group — see inference/serving.py)."""
        batches = [self.preprocess_input(p, idx=i) for i, p in enumerate(params)]
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        suffix = ".wav" if not save_mel else ".mel.npz"
        sr = self.cfg["audio_sample_rate"]
        dp = None
        if data_parallel:
            from .serving import DataParallelSynthesizer

            dp = DataParallelSynthesizer(self)
        for run in range(num_runs):
            # seed < 0 reproduces the reference's unseeded mode: fresh
            # entropy per run, so repeated invocations give different takes
            run_seed = seed if seed >= 0 else fresh_seed()
            dp_mels = dp_wavs = None
            if dp is not None:
                dp_mels, dp_f0s = dp.synthesize_mels(
                    params, seed=run_seed, batches=batches,
                )
                if not save_mel:
                    # bucket-batched vocoding over all segments at once
                    dp_wavs = dp.vocode(
                        dp_mels, dp_f0s, seed=run_seed
                    )
            result = [] if save_mel else np.zeros(0)
            current_length = 0
            for i, (param, batch) in enumerate(zip(params, batches)):
                if dp_mels is not None:
                    mel_pred = dp_mels[i][None]
                else:
                    seg_seed = param.get("seed", run_seed + i)
                    mel_pred = self.forward_model(batch, seed=int(seg_seed))
                if save_mel:
                    result.append({
                        "offset": param.get("offset", 0.0),
                        "mel": mel_pred[0],
                        "f0": np.asarray(batch["f0"])[0],
                    })
                else:
                    wav = (
                        dp_wavs[i] if dp_wavs is not None
                        else self.run_vocoder(mel_pred, np.asarray(batch["f0"]),
                                              seed=int(seg_seed))
                    )
                    silent = round(param.get("offset", 0) * sr) - current_length
                    if silent >= 0:
                        result = np.append(result, np.zeros(silent))
                        result = np.append(result, wav)
                    else:
                        result = cross_fade(result, wav, current_length + silent)
                    current_length = current_length + silent + wav.shape[0]
            name = f"{title}-{run:03d}{suffix}" if num_runs > 1 else title + suffix
            path = out_dir / name
            if save_mel:
                np.savez(
                    path,
                    **{f"seg{i}_{k}": v for i, d in enumerate(result) for k, v in d.items()},
                )
                print(f"| save mel: {path}")
            else:
                from ..utils.audio import save_wav

                save_wav(result, path, sr)
                print(f"| save audio: {path}")
