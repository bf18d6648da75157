"""END-TO-END variance-model parity vs the reference (BASELINE config 2).

Random-weight reference DiffSingerVariance vs our stack through the
converter: duration prediction, pitch diffusion (delta vs base pitch, retake
conditioning), and multi-variance diffusion — identical injected noise.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE = Path("/root/reference")
pytestmark = [
    pytest.mark.skipif(not REFERENCE.exists(), reason="reference repo not mounted"),
    pytest.mark.slow,  # heavy tier: run the fast tier with -m 'not slow'
]

if REFERENCE.exists():
    sys.path.insert(0, str(REFERENCE))
    from test_reference_parity import _install_lightning_stub

    _install_lightning_stub()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402

from xiaoicesing_io_tpu.config import Config  # noqa: E402

HP = {
    "hidden_size": 64,
    "enc_layers": 2,
    "enc_ffn_kernel_size": 3,
    "ffn_act": "gelu",
    "dropout": 0.0,
    "num_heads": 2,
    "use_pos_embed": True,
    "rel_pos": True,
    "use_rope": True,
    "use_spk_id": False,
    "predict_dur": True,
    "predict_pitch": True,
    "predict_energy": True,
    "predict_breathiness": True,
    "predict_voicing": False,
    "predict_tension": False,
    "use_melody_encoder": False,
    "use_glide_embed": False,
    "glide_types": ["up", "down"],
    "dur_prediction_args": {
        "arch": "fs2", "hidden_size": 32, "dropout": 0.0, "num_layers": 2,
        "kernel_size": 3, "log_offset": 1.0, "loss_type": "mse",
        "lambda_pdur_loss": 0.3, "lambda_wdur_loss": 1.0, "lambda_sdur_loss": 3.0,
    },
    "pitch_prediction_args": {
        "pitd_norm_min": -8.0, "pitd_norm_max": 8.0,
        "pitd_clip_min": -12.0, "pitd_clip_max": 12.0,
        "repeat_bins": 8,
        "backbone_type": "wavenet",
        "backbone_args": {"num_layers": 2, "num_channels": 16,
                          "dilation_cycle_length": 2},
    },
    "energy_db_min": -96.0, "energy_db_max": -12.0,
    "breathiness_db_min": -96.0, "breathiness_db_max": -20.0,
    "variances_prediction_args": {
        "total_repeat_bins": 8,
        "backbone_type": "wavenet",
        "backbone_args": {"num_layers": 2, "num_channels": 16,
                          "dilation_cycle_length": 2},
    },
    "diffusion_type": "ddpm",
    "timesteps": 50,
    "K_step": 50,
    "K_step_infer": 50,
    "schedule_type": "linear",
    "diff_accelerator": "ddim",
    "diff_speedup": 10,
    "use_shallow_diffusion": False,
    "infer": True,
}


def test_e2e_variance_parity(rng, monkeypatch):
    from utils.hparams import hparams

    hparams.clear()
    hparams.update(HP)
    from modules.toplevel import DiffSingerVariance

    torch.manual_seed(0)
    vocab = 12
    tmodel = DiffSingerVariance(vocab_size=vocab).eval()

    cfg = Config({k: (Config(v) if isinstance(v, dict) else v) for k, v in HP.items()})
    from xiaoicesing_io_tpu.models.toplevel import (
        VarianceModel,
        build_variance_normalizers,
    )
    from xiaoicesing_io_tpu.training.variance import build_variance
    from xiaoicesing_io_tpu.utils.torch_ckpt import convert_variance

    model, core, normalizers = build_variance(cfg, vocab)
    params = convert_variance(tmodel.state_dict(), cfg)

    B, T_ph, T_f = 1, 6, 24
    tokens = rng.integers(1, vocab, size=(B, T_ph))
    midi = rng.integers(40, 80, size=(B, T_ph))
    ph2word = np.sort(rng.integers(1, 4, size=(B, T_ph)), axis=1)
    ph_dur = rng.integers(2, 7, size=(B, T_ph))
    from xiaoicesing_io_tpu.ops.seq import length_regulator

    mel2ph = np.asarray(length_regulator(jnp.asarray(ph_dur), out_len=T_f))
    base_pitch = rng.uniform(50, 70, size=(B, T_f)).astype(np.float32)
    pitch = base_pitch + rng.uniform(-1, 1, size=(B, T_f)).astype(np.float32)
    energy = rng.uniform(-60, -20, size=(B, T_f)).astype(np.float32)
    breathiness = rng.uniform(-60, -25, size=(B, T_f)).astype(np.float32)

    # deterministic noise per randn call (two sampler calls: pitch then var)
    noises = [
        rng.standard_normal((B, 1, 8, T_f)).astype(np.float32),
        rng.standard_normal((B, 2, 4, T_f)).astype(np.float32),
    ]
    call_idx = {"i": 0}

    def fake_randn(*shape, device=None, dtype=None):
        n = noises[call_idx["i"]]
        assert tuple(shape) == n.shape, (shape, n.shape)
        call_idx["i"] += 1
        return torch.from_numpy(n.copy())

    monkeypatch.setattr(torch, "randn", fake_randn)
    with torch.no_grad():
        dur_ref, pitch_ref, var_ref = tmodel(
            torch.from_numpy(tokens), midi=torch.from_numpy(midi).long(),
            ph2word=torch.from_numpy(ph2word).long(),
            ph_dur=torch.from_numpy(ph_dur).long(),
            mel2ph=torch.from_numpy(mel2ph).long(),
            base_pitch=torch.from_numpy(base_pitch),
            pitch=torch.from_numpy(pitch),
            energy=torch.from_numpy(energy),
            breathiness=torch.from_numpy(breathiness),
            infer=True,
        )
    dur_ref = dur_ref.numpy()
    pitch_ref = pitch_ref.numpy()
    var_ref = {k: v.numpy() for k, v in var_ref.items()}

    # ours
    enc, dur_pred = model.apply(
        params, jnp.asarray(tokens), jnp.asarray(midi), jnp.asarray(ph2word),
        ph_dur=jnp.asarray(ph_dur), infer=True, method=VarianceModel.encode,
    )
    np.testing.assert_allclose(np.asarray(dur_pred), dur_ref, atol=1e-3)

    condition = model.apply(params, enc, jnp.asarray(mel2ph),
                            method=VarianceModel.frame_condition)
    pitch_cond = model.apply(
        params, condition, jnp.asarray(mel2ph), jnp.asarray(base_pitch),
        method=VarianceModel.pitch_condition,
    )
    pn = normalizers["pitch"]

    def dn_pitch(x, t):
        return model.apply(params, x, t, pitch_cond, method=VarianceModel.denoise_pitch)

    x = core.inference(
        dn_pitch, jax.random.PRNGKey(0), (B, 1, T_f, 8),
        depth=50, speedup=10, algorithm="ddim",
        noise=jnp.asarray(noises[0].transpose(0, 1, 3, 2)),
    )
    pitch_delta = pn.denorm(x)
    np.testing.assert_allclose(np.asarray(pitch_delta), pitch_ref, atol=1e-3)

    var_cond = model.apply(
        params, condition, jnp.asarray(pitch), {},
        method=VarianceModel.variance_condition,
    )
    vn = normalizers["variances"]

    def dn_var(x, t):
        return model.apply(params, x, t, var_cond, method=VarianceModel.denoise_variance)

    xv = core.inference(
        dn_var, jax.random.PRNGKey(0), (B, 2, T_f, 4),
        depth=50, speedup=10, algorithm="ddim",
        noise=jnp.asarray(noises[1].transpose(0, 1, 3, 2)),
    )
    var_out = dict(zip(["energy", "breathiness"], vn.denorm(xv)))
    for k in var_ref:
        np.testing.assert_allclose(np.asarray(var_out[k]), var_ref[k], atol=1e-3,
                                   err_msg=k)
    print("variance e2e parity: dur/pitch/variances all within 1e-3")
