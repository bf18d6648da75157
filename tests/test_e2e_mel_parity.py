"""END-TO-END mel parity vs the reference (BASELINE criterion).

Builds the reference DiffSingerAcoustic (torch, random weights), converts the
checkpoint, and runs BOTH full inference stacks — encoder -> aux decoder ->
shallow-start -> scan-fused sampler -> denorm — with identical injected
noise.  BASELINE.json requires mel allclose atol 1e-3; module-level parity is
covered elsewhere, this is the whole §3.3 call stack.
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

M = 16
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
    "audio_num_mel_bins": M,
    "diffusion_type": "ddpm",
    "timesteps": 50,
    "K_step": 20,
    "K_step_infer": 20,
    "schedule_type": "linear",
    "diff_accelerator": "ddim",
    "diff_speedup": 5,
    "use_shallow_diffusion": True,
    "T_start": 0.6,
    "T_start_infer": 0.6,
    "shallow_diffusion_args": {
        "train_aux_decoder": True,
        "train_diffusion": True,
        "val_gt_start": False,
        "aux_decoder_arch": "convnext",
        "aux_decoder_args": {"num_channels": 24, "num_layers": 2, "kernel_size": 7,
                             "dropout_rate": 0.0},
        "aux_decoder_grad": 0.1,
    },
    "backbone_type": "wavenet",
    "backbone_args": {"num_layers": 3, "num_channels": 24, "dilation_cycle_length": 2},
    "spec_min": [-12],
    "spec_max": [0],
    "infer": True,
}


@pytest.fixture()
def models(rng):
    from utils.hparams import hparams

    hparams.clear()
    hparams.update(HP)
    from modules.toplevel import DiffSingerAcoustic

    torch.manual_seed(0)
    vocab = 12
    tmodel = DiffSingerAcoustic(vocab_size=vocab, out_dims=M).eval()

    cfg = Config({k: (Config(v) if isinstance(v, dict) else v) for k, v in HP.items()})
    from xiaoicesing_io_tpu.training.acoustic import build_acoustic
    from xiaoicesing_io_tpu.utils.torch_ckpt import convert_acoustic

    model, core, normalizer = build_acoustic(cfg, vocab)
    params = convert_acoustic(tmodel.state_dict(), cfg)
    return tmodel, model, core, normalizer, cfg, params


def _inputs(rng, B=1, T_ph=6, T_f=24):
    from xiaoicesing_io_tpu.ops.seq import length_regulator

    dur = rng.integers(2, 6, size=(B, T_ph))
    mel2ph = np.asarray(length_regulator(jnp.asarray(dur), out_len=T_f))
    tokens = rng.integers(1, 12, size=(B, T_ph))
    f0 = rng.uniform(100, 400, size=(B, T_f)).astype(np.float32)
    return tokens, mel2ph, f0


@pytest.mark.parametrize("algorithm,speedup", [
    ("ddim", 5), ("pndm", 5), ("dpm-solver", 5), ("unipc", 5),
])
def test_e2e_mel_allclose(models, rng, monkeypatch, algorithm, speedup):
    tmodel, model, core, normalizer, cfg, params = models
    from utils.hparams import hparams

    hparams["diff_accelerator"] = algorithm
    hparams["diff_speedup"] = speedup
    tokens, mel2ph, f0 = _inputs(rng)
    B, T_f = f0.shape

    # fixed noise shared by both stacks; DDIM is deterministic given the start
    noise = rng.standard_normal((B, 1, M, T_f)).astype(np.float32)  # torch layout

    def fake_randn(*shape, device=None, dtype=None):
        assert tuple(shape) == noise.shape, (shape, noise.shape)
        return torch.from_numpy(noise.copy())

    monkeypatch.setattr(torch, "randn", fake_randn)
    with torch.no_grad():
        out = tmodel(
            torch.from_numpy(tokens), mel2ph=torch.from_numpy(mel2ph).long(),
            f0=torch.from_numpy(f0), infer=True,
        )
    ref_mel = out.diff_out.numpy()  # [B, T, M]
    ref_aux = out.aux_out.numpy()

    # ours: same weights, same noise (converted to [B, F, T, M] layout)
    from xiaoicesing_io_tpu.models.toplevel import AcousticModel

    cond = model.apply(
        params, jnp.asarray(tokens), jnp.asarray(mel2ph), jnp.asarray(f0),
        method=AcousticModel.condition,
    )
    mask = (jnp.asarray(mel2ph) > 0)[:, :, None]
    aux = model.apply(params, cond, method=AcousticModel.aux_out)
    # denorm drops the F axis: [B, 1, T, M] -> [B, T, M]
    aux_denorm = np.asarray(normalizer.denorm(aux.astype(jnp.float32)[:, None]) * mask)
    np.testing.assert_allclose(aux_denorm, ref_aux, atol=1e-3)

    def denoise_fn(x, t):
        return model.apply(params, x, t, cond, method=AcousticModel.denoise)

    x = core.inference(
        denoise_fn, jax.random.PRNGKey(0), (B, 1, T_f, M),
        x_start=normalizer.norm(aux_denorm),
        depth=cfg["K_step_infer"], speedup=speedup,
        algorithm=algorithm,
        noise=jnp.asarray(noise.transpose(0, 1, 3, 2)),  # [B,1,M,T]->[B,1,T,M]
    )
    our_mel = np.asarray(normalizer.denorm(x) * mask)

    assert our_mel.shape == ref_mel.shape
    np.testing.assert_allclose(our_mel, ref_mel, atol=1e-3)
    print(f"e2e mel max diff ({algorithm}): {np.abs(our_mel - ref_mel).max():.2e}")


def test_e2e_mel_allclose_reflow(models, rng, monkeypatch):
    """Same end-to-end check with the rectified-flow core (euler)."""
    from utils.hparams import hparams

    hp = dict(HP)
    hp.update(diffusion_type="reflow", time_scale_factor=1000,
              sampling_algorithm="euler", sampling_steps=5,
              T_start=0.4, T_start_infer=0.4)
    hparams.clear()
    hparams.update(hp)
    from modules.toplevel import DiffSingerAcoustic

    torch.manual_seed(1)
    tmodel = DiffSingerAcoustic(vocab_size=12, out_dims=M).eval()
    cfg = Config({k: (Config(v) if isinstance(v, dict) else v) for k, v in hp.items()})
    from xiaoicesing_io_tpu.training.acoustic import build_acoustic
    from xiaoicesing_io_tpu.utils.torch_ckpt import convert_acoustic

    model, core, normalizer = build_acoustic(cfg, 12)
    params = convert_acoustic(tmodel.state_dict(), cfg)

    tokens, mel2ph, f0 = _inputs(rng)
    B, T_f = f0.shape
    noise = rng.standard_normal((B, 1, M, T_f)).astype(np.float32)

    monkeypatch.setattr(
        torch, "randn",
        lambda *shape, device=None, dtype=None: torch.from_numpy(noise.copy()),
    )
    with torch.no_grad():
        out = tmodel(
            torch.from_numpy(tokens), mel2ph=torch.from_numpy(mel2ph).long(),
            f0=torch.from_numpy(f0), infer=True,
        )
    ref_mel = out.diff_out.numpy()

    from xiaoicesing_io_tpu.models.toplevel import AcousticModel

    cond = model.apply(params, jnp.asarray(tokens), jnp.asarray(mel2ph),
                       jnp.asarray(f0), method=AcousticModel.condition)
    mask = (jnp.asarray(mel2ph) > 0)[:, :, None]
    aux = model.apply(params, cond, method=AcousticModel.aux_out)
    aux_denorm = np.asarray(normalizer.denorm(aux.astype(jnp.float32)[:, None]) * mask)

    def velocity_fn(x, t):
        return model.apply(params, x, t, cond, method=AcousticModel.denoise)

    x = core.inference(
        velocity_fn, jax.random.PRNGKey(0), (B, 1, T_f, M),
        x_end=normalizer.norm(aux_denorm),
        t_start=0.4, steps=5, algorithm="euler",
        noise=jnp.asarray(noise.transpose(0, 1, 3, 2)),
    )
    our_mel = np.asarray(normalizer.denorm(x) * mask)
    np.testing.assert_allclose(our_mel, ref_mel, atol=1e-3)
    print(f"e2e reflow mel max diff: {np.abs(our_mel - ref_mel).max():.2e}")
