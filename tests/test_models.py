"""Shape/behavior tests for the model stack (init + forward on tiny shapes)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xiaoicesing_io_tpu.config import Config
from xiaoicesing_io_tpu.models.backbones import build_backbone
from xiaoicesing_io_tpu.models.fastspeech.acoustic import FastSpeech2Acoustic
from xiaoicesing_io_tpu.models.fastspeech.variance import DurationPredictor
from xiaoicesing_io_tpu.models.toplevel import (
    AcousticModel,
    VarianceModel,
    build_variance_normalizers,
)

B, T_PH, T_F, M, H = 2, 7, 24, 16, 64

ACOUSTIC_CFG = Config(
    hidden_size=H, enc_layers=2, enc_ffn_kernel_size=3, ffn_act="gelu",
    dropout=0.1, num_heads=2, use_pos_embed=True, use_rope=True,
    audio_num_mel_bins=M, backbone_type="wavenet",
    backbone_args=Config(num_layers=4, num_channels=32, dilation_cycle_length=2),
    use_shallow_diffusion=True,
    shallow_diffusion_args=Config(
        aux_decoder_arch="convnext",
        aux_decoder_args=Config(num_channels=32, num_layers=2, kernel_size=7),
    ),
    use_spk_id=True, num_spk=3,
)

VARIANCE_CFG = Config(
    hidden_size=H, enc_layers=2, enc_ffn_kernel_size=3, ffn_act="gelu",
    dropout=0.1, num_heads=2, use_pos_embed=True, use_rope=True,
    predict_dur=True, predict_pitch=True,
    predict_energy=True, predict_breathiness=True,
    dur_prediction_args=Config(hidden_size=32, num_layers=2, kernel_size=3),
    pitch_prediction_args=Config(
        repeat_bins=8, backbone_type="wavenet",
        backbone_args=Config(num_layers=2, num_channels=32, dilation_cycle_length=2),
    ),
    variances_prediction_args=Config(
        total_repeat_bins=8, backbone_type="wavenet",
        backbone_args=Config(num_layers=2, num_channels=32, dilation_cycle_length=2),
    ),
    use_melody_encoder=True,
    melody_encoder_args=Config(hidden_size=32, enc_layers=1),
)


def _acoustic_inputs(rng):
    tokens = rng.integers(1, 10, size=(B, T_PH))
    tokens[:, -2:] = 0
    dur = np.zeros((B, T_PH), np.int32)
    dur[:, :5] = rng.integers(2, 6, size=(B, 5))
    from xiaoicesing_io_tpu.ops.seq import length_regulator

    mel2ph = np.asarray(length_regulator(jnp.asarray(dur), out_len=T_F))
    f0 = rng.uniform(100, 400, size=(B, T_F)).astype(np.float32)
    return jnp.asarray(tokens), jnp.asarray(mel2ph), jnp.asarray(f0)


def test_acoustic_model_shapes(rng):
    model = AcousticModel.from_config(ACOUSTIC_CFG, vocab_size=12)
    tokens, mel2ph, f0 = _acoustic_inputs(rng)
    x = jnp.zeros((B, 1, T_F, M))
    t = jnp.zeros((B,))
    spk = jnp.zeros((B,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens, mel2ph, f0, x, t, spk_embed_id=spk)
    cond = model.apply(params, tokens, mel2ph, f0, spk_embed_id=spk,
                       method=AcousticModel.condition)
    assert cond.shape == (B, T_F, H)
    aux = model.apply(params, cond, method=AcousticModel.aux_out)
    assert aux.shape == (B, T_F, M)
    out = model.apply(params, x, t, cond, method=AcousticModel.denoise)
    assert out.shape == (B, 1, T_F, M)
    # zero-init output projection -> zero denoiser output at init
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)
    # condition at padded frames (mel2ph==0) gets pitch/spk embeds only; check finite
    assert np.isfinite(np.asarray(cond)).all()


def test_acoustic_condition_padding_gather(rng):
    """Frames with mel2ph==0 must gather the zero row of encoder output."""
    model = AcousticModel.from_config(ACOUSTIC_CFG, vocab_size=12)
    tokens, mel2ph, f0 = _acoustic_inputs(rng)
    x = jnp.zeros((B, 1, T_F, M))
    spk = jnp.zeros((B,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens, mel2ph, f0, x, jnp.zeros((B,)),
                        spk_embed_id=spk)
    cond = model.apply(params, tokens, mel2ph, f0, spk_embed_id=spk,
                       method=AcousticModel.condition)
    cond2 = model.apply(params, tokens, jnp.zeros_like(mel2ph), f0, spk_embed_id=spk,
                        method=AcousticModel.condition)
    # with all-zero mel2ph the encoder contribution vanishes entirely
    # -> differences between two frames come only from f0
    c = np.asarray(cond2)
    same_f0 = np.isclose(np.asarray(f0)[:, :1], np.asarray(f0))
    assert c.shape == (B, T_F, H)


def test_lynxnet_backbone_shapes():
    bb = build_backbone(
        out_dims=M, num_feats=1, backbone_type="lynxnet",
        backbone_args={"num_layers": 2, "num_channels": 32, "strong_cond": True},
        cond_dims=H,
    )
    x = jnp.ones((B, 1, T_F, M))
    cond = jnp.ones((B, T_F, H))
    params = bb.init(jax.random.PRNGKey(0), x, jnp.zeros((B,)), cond)
    out = bb.apply(params, x, jnp.full((B,), 10.0), cond)
    assert out.shape == (B, 1, T_F, M)


def test_duration_predictor_clamp(rng):
    dp = DurationPredictor(n_layers=2, n_chans=16)
    xs = jnp.asarray(rng.standard_normal((B, T_PH, H)).astype(np.float32))
    masks = jnp.zeros((B, T_PH), bool)
    params = dp.init(jax.random.PRNGKey(0), xs, masks)
    out_inf = dp.apply(params, xs, masks, infer=True)
    assert (np.asarray(out_inf) >= 0).all()
    # padding rows give exp(0)-offset = 0 after mask
    masks_all = jnp.ones((B, T_PH), bool)
    out_pad = dp.apply(params, xs, masks_all, infer=True)
    np.testing.assert_allclose(np.asarray(out_pad), 0.0, atol=1e-6)


def test_variance_model_full_graph(rng):
    model = VarianceModel.from_config(VARIANCE_CFG, vocab_size=12)
    tokens = jnp.asarray(rng.integers(1, 10, size=(B, T_PH)))
    midi = jnp.asarray(rng.integers(40, 80, size=(B, T_PH)))
    ph2word = jnp.asarray(np.sort(rng.integers(1, 4, size=(B, T_PH)), axis=1))
    ph_dur = jnp.asarray(rng.integers(1, 5, size=(B, T_PH)))
    mel2ph = jnp.asarray(rng.integers(0, T_PH + 1, size=(B, T_F)))
    base_pitch = jnp.asarray(rng.uniform(40, 80, size=(B, T_F)).astype(np.float32))
    pitch = base_pitch + 1.0
    note_midi = jnp.asarray(rng.uniform(40, 80, size=(B, 4)).astype(np.float32))
    note_rest = jnp.zeros((B, 4), bool)
    note_dur = jnp.asarray(rng.integers(1, 9, size=(B, 4)))
    mel2note = jnp.asarray(rng.integers(0, 5, size=(B, T_F)))
    x_pitch = jnp.zeros((B, 1, T_F, 8))
    x_var = jnp.zeros((B, 2, T_F, 4))
    t = jnp.zeros((B,))
    variances = {
        "energy": jnp.asarray(rng.uniform(-60, -20, (B, T_F)).astype(np.float32)),
        "breathiness": jnp.asarray(rng.uniform(-60, -20, (B, T_F)).astype(np.float32)),
    }
    params = model.init(
        jax.random.PRNGKey(0), tokens, midi, ph2word, ph_dur, base_pitch, pitch,
        mel2ph, x_pitch=x_pitch, t=t, x_var=x_var, variances=variances,
        note_midi=note_midi, note_rest=note_rest, note_dur=note_dur, mel2note=mel2note,
    )
    outs = model.apply(
        params, tokens, midi, ph2word, ph_dur, base_pitch, pitch, mel2ph,
        x_pitch=x_pitch, t=t, x_var=x_var, variances=variances,
        note_midi=note_midi, note_rest=note_rest, note_dur=note_dur, mel2note=mel2note,
    )
    dur_pred, pitch_out, var_out = outs
    assert dur_pred.shape == (B, T_PH)
    assert pitch_out.shape == (B, 1, T_F, 8)
    assert var_out.shape == (B, 2, T_F, 4)


def test_variance_normalizers_roundtrip():
    norms = build_variance_normalizers(VARIANCE_CFG)
    pn = norms["pitch"]
    x = jnp.asarray(np.linspace(-7, 7, 48, dtype=np.float32).reshape(1, 48))
    normed = pn.norm(x)
    assert normed.shape == (1, 1, 48, 8)
    back = pn.denorm(normed)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)
    vn = norms["variances"]
    xs = [
        jnp.asarray(np.linspace(-90, -15, 48, dtype=np.float32).reshape(1, 48)),
        jnp.asarray(np.linspace(-90, -25, 48, dtype=np.float32).reshape(1, 48)),
    ]
    normed = vn.norm(xs)
    assert normed.shape == (1, 2, 48, 4)
    back = vn.denorm(normed)
    for a, b in zip(back, xs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_losses():
    from xiaoicesing_io_tpu.training.losses import (
        diffusion_loss,
        duration_loss,
        reflow_loss,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, 1, T_F, M)).astype(np.float32))
    n = jnp.asarray(rng.standard_normal((B, 1, T_F, M)).astype(np.float32))
    mask = jnp.ones((B, T_F))
    l = diffusion_loss(x, n, mask)
    np.testing.assert_allclose(float(l), float(jnp.mean((x - n) ** 2)), rtol=1e-6)
    t = jnp.asarray([0.3, 0.7])
    lr = reflow_loss(x, n, t, mask, log_norm=True)
    assert np.isfinite(float(lr))
    dur_pred = jnp.asarray(rng.uniform(0, 5, (B, T_PH)).astype(np.float32))
    dur_gt = jnp.asarray(rng.integers(0, 5, (B, T_PH)))
    ph2word = jnp.asarray(np.sort(rng.integers(1, 4, (B, T_PH)), axis=1))
    dl = duration_loss(dur_pred, dur_gt, ph2word)
    assert np.isfinite(float(dl))
    # loss is zero when prediction equals target
    dl0 = duration_loss(dur_gt.astype(jnp.float32), dur_gt, ph2word)
    np.testing.assert_allclose(float(dl0), 0.0, atol=1e-10)


def test_discrete_f0_embed_parity():
    """Legacy ``f0_embed_type: discrete`` coarse quantization matches the
    reference formula (deployment/modules/fastspeech2.py:21-28), and the
    converter maps a legacy [256, H] embedding table onto the flax Embed."""
    import torch

    from xiaoicesing_io_tpu.models.fastspeech.acoustic import f0_to_coarse

    rng = np.random.default_rng(3)
    f0_np = rng.uniform(0, 1100, size=(2, 64)).astype(np.float32)
    f0_np[0, :8] = 0.0  # unvoiced

    f0_bin, f0_min, f0_max = 256, 50.0, 1100.0
    f0_mel_min = 1127 * np.log(1 + f0_min / 700)
    f0_mel_max = 1127 * np.log(1 + f0_max / 700)
    f0_t = torch.from_numpy(f0_np)
    f0_mel = 1127 * (1 + f0_t / 700).log()
    a = (f0_bin - 2) / (f0_mel_max - f0_mel_min)
    b = f0_mel_min * a - 1.0
    f0_mel = torch.where(f0_mel > 0, f0_mel * a - b, f0_mel)
    torch.clip_(f0_mel, min=1.0, max=float(f0_bin - 1))
    ref = torch.round(f0_mel).long().numpy()

    ours = np.asarray(f0_to_coarse(jnp.asarray(f0_np)))
    np.testing.assert_array_equal(ours, ref)

    # converter: a bias-free [256, H] fs2.pitch_embed lands as an Embed table
    from xiaoicesing_io_tpu.utils import torch_ckpt

    H = 16
    table = torch.randn(256, H)
    sd = {
        "fs2.txt_embed.weight": torch.randn(8, H),
        "fs2.dur_embed.weight": torch.randn(H, 1),
        "fs2.dur_embed.bias": torch.randn(H),
        "fs2.pitch_embed.weight": table,
    }
    emb = torch_ckpt.embedding(sd, "fs2.pitch_embed")
    np.testing.assert_allclose(emb["embedding"], table.numpy())

    # model forward with discrete embed runs and differs from continuous
    model = FastSpeech2Acoustic(
        vocab_size=8, hidden_size=H, enc_layers=1, num_heads=2,
        f0_embed_type="discrete",
    )
    tokens = jnp.asarray(rng.integers(1, 8, size=(2, 6)).astype(np.int32))
    mel2ph = jnp.asarray(np.sort(rng.integers(1, 7, size=(2, 64))).astype(np.int32))
    params = model.init(jax.random.PRNGKey(0), tokens, mel2ph, jnp.asarray(f0_np))
    assert params["params"]["pitch_embed"]["embedding"].shape == (256, H)
    cond = model.apply(params, tokens, mel2ph, jnp.asarray(f0_np))
    assert np.isfinite(np.asarray(cond)).all()


def test_vocoder_registry_reference_semantics():
    """Reference registry semantics (ref modules/vocoders/registry.py:8-21):
    class-name AND lowercase keys, dotted-path fallback, clean error."""
    import pytest

    from xiaoicesing_io_tpu.models.vocoders import get_vocoder_cls
    import xiaoicesing_io_tpu.models.vocoders.wrapper  # noqa: F401  (registers)

    assert get_vocoder_cls("NsfHifiGAN") is get_vocoder_cls("nsfhifigan")
    cls = get_vocoder_cls("xiaoicesing_io_tpu.models.vocoders.wrapper.NsfHifiGAN")
    assert cls is get_vocoder_cls("NsfHifiGAN")
    with pytest.raises(KeyError, match="unknown vocoder"):
        get_vocoder_cls("nsf_hifigan")
