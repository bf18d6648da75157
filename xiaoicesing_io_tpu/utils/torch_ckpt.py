"""PyTorch checkpoint -> JAX param-pytree conversion.

Loads reference-format checkpoints (DiffSinger ``model_ckpt_steps_*.ckpt``
Lightning files and NSF-HiFiGAN ``model.ckpt``) and maps tensor names/layouts
onto this framework's flax parameter trees.

Layout rules:
* torch ``Linear``  W [out, in]        -> Dense kernel [in, out] = W.T
* torch ``Conv1d``  W [out, in, k]     -> flax Conv kernel [k, in, out]
* torch depthwise Conv1d W [C, 1, k]   -> flax kernel [k, 1, C]
* torch ``ConvTranspose1d`` W [in, out, k] -> our kernel [k, in, out] with
  taps flipped (see models/vocoders/nsf_hifigan.py ConvTranspose1d)
* torch ``Embedding`` W                -> Embed embedding (unchanged)
* torch ``LayerNorm`` weight/bias      -> scale/bias

Reference naming is documented inline with file:line citations so parity can
be audited.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def _np(t):
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _join(prefix: str, name: str) -> str:
    return f"{prefix}.{name}" if prefix else name


def linear(sd, name):
    out = {"kernel": _np(sd[f"{name}.weight"]).T}
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def conv1d(sd, name):
    w = _np(sd[f"{name}.weight"])  # [out, in, k]
    out = {"kernel": w.transpose(2, 1, 0)}
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def conv1d_as_dense(sd, name):
    """1x1 Conv1d -> Dense."""
    w = _np(sd[f"{name}.weight"])  # [out, in, 1]
    out = {"kernel": w[:, :, 0].T}
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def conv_transpose1d(sd, name):
    w = _np(sd[f"{name}.weight"])  # [in, out, k]
    kernel = w[:, :, ::-1].transpose(2, 0, 1)  # [k, in, out], taps flipped
    out = {"kernel": np.ascontiguousarray(kernel)}
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def embedding(sd, name):
    return {"embedding": _np(sd[f"{name}.weight"])}


def layer_norm(sd, name):
    return {"scale": _np(sd[f"{name}.weight"]), "bias": _np(sd[f"{name}.bias"])}


# ---------------------------------------------------------------------------
# FastSpeech2 encoder (ref: modules/fastspeech/tts_modules.py:353-428,
# modules/commons/common_layers.py:120-263)
# ---------------------------------------------------------------------------

def convert_fs2_encoder(sd, prefix: str, num_layers: int) -> Dict:
    out = {}
    for i in range(num_layers):
        lp = f"{prefix}.layers.{i}.op"
        layer = {
            "layer_norm1": layer_norm(sd, f"{lp}.layer_norm1"),
            "layer_norm2": layer_norm(sd, f"{lp}.layer_norm2"),
        }
        # attention: torch MultiheadAttention packs in_proj_weight [3C, C];
        # the RoPE variant uses in_proj.weight (common_layers.py:162,223)
        if f"{lp}.self_attn.in_proj_weight" in sd:
            w_in = _np(sd[f"{lp}.self_attn.in_proj_weight"])
        else:
            w_in = _np(sd[f"{lp}.self_attn.in_proj.weight"])
        layer["self_attn"] = {
            "in_proj": {"kernel": w_in.T},
            "out_proj": {"kernel": _np(sd[f"{lp}.self_attn.out_proj.weight"]).T},
        }
        layer["ffn"] = {
            "ffn_1": conv1d(sd, f"{lp}.ffn.ffn_1"),
            "ffn_2": linear(sd, f"{lp}.ffn.ffn_2"),
        }
        out[f"layers_{i}"] = layer
    out["layer_norm"] = layer_norm(sd, f"{prefix}.layer_norm")
    return out


# ---------------------------------------------------------------------------
# Denoiser backbones
# ---------------------------------------------------------------------------

def convert_wavenet(sd, prefix: str, num_layers: int) -> Dict:
    """ref: modules/backbones/wavenet.py:51-107."""
    out = {
        "input_projection": conv1d_as_dense(sd, _join(prefix, "input_projection")),
        "mlp_0": linear(sd, _join(prefix, "mlp.0")),
        "mlp_2": linear(sd, _join(prefix, "mlp.2")),
        "skip_projection": conv1d_as_dense(sd, _join(prefix, "skip_projection")),
        "output_projection": conv1d_as_dense(sd, _join(prefix, "output_projection")),
    }
    for i in range(num_layers):
        lp = _join(prefix, f"residual_layers.{i}")
        out[f"residual_layers_{i}"] = {
            "dilated_conv": conv1d(sd, f"{lp}.dilated_conv"),
            "diffusion_projection": linear(sd, f"{lp}.diffusion_projection"),
            "conditioner_projection": conv1d_as_dense(sd, f"{lp}.conditioner_projection"),
            "output_projection": conv1d_as_dense(sd, f"{lp}.output_projection"),
        }
    return out


def convert_lynxnet(sd, prefix: str, num_layers: int) -> Dict:
    """ref: modules/backbones/lynxnet.py:90-163. torch Sequential indices:
    diffusion_embedding = [SinusoidalPosEmb, Linear(1), GELU, Linear(3)];
    convmodule.net = [LN(0), Transpose, Conv1x1(2), SwiGLU, DWConv(4),
    PReLU(5), Conv1x1(6), Transpose, Dropout]."""
    out = {
        "input_projection": conv1d_as_dense(sd, _join(prefix, "input_projection")),
        "diff_mlp_0": linear(sd, _join(prefix, "diffusion_embedding.1")),
        "diff_mlp_1": linear(sd, _join(prefix, "diffusion_embedding.3")),
        "norm": layer_norm(sd, _join(prefix, "norm")),
        "output_projection": conv1d_as_dense(sd, _join(prefix, "output_projection")),
    }
    for i in range(num_layers):
        lp = _join(prefix, f"residual_layers.{i}")
        cm = f"{lp}.convmodule.net"
        dw = _np(sd[f"{cm}.4.weight"])  # [inner, 1, k]
        layer = {
            "diffusion_projection": conv1d_as_dense(sd, f"{lp}.diffusion_projection"),
            "conditioner_projection": conv1d_as_dense(sd, f"{lp}.conditioner_projection"),
            "convmodule": {
                "norm": layer_norm(sd, f"{cm}.0"),
                "pw_in": conv1d_as_dense(sd, f"{cm}.2"),
                "dw_conv": {
                    "kernel": dw.transpose(2, 1, 0),
                    "bias": _np(sd[f"{cm}.4.bias"]),
                },
                "pw_out": conv1d_as_dense(sd, f"{cm}.6"),
            },
        }
        if f"{cm}.5.weight" in sd:  # PReLU
            layer["convmodule"]["act"] = {"alpha": _np(sd[f"{cm}.5.weight"])}
        out[f"residual_layers_{i}"] = layer
    return out


def convert_backbone(sd, prefix: str, backbone_type: str, num_layers: int) -> Dict:
    if backbone_type == "wavenet":
        return convert_wavenet(sd, prefix, num_layers)
    if backbone_type == "lynxnet":
        return convert_lynxnet(sd, prefix, num_layers)
    raise NotImplementedError(backbone_type)


# ---------------------------------------------------------------------------
# ConvNeXt aux decoder (ref: modules/aux_decoder/convnext.py)
# ---------------------------------------------------------------------------

def convert_convnext(sd, prefix: str, num_layers: int) -> Dict:
    out = {
        "inconv": conv1d(sd, _join(prefix, "inconv")),
        "outconv": conv1d(sd, _join(prefix, "outconv")),
    }
    for i in range(num_layers):
        lp = _join(prefix, f"conv.{i}")
        dw = _np(sd[f"{lp}.dwconv.weight"])  # [C, 1, 7]
        out[f"conv_{i}"] = {
            "dwconv": {"kernel": dw.transpose(2, 1, 0), "bias": _np(sd[f"{lp}.dwconv.bias"])},
            "norm": layer_norm(sd, f"{lp}.norm"),
            "pwconv1": linear(sd, f"{lp}.pwconv1"),
            "pwconv2": linear(sd, f"{lp}.pwconv2"),
            "gamma": _np(sd[f"{lp}.gamma"]),
        }
    return out


# ---------------------------------------------------------------------------
# Acoustic model (ref: modules/toplevel.py:32-121,
# modules/fastspeech/acoustic_encoder.py)
# ---------------------------------------------------------------------------

def convert_acoustic(state_dict: Dict, cfg) -> Dict:
    """torch state_dict (with 'model.' prefix stripped or present) -> params."""
    sd = {k.removeprefix("model."): v for k, v in state_dict.items()}
    fs2 = {
        "txt_embed": embedding(sd, "fs2.txt_embed"),
        "dur_embed": linear(sd, "fs2.dur_embed"),
        # legacy ckpts (f0_embed_type: discrete) store a [256, H] embedding
        # table instead of a Linear(1, H) (ref: deployment/modules/fastspeech2.py:48-51)
        "pitch_embed": (
            embedding(sd, "fs2.pitch_embed")
            if sd["fs2.pitch_embed.weight"].dim() == 2
            and sd["fs2.pitch_embed.weight"].shape[1] != 1
            and "fs2.pitch_embed.bias" not in sd
            else linear(sd, "fs2.pitch_embed")
        ),
        "encoder": convert_fs2_encoder(sd, "fs2.encoder", cfg.get("enc_layers", 4)),
    }
    for v in ("energy", "breathiness", "voicing", "tension"):
        if f"fs2.variance_embeds.{v}.weight" in sd:
            fs2[f"variance_embed_{v}"] = linear(sd, f"fs2.variance_embeds.{v}")
    if "fs2.key_shift_embed.weight" in sd:
        fs2["key_shift_embed"] = linear(sd, "fs2.key_shift_embed")
    if "fs2.speed_embed.weight" in sd:
        fs2["speed_embed"] = linear(sd, "fs2.speed_embed")
    if "fs2.spk_embed.weight" in sd:
        fs2["spk_embed"] = embedding(sd, "fs2.spk_embed")

    backbone_type = cfg.get("backbone_type", "wavenet")
    n_layers = cfg.get("backbone_args", {}).get("num_layers", 20)
    # ddpm names its net denoise_fn; rectified flow names it velocity_fn
    net = "denoise_fn" if any(
        k.startswith("diffusion.denoise_fn.") for k in sd
    ) else "velocity_fn"
    params = {
        "fs2": fs2,
        "backbone": convert_backbone(sd, f"diffusion.{net}", backbone_type, n_layers),
    }
    if any(k.startswith("aux_decoder.") for k in sd):
        shallow = cfg.get("shallow_diffusion_args", {})
        params["aux_decoder"] = convert_convnext(
            sd, "aux_decoder.decoder",
            shallow.get("aux_decoder_args", {}).get("num_layers", 6),
        )
    return {"params": params}


# ---------------------------------------------------------------------------
# Variance model (ref: modules/toplevel.py:124-306)
# ---------------------------------------------------------------------------

def convert_variance(state_dict: Dict, cfg) -> Dict:
    sd = {k.removeprefix("model."): v for k, v in state_dict.items()}
    fs2 = {
        "txt_embed": embedding(sd, "fs2.txt_embed"),
        "encoder": convert_fs2_encoder(sd, "fs2.encoder", cfg.get("enc_layers", 4)),
    }
    if "fs2.onset_embed.weight" in sd:
        fs2["onset_embed"] = embedding(sd, "fs2.onset_embed")
        fs2["word_dur_embed"] = linear(sd, "fs2.word_dur_embed")
    if "fs2.ph_dur_embed.weight" in sd:
        fs2["ph_dur_embed"] = linear(sd, "fs2.ph_dur_embed")
    if "fs2.midi_embed.weight" in sd:
        fs2["midi_embed"] = embedding(sd, "fs2.midi_embed")
    if any(k.startswith("fs2.dur_predictor.") for k in sd):
        dur_args = cfg.get("dur_prediction_args", {})
        dp = {"linear": linear(sd, "fs2.dur_predictor.linear")}
        for i in range(dur_args.get("num_layers", 5)):
            # torch Sequential: [Identity, Conv1d(1), ReLU, LayerNorm(3), Dropout]
            dp[f"conv_{i}"] = conv1d(sd, f"fs2.dur_predictor.conv.{i}.1")
            dp[f"ln_{i}"] = layer_norm(sd, f"fs2.dur_predictor.conv.{i}.3")
        fs2["dur_predictor"] = dp

    params: Dict = {"fs2": fs2}
    if "spk_embed.weight" in sd:
        params["spk_embed"] = embedding(sd, "spk_embed")
    if "pitch_retake_embed.weight" in sd:
        params["pitch_retake_embed"] = embedding(sd, "pitch_retake_embed")
    if "base_pitch_embed.weight" in sd:
        params["base_pitch_embed"] = linear(sd, "base_pitch_embed")
    if "delta_pitch_embed.weight" in sd:
        params["delta_pitch_embed"] = linear(sd, "delta_pitch_embed")
    if "pitch_embed.weight" in sd:
        params["pitch_embed"] = linear(sd, "pitch_embed")
    for v in ("energy", "breathiness", "voicing", "tension"):
        if f"variance_embeds.{v}.weight" in sd:
            params[f"variance_embed_{v}"] = linear(sd, f"variance_embeds.{v}")

    def _net(prefix):
        return "denoise_fn" if any(
            k.startswith(f"{prefix}.denoise_fn.") for k in sd
        ) else "velocity_fn"

    if any(k.startswith("pitch_predictor.") for k in sd):
        pargs = cfg.get("pitch_prediction_args", {})
        params["pitch_backbone"] = convert_backbone(
            sd, f"pitch_predictor.{_net('pitch_predictor')}",
            pargs.get("backbone_type", "wavenet"),
            pargs.get("backbone_args", {}).get("num_layers", 20),
        )
    if any(k.startswith("variance_predictor.") for k in sd):
        vargs = cfg.get("variances_prediction_args", {})
        params["variance_backbone"] = convert_backbone(
            sd, f"variance_predictor.{_net('variance_predictor')}",
            vargs.get("backbone_type", "wavenet"),
            vargs.get("backbone_args", {}).get("num_layers", 10),
        )
    if any(k.startswith("melody_encoder.") for k in sd):
        margs = cfg.get("melody_encoder_args", {})
        me = {
            "note_midi_embed": linear(sd, "melody_encoder.note_midi_embed"),
            "note_dur_embed": linear(sd, "melody_encoder.note_dur_embed"),
            "encoder": convert_fs2_encoder(
                sd, "melody_encoder.encoder", margs.get("enc_layers", 4)
            ),
            "out_proj": linear(sd, "melody_encoder.out_proj"),
        }
        if "melody_encoder.note_glide_embed.weight" in sd:
            me["note_glide_embed"] = embedding(sd, "melody_encoder.note_glide_embed")
        params["melody_encoder"] = me
    return {"params": params}


# ---------------------------------------------------------------------------
# NSF-HiFiGAN generator (ref: modules/nsf_hifigan/models.py:206-300; weights
# loaded AFTER remove_weight_norm so plain .weight tensors exist)
# ---------------------------------------------------------------------------

def convert_nsf_hifigan(state_dict: Dict, config) -> Dict:
    sd = dict(state_dict)
    # merge weight-norm factors if present (training checkpoints keep
    # weight_g/weight_v; inference checkpoints are already merged)
    merged = {}
    for k in list(sd.keys()):
        if k.endswith("weight_v"):
            base = k[: -len("weight_v")]
            g = _np(sd[base + "weight_g"])
            v = _np(sd[k])
            norm = np.sqrt((v ** 2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
            merged[base + "weight"] = g * v / np.maximum(norm, 1e-12)
    sd.update({k: v for k, v in merged.items()})

    num_kernels = len(config.resblock_kernel_sizes)
    params = {
        "conv_pre": conv1d(sd, "conv_pre"),
        "conv_post": conv1d(sd, "conv_post"),
    }
    for i in range(len(config.upsample_rates)):
        params[f"ups_{i}"] = conv_transpose1d(sd, f"ups.{i}")
        if not config.mini_nsf:
            params[f"noise_convs_{i}"] = conv1d(sd, f"noise_convs.{i}")
    if config.mini_nsf:
        params["source_conv"] = conv1d(sd, "source_conv")
    else:
        params["source_linear"] = linear(sd, "m_source.l_linear")
    n_blocks = len(config.upsample_rates) * num_kernels
    for bi in range(n_blocks):
        block = {}
        if config.resblock == "1":
            for j in range(3):
                block[f"convs1_{j}"] = conv1d(sd, f"resblocks.{bi}.convs1.{j}")
                block[f"convs2_{j}"] = conv1d(sd, f"resblocks.{bi}.convs2.{j}")
        else:
            for j in range(2):
                block[f"convs_{j}"] = conv1d(sd, f"resblocks.{bi}.convs.{j}")
        params[f"resblocks_{bi}"] = block
    return {"params": params}


def load_torch_file(path):
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


# ---------------------------------------------------------------------------
# RMVPE pitch extractor (ref: modules/pe/rmvpe/{model,deepunet,seq}.py)
# ---------------------------------------------------------------------------

def conv2d(sd, name):
    w = _np(sd[f"{name}.weight"])  # [out, in, kh, kw]
    out = {"kernel": w.transpose(2, 3, 1, 0)}
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def batch_norm2d(sd, name):
    return {
        "scale": _np(sd[f"{name}.weight"]),
        "bias": _np(sd[f"{name}.bias"]),
        "mean": _np(sd[f"{name}.running_mean"]),
        "var": _np(sd[f"{name}.running_var"]),
    }


def _conv_block_res(sd, prefix):
    out = {
        "conv1": {"kernel": _np(sd[f"{prefix}.conv.0.weight"]).transpose(2, 3, 1, 0)},
        "bn1": batch_norm2d(sd, f"{prefix}.conv.1"),
        "conv2": {"kernel": _np(sd[f"{prefix}.conv.3.weight"]).transpose(2, 3, 1, 0)},
        "bn2": batch_norm2d(sd, f"{prefix}.conv.4"),
    }
    if f"{prefix}.shortcut.weight" in sd:
        out["shortcut"] = conv2d(sd, f"{prefix}.shortcut")
    return out


def convert_rmvpe(state_dict, en_de_layers: int = 5, inter_layers: int = 4,
                  n_blocks: int = 4) -> Dict:
    sd = dict(state_dict)
    params: Dict = {"in_bn": batch_norm2d(sd, "unet.encoder.bn")}
    for i in range(en_de_layers):
        params[f"enc_{i}"] = {
            f"conv_{j}": _conv_block_res(sd, f"unet.encoder.layers.{i}.conv.{j}")
            for j in range(n_blocks)
        }
    for i in range(inter_layers):
        params[f"inter_{i}"] = {
            f"conv_{j}": _conv_block_res(sd, f"unet.intermediate.layers.{i}.conv.{j}")
            for j in range(n_blocks)
        }
    for i in range(en_de_layers):
        dp = f"unet.decoder.layers.{i}"
        w = _np(sd[f"{dp}.conv1.0.weight"])  # ConvTranspose2d [in, out, kh, kw]
        layer = {
            "tconv_kernel": np.ascontiguousarray(
                w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
            ),
            "tbn": batch_norm2d(sd, f"{dp}.conv1.1"),
        }
        for j in range(n_blocks):
            layer[f"conv_{j}"] = _conv_block_res(sd, f"{dp}.conv2.{j}")
        params[f"dec_{i}"] = layer
    params["cnn"] = conv2d(sd, "cnn")
    gru = {}
    for direction, tname in (("fwd", ""), ("bwd", "_reverse")):
        gru[direction] = {
            "w_ih": _np(sd[f"fc.0.gru.weight_ih_l0{tname}"]).T,
            "w_hh": _np(sd[f"fc.0.gru.weight_hh_l0{tname}"]).T,
            "b_ih": _np(sd[f"fc.0.gru.bias_ih_l0{tname}"]),
            "b_hh": _np(sd[f"fc.0.gru.bias_hh_l0{tname}"]),
        }
    params["gru"] = gru
    params["fc"] = linear(sd, "fc.1")
    return {"params": params}


# ---------------------------------------------------------------------------
# Vocal-remover CascadedNet (ref: modules/hnsep/vr/{nets,layers}.py)
# ---------------------------------------------------------------------------

def _conv_bn_activ(sd, prefix):
    return {
        "conv": {"kernel": _np(sd[f"{prefix}.conv.0.weight"]).transpose(2, 3, 1, 0)},
        "bn": batch_norm2d(sd, f"{prefix}.conv.1"),
    }


def _vr_encoder(sd, prefix):
    return {
        "conv1": _conv_bn_activ(sd, f"{prefix}.conv1"),
        "conv2": _conv_bn_activ(sd, f"{prefix}.conv2"),
    }


def _vr_decoder(sd, prefix):
    return {"conv1": _conv_bn_activ(sd, f"{prefix}.conv1")}


def _vr_aspp(sd, prefix):
    return {
        "conv1": _conv_bn_activ(sd, f"{prefix}.conv1.1"),
        "conv2": _conv_bn_activ(sd, f"{prefix}.conv2"),
        "conv3": _conv_bn_activ(sd, f"{prefix}.conv3"),
        "conv4": _conv_bn_activ(sd, f"{prefix}.conv4"),
        "conv5": _conv_bn_activ(sd, f"{prefix}.conv5"),
        "bottleneck": _conv_bn_activ(sd, f"{prefix}.bottleneck"),
    }


def _lstm_dir(sd, prefix, suffix):
    return {
        "w_ih": _np(sd[f"{prefix}.lstm.weight_ih_l0{suffix}"]).T,
        "w_hh": _np(sd[f"{prefix}.lstm.weight_hh_l0{suffix}"]).T,
        "b_ih": _np(sd[f"{prefix}.lstm.bias_ih_l0{suffix}"]),
        "b_hh": _np(sd[f"{prefix}.lstm.bias_hh_l0{suffix}"]),
    }


def _vr_lstm_module(sd, prefix):
    return {
        "conv": _conv_bn_activ(sd, f"{prefix}.conv"),
        "fwd": _lstm_dir(sd, prefix, ""),
        "bwd": _lstm_dir(sd, prefix, "_reverse"),
        "dense": linear(sd, f"{prefix}.dense.0"),
        "dense_bn": {
            "scale": _np(sd[f"{prefix}.dense.1.weight"]),
            "bias": _np(sd[f"{prefix}.dense.1.bias"]),
            "mean": _np(sd[f"{prefix}.dense.1.running_mean"]),
            "var": _np(sd[f"{prefix}.dense.1.running_var"]),
        },
    }


def _vr_basenet(sd, prefix):
    return {
        "enc1": _conv_bn_activ(sd, f"{prefix}.enc1"),
        "enc2": _vr_encoder(sd, f"{prefix}.enc2"),
        "enc3": _vr_encoder(sd, f"{prefix}.enc3"),
        "enc4": _vr_encoder(sd, f"{prefix}.enc4"),
        "enc5": _vr_encoder(sd, f"{prefix}.enc5"),
        "aspp": _vr_aspp(sd, f"{prefix}.aspp"),
        "dec4": _vr_decoder(sd, f"{prefix}.dec4"),
        "dec3": _vr_decoder(sd, f"{prefix}.dec3"),
        "dec2": _vr_decoder(sd, f"{prefix}.dec2"),
        "lstm_dec2": _vr_lstm_module(sd, f"{prefix}.lstm_dec2"),
        "dec1": _vr_decoder(sd, f"{prefix}.dec1"),
    }


def convert_cascaded_net(state_dict) -> Dict:
    sd = dict(state_dict)
    params = {
        "stg1_low": _vr_basenet(sd, "stg1_low_band_net.0"),
        "stg1_low_out": _conv_bn_activ(sd, "stg1_low_band_net.1"),
        "stg1_high": _vr_basenet(sd, "stg1_high_band_net"),
        "stg2_low": _vr_basenet(sd, "stg2_low_band_net.0"),
        "stg2_low_out": _conv_bn_activ(sd, "stg2_low_band_net.1"),
        "stg2_high": _vr_basenet(sd, "stg2_high_band_net"),
        "stg3_full": _vr_basenet(sd, "stg3_full_band_net"),
        "out": {"kernel": _np(sd["out.weight"]).transpose(2, 3, 1, 0)},
    }
    return {"params": params}
