"""Vocal-remover harmonic/noise separator (CascadedNet, JAX port).

Capability parity with ``/root/reference/modules/hnsep/vr/``: a band-split
cascaded 2D CNN over the complex STFT (real/imag stacked as channels),
ASPP dilation pyramid, BiLSTM bottleneck, bounded complex mask output; used
as ``hnsep: vr`` to predict the harmonic part of a waveform (aperiodic =
residual).

Layout: NHWC with H = frequency bins, W = time frames (matching the torch
NCHW semantics).  Bilinear upsampling uses align_corners=True semantics via
precomputed interpolation matrices (static shapes -> MXU matmuls).
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class BatchNorm(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        mean = self.param("mean", nn.initializers.zeros, (self.channels,))
        var = self.param("var", nn.initializers.ones, (self.channels,))
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias


class Conv2DBNActiv(nn.Module):
    nout: int
    ksize: int = 3
    stride: int = 1
    pad: Any = 1
    dilation: Any = 1
    activ: str = "relu"

    @nn.compact
    def __call__(self, x):
        # pad/dilation may be per-axis (h, w) tuples, e.g. the anisotropic
        # ASPP dilations (ref: nets.py:10 dilations=((4,2),(8,4),(12,6)))
        pad = self.pad if isinstance(self.pad, (tuple, list)) else (self.pad, self.pad)
        dil = (
            self.dilation
            if isinstance(self.dilation, (tuple, list))
            else (self.dilation, self.dilation)
        )
        x = nn.Conv(
            self.nout, (self.ksize, self.ksize), strides=(self.stride, self.stride),
            padding=[(pad[0], pad[0]), (pad[1], pad[1])],
            kernel_dilation=tuple(dil), use_bias=False,
            name="conv",
        )(x)
        x = BatchNorm(self.nout, name="bn")(x)
        if self.activ == "relu":
            return jax.nn.relu(x)
        if self.activ == "leaky_relu":
            return jnp.where(x >= 0, x, 0.01 * x)
        raise ValueError(self.activ)


class Encoder(nn.Module):
    nout: int
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        x = Conv2DBNActiv(self.nout, 3, self.stride, 1, activ="leaky_relu",
                          name="conv1")(x)
        x = Conv2DBNActiv(self.nout, 3, 1, 1, activ="leaky_relu", name="conv2")(x)
        return x


@functools.lru_cache(maxsize=64)
def _bilinear_matrix(n_in: int, n_out: int) -> np.ndarray:
    """align_corners=True bilinear interpolation matrix [n_out, n_in]."""
    if n_in == 1:
        return np.ones((n_out, 1), np.float32)
    src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    lo = np.floor(src).astype(int)
    hi = np.minimum(lo + 1, n_in - 1)
    w = (src - lo).astype(np.float32)
    m = np.zeros((n_out, n_in), np.float32)
    m[np.arange(n_out), lo] += 1 - w
    np.add.at(m, (np.arange(n_out), hi), w)
    return m


def upsample2_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, 2H, 2W, C] (torch F.interpolate align_corners=True)."""
    B, H, W, C = x.shape
    mh = jnp.asarray(_bilinear_matrix(H, 2 * H))
    mw = jnp.asarray(_bilinear_matrix(W, 2 * W))
    x = jnp.einsum("oh,bhwc->bowc", mh, x)
    x = jnp.einsum("ow,bhwc->bhoc", mw, x)
    return x


class Decoder(nn.Module):
    nout: int

    @nn.compact
    def __call__(self, x, skip=None):
        x = upsample2_bilinear(x)
        if skip is not None:
            # crop_center over the time axis (layers.py:6-21)
            if skip.shape[2] != x.shape[2]:
                s = (skip.shape[2] - x.shape[2]) // 2
                skip = skip[:, :, s : s + x.shape[2]]
            x = jnp.concatenate([x, skip], axis=-1)
        return Conv2DBNActiv(self.nout, 3, 1, 1, name="conv1")(x)


class ASPPModule(nn.Module):
    """Anisotropic dilations: (freq, time) pairs (ref: nets.py:10)."""

    nout: int
    dilations: Tuple[Tuple[int, int], ...] = ((4, 2), (8, 4), (12, 6))

    @nn.compact
    def __call__(self, x):
        H = x.shape[1]
        f1 = jnp.mean(x, axis=1, keepdims=True)
        f1 = Conv2DBNActiv(self.nout, 1, 1, 0, name="conv1")(f1)
        f1 = jnp.repeat(f1, H, axis=1)
        f2 = Conv2DBNActiv(self.nout, 1, 1, 0, name="conv2")(x)
        f3 = Conv2DBNActiv(self.nout, 3, 1, self.dilations[0], self.dilations[0],
                           name="conv3")(x)
        f4 = Conv2DBNActiv(self.nout, 3, 1, self.dilations[1], self.dilations[1],
                           name="conv4")(x)
        f5 = Conv2DBNActiv(self.nout, 3, 1, self.dilations[2], self.dilations[2],
                           name="conv5")(x)
        out = jnp.concatenate([f1, f2, f3, f4, f5], axis=-1)
        return Conv2DBNActiv(self.nout, 1, 1, 0, name="bottleneck")(out)


class LSTMTorch(nn.Module):
    """torch nn.LSTM single layer, one direction; seq-first inputs."""

    hidden: int

    @nn.compact
    def __call__(self, xs):
        """xs: [T, B, F] -> [T, B, H]"""
        Hn = self.hidden
        w_ih = self.param("w_ih", nn.initializers.normal(0.02), (xs.shape[-1], 4 * Hn))
        w_hh = self.param("w_hh", nn.initializers.normal(0.02), (Hn, 4 * Hn))
        b_ih = self.param("b_ih", nn.initializers.zeros, (4 * Hn,))
        b_hh = self.param("b_hh", nn.initializers.zeros, (4 * Hn,))
        x_proj = xs @ w_ih + b_ih

        def step(carry, x_t):
            h, c = carry
            gates = x_t + h @ w_hh + b_hh
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
            g = jnp.tanh(g)
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        B = xs.shape[1]
        init = (jnp.zeros((B, Hn), xs.dtype), jnp.zeros((B, Hn), xs.dtype))
        _, ys = jax.lax.scan(step, init, x_proj)
        return ys


class LSTMModule(nn.Module):
    nin_lstm: int
    nout_lstm: int

    @nn.compact
    def __call__(self, x):
        """x: [B, H, W, C] -> [B, H(=nin_lstm), W, 1]"""
        B, Hb, W, C = x.shape
        h = Conv2DBNActiv(1, 1, 1, 0, name="conv")(x)[..., 0]  # [B, H, W]
        h = jnp.transpose(h, (2, 0, 1))  # [W(=frames), B, H(bins)]
        half = self.nout_lstm // 2
        fwd = LSTMTorch(half, name="fwd")(h)
        bwd = LSTMTorch(half, name="bwd")(h[::-1])[::-1]
        h = jnp.concatenate([fwd, bwd], axis=-1)  # [W, B, nout_lstm]
        h = nn.Dense(self.nin_lstm, name="dense")(h)
        h = BatchNorm(self.nin_lstm, name="dense_bn")(h)
        h = jax.nn.relu(h)
        h = jnp.transpose(h, (1, 2, 0))[:, :, None, :]  # [B, nbins, 1, W]
        return jnp.transpose(h, (0, 1, 3, 2))  # -> [B, nbins, W, 1] NHWC


class BaseNet(nn.Module):
    nout: int
    nin_lstm: int
    nout_lstm: int

    @nn.compact
    def __call__(self, x):
        e1 = Conv2DBNActiv(self.nout, 3, 1, 1, name="enc1")(x)
        e2 = Encoder(self.nout * 2, name="enc2")(e1)
        e3 = Encoder(self.nout * 4, name="enc3")(e2)
        e4 = Encoder(self.nout * 6, name="enc4")(e3)
        e5 = Encoder(self.nout * 8, name="enc5")(e4)
        h = ASPPModule(self.nout * 8, name="aspp")(e5)
        h = Decoder(self.nout * 6, name="dec4")(h, e4)
        h = Decoder(self.nout * 4, name="dec3")(h, e3)
        h = Decoder(self.nout * 2, name="dec2")(h, e2)
        lstm_out = LSTMModule(self.nin_lstm, self.nout_lstm, name="lstm_dec2")(h)
        h = jnp.concatenate([h, lstm_out], axis=-1)
        h = Decoder(self.nout, name="dec1")(h, e1)
        return h


class CascadedNet(nn.Module):
    """ref: nets.py:45-123 (is_complex=True)."""

    n_fft: int
    nout: int = 32
    nout_lstm: int = 128
    is_mono: bool = False

    @nn.compact
    def __call__(self, spec_ri: jnp.ndarray) -> jnp.ndarray:
        """spec_ri: [B, 2*C, F_bins, T] real/imag channels (C=1 mono).

        Returns the complex mask as [B, 2*C, F_bins, T] real/imag channels.
        """
        nin = 2 if self.is_mono else 4
        max_bin = self.n_fft // 2
        nin_lstm = max_bin // 2
        nout = self.nout

        # to NHWC [B, F, T, ch]
        x = jnp.transpose(spec_ri, (0, 2, 3, 1))[:, :max_bin]
        bandw = x.shape[1] // 2
        l1_in = x[:, :bandw]
        h1_in = x[:, bandw:]
        l1 = BaseNet(nout // 2, nin_lstm // 2, self.nout_lstm, name="stg1_low")(l1_in)
        l1 = Conv2DBNActiv(nout // 4, 1, 1, 0, name="stg1_low_out")(l1)
        h1 = BaseNet(nout // 4, nin_lstm // 2, self.nout_lstm // 2,
                     name="stg1_high")(h1_in)
        aux1 = jnp.concatenate([l1, h1], axis=1)

        l2_in = jnp.concatenate([l1_in, l1], axis=-1)
        h2_in = jnp.concatenate([h1_in, h1], axis=-1)
        l2 = BaseNet(nout, nin_lstm // 2, self.nout_lstm, name="stg2_low")(l2_in)
        l2 = Conv2DBNActiv(nout // 2, 1, 1, 0, name="stg2_low_out")(l2)
        h2 = BaseNet(nout // 2, nin_lstm // 2, self.nout_lstm // 2,
                     name="stg2_high")(h2_in)
        aux2 = jnp.concatenate([l2, h2], axis=1)

        f3_in = jnp.concatenate([x, aux1, aux2], axis=-1)
        f3 = BaseNet(nout, nin_lstm, self.nout_lstm, name="stg3_full")(f3_in)
        mask_ri = nn.Conv(nin, (1, 1), use_bias=False, name="out")(f3)  # [B,F,T,nin]

        # bounded complex mask (nets.py:125-128)
        c = 1 if self.is_mono else 2
        re, im = mask_ri[..., :c], mask_ri[..., c:]
        mag = jnp.sqrt(re ** 2 + im ** 2)
        scale = jnp.tanh(mag) / (mag + 1e-8)
        re, im = re * scale, im * scale
        # replicate-pad the dropped bins back to n_fft//2+1 (nets.py:117-121)
        pad = self.n_fft // 2 + 1 - re.shape[1]
        re = jnp.concatenate([re] + [re[:, -1:]] * pad, axis=1)
        im = jnp.concatenate([im] + [im[:, -1:]] * pad, axis=1)
        out = jnp.concatenate([re, im], axis=-1)  # [B, F+1, T, 2c]
        return jnp.transpose(out, (0, 3, 1, 2))  # [B, 2c, F, T]


class VocalRemover:
    """hnsep='vr' runner: waveform -> harmonic part (ref: nets.py:139-197 +
    utils/decomposed_waveform.py:236-282)."""

    def __init__(self, model_path):
        import yaml

        from ..utils.torch_ckpt import convert_cascaded_net, load_torch_file
        from pathlib import Path

        model_path = Path(model_path)
        with open(model_path.with_name("config.yaml")) as f:
            args = yaml.safe_load(f)
        self.n_fft = args["n_fft"]
        self.hop_length = args["hop_length"]
        self.is_mono = args.get("is_mono", False)
        self.model = CascadedNet(
            n_fft=self.n_fft, nout=args.get("n_out", 32),
            nout_lstm=args.get("n_out_lstm", 128), is_mono=self.is_mono,
        )
        sd = load_torch_file(model_path)
        self.params = convert_cascaded_net(sd)
        self._apply = jax.jit(lambda p, s: self.model.apply(p, s))

    def predict_harmonic(self, waveform: np.ndarray) -> np.ndarray:
        """waveform [T] -> harmonic waveform [T]."""
        from ..dsp.hnsep import istft_centered, stft_centered

        hop = self.hop_length
        T = len(waveform)
        n_frames = T // hop + 1
        T_pad = (32 * (n_frames // 32 + 1) - 1) * hop - T
        tl_pad = (T_pad // 2 // hop) * hop
        x = np.pad(waveform, (tl_pad, T_pad - tl_pad))
        window = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(self.n_fft) / self.n_fft)
        # torch.stft(center=True, pad_mode='constant')
        pad = self.n_fft // 2
        xp = np.pad(x, (pad, pad))
        idx = np.arange(self.n_fft)[None, :] + hop * np.arange(
            1 + (len(xp) - self.n_fft) // hop
        )[:, None]
        spec = np.fft.rfft(xp[idx] * window[None, :], axis=1).T  # [F, T]
        chans = 1 if self.is_mono else 2
        ri = np.stack([spec.real] * chans + [spec.imag] * chans, 0)[None]
        mask = np.asarray(self._apply(self.params, jnp.asarray(ri.astype(np.float32))))
        c = chans
        mask_c = mask[:, :c] + 1j * mask[:, c:]
        pred = (spec[None, None] * mask_c).mean(axis=1)[0]  # avg channels
        wav = istft_centered(pred.T, self.n_fft, hop, window, len(x))
        return wav[tl_pad : tl_pad + T].astype(np.float32)
