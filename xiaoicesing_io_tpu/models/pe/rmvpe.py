"""RMVPE neural pitch extractor (JAX port).

Capability parity with ``/root/reference/modules/pe/rmvpe/``: DeepUnet
(5-level encoder with 4 ConvBlockRes per level + avgpool 2x2, 4 intermediate
blocks, mirrored transposed-conv decoder), 3-channel head conv, BiGRU + Linear
-> 360 sigmoid cent-class logits over a 16 kHz HTK mel (128 bins, win 1024,
hop 160, fmin 30, fmax 8000); decoding by local average around the argmax (or
Viterbi path), cents -> Hz, threshold-based UV.  The reference's
``TimbreFilter`` weights exist in checkpoints but are unused in the forward
pass (deepunet.py:169-173) — same here.

Layout NHWC with H=T (frames), W=128 (mel bins).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
N_CLASS = 360
N_MELS = 128
MEL_FMIN = 30
MEL_FMAX = 8000
WINDOW_LENGTH = 1024
CONST = 1997.3794084376191


class BatchNorm(nn.Module):
    """Inference-mode BN over the channel (last) axis using stored stats."""

    channels: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.channels,))
        mean = self.param("mean", nn.initializers.zeros, (self.channels,))
        var = self.param("var", nn.initializers.ones, (self.channels,))
        return (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias


class ConvBlockRes(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", use_bias=False, name="conv1")(x)
        h = BatchNorm(self.out_ch, name="bn1")(h)
        h = jax.nn.relu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", use_bias=False, name="conv2")(h)
        h = BatchNorm(self.out_ch, name="bn2")(h)
        h = jax.nn.relu(h)
        if in_ch != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), name="shortcut")(x)
        return h + x


class ResEncoderBlock(nn.Module):
    out_ch: int
    n_blocks: int = 4
    pool: bool = True

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_blocks):
            x = ConvBlockRes(self.out_ch, name=f"conv_{i}")(x)
        if not self.pool:
            return x
        pooled = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return x, pooled


class ResDecoderBlock(nn.Module):
    out_ch: int
    n_blocks: int = 4

    @nn.compact
    def __call__(self, x, skip):
        in_ch = x.shape[-1]
        # torch ConvTranspose2d(3x3, stride 2, padding 1, output_padding 1)
        kernel = self.param(
            "tconv_kernel", nn.initializers.normal(0.02), (3, 3, in_ch, self.out_ch)
        )
        x = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1), padding=[(1, 2), (1, 2)],
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = BatchNorm(self.out_ch, name="tbn")(x)
        x = jax.nn.relu(x)
        x = jnp.concatenate([x, skip], axis=-1)
        for i in range(self.n_blocks):
            x = ConvBlockRes(self.out_ch, name=f"conv_{i}")(x)
        return x


class GRUCellTorch(nn.Module):
    """torch.nn.GRU gate math for one direction (batch_first)."""

    hidden: int

    @nn.compact
    def __call__(self, xs):
        """xs: [B, T, F] -> [B, T, H]"""
        H = self.hidden
        w_ih = self.param("w_ih", nn.initializers.normal(0.02), (xs.shape[-1], 3 * H))
        w_hh = self.param("w_hh", nn.initializers.normal(0.02), (H, 3 * H))
        b_ih = self.param("b_ih", nn.initializers.zeros, (3 * H,))
        b_hh = self.param("b_hh", nn.initializers.zeros, (3 * H,))

        x_proj = xs @ w_ih + b_ih  # [B, T, 3H]

        def step(h, x_t):
            h_proj = h @ w_hh + b_hh
            xr, xz, xn = jnp.split(x_t, 3, axis=-1)
            hr, hz, hn = jnp.split(h_proj, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h_new = (1 - z) * n + z * h
            return h_new, h_new

        h0 = jnp.zeros((xs.shape[0], H), xs.dtype)
        _, ys = jax.lax.scan(step, h0, jnp.swapaxes(x_proj, 0, 1))
        return jnp.swapaxes(ys, 0, 1)


class BiGRU(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, xs):
        fwd = GRUCellTorch(self.hidden, name="fwd")(xs)
        bwd = GRUCellTorch(self.hidden, name="bwd")(xs[:, ::-1])[:, ::-1]
        return jnp.concatenate([fwd, bwd], axis=-1)


class E2E0(nn.Module):
    """ref: modules/pe/rmvpe/model.py — E2E0(4, 1, (2, 2))."""

    n_blocks: int = 4
    en_de_layers: int = 5
    inter_layers: int = 4
    en_out_channels: int = 16

    @nn.compact
    def __call__(self, mel):
        """mel: [B, T, 128] log-mel -> [B, T, 360] sigmoid probabilities."""
        x = mel[..., None]  # [B, T, M, 1] NHWC
        x = BatchNorm(1, name="in_bn")(x)
        skips = []
        ch = self.en_out_channels
        for i in range(self.en_de_layers):
            skip, x = ResEncoderBlock(ch, self.n_blocks, name=f"enc_{i}")(x)
            skips.append(skip)
            ch *= 2
        for i in range(self.inter_layers):
            x = ResEncoderBlock(ch, self.n_blocks, pool=False, name=f"inter_{i}")(x)
        for i in range(self.en_de_layers):
            ch //= 2
            x = ResDecoderBlock(ch, self.n_blocks, name=f"dec_{i}")(x, skips[-1 - i])
        x = nn.Conv(3, (3, 3), padding="SAME", name="cnn")(x)  # [B, T, M, 3]
        B, T = x.shape[:2]
        x = jnp.transpose(x, (0, 1, 3, 2)).reshape(B, T, 3 * N_MELS)
        x = BiGRU(256, name="gru")(x)
        x = nn.Dense(N_CLASS, name="fc")(x)
        return jax.nn.sigmoid(x)


# ---------------------------------------------------------------------------
# decoding (ref: modules/pe/rmvpe/utils.py)
# ---------------------------------------------------------------------------

def to_local_average_f0(hidden: np.ndarray, center: Optional[np.ndarray] = None,
                        thred: float = 0.03) -> np.ndarray:
    """hidden: [T, N_CLASS] -> f0 [T] (0 at unvoiced)."""
    idx = np.arange(N_CLASS)[None, :]
    idx_cents = idx * 20 + CONST
    if center is None:
        center = np.argmax(hidden, axis=1, keepdims=True)
    start = np.clip(center - 4, 0, None)
    end = np.clip(center + 5, None, N_CLASS)
    mask = (idx >= start) & (idx < end)
    weights = hidden * mask
    product_sum = np.sum(weights * idx_cents, axis=1)
    weight_sum = np.sum(weights, axis=1)
    cents = product_sum / (weight_sum + (weight_sum == 0))
    f0 = 10 * 2 ** (cents / 1200)
    uv = hidden.max(axis=1) < thred
    return (f0 * ~uv).astype(np.float32)


def to_viterbi_f0(hidden: np.ndarray, thred: float = 0.03) -> np.ndarray:
    """Viterbi-smoothed decoding (librosa.sequence.viterbi equivalent)."""
    xx, yy = np.meshgrid(range(N_CLASS), range(N_CLASS))
    transition = np.maximum(30 - np.abs(xx - yy), 0).astype(np.float64)
    transition /= transition.sum(axis=1, keepdims=True)
    log_trans = np.log(np.maximum(transition, 1e-12))
    prob = hidden.astype(np.float64)
    prob = prob / np.maximum(prob.sum(axis=1, keepdims=True), 1e-12)
    log_prob = np.log(np.maximum(prob, 1e-12))
    T = len(log_prob)
    value = np.full((T, N_CLASS), -np.inf)
    ptr = np.zeros((T, N_CLASS), np.int64)
    value[0] = log_prob[0] - np.log(N_CLASS)
    for t in range(1, T):
        trans_scores = value[t - 1][:, None] + log_trans
        ptr[t] = np.argmax(trans_scores, axis=0)
        value[t] = trans_scores[ptr[t], np.arange(N_CLASS)] + log_prob[t]
    path = np.zeros(T, np.int64)
    path[-1] = int(np.argmax(value[-1]))
    for t in range(T - 1, 0, -1):
        path[t - 1] = ptr[t, path[t]]
    return to_local_average_f0(hidden, center=path[:, None], thred=thred)


# ---------------------------------------------------------------------------
# runner
# ---------------------------------------------------------------------------

class RMVPE:
    """ref: modules/pe/rmvpe/inference.py — 16 kHz resample, HTK mel,
    32-frame padding, decode, resample to the target hop."""

    def __init__(self, model_path, hop_length: int = 160):
        from ...utils.torch_ckpt import convert_rmvpe, load_torch_file

        self.model = E2E0()
        ckpt = load_torch_file(model_path)
        self.params = convert_rmvpe(ckpt.get("model", ckpt))
        self.hop_length = hop_length
        from ...ops.mel import MelConfig, MelSpectrogram

        self.mel = MelSpectrogram(MelConfig(
            sample_rate=SAMPLE_RATE, n_mels=N_MELS, n_fft=WINDOW_LENGTH,
            win_size=WINDOW_LENGTH, hop_size=hop_length,
            fmin=MEL_FMIN, fmax=MEL_FMAX,
        ), htk=True, center=True)
        self._apply = jax.jit(lambda p, m: self.model.apply(p, m))

    def infer_from_audio(self, audio: np.ndarray, sample_rate: int = 16000,
                         thred: float = 0.03, use_viterbi: bool = False) -> np.ndarray:
        if sample_rate != SAMPLE_RATE:
            from scipy.signal import resample_poly

            g = np.gcd(SAMPLE_RATE, int(sample_rate))
            audio = resample_poly(audio, SAMPLE_RATE // g, sample_rate // g)
        mel = self.mel.numpy(np.asarray(audio, np.float32))  # [T, M]
        n_frames = mel.shape[0]
        pad = 32 * ((n_frames - 1) // 32 + 1) - n_frames
        mel = np.pad(mel, [(0, pad), (0, 0)])
        hidden = np.asarray(self._apply(self.params, jnp.asarray(mel[None])))[0]
        hidden = hidden[:n_frames]
        if use_viterbi:
            return to_viterbi_f0(hidden, thred=thred)
        return to_local_average_f0(hidden, thred=thred)

    def get_pitch(self, waveform, samplerate, length, *, hop_size,
                  f0_min=65, f0_max=1100, speed=1, interp_uv=False):
        from ...utils.curves import interp_f0, resample_align_curve

        f0 = self.infer_from_audio(waveform, sample_rate=samplerate)
        uv = f0 == 0
        f0, uv = interp_f0(f0, uv)
        hop = int(np.round(hop_size * speed))
        time_step = hop / samplerate
        f0_res = resample_align_curve(f0.astype(np.float32), 0.01, time_step, length)
        uv_res = resample_align_curve(uv.astype(np.float32), 0.01, time_step, length) > 0.5
        if not interp_uv:
            f0_res[uv_res] = 0
        return f0_res, uv_res
