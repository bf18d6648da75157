"""NSF-HiFiGAN generator (JAX/flax).

Capability parity with ``/root/reference/modules/nsf_hifigan/models.py``:

* ``conv_pre`` k=7 over mel, 4-5 transposed-conv upsample stages with channel
  halving, each followed by ``num_kernels`` parallel dilated ResBlock1/2
  averaged, leaky-relu(0.1), ``conv_post`` k=7 -> tanh  (ref: models.py:206-290)
* full NSF source: ``SineGen`` frame-phase accumulator + 8 harmonics + linear
  + tanh merge, injected per stage via strided ``noise_convs``
  (ref: models.py:100-245)
* ``mini_nsf`` variant: quadratic-interpolated single-sine phase accumulator
  (``fastsinegen``) injected after stage 2 via a 1x1 conv (ref: :253-263)

Weight-norm exists only in training checkpoints; like the reference we load
weight-norm-removed (merged) weights.  Layout: [B, T, C] feature-last.

The transposed convs use ``lax.conv_general_dilated`` with lhs dilation —
XLA lowers these onto the MXU; kernel layout is [k, in, out] with taps
flipped relative to torch's ConvTranspose1d (handled by the converter in
``utils/torch_ckpt.py``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

LRELU_SLOPE = 0.1


def leaky_relu(x, slope=LRELU_SLOPE):
    return jnp.where(x >= 0, x, slope * x)


@dataclass(frozen=True)
class NsfHifiganConfig:
    """Mirror of the vocoder's config.json fields we consume."""

    num_mels: int = 128
    sampling_rate: int = 44100
    hop_size: int = 512
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4, 4)
    upsample_initial_channel: int = 512
    resblock: str = "1"
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    mini_nsf: bool = False

    @staticmethod
    def from_json(d: dict) -> "NsfHifiganConfig":
        return NsfHifiganConfig(
            num_mels=d["num_mels"], sampling_rate=d["sampling_rate"],
            hop_size=d["hop_size"],
            upsample_rates=tuple(d["upsample_rates"]),
            upsample_kernel_sizes=tuple(d["upsample_kernel_sizes"]),
            upsample_initial_channel=d["upsample_initial_channel"],
            resblock=str(d["resblock"]),
            resblock_kernel_sizes=tuple(d["resblock_kernel_sizes"]),
            resblock_dilation_sizes=tuple(tuple(x) for x in d["resblock_dilation_sizes"]),
            mini_nsf=d.get("mini_nsf", False),
        )


class ConvTranspose1d(nn.Module):
    """Torch-semantics ConvTranspose1d with padding=(k-stride)//2 (k-stride even)."""

    out_ch: int
    kernel_size: int
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, u = self.kernel_size, self.stride
        p = (k - u) // 2
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.normal(0.01), (k, in_ch, self.out_ch)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_ch,))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=(1,), padding=[(k - 1 - p, k - 1 - p)],
            lhs_dilation=(u,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y + bias


class ResBlock1(nn.Module):
    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3, 5)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilation):
            xt = leaky_relu(x)
            xt = nn.Conv(self.channels, (self.kernel_size,), kernel_dilation=d,
                         padding="SAME", dtype=self.dtype, name=f"convs1_{i}")(xt)
            xt = leaky_relu(xt)
            xt = nn.Conv(self.channels, (self.kernel_size,), padding="SAME",
                         dtype=self.dtype, name=f"convs2_{i}")(xt)
            x = xt + x
        return x


class ResBlock2(nn.Module):
    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilation):
            xt = leaky_relu(x)
            xt = nn.Conv(self.channels, (self.kernel_size,), kernel_dilation=d,
                         padding="SAME", dtype=self.dtype, name=f"convs_{i}")(xt)
            x = xt + x
        return x


def sine_gen(
    f0: jnp.ndarray, upp: int, sampling_rate: float, harmonic_num: int,
    rand_ini: Optional[jnp.ndarray] = None, key: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Frame-rate f0 -> sample-rate harmonic sine bank [B, T*upp, H+1].

    Phase-accumulation parity with SineGen._f02sine (models.py:133-147):
    within-frame linear phase ramp + cross-frame wrapped accumulator in f32.
    """
    dim = harmonic_num + 1
    f0 = f0[..., None]  # [B, T, 1]
    n = jnp.arange(1, upp + 1, dtype=jnp.float32)
    rad = f0 / sampling_rate * n  # [B, T, upp]
    rad2 = jnp.fmod(rad[..., -1:].astype(jnp.float32) + 0.5, 1.0) - 0.5
    rad_acc = jnp.fmod(jnp.cumsum(rad2, axis=1), 1.0)
    rad = rad + jnp.pad(rad_acc[:, :-1, :], [(0, 0), (1, 0), (0, 0)])
    rad = rad.reshape(f0.shape[0], -1, 1)  # [B, T*upp, 1]
    rad = rad * jnp.arange(1, dim + 1, dtype=jnp.float32).reshape(1, 1, -1)
    if rand_ini is None:
        if key is not None:
            rand_ini = jax.random.uniform(key, (1, 1, dim))
            rand_ini = rand_ini.at[..., 0].set(0.0)
        else:
            rand_ini = jnp.zeros((1, 1, dim))
    rad = rad + rand_ini
    return jnp.sin(2 * np.pi * rad)


def fast_sine_gen(f0: jnp.ndarray, upp: int, source_sr: float) -> jnp.ndarray:
    """mini_nsf single-sine source with quadratic in-frame phase
    (parity: Generator.fastsinegen, models.py:253-263). -> [B, T*upp, 1]"""
    n = jnp.arange(1, upp + 1, dtype=jnp.float32)
    s0 = f0[..., None] / source_sr  # [B, T, 1]
    ds0 = jnp.pad(s0[:, 1:, :] - s0[:, :-1, :], [(0, 0), (0, 1), (0, 0)])
    rad = s0 * n + 0.5 * ds0 * n * (n - 1) / upp
    rad2 = jnp.fmod(rad[..., -1:].astype(jnp.float32) + 0.5, 1.0) - 0.5
    rad_acc = jnp.fmod(jnp.cumsum(rad2, axis=1), 1.0)
    rad = rad + jnp.pad(rad_acc[:, :-1, :], [(0, 0), (1, 0), (0, 0)])
    rad = rad.reshape(f0.shape[0], -1, 1)
    return jnp.sin(2 * np.pi * rad)


class Generator(nn.Module):
    config: NsfHifiganConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel, f0, sine_key: Optional[jax.Array] = None,
                 noise_key: Optional[jax.Array] = None):
        """
        :param mel: [B, T, M] (natural-log mel)
        :param f0: [B, T] frame-rate f0 in Hz
        :return: waveform [B, T * hop]
        """
        h = self.config
        num_kernels = len(h.resblock_kernel_sizes)
        res_cls = ResBlock1 if h.resblock == "1" else ResBlock2

        if h.mini_nsf:
            source_sr = h.sampling_rate / int(np.prod(h.upsample_rates[2:]))
            upp = int(np.prod(h.upsample_rates[:2]))
            har_source = fast_sine_gen(f0, upp, source_sr)
        else:
            upp = int(np.prod(h.upsample_rates))
            sines = sine_gen(f0, upp, h.sampling_rate, harmonic_num=8, key=sine_key)
            sines = sines * 0.1  # sine_amp
            uv = (f0 > 0).astype(jnp.float32)[..., None]
            uv = jnp.repeat(uv, upp, axis=1)
            noise_amp = uv * 0.003 + (1 - uv) * 0.1 / 3
            if noise_key is not None:
                noise = noise_amp * jax.random.normal(noise_key, sines.shape)
            else:
                noise = 0.0
            sines = sines * uv + noise
            merged = nn.Dense(1, dtype=self.dtype, name="source_linear")(sines)
            har_source = jnp.tanh(merged)  # [B, T*hop, 1]

        x = nn.Conv(h.upsample_initial_channel, (7,), padding="SAME",
                    dtype=self.dtype, name="conv_pre")(mel)
        ch = h.upsample_initial_channel
        ri = 0
        for i, (u, k) in enumerate(zip(h.upsample_rates, h.upsample_kernel_sizes)):
            ch //= 2
            x = leaky_relu(x)
            x = ConvTranspose1d(ch, k, u, dtype=self.dtype, name=f"ups_{i}")(x)
            if not h.mini_nsf:
                if i + 1 < len(h.upsample_rates):
                    stride_f0 = int(np.prod(h.upsample_rates[i + 1 :]))
                    pad = stride_f0 // 2
                    x_source = nn.Conv(
                        ch, (stride_f0 * 2,), strides=(stride_f0,),
                        padding=[(pad, pad)],
                        dtype=self.dtype, name=f"noise_convs_{i}",
                    )(har_source)
                else:
                    x_source = nn.Conv(ch, (1,), dtype=self.dtype,
                                       name=f"noise_convs_{i}")(har_source)
                x = x + x_source[:, : x.shape[1]]
            elif i == 1:
                x_source = nn.Conv(ch, (1,), dtype=self.dtype, name="source_conv")(
                    har_source
                )
                x = x + x_source[:, : x.shape[1]]
            xs = None
            for j, (rk, rd) in enumerate(
                zip(h.resblock_kernel_sizes, h.resblock_dilation_sizes)
            ):
                block = res_cls(ch, rk, tuple(rd), dtype=self.dtype,
                                name=f"resblocks_{ri}")
                ri += 1
                xs = block(x) if xs is None else xs + block(x)
            x = xs / num_kernels
        x = leaky_relu(x, 0.01)  # torch F.leaky_relu default slope
        x = nn.Conv(1, (7,), padding="SAME", dtype=self.dtype, name="conv_post")(x)
        return jnp.tanh(x)[..., 0]
