"""Time-folded NSF-HiFiGAN apply — the TPU-shaped vocoder.

The stock generator's late stages process [B, T~1M, C=16..64]: with TPU lanes
fixed at 128, every op runs at 1/8..1/2 lane occupancy and the measured MFU
is <1% (stage profile: 73 ms for stage4 resblocks alone at B=2).

This module runs the SAME parameters exactly, but in a folded layout
[B, T/F, F*C] with F chosen so F*C >= 128.  Every convolution's weights are
transformed once (numpy) into an equivalent folded-layout convolution:

    out[t, co] = sum_tau x[t + tau*d - p, ci] W[tau, ci, co]
    t = r*F + f  =>  folded conv with kernel [k', F*C_in, F*C_out]

Transposed convs become k=2 sub-pixel convs whose natural output fold is
u * F_in (depth-to-space is a contiguous reshape in this layout, i.e. free),
and the sample-rate NSF source convs fold by stride*F.  Zero padding in
folded blocks equals logical zero padding, so results match the reference
semantics bit-for-near-bit (bf16 rounding aside).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .nsf_hifigan import NsfHifiganConfig, fast_sine_gen, leaky_relu, sine_gen


# ---------------------------------------------------------------------------
# weight folding
# ---------------------------------------------------------------------------

def _fold_generic(W: np.ndarray, b: Optional[np.ndarray], F_in: int, F_out: int,
                  s_logical) -> Tuple[np.ndarray, np.ndarray, int]:
    """Build folded conv weights.

    W: [k, C_in, C_out]; s_logical(f_out, tau) -> logical input index offset
    relative to r*F_in (or None if the tap is invalid).  Returns
    (W2 [k2, F_in*C_in, F_out*C_out], b2 [F_out*C_out], pad_left_blocks).
    """
    k, C_in, C_out = W.shape
    entries = []
    qs = set()
    for f in range(F_out):
        for tau in range(k):
            o = s_logical(f, tau)
            if o is None:
                continue
            q, g = divmod(o, F_in)
            qs.add(q)
            entries.append((q, g, tau, f))
    qmin, qmax = min(qs), max(qs)
    k2 = qmax - qmin + 1
    W2 = np.zeros((k2, F_in * C_in, F_out * C_out), W.dtype)
    for q, g, tau, f in entries:
        W2[q - qmin, g * C_in : (g + 1) * C_in, f * C_out : (f + 1) * C_out] += W[tau]
    b2 = np.tile(b, F_out) if b is not None else np.zeros(F_out * C_out, W.dtype)
    return W2, b2, -qmin


def fold_conv(W: np.ndarray, b: Optional[np.ndarray], F: int,
              dilation: int = 1, stride: int = 1,
              pad_l: Optional[int] = None):
    """Regular (optionally strided) conv folded to F output blocks.

    Input fold is F*stride (so the folded conv has stride 1).
    torch SAME padding by default: pad_l = (k-1)*d // 2.
    Returns (W2, b2, pad_left_blocks, rhs_dilation).
    """
    k = W.shape[0]
    if pad_l is None:
        pad_l = (k - 1) * dilation // 2
    if F == 1 and stride == 1:
        # keep the native (possibly dilated) conv: folding would densify the
        # kernel and waste FLOPs on the large-channel stages
        b2 = np.tile(b, 1) if b is not None else np.zeros(W.shape[2], W.dtype)
        return W, b2, pad_l, dilation

    def s_logical(f, tau):
        return f * stride + tau * dilation - pad_l

    W2, b2, pad_blocks = _fold_generic(W, b, F * stride, F, s_logical)
    return W2, b2, pad_blocks, 1


def fold_conv_transpose(W: np.ndarray, b: Optional[np.ndarray], u: int,
                        F_in: int) -> Tuple[np.ndarray, np.ndarray, int]:
    """ConvTranspose1d(k=2u, stride=u, padding=(k-u)//2) folded.

    Our stored kernel (models/vocoders/nsf_hifigan.py ConvTranspose1d) is
    [k, C_in, C_out] with taps ALREADY flipped to plain-conv orientation:
    out[t] = sum_j x_dilated[t + j - (k-1-p)] K[j], where x_dilated has u-1
    zeros between samples.  Equivalently out[t] = K[j] x[s] with
    s*u = t + j - (k-1-p).  Output fold is F_out = u * F_in (input advances
    one block per output block).
    """
    k, C_in, C_out = W.shape
    p = (k - u) // 2
    off = k - 1 - p
    F_out = u * F_in

    def s_logical(f, j):
        num = f + j - off
        if num % u != 0:
            return None
        return num // u

    W2, b2, pad_blocks = _fold_generic(W, b, F_in, F_out, s_logical)
    return W2, b2, pad_blocks, 1


def _conv_folded(x: jnp.ndarray, W2: jnp.ndarray, b2: jnp.ndarray,
                 pad_l_blocks: int, rhs_dilation: int = 1,
                 dtype=jnp.bfloat16) -> jnp.ndarray:
    """x: [B, R, F*C_in]; W2: [k2, F*C_in, F*C_out] -> [B, R, F*C_out]."""
    k2 = W2.shape[0]
    span = (k2 - 1) * rhs_dilation
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), W2.astype(dtype),
        window_strides=(1,),
        padding=[(pad_l_blocks, span - pad_l_blocks)],
        rhs_dilation=(rhs_dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return y + b2.astype(dtype)


def refold(x: jnp.ndarray, F_from: int, F_to: int) -> jnp.ndarray:
    """[B, R, F_from*C] -> [B, R*F_from/F_to, F_to*C] (contiguous reshape)."""
    if F_from == F_to:
        return x
    B, R, FC = x.shape
    C = FC // F_from
    total = R * F_from
    assert total % F_to == 0
    return x.reshape(B, total // F_to, F_to * C)


# ---------------------------------------------------------------------------
# folded generator
# ---------------------------------------------------------------------------

class FastNsfHifigan:
    """Folded-layout applier over a converted NSF-HiFiGAN param tree.

    ``pallas_stages``: stage indices whose resblock group runs as ONE fused
    Pallas kernel (``ops/pallas/hifigan_stage.py``) instead of 18 XLA convs;
    ``pallas_tile`` is that kernel's row-tile size.
    """

    def __init__(self, config: NsfHifiganConfig, params: Dict,
                 dtype=jnp.bfloat16, min_lanes: int = 128,
                 pallas_stages: Tuple[int, ...] = (),
                 pallas_tile: int = 1024,
                 pallas_interpret: bool = False):
        self.h = config
        self.dtype = dtype
        self.pallas_stages = tuple(pallas_stages)
        self.pallas_tile = pallas_tile
        self.pallas_interpret = pallas_interpret
        p = params["params"] if "params" in params else params
        h = config
        get = lambda d: (np.asarray(d["kernel"]), np.asarray(d.get("bias")))

        folds = []  # fold factor per stage output
        ch = h.upsample_initial_channel
        for u in h.upsample_rates:
            ch //= 2
            folds.append(max(1, min_lanes // ch))
        self.folds = folds

        self.w = {}
        # conv_pre: k=7 over mel, F=1
        Wk, b = get(p["conv_pre"])
        self.w["conv_pre"] = fold_conv(Wk, b, 1)
        ch = h.upsample_initial_channel
        ri = 0
        F_prev = 1
        self.stage_meta = []
        for i, (u, k) in enumerate(zip(h.upsample_rates, h.upsample_kernel_sizes)):
            ch //= 2
            F_stage = folds[i]
            Wk, b = get(p[f"ups_{i}"])
            self.w[f"ups_{i}"] = fold_conv_transpose(Wk, b, u, F_prev)
            F_after_up = u * F_prev
            if not h.mini_nsf:
                sf = int(np.prod(h.upsample_rates[i + 1 :])) if i + 1 < len(
                    h.upsample_rates) else 1
                Wk, b = get(p[f"noise_convs_{i}"])
                if i + 1 < len(h.upsample_rates):
                    # strided conv k=2sf stride sf pad sf//2 from sample rate
                    self.w[f"noise_convs_{i}"] = fold_conv(
                        Wk, b, F_stage, stride=sf, pad_l=sf // 2
                    )
                else:
                    self.w[f"noise_convs_{i}"] = fold_conv(Wk, b, F_stage, pad_l=0)
            elif i == 1:
                Wk, b = get(p["source_conv"])
                self.w["source_conv"] = fold_conv(Wk, b, F_stage, pad_l=0)
            for j, (rk, rd) in enumerate(
                zip(h.resblock_kernel_sizes, h.resblock_dilation_sizes)
            ):
                block = p[f"resblocks_{ri}"]
                for ci_, d in enumerate(rd):
                    if h.resblock == "1":
                        Wk, b = get(block[f"convs1_{ci_}"])
                        self.w[f"res{ri}_c1_{ci_}"] = fold_conv(Wk, b, F_stage,
                                                                dilation=d)
                        Wk, b = get(block[f"convs2_{ci_}"])
                        self.w[f"res{ri}_c2_{ci_}"] = fold_conv(Wk, b, F_stage)
                    else:
                        Wk, b = get(block[f"convs_{ci_}"])
                        self.w[f"res{ri}_c_{ci_}"] = fold_conv(Wk, b, F_stage,
                                                               dilation=d)
                ri += 1
            self.stage_meta.append((u, F_prev, F_after_up, F_stage, ch))
            F_prev = F_stage
        Wk, b = get(p["conv_post"])
        self.w["conv_post"] = fold_conv(Wk, b, F_prev)

        # stacked-tap weights + geometry for the fused whole-stage kernel
        if self.pallas_stages:
            from ...ops.pallas.hifigan_stage import ConvSpec, stack_taps

            assert h.resblock == "1", "fused stage kernel supports ResBlock1"
            num_k = len(h.resblock_kernel_sizes)
            self.pallas_stage_wb = {}
            for si in self.pallas_stages:
                weights, biases, specs = [], [], []
                for j in range(num_k):
                    ri = si * num_k + j
                    branch = []
                    for ci_ in range(len(h.resblock_dilation_sizes[j])):
                        pair = []
                        for cname in ("c1", "c2"):
                            W2, b2, pad_l, rdil = self.w[f"res{ri}_{cname}_{ci_}"]
                            weights.append(jnp.asarray(stack_taps(np.asarray(W2))))
                            biases.append(jnp.asarray(np.asarray(b2)))
                            pair.append(ConvSpec(k=W2.shape[0], d=rdil, pad_l=pad_l))
                        branch.append(tuple(pair))
                    specs.append(tuple(branch))
                self.pallas_stage_wb[si] = (
                    tuple(weights), tuple(biases), tuple(specs)
                )
        if not h.mini_nsf:
            self.source_linear = (
                np.asarray(p["source_linear"]["kernel"]),
                np.asarray(p["source_linear"]["bias"]),
            )
        self._jitted = jax.jit(self._apply)

    # -- forward -------------------------------------------------------------

    def _apply(self, mel: jnp.ndarray, f0: jnp.ndarray,
               key: Optional[jax.Array] = None) -> jnp.ndarray:
        h = self.h
        dt = self.dtype
        num_k = len(h.resblock_kernel_sizes)
        res_dils = h.resblock_dilation_sizes

        if h.mini_nsf:
            # the reference's mini-NSF source is deterministic (models.py:253-263)
            source_sr = h.sampling_rate / int(np.prod(h.upsample_rates[2:]))
            upp = int(np.prod(h.upsample_rates[:2]))
            har = fast_sine_gen(f0, upp, source_sr)  # [B, T*upp, 1]
        else:
            # lane-packed harmonic source: keep samples on lanes as
            # [B, T_frames, upp] instead of [B, T*upp, 9] (9-channel layout
            # wastes 14/16 of each lane register)
            upp = int(np.prod(h.upsample_rates))
            f0e = f0[..., None]
            n = jnp.arange(1, upp + 1, dtype=jnp.float32)
            rad = f0e / h.sampling_rate * n  # [B, T, upp]
            rad2 = jnp.fmod(rad[..., -1:].astype(jnp.float32) + 0.5, 1.0) - 0.5
            rad_acc = jnp.fmod(jnp.cumsum(rad2, axis=1), 1.0)
            rad = rad + jnp.pad(rad_acc[:, :-1, :], [(0, 0), (1, 0), (0, 0)])
            wk, bk = self.source_linear  # [9, 1], [1]
            uv = (f0 > 0).astype(jnp.float32)[..., None]  # [B, T, 1]
            if key is not None:
                k_ini, k_noise = jax.random.split(key)
                # SineGen random per-harmonic initial phases, harmonic 0 fixed
                # (models.py:143-146); shared across the batch like the ref
                rand_ini = jax.random.uniform(k_ini, (wk.shape[0],))
                rand_ini = rand_ini.at[0].set(0.0)
            else:
                rand_ini = jnp.zeros((wk.shape[0],))
            merged = jnp.zeros_like(rad)
            for hm in range(wk.shape[0]):
                merged = merged + float(wk[hm, 0]) * jnp.sin(
                    2 * np.pi * ((hm + 1) * rad + rand_ini[hm])
                )
            merged = 0.1 * uv * merged
            if key is not None:
                # SineGen additive noise (models.py:162-165): per-harmonic iid
                # N(0,1) scaled by uv*0.003 + (1-uv)*sine_amp/3, then merged by
                # the source linear.  Collapsed to one draw per sample with the
                # exactly-equivalent distribution: sum_h w_h z_h = ||w||_2 z.
                noise_amp = uv * 0.003 + (1.0 - uv) * (0.1 / 3.0)
                w_norm = float(np.linalg.norm(np.asarray(wk)[:, 0]))
                merged = merged + w_norm * noise_amp * jax.random.normal(
                    k_noise, rad.shape, jnp.float32
                )
            har = jnp.tanh(merged + float(bk[0]))  # [B, T, upp]
            har = har.reshape(har.shape[0], -1, 1)  # [B, T*upp, 1]

        x = _conv_folded(mel, *self.w["conv_pre"], dtype=dt)  # F=1
        ri = 0
        for i, (u, F_prev, F_after_up, F_stage, ch) in enumerate(self.stage_meta):
            x = leaky_relu(x)
            x = _conv_folded(x, *self.w[f"ups_{i}"], dtype=dt)  # fold F_after_up
            x = refold(x, F_after_up, F_stage)
            if not h.mini_nsf:
                sf = int(np.prod(h.upsample_rates[i + 1 :])) if i + 1 < len(
                    h.upsample_rates) else 1
                # fold sample-rate source to F_stage*sf blocks
                B, Ts, _ = har.shape
                src = har.reshape(B, Ts // (F_stage * sf), F_stage * sf)
                xs = _conv_folded(src, *self.w[f"noise_convs_{i}"], dtype=dt)
                x = x + xs[:, : x.shape[1]]
            elif i == 1:
                B, Ts, _ = har.shape
                src = har.reshape(B, Ts // F_stage, F_stage)
                xs = _conv_folded(src, *self.w["source_conv"], dtype=dt)
                x = x + xs[:, : x.shape[1]]
            if i in self.pallas_stages:
                from ...ops.pallas.hifigan_stage import fused_resblock_stage

                weights, biases, specs = self.pallas_stage_wb[i]
                x = fused_resblock_stage(
                    x.astype(dt), weights, biases, specs,
                    tile=self.pallas_tile, interpret=self.pallas_interpret,
                )
                ri += num_k
            else:
                acc = None
                for j in range(num_k):
                    hblk = x
                    for ci_ in range(len(res_dils[j])):
                        if h.resblock == "1":
                            t = leaky_relu(hblk)
                            t = _conv_folded(t, *self.w[f"res{ri}_c1_{ci_}"], dtype=dt)
                            t = leaky_relu(t)
                            t = _conv_folded(t, *self.w[f"res{ri}_c2_{ci_}"], dtype=dt)
                            hblk = hblk + t
                        else:
                            t = leaky_relu(hblk)
                            t = _conv_folded(t, *self.w[f"res{ri}_c_{ci_}"], dtype=dt)
                            hblk = hblk + t
                    acc = hblk if acc is None else acc + hblk
                    ri += 1
                x = acc / num_k
        x = leaky_relu(x, 0.01)
        x = _conv_folded(x, *self.w["conv_post"], dtype=dt)  # [B, R, F_cur]
        x = jnp.tanh(x.astype(jnp.float32))
        B, R, Fc = x.shape
        return x.reshape(B, R * Fc)

    def __call__(self, mel, f0, key=None):
        return self._jitted(mel, f0, key)
