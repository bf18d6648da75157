"""On-TPU mel extraction: Pallas fused kernel vs the XLA matmul-DFT path.

VERDICT r2 task 6: the Pallas mel kernel is tested but unwired; measure it
in context and either wire it into the on-TPU eval path or delete it.

Usage: python tools/mel_bench.py  (runs on the default TPU backend)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update(
    "jax_compilation_cache_dir", str(Path(__file__).parent.parent / ".jax_cache")
)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np


def _time(fn, iters=20, warmup=1):
    out = None
    for _ in range(warmup):
        out = fn()
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    start = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - start) / iters


def main():
    from xiaoicesing_io_tpu.ops.mel import MelConfig, MelSpectrogram
    from xiaoicesing_io_tpu.ops.pallas.mel_kernel import PallasMelSpectrogram

    cfg = MelConfig()
    ext = MelSpectrogram(cfg)
    # eval-shaped workload: a batch of ~23.8 s segments (2048 frames)
    for B, T_f in ((4, 2048), (1, 2048)):
        T = T_f * cfg.hop_size
        rng = np.random.default_rng(0)
        y = jnp.asarray(rng.uniform(-0.5, 0.5, (B, T)).astype(np.float32))

        xla = jax.jit(ext.jax)
        t_xla = _time(lambda: xla(y))
        print(f"B={B} T_f={T_f}  xla matmul-DFT: {t_xla*1e3:.2f} ms", flush=True)

        pal = PallasMelSpectrogram(cfg)
        t_pal = _time(lambda: pal(y))
        print(f"B={B} T_f={T_f}  pallas fused:   {t_pal*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
