"""Micro-probe: does Mosaic dual-issue independent MXU and VPU work?

Three kernels on identical data: (a) matmul only, (b) elementwise chain
only, (c) both, fully independent.  If t(c) ~= max(t_a, t_b), software
pipelining (MXU of tile i vs VPU of tile i-1) is worth building; if
t(c) ~= t_a + t_b, the units serialize and kernel-level pipelining cannot
win — record the bound in docs/PerformanceNotes.md.
"""

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

import functools

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 256, 1024, 2048
VROWS = 256
REPS_MM = 8      # matmuls per grid step
REPS_VPU = 40    # elementwise FMA passes per grid step
GRID = 64


def _kernel(a_ref, b_ref, v_ref, o_ref, s_ref, *, mode):
    if mode in ("mm", "both"):
        acc = jnp.zeros((M, N), jnp.float32)
        for _ in range(REPS_MM):
            acc = acc + jnp.dot(a_ref[...], b_ref[...],
                                preferred_element_type=jnp.float32)
        o_ref[...] = acc.astype(o_ref.dtype)
    if mode in ("vpu", "both"):
        v = v_ref[...].astype(jnp.float32)
        acc = jnp.zeros_like(v)
        for r in range(REPS_VPU):
            acc = acc + v * (1.0 + 1e-6 * r)
        s_ref[...] = acc.astype(s_ref.dtype)
    if mode == "mm":
        s_ref[...] = v_ref[...]
    if mode == "vpu":
        o_ref[...] = jnp.zeros((M, N), o_ref.dtype)


def run(mode):
    a = jnp.ones((M, K), jnp.bfloat16)
    b = jnp.ones((K, N), jnp.bfloat16)
    v = jnp.ones((GRID, VROWS, N), jnp.float32)
    fn = pl.pallas_call(
        functools.partial(_kernel, mode=mode),
        out_shape=(
            jax.ShapeDtypeStruct((M, N), jnp.float32),
            jax.ShapeDtypeStruct((GRID, VROWS, N), jnp.float32),
        ),
        grid=(GRID,),
        in_specs=[
            pl.BlockSpec((M, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, VROWS, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((M, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, VROWS, N), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )
    f = jax.jit(lambda: fn(a, b, v))
    out = f()
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    start = time.perf_counter()
    for _ in range(20):
        out = f()
    np.asarray(jax.tree.leaves(out)[0].ravel()[:1])
    dt = (time.perf_counter() - start) / 20
    # per grid step: matmul FLOPs and VPU FLOPs
    mm_fl = REPS_MM * 2 * M * K * N * GRID
    print(f"{mode:5s}: {dt*1e3:7.2f} ms  (mm {mm_fl/dt/1e12:5.1f} TFLOP/s)",
          flush=True)
    return dt


if __name__ == "__main__":
    ta = run("mm")
    tb = run("vpu")
    tc = run("both")
    print(f"sum={1e3*(ta+tb):.2f} ms  max={1e3*max(ta,tb):.2f} ms  "
          f"both={1e3*tc:.2f} ms  overlap_frac="
          f"{(ta+tb-tc)/min(ta,tb):.2f}")
