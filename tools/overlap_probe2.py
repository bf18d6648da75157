"""Probe 2: overlap with REAL dependencies, pure value dataflow (no scratch).

The LYNX module is a serial chain per tile (dots -> VPU).  Split into
chunks, chunk B's dots are independent of chunk A's VPU stage.  Measure:

  a. dots only (all chunks)
  b. vpu only
  c. chained: per chunk dot -> vpu, program order A-dots, B-dots, A-vpu, B-vpu
  d. chained, interleaved order: A-dots, A-vpu, B-dots, B-vpu

If t(c) or t(d) ~= max+eps, the scheduler hides dependent-chunk VPU under
other chunks' dots and the production kernel should adopt that structure;
if ~= sum, Mosaic does not reorder across value deps and the serial kernel
is the floor.
"""

import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CH = 4         # chunks
M, K, N = 128, 1024, 2048   # per-chunk dot
VPU_REPS = 12  # elementwise passes per chunk
GRID = 64


def _vpu_chain(z):
    acc = jnp.zeros_like(z)
    for r in range(VPU_REPS):
        acc = acc + z * (1.0 + 1e-6 * r)
    return acc


def _kernel(a_ref, b_ref, o_ref, *, mode):
    a = a_ref[...]
    b = b_ref[...]
    chunks = [a[c * M : (c + 1) * M] for c in range(CH)]
    if mode == "mm":
        outs = [jnp.dot(c, b, preferred_element_type=jnp.float32)
                for c in chunks]
    elif mode == "vpu":
        outs = [_vpu_chain(c.astype(jnp.float32) @ jnp.zeros((K, N), jnp.bfloat16) + 1.0)
                for c in chunks]  # placeholder; not used
    elif mode == "grouped":
        zs = [jnp.dot(c, b, preferred_element_type=jnp.float32)
              for c in chunks]
        outs = [_vpu_chain(z) for z in zs]
    else:  # interleaved
        outs = []
        for c in chunks:
            z = jnp.dot(c, b, preferred_element_type=jnp.float32)
            outs.append(_vpu_chain(z))
    o_ref[...] = jnp.concatenate(outs, axis=0).astype(o_ref.dtype)


def run(mode):
    a = jnp.ones((CH * M, K), jnp.bfloat16)
    b = jnp.ones((K, N), jnp.bfloat16)
    fn = pl.pallas_call(
        functools.partial(_kernel, mode=mode),
        out_shape=jax.ShapeDtypeStruct((CH * M, N), jnp.float32),
        grid=(GRID,),
        in_specs=[
            pl.BlockSpec((CH * M, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CH * M, N), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )
    f = jax.jit(lambda: fn(a, b))
    out = f()
    np.asarray(out.ravel()[:1])
    start = time.perf_counter()
    for _ in range(20):
        out = f()
    np.asarray(out.ravel()[:1])
    dt = (time.perf_counter() - start) / 20
    print(f"{mode:11s}: {dt*1e3:7.2f} ms", flush=True)
    return dt


if __name__ == "__main__":
    t_mm = run("mm")
    t_g = run("grouped")
    t_i = run("interleaved")
    print(f"mm-only={t_mm*1e3:.2f}  grouped={t_g*1e3:.2f}  "
          f"interleaved={t_i*1e3:.2f}")
