"""Data-parallel correctness on the 8-device virtual CPU mesh:
the sharded train step must match single-device math exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xiaoicesing_io_tpu.config import Config, load_config
from xiaoicesing_io_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    make_train_step,
    replicated_sharding,
    shard_batch,
)


@pytest.fixture(scope="module")
def setup(eight_devices):
    from pathlib import Path

    from xiaoicesing_io_tpu.training.acoustic import (
        build_acoustic,
        init_acoustic_state,
        make_acoustic_train_step,
    )

    cfg = load_config(
        Path(__file__).parent.parent / "xiaoicesing_io_tpu/configs/acoustic.yaml"
    )
    cfg.update(
        enc_layers=1, precision="fp32",
        backbone_args=Config(num_channels=32, num_layers=1, kernel_size=31,
                             strong_cond=True),
    )
    cfg["shallow_diffusion_args"]["aux_decoder_args"].update(num_channels=32, num_layers=1)
    model, core, normalizer = build_acoustic(cfg, 12)
    state = init_acoustic_state(model, cfg, 12, jax.random.PRNGKey(0))
    step_fn = make_acoustic_train_step(model, core, normalizer, cfg)
    return cfg, model, state, step_fn


def _batch(rng, B=8, T_ph=8, T_f=64, M=128):
    from xiaoicesing_io_tpu.ops.seq import length_regulator

    dur = rng.integers(2, 9, size=(B, T_ph))
    mel2ph = np.asarray(length_regulator(jnp.asarray(dur), out_len=T_f))
    return {
        "tokens": rng.integers(1, 12, size=(B, T_ph)).astype(np.int32),
        "mel2ph": mel2ph.astype(np.int32),
        "f0": rng.uniform(100, 400, size=(B, T_f)).astype(np.float32),
        "mel": rng.uniform(-10, -1, size=(B, T_f, M)).astype(np.float32),
    }


@pytest.mark.slow  # multi-process DP tests cover this path in the slow tier too
def test_dp_step_matches_single_device(setup, rng):
    cfg, model, state, step_fn = setup
    mesh = make_mesh()
    batch_np = _batch(rng)
    key = jax.random.PRNGKey(7)

    # single-device reference
    state_ref, metrics_ref = jax.jit(step_fn)(state, jax.tree.map(jnp.asarray, batch_np), key)

    # dp-sharded
    dp_step = make_train_step(step_fn, mesh, donate=False)
    state_dp = jax.device_put(state, replicated_sharding(mesh))
    batch_dp = shard_batch(batch_np, mesh)
    key_dp = jax.device_put(key, replicated_sharding(mesh))
    state_dp, metrics_dp = dp_step(state_dp, batch_dp, key_dp)

    for k in metrics_ref:
        np.testing.assert_allclose(
            float(metrics_ref[k]), float(metrics_dp[k]), rtol=2e-4,
            err_msg=f"metric {k} diverged between single-device and dp mesh",
        )
    # parameters after the step agree
    flat_ref = jax.tree.leaves(state_ref.params)
    flat_dp = jax.tree.leaves(jax.device_get(state_dp.params))
    for a, b in zip(flat_ref, flat_dp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_batch_sharding_layout(setup, rng):
    cfg, model, state, step_fn = setup
    mesh = make_mesh()
    batch = shard_batch(_batch(rng), mesh)
    sh = batch["mel"].sharding
    assert sh.spec == batch_sharding(mesh).spec
    # each device holds B/8 rows
    assert batch["mel"].addressable_shards[0].data.shape[0] == 1
