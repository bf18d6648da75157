"""Finetune checkpoint loading (blacklist, strict shapes, category guard)
and parameter freezing (ref: basics/base_task.py:93-166)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xiaoicesing_io_tpu.config import load_config
from xiaoicesing_io_tpu.training.acoustic import build_acoustic, init_acoustic_state
from xiaoicesing_io_tpu.training.checkpoint import CheckpointManager
from xiaoicesing_io_tpu.training.finetune import (
    freeze_mask,
    load_finetune_params,
    wrap_optimizer_with_freezing,
)

VOCAB = 10


def _tiny_cfg(num_spk=2):
    cfg = load_config(
        Path(__file__).parent.parent / "xiaoicesing_io_tpu/configs/acoustic.yaml"
    )
    cfg.update(enc_layers=1, hidden_size=32, use_spk_id=True, num_spk=num_spk,
               backbone_args={"num_channels": 16, "num_layers": 1,
                              "kernel_size": 31, "strong_cond": True})
    cfg["shallow_diffusion_args"]["aux_decoder_args"].update(num_channels=16, num_layers=1)
    return cfg


def _leaf(params, dotted):
    node = params
    for p in dotted.split("."):
        node = node[p]
    return np.asarray(node)


@pytest.mark.slow
def test_finetune_load_blacklist_and_shape_tolerance(tmp_path):
    cfg = _tiny_cfg(num_spk=2)
    model, _, _ = build_acoustic(cfg, VOCAB)
    state = init_acoustic_state(model, cfg, VOCAB, jax.random.PRNGKey(0))
    mgr = CheckpointManager(tmp_path / "pretrain", "acoustic")
    ckpt_path = mgr.save(state, step=7)

    # fresh model with a LARGER speaker table (shape mismatch on spk_embed)
    cfg2 = _tiny_cfg(num_spk=5)
    cfg2.update(
        finetune_enabled=True,
        finetune_ckpt_path=str(ckpt_path),
        finetune_ignored_params=["model.fs2.txt_embed"],
        finetune_strict_shapes=False,
    )
    model2, _, _ = build_acoustic(cfg2, VOCAB)
    fresh = init_acoustic_state(model2, cfg2, VOCAB, jax.random.PRNGKey(1)).params
    merged = load_finetune_params(fresh, cfg2, "acoustic")

    # non-blacklisted tensor adopted from the checkpoint
    np.testing.assert_array_equal(
        _leaf(merged, "fs2.pitch_embed.kernel"),
        _leaf(state.params, "fs2.pitch_embed.kernel"),
    )
    # blacklisted tensor keeps the fresh initialization
    np.testing.assert_array_equal(
        _leaf(merged, "fs2.txt_embed.embedding"),
        _leaf(fresh, "fs2.txt_embed.embedding"),
    )
    assert not np.array_equal(
        _leaf(merged, "fs2.txt_embed.embedding"),
        _leaf(state.params, "fs2.txt_embed.embedding"),
    )
    # shape-mismatched speaker table skipped (not an error)
    assert _leaf(merged, "fs2.spk_embed.embedding").shape[0] == 5

    # strict shapes -> hard error on the same mismatch
    cfg2["finetune_strict_shapes"] = True
    with pytest.raises(ValueError, match="Shape mismatch"):
        load_finetune_params(fresh, cfg2, "acoustic")

    # category guard
    with pytest.raises(ValueError, match="category"):
        load_finetune_params(fresh, cfg2, "variance")


def test_freezing_masks_updates():
    params = {
        "fs2": {"txt_embed": {"embedding": jnp.ones((4, 8))},
                "pitch_embed": {"kernel": jnp.ones((1, 8))}},
        "backbone": {"w": jnp.ones((8, 8))},
    }
    labels = freeze_mask(params, ["model.fs2.txt_embed"])
    assert labels["fs2"]["txt_embed"]["embedding"] == "frozen"
    assert labels["fs2"]["pitch_embed"]["kernel"] == "trainable"
    assert labels["backbone"]["w"] == "trainable"

    import optax

    tx = wrap_optimizer_with_freezing(optax.sgd(0.5), params, ["model.fs2.txt_embed"])
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    new = optax.apply_updates(params, updates)
    np.testing.assert_array_equal(
        np.asarray(new["fs2"]["txt_embed"]["embedding"]), 1.0 * np.ones((4, 8))
    )  # frozen: unchanged
    assert not np.allclose(np.asarray(new["backbone"]["w"]), 1.0)  # trainable: moved
