"""Task assembly: wire config -> datasets, model, train/val steps, Trainer.

Equivalent of AcousticTask / VarianceTask construction in
``/root/reference/training/*_task.py`` + ``basics/base_task.py``.
"""

from __future__ import annotations

import shutil
from functools import partial
from pathlib import Path

import jax
import numpy as np

from ..data.dataset import AcousticDataset, VarianceDataset
from ..utils.phonemes import PhonemeDictionary, locate_dictionary
from ..utils.text_encoder import TokenTextEncoder
from .acoustic import (
    acoustic_losses,
    build_acoustic,
    init_acoustic_state,
    make_acoustic_train_step,
)
from .trainer import Trainer
from .variance import (
    build_variance,
    init_variance_state,
    make_variance_train_step,
    variance_losses,
)


def _prepare_work_dir(cfg):
    work_dir = Path(cfg["work_dir"])
    work_dir.mkdir(parents=True, exist_ok=True)
    cfg.save(work_dir / "config.yaml")
    # archive spk_map + dictionary (ref: base_task.py:449-467)
    binary_dir = Path(cfg["binary_data_dir"])
    if (binary_dir / "spk_map.json").exists():
        shutil.copy(binary_dir / "spk_map.json", work_dir / "spk_map.json")
    dict_path = locate_dictionary(cfg.get("dictionary"), str(binary_dir))
    shutil.copy(dict_path, work_dir / "dictionary.txt")
    return work_dir


def build_phone_encoder(cfg) -> TokenTextEncoder:
    dict_path = locate_dictionary(
        cfg.get("dictionary"), cfg.get("binary_data_dir") or cfg.get("work_dir")
    )
    return TokenTextEncoder(PhonemeDictionary.load(dict_path).phoneme_list)


def build_acoustic_trainer(cfg) -> Trainer:
    _prepare_work_dir(cfg)
    encoder = build_phone_encoder(cfg)
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if "bf16" in str(cfg.get("precision", "bf16-mixed")) else jnp.float32
    model, core, normalizer = build_acoustic(cfg, encoder.vocab_size, dtype=dtype)
    state = init_acoustic_state(model, cfg, encoder.vocab_size, jax.random.PRNGKey(0))
    train_step = make_acoustic_train_step(model, core, normalizer, cfg)

    def val_losses(params, batch, key):
        return acoustic_losses(
            model, core, normalizer, cfg, {"params": params}, batch, key,
            deterministic=True,
        )

    train_ds = AcousticDataset(cfg["binary_data_dir"], "train", cfg)
    valid_ds = AcousticDataset(cfg["binary_data_dir"], "valid", cfg)
    return Trainer(
        cfg, state, train_step, val_losses, train_ds, valid_ds, category="acoustic",
    )


def build_variance_trainer(cfg) -> Trainer:
    _prepare_work_dir(cfg)
    encoder = build_phone_encoder(cfg)
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if "bf16" in str(cfg.get("precision", "bf16-mixed")) else jnp.float32
    model, core, normalizers = build_variance(cfg, encoder.vocab_size, dtype=dtype)
    state = init_variance_state(model, cfg, encoder.vocab_size, jax.random.PRNGKey(0))
    train_step = make_variance_train_step(model, core, normalizers, cfg)

    def val_losses(params, batch, key):
        return variance_losses(
            model, core, normalizers, cfg, {"params": params}, batch, key,
            deterministic=True,
        )

    train_ds = VarianceDataset(cfg["binary_data_dir"], "train", cfg)
    valid_ds = VarianceDataset(cfg["binary_data_dir"], "valid", cfg)
    return Trainer(
        cfg, state, train_step, val_losses, train_ds, valid_ds, category="variance",
    )


TASKS = {
    "acoustic": build_acoustic_trainer,
    "variance": build_variance_trainer,
}


def build_trainer_from_config(cfg) -> Trainer:
    task_cls = cfg.get("task_cls", "")
    if "acoustic" in str(task_cls).lower():
        return build_acoustic_trainer(cfg)
    if "variance" in str(task_cls).lower():
        return build_variance_trainer(cfg)
    raise ValueError(f"Cannot infer task from task_cls={task_cls!r}")
