"""Denoiser backbones.

Registry mirrors ``/root/reference/modules/backbones/__init__.py``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...utils import filter_kwargs
from .lynxnet import LYNXNet
from .wavenet import WaveNet

BACKBONES = {"wavenet": WaveNet, "lynxnet": LYNXNet}


def build_backbone(
    out_dims: int,
    num_feats: int,
    backbone_type: str,
    backbone_args: dict,
    cond_dims: int = 256,
    dtype=jnp.float32,
):
    cls = BACKBONES[backbone_type]
    kwargs = dict(backbone_args or {})
    kwargs.update(in_dims=out_dims, n_feats=num_feats, cond_dims=cond_dims, dtype=dtype)
    return cls(**filter_kwargs(kwargs, cls.__init__))
