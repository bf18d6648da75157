"""Vocoder registry (parity: /root/reference/modules/vocoders/registry.py).

Matches the reference's lookup semantics: classes are registered under both
their class name and its lowercase form, and an unknown name is resolved as
a dotted import path (``pkg.mod.Class``) so user vocoders plug in without
touching the registry.
"""

from __future__ import annotations

import importlib

VOCODERS = {}


def register_vocoder(cls):
    VOCODERS[cls.__name__.lower()] = cls
    VOCODERS[cls.__name__] = cls
    return cls


def get_vocoder_cls(name: str):
    if name in VOCODERS:
        return VOCODERS[name]
    if "." in name:
        pkg, _, cls_name = name.rpartition(".")
        return getattr(importlib.import_module(pkg), cls_name)
    raise KeyError(
        f"unknown vocoder {name!r}; registered: {sorted(VOCODERS)} "
        "(or pass a dotted import path pkg.mod.Class)"
    )
