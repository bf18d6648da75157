"""Vocoder registry (parity: /root/reference/modules/vocoders/registry.py)."""

from __future__ import annotations

VOCODERS = {}


def register_vocoder(cls):
    VOCODERS[cls.__name__] = cls
    return cls


def get_vocoder_cls(name: str):
    return VOCODERS[name]
