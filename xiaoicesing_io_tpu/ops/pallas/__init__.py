"""Pallas TPU kernels for the hot compute paths."""

from __future__ import annotations

import jax.numpy as jnp


def flatten_batch_windows(x: jnp.ndarray, halo_l: int, halo_r: int, tile: int):
    """Flatten [B, T, C] sequences into one padded row axis and gather
    overlapping per-tile row windows for a row-tiled kernel grid.

    Each sequence gets ``halo_l`` zero rows before and ``halo_r`` after (the
    convolution's own SAME padding), so period = T + halo and windows never
    mix sequences.  Output row g of tile i is global row ``i*tile + g`` in
    LOGICAL coordinates (valid rows of sequence b are
    ``[b*period, b*period + T)``); window row j of tile i is logical row
    ``i*tile - halo_l + j``.

    Returns (windows [n_tiles, tile + halo, C], period, total_rows, n_tiles);
    callers unflatten with ``out[:total_rows].reshape(B, period, C)[:, :T]``.

    Shared by the LYNX conv-module, WaveNet block, and HiFiGAN resblock
    kernels — the halo/boundary arithmetic lives only here.
    """
    B, T, C = x.shape
    halo = halo_l + halo_r
    period = T + halo
    xp = jnp.pad(x, ((0, 0), (halo_l, halo_r), (0, 0))).reshape(B * period, C)
    total_rows = B * period
    n_tiles = (total_rows + tile - 1) // tile
    total = n_tiles * tile
    xp = jnp.pad(xp, ((0, total + halo - total_rows), (0, 0)))
    win_idx = (
        jnp.arange(n_tiles)[:, None] * tile + jnp.arange(tile + halo)[None, :]
    )
    return xp[win_idx], period, total_rows, n_tiles
