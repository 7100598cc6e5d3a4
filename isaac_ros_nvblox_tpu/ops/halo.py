"""Halo gathering: assemble padded per-block neighborhoods from the pool.

The reference's CUDA kernels chase hash-table pointers to read neighboring
blocks' voxels (e.g. marching cubes needs the +1 corner, the ESDF sweep needs
the full 26-neighborhood). On TPU we instead materialize a padded block
tensor `[N, 8+lo+hi, ...]` with static gathers driven by the host-maintained
neighbor-slot table (core/block_pool.py) — 27 dense slice copies, no pointer
chasing, fully fusible by XLA.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax.numpy as jnp

from isaac_ros_nvblox_tpu.core.types import VOXELS_PER_SIDE

B = VOXELS_PER_SIDE


def _ranges(d: int, lo: int, hi: int) -> Tuple[slice, slice]:
    """(dst_slice, src_slice) along one axis for neighbor offset d."""
    if d == -1:
        return slice(0, lo), slice(B - lo, B)
    if d == 0:
        return slice(lo, lo + B), slice(0, B)
    return slice(lo + B, lo + B + hi), slice(0, hi)


def gather_halo(grid_channel, neighbor_slots, *, lo: int = 1, hi: int = 1,
                fill=0.0):
    """Build padded neighborhoods `[N, B+lo+hi, B+lo+hi, B+lo+hi, ...]`.

    Args:
      grid_channel: pool channel as a grid view `[cap, 8, 8, 8, ...]`.
      neighbor_slots: `i32[N, 27]` neighbor slot rows (order of
        NEIGHBOR_OFFSETS; -1 = absent). Entry 13 is the block itself.
      lo, hi: halo width on the negative / positive side (0 or 1).
      fill: value for absent neighbors.

    Missing neighbors contribute `fill`.
    """
    cap = grid_channel.shape[0]
    P = B + lo + hi
    trailing = grid_channel.shape[4:]
    N = neighbor_slots.shape[0]
    out = jnp.full((N, P, P, P) + trailing, fill, grid_channel.dtype)

    n = 0
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                skip = ((dx == -1 and lo == 0) or (dx == 1 and hi == 0)
                        or (dy == -1 and lo == 0) or (dy == 1 and hi == 0)
                        or (dz == -1 and lo == 0) or (dz == 1 and hi == 0))
                if not skip:
                    dst_x, src_x = _ranges(dx, lo, hi)
                    dst_y, src_y = _ranges(dy, lo, hi)
                    dst_z, src_z = _ranges(dz, lo, hi)
                    ns = neighbor_slots[:, n]
                    data = grid_channel[jnp.clip(ns, 0, cap - 1),
                                        src_x, src_y, src_z]
                    mask = (ns >= 0).reshape((N,) + (1,) * (data.ndim - 1))
                    data = jnp.where(mask, data,
                                     jnp.asarray(fill, grid_channel.dtype))
                    out = out.at[:, dst_x, dst_y, dst_z].set(data)
                n += 1
    return out
