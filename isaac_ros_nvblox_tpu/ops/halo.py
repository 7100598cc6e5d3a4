"""Halo gathering: assemble padded per-block neighborhoods from the pool.

The reference's CUDA kernels chase hash-table pointers to read neighboring
blocks' voxels (e.g. marching cubes needs the +1 corner, the ESDF sweep
needs the full 26-neighborhood). On TPU, the fast construction is **row
gathers + static concatenation**: gather whole neighbor blocks by slot
(row-granular gathers run ~30x faster than sliced or per-element gathers on
TPU), then slice the needed faces/edges/corners and concatenate along each
axis — pure copies, no scatters, no element gathers.
"""

from __future__ import annotations

import jax.numpy as jnp

from isaac_ros_nvblox_tpu.core.types import VOXELS_PER_SIDE

B = VOXELS_PER_SIDE


def gather_halo(grid_channel, neighbor_slots, *, lo: int = 1, hi: int = 1,
                fill=0.0):
    """Build padded neighborhoods `[N, B+lo+hi, B+lo+hi, B+lo+hi, ...]`.

    Args:
      grid_channel: pool channel as a grid view `[cap, 8, 8, 8, ...]`.
      neighbor_slots: `i32[N, 27]` neighbor slot rows (order of
        core/block_pool.NEIGHBOR_OFFSETS; -1 = absent). Entry 13 is the
        block itself.
      lo, hi: halo width on the negative / positive side (0 or 1).
      fill: value for absent neighbors.
    """
    cap = grid_channel.shape[0]
    trailing = grid_channel.shape[4:]
    N = neighbor_slots.shape[0]
    fill_c = jnp.asarray(fill, grid_channel.dtype)

    def blocks_of(col):
        ns = neighbor_slots[:, col]
        data = grid_channel[jnp.clip(ns, 0, cap - 1)]
        mask = (ns >= 0).reshape((N, 1, 1, 1) + (1,) * len(trailing))
        return jnp.where(mask, data, fill_c)

    def src(d):
        if d == -1:
            return slice(B - lo, B)
        if d == 0:
            return slice(0, B)
        return slice(0, hi)

    ds_lo = ([-1] if lo else [])
    ds_hi = ([1] if hi else [])
    x_slabs = []
    for dx in ds_lo + [0] + ds_hi:
        y_slabs = []
        for dy in ds_lo + [0] + ds_hi:
            z_parts = []
            for dz in ds_lo + [0] + ds_hi:
                col = (dx + 1) * 9 + (dy + 1) * 3 + (dz + 1)
                z_parts.append(blocks_of(col)[:, src(dx), src(dy), src(dz)])
            y_slabs.append(jnp.concatenate(z_parts, axis=3)
                           if len(z_parts) > 1 else z_parts[0])
        x_slabs.append(jnp.concatenate(y_slabs, axis=2)
                       if len(y_slabs) > 1 else y_slabs[0])
    return jnp.concatenate(x_slabs, axis=1) if len(x_slabs) > 1 else x_slabs[0]


def gather_halo_sliced(grid_channel, neighbor_slots, *, lo: int = 1,
                       hi: int = 1, fill=0.0):
    """Sliced-gather halo construction (27 sliced row-gathers + updates).

    Moves only the halo shell's voxels (~1/14th of the row-gather form for
    the full +-1 neighborhood), at the cost of sliced gathers. Used by the
    ESDF outer loop where the 27-neighbor data blowup of the row-gather
    form dominates.
    """
    cap = grid_channel.shape[0]
    P = B + lo + hi
    trailing = grid_channel.shape[4:]
    N = neighbor_slots.shape[0]
    out = jnp.full((N, P, P, P) + trailing, fill, grid_channel.dtype)

    def _ranges(d):
        if d == -1:
            return slice(0, lo), slice(B - lo, B)
        if d == 0:
            return slice(lo, lo + B), slice(0, B)
        return slice(lo + B, lo + B + hi), slice(0, hi)

    n = 0
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                skip = ((dx == -1 and lo == 0) or (dx == 1 and hi == 0)
                        or (dy == -1 and lo == 0) or (dy == 1 and hi == 0)
                        or (dz == -1 and lo == 0) or (dz == 1 and hi == 0))
                if not skip:
                    dst_x, src_x = _ranges(dx)
                    dst_y, src_y = _ranges(dy)
                    dst_z, src_z = _ranges(dz)
                    ns = neighbor_slots[:, n]
                    data = grid_channel[jnp.clip(ns, 0, cap - 1),
                                        src_x, src_y, src_z]
                    mask = (ns >= 0).reshape((N,) + (1,) * (data.ndim - 1))
                    data = jnp.where(mask, data,
                                     jnp.asarray(fill, grid_channel.dtype))
                    out = out.at[:, dst_x, dst_y, dst_z].set(data)
                n += 1
    return out
