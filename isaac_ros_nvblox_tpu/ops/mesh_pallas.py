"""Pallas TPU kernel for marching-cubes triangle emission.

The XLA meshing path (ops/mesh.py) is dominated by element gathers: the
256-case table lookup and the per-triangle edge-vertex selection are ~50M
gathered elements per 2k-block batch (~0.5 s at TPU gather throughput).
This kernel replaces every lookup with one-hot matmuls / masked reduces:

    config one-hot   OH  (256, 512) = (iota == config)
    triangle edges   E   (15, 512)  = tri_table^T (15,256) @ OH      [MXU]
    edge endpoints   DA  (12, 512)  = A (12,8) @ corner_values (8,512) [MXU]
    per-slot select  v_k (1, 512)   = sum_e (iota12 == E_k) * P_e     [VPU]

Corner extraction (the +1 halo) stays in XLA (static slice copies); the
kernel receives corner-major arrays `[N, 8, 512]` and emits fixed-capacity
triangle soup `[N, 3, 16, 512]` (xyz-major, 15 tri-vertex slots padded to
16) plus a validity mask, compacted on the host at export time.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from isaac_ros_nvblox_tpu.ops.mesh_tables import (CORNERS, EDGES,
                                                  MAX_TRIS_PER_CUBE,
                                                  build_tables)

V = 512
K_SLOTS = MAX_TRIS_PER_CUBE * 3      # 15 triangle-vertex slots
K_PAD = 16


@functools.lru_cache(maxsize=1)
def _edge_constants():
    """Constant matrices for edge endpoint selection and positions."""
    ea = np.asarray([e[0] for e in EDGES])
    eb = np.asarray([e[1] for e in EDGES])
    A = np.zeros((12, 8), np.float32)
    Bm = np.zeros((12, 8), np.float32)
    A[np.arange(12), ea] = 1.0
    Bm[np.arange(12), eb] = 1.0
    pa = CORNERS[ea].astype(np.float32)   # [12, 3]
    pb = CORNERS[eb].astype(np.float32)
    tri_table, tri_counts, _, _ = build_tables()
    ttT = tri_table.astype(np.float32).T  # [15, 256] (-1 padded)
    return A, Bm, pa, pb, ttT, tri_counts.astype(np.float32)


def _kernel(bx_ref, by_ref, bz_ref, valid_ref, ttT_ref, counts_ref,
            A_ref, B_ref, pp_ref, cd_ref, cw_ref,
            vx_ref, vy_ref, vz_ref, mask_ref,
            *, voxel_size_m: float, min_weight: float):
    i = pl.program_id(0)

    cd = cd_ref[0]   # (8, 512) corner distances
    cw = cw_ref[0]   # (8, 512) corner weights

    cube_ok = jnp.min(cw, axis=0, keepdims=True) >= min_weight  # (1,512)
    cube_ok = cube_ok & (valid_ref[i] > 0)

    bits = (cd < 0.0).astype(jnp.float32)                        # (8,512)
    pow2 = jnp.exp2(jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
                    .astype(jnp.float32))
    config = jnp.sum(bits * pow2, axis=0, keepdims=True)         # (1,512)
    config = jnp.where(cube_ok, config, 0.0)
    config_i = config.astype(jnp.int32)

    iota256 = jax.lax.broadcasted_iota(jnp.int32, (256, V), 0)
    oh = (iota256 == config_i).astype(jnp.float32)               # (256,512)

    n_tris = jnp.dot(counts_ref[:, :], oh,
                     preferred_element_type=jnp.float32)         # (1,512)
    edges = jnp.dot(ttT_ref[:, :], oh,
                    preferred_element_type=jnp.float32)          # (15,512)

    # Edge endpoint values/positions for all 12 edges at every cube.
    da = jnp.dot(A_ref[:, :], cd, preferred_element_type=jnp.float32)
    db = jnp.dot(B_ref[:, :], cd, preferred_element_type=jnp.float32)
    denom = da - db
    t = da / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12)
    t = jnp.clip(t, 0.0, 1.0)
    pax = pp_ref[:, 0:1]
    pay = pp_ref[:, 1:2]
    paz = pp_ref[:, 2:3]
    pbx = pp_ref[:, 3:4]
    pby = pp_ref[:, 4:5]
    pbz = pp_ref[:, 5:6]
    ex = pax + t * (pbx - pax)                                   # (12,512)
    ey = pay + t * (pby - pay)
    ez = paz + t * (pbz - paz)

    # Cube base coordinates (voxel within block + block origin).
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1)
    gx = (lane // 64).astype(jnp.float32)
    gy = ((lane // 8) % 8).astype(jnp.float32)
    gz = (lane % 8).astype(jnp.float32)
    base_x = bx_ref[i].astype(jnp.float32) * 8.0 + gx
    base_y = by_ref[i].astype(jnp.float32) * 8.0 + gy
    base_z = bz_ref[i].astype(jnp.float32) * 8.0 + gz

    iota12 = jax.lax.broadcasted_iota(jnp.int32, (12, V), 0) \
        .astype(jnp.float32)
    for k in range(K_SLOTS):
        e_k = edges[k:k + 1, :]                                  # (1,512)
        ohe = (iota12 == e_k).astype(jnp.float32)                # (12,512)
        vx = jnp.sum(ohe * ex, axis=0, keepdims=True)
        vy = jnp.sum(ohe * ey, axis=0, keepdims=True)
        vz = jnp.sum(ohe * ez, axis=0, keepdims=True)
        valid_k = cube_ok & (jnp.float32(k) < n_tris * 3.0) & (e_k >= 0.0)
        # Vertex position in meters (TSDF samples sit at voxel centers).
        vx_ref[0, k:k + 1, :] = (vx + base_x + 0.5) * voxel_size_m
        vy_ref[0, k:k + 1, :] = (vy + base_y + 0.5) * voxel_size_m
        vz_ref[0, k:k + 1, :] = (vz + base_z + 0.5) * voxel_size_m
        mask_ref[0, k:k + 1, :] = valid_k.astype(jnp.float32)
    zero_row = jnp.zeros((1, V), jnp.float32)
    for k in range(K_SLOTS, K_PAD):
        vx_ref[0, k:k + 1, :] = zero_row
        vy_ref[0, k:k + 1, :] = zero_row
        vz_ref[0, k:k + 1, :] = zero_row
        mask_ref[0, k:k + 1, :] = zero_row


@functools.partial(jax.jit,
                   static_argnames=("voxel_size_m", "min_weight", "interpret"))
def marching_cubes_pallas(corner_d, corner_w, block_indices, valid, *,
                          voxel_size_m: float, min_weight: float,
                          interpret: bool = False):
    """Triangle soup from corner-major TSDF samples.

    Args:
      corner_d, corner_w: f32[N, 8, 512] — 8 cube-corner samples per voxel
        (from the XLA halo/corner extraction).
      block_indices: i32[N, 3]; valid: i32[N] (0 = padding block).

    Returns (verts f32[N, 3, 16, 512] xyz-major, mask f32[N, 16, 512]).
    Triangle-vertex slot k of cube v belongs to triangle k//3.
    """
    N = corner_d.shape[0]
    A, Bm, pa, pb, ttT, tri_counts = _edge_constants()
    pp = np.concatenate([pa, pb, np.zeros((12, 2), np.float32)], axis=1)
    kernel = functools.partial(_kernel, voxel_size_m=float(voxel_size_m),
                               min_weight=float(min_weight))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # bx, by, bz, valid
        grid=(N,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # ttT (15,256)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # counts (1,256)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # A (12,8)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # B (12,8)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # pp (12,8)
            pl.BlockSpec((1, 8, V), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, V), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, K_PAD, V), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K_PAD, V), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K_PAD, V), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K_PAD, V), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    vx, vy, vz, mask = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((N, K_PAD, V), jnp.float32)] * 4,
        interpret=interpret,
    )(block_indices[:, 0].astype(jnp.int32),
      block_indices[:, 1].astype(jnp.int32),
      block_indices[:, 2].astype(jnp.int32),
      valid.astype(jnp.int32),
      jnp.asarray(ttT), jnp.asarray(tri_counts).reshape(1, 256),
      jnp.asarray(A), jnp.asarray(Bm), jnp.asarray(pp),
      corner_d, corner_w)
    verts = jnp.stack([vx, vy, vz], axis=1)  # [N, 3, 16, 512]
    return verts, mask


# Neighbor-table columns (core/block_pool.NEIGHBOR_OFFSETS order) for the
# positive-octant neighbors needed by the +1 marching-cubes halo.
_SELF, _XP, _YP, _ZP, _XYP, _XZP, _YZP, _XYZP = 13, 22, 16, 14, 25, 23, 17, 26


def corner_stacks(tsdf_grid, weight_grid, neighbor_slots):
    """XLA front half: +1 halo + corner-major stacking -> [N, 8, 512].

    Built from 8 *row* gathers (full neighbor blocks) plus static slice
    concatenations — row gathers run ~30x faster than the sliced-gather
    form on TPU, and concats are plain copies.
    """
    cap = tsdf_grid.shape[0]
    B = 8
    N = neighbor_slots.shape[0]

    def blocks_of(grid, col):
        ns = neighbor_slots[:, col]
        data = grid.reshape(cap, B, B, B)[jnp.clip(ns, 0, cap - 1)]
        mask = (ns >= 0).reshape(N, 1, 1, 1)
        return jnp.where(mask, data, 0.0)

    def padded(grid):
        own = blocks_of(grid, _SELF)
        xn = blocks_of(grid, _XP)
        yn = blocks_of(grid, _YP)
        zn = blocks_of(grid, _ZP)
        xyn = blocks_of(grid, _XYP)
        xzn = blocks_of(grid, _XZP)
        yzn = blocks_of(grid, _YZP)
        xyzn = blocks_of(grid, _XYZP)
        X = jnp.concatenate([own, xn[:, :1]], axis=1)           # [N,9,8,8]
        Y = jnp.concatenate([yn[:, :, :1], xyn[:, :1, :1]], axis=1)  # [N,9,1,8]
        XY = jnp.concatenate([X, Y], axis=2)                    # [N,9,9,8]
        Zx = jnp.concatenate([zn[:, :, :, :1], xzn[:, :1, :, :1]],
                             axis=1)                            # [N,9,8,1]
        Zy = jnp.concatenate([yzn[:, :, :1, :1], xyzn[:, :1, :1, :1]],
                             axis=1)                            # [N,9,1,1]
        Z = jnp.concatenate([Zx, Zy], axis=2)                   # [N,9,9,1]
        return jnp.concatenate([XY, Z], axis=3)                 # [N,9,9,9]

    def stack(pad):
        parts = [pad[:, cx:cx + B, cy:cy + B, cz:cz + B]
                 .reshape(pad.shape[0], 1, V)
                 for (cx, cy, cz) in np.asarray(CORNERS).tolist()]
        return jnp.concatenate(parts, axis=1)  # [N, 8, 512]

    return stack(padded(tsdf_grid)), stack(padded(weight_grid))
