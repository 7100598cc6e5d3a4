"""Unified3DGrid: dense materialization of sparse layers over an AABB.

Reference: `voxelLayerToDenseVoxelGridInAABBAsync` + `Unified3DGrid<float>`
(esdf_and_gradients_conversions.cu:96-100,
test_esdf_and_gradient_conversions.cpp:39-50) — powering the
EsdfAndGradients service consumed by motion planners.

TPU design: the host builds a (grid-cell -> slot, voxel-linear-index) lookup
once per request (numpy, vectorized), then one device gather produces the
dense grid; gradients are central differences on the dense grid (one more
fused jit op).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isaac_ros_nvblox_tpu.core.types import VOXELS_PER_SIDE
from isaac_ros_nvblox_tpu.ops.esdf import INF_SQ

B = VOXELS_PER_SIDE


def dense_voxel_lookup(table, aabb_min_m, aabb_max_m, voxel_size_m: float
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host: (slot i32[X,Y,Z], voxel_linear i32[X,Y,Z], origin_m f64[3]).

    Grid cells are voxel centers starting at the voxel containing
    aabb_min. slot == -1 where no block is allocated.
    """
    g0 = np.floor(np.asarray(aabb_min_m, np.float64) / voxel_size_m).astype(np.int64)
    g1 = np.floor(np.asarray(aabb_max_m, np.float64) / voxel_size_m).astype(np.int64)
    dims = (g1 - g0 + 1).astype(int)
    gx = g0[0] + np.arange(dims[0])
    gy = g0[1] + np.arange(dims[1])
    gz = g0[2] + np.arange(dims[2])
    bx, lx = np.divmod(gx, B)
    by, ly = np.divmod(gy, B)
    bz, lz = np.divmod(gz, B)
    # Unique blocks along each axis -> small dict lookups.
    ubx, ix = np.unique(bx, return_inverse=True)
    uby, iy = np.unique(by, return_inverse=True)
    ubz, iz = np.unique(bz, return_inverse=True)
    slot_cube = np.full((ubx.size, uby.size, ubz.size), -1, np.int32)
    for a, bxa in enumerate(ubx.tolist()):
        for b, byb in enumerate(uby.tolist()):
            for c, bzc in enumerate(ubz.tolist()):
                slot_cube[a, b, c] = table.slot_of((bxa, byb, bzc))
    slot = slot_cube[np.ix_(ix, iy, iz)]
    voxel_linear = ((lx[:, None, None] * B + ly[None, :, None]) * B
                    + lz[None, None, :]).astype(np.int32)
    origin_m = (g0.astype(np.float64) + 0.5) * voxel_size_m
    return slot, np.broadcast_to(voxel_linear, slot.shape).copy(), origin_m


@jax.jit
def gather_dense(channel, slot, voxel_linear, fill):
    """Device gather: channel f32[cap, 512] -> dense f32[X, Y, Z]."""
    cap = channel.shape[0]
    vals = channel[jnp.clip(slot, 0, cap - 1).reshape(-1),
                   voxel_linear.reshape(-1)].reshape(slot.shape)
    return jnp.where(slot >= 0, vals, fill)


@jax.jit
def central_gradients(grid, voxel_size_m):
    """Central-difference gradients f32[X, Y, Z, 3] with one-sided edges."""
    def diff(axis):
        fwd = jnp.concatenate([grid.take(jnp.arange(1, grid.shape[axis]),
                                         axis=axis),
                               grid.take(jnp.asarray([grid.shape[axis] - 1]),
                                         axis=axis)], axis=axis)
        bwd = jnp.concatenate([grid.take(jnp.asarray([0]), axis=axis),
                               grid.take(jnp.arange(0, grid.shape[axis] - 1),
                                         axis=axis)], axis=axis)
        # Spacing: 2 voxels interior, 1 voxel at the two faces.
        n = grid.shape[axis]
        idx = jnp.arange(n)
        spacing = jnp.where((idx == 0) | (idx == n - 1), 1.0, 2.0)
        shape = [1, 1, 1]
        shape[axis] = n
        return (fwd - bwd) / (spacing.reshape(shape) * voxel_size_m)
    return jnp.stack([diff(0), diff(1), diff(2)], axis=-1)


def esdf_and_gradients(mapper, aabb_min_m, aabb_max_m):
    """Full service response (parity: EsdfAndGradientsConverter::
    getEsdfAndGradientResponse, esdf_and_gradients_conversions.cu:50-86)."""
    from isaac_ros_nvblox_tpu.runtime.msgs import EsdfAndGradientsResponse

    vs = mapper.voxel_size_m
    slot, voxel_linear, origin = dense_voxel_lookup(
        mapper.table, aabb_min_m, aabb_max_m, vs)
    slot_d = jnp.asarray(slot)
    lin_d = jnp.asarray(voxel_linear)
    sq = gather_dense(mapper.pool["esdf_sq_dist"], slot_d, lin_d,
                      jnp.float32(INF_SQ))
    inside = gather_dense(
        mapper.pool["esdf_is_inside"].astype(jnp.float32), slot_d, lin_d,
        jnp.float32(0.0))
    max_d = mapper.params.esdf.max_esdf_distance_m
    dist = jnp.minimum(jnp.sqrt(jnp.minimum(sq, INF_SQ)) * vs, max_d)
    dist = jnp.where(inside > 0.5, -dist, dist)
    grads = central_gradients(dist, jnp.float32(vs))
    return EsdfAndGradientsResponse(
        success=True, origin_m=tuple(origin), voxel_size_m=vs,
        esdf=np.asarray(dist), gradients=np.asarray(grads))
