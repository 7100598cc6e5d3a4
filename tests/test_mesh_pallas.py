"""Pallas marching-cubes kernel vs the XLA reference path."""

import jax
import jax.numpy as jnp
import numpy as np

from isaac_ros_nvblox_tpu.core.block_pool import BlockPool, BlockTable
from isaac_ros_nvblox_tpu.core.types import voxel_centers_for_blocks
from isaac_ros_nvblox_tpu.models.scene import Scene, Sphere
from isaac_ros_nvblox_tpu.ops.mesh import marching_cubes_blocks
from isaac_ros_nvblox_tpu.ops.mesh_pallas import (corner_stacks,
                                                  marching_cubes_pallas)

VOXEL = 0.05
INTERP = jax.default_backend() == "cpu"


def _make_pool(radius=0.35, center=(0.31, 0.29, 0.27)):
    scene = Scene(primitives=(Sphere(center=center, radius=radius),))
    bs = 8 * VOXEL
    lo = np.floor((np.asarray(center) - radius - 4 * VOXEL) / bs).astype(int)
    hi = np.floor((np.asarray(center) + radius + 4 * VOXEL) / bs).astype(int)
    idx = np.array([(x, y, z)
                    for x in range(lo[0], hi[0] + 1)
                    for y in range(lo[1], hi[1] + 1)
                    for z in range(lo[2], hi[2] + 1)], np.int32)
    table = BlockTable(len(idx) + 8)
    pool = BlockPool(table, {"tsdf_distance": ((), jnp.float32),
                             "tsdf_weight": ((), jnp.float32)})
    slots, _ = table.allocate(idx)
    centers = voxel_centers_for_blocks(jnp.asarray(idx), VOXEL)
    sdf = jnp.clip(scene.sdf(centers), -0.2, 0.2)
    pool["tsdf_distance"] = pool["tsdf_distance"].at[jnp.asarray(slots)].set(sdf)
    pool["tsdf_weight"] = pool["tsdf_weight"].at[jnp.asarray(slots)].set(1.0)
    return table, pool, idx, slots


def test_pallas_mc_matches_xla_triangles():
    table, pool, idx, slots = _make_pool()
    nbrs = jnp.asarray(table.neighbors[slots])
    bidx = jnp.asarray(idx)
    tsdf_grid = pool.voxel_grid_view("tsdf_distance")
    weight_grid = pool.voxel_grid_view("tsdf_weight")
    color_grid = jnp.zeros(tsdf_grid.shape + (3,), jnp.float32)

    v_ref, _, valid_ref = marching_cubes_blocks(
        tsdf_grid, weight_grid, color_grid, nbrs, bidx,
        voxel_size_m=VOXEL, min_weight=1e-4)

    cd, cw = corner_stacks(tsdf_grid, weight_grid, nbrs)
    verts, mask = marching_cubes_pallas(
        cd, cw, bidx, jnp.ones((len(slots),), jnp.int32),
        voxel_size_m=VOXEL, min_weight=1e-4, interpret=INTERP)

    # Reference soup -> set of triangles.
    v_ref = np.asarray(v_ref)           # [N,512,5,3,3]
    valid_ref = np.asarray(valid_ref)   # [N,512,5]
    tris_ref = v_ref[valid_ref]         # [T,3,3]
    assert tris_ref.shape[0] > 100

    # Pallas soup: verts [N,3,16,512], mask [N,16,512]; slot k -> tri k//3.
    verts = np.asarray(verts)
    mask = np.asarray(mask) > 0.5
    N = verts.shape[0]
    vx = verts[:, 0].transpose(0, 2, 1)  # [N,512,16]
    vy = verts[:, 1].transpose(0, 2, 1)
    vz = verts[:, 2].transpose(0, 2, 1)
    m = mask.transpose(0, 2, 1)          # [N,512,16]
    tri_valid = m[..., 0:15:3]           # first vertex of each tri [N,512,5]
    np.testing.assert_array_equal(tri_valid, valid_ref)

    pts = np.stack([vx, vy, vz], axis=-1)[..., :15, :]  # [N,512,15,3]
    tris_pal = pts.reshape(N, 512, 5, 3, 3)[valid_ref]
    np.testing.assert_allclose(tris_pal, tris_ref, atol=1e-5)
