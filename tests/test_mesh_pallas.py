"""Fused Pallas marching-cubes kernel vs the XLA reference path."""

import jax
import jax.numpy as jnp
import numpy as np

from isaac_ros_nvblox_tpu.core.block_pool import BlockPool, BlockTable
from isaac_ros_nvblox_tpu.core.types import voxel_centers_for_blocks
from isaac_ros_nvblox_tpu.models.scene import Scene, Sphere
from isaac_ros_nvblox_tpu.ops.mesh import marching_cubes_blocks
from isaac_ros_nvblox_tpu.ops.mesh_pallas import (NEIGHBOR_COLS,
                                                  local_to_world_verts,
                                                  marching_cubes_fused)

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
    # Smooth synthetic color field (x+y+z based) for interpolation checks.
    col = (jnp.sum(centers, axis=-1) * 40.0) % 255.0
    colors = []
    for ch in range(3):
        c = jnp.zeros_like(pool["tsdf_distance"])
        colors.append(c.at[jnp.asarray(slots)].set((col + 30.0 * ch) % 255.0))
    return table, pool, idx, slots, colors


def test_fused_mc_matches_xla_triangles():
    table, pool, idx, slots, colors = _make_pool()
    nbrs = jnp.asarray(table.neighbors[slots])
    bidx = jnp.asarray(idx)
    tsdf_grid = pool.voxel_grid_view("tsdf_distance")
    weight_grid = pool.voxel_grid_view("tsdf_weight")
    color_grid = jnp.stack(colors, axis=-1).reshape(
        tsdf_grid.shape + (3,))

    v_ref, c_ref, valid_ref = marching_cubes_blocks(
        tsdf_grid, weight_grid, color_grid, nbrs, bidx,
        voxel_size_m=VOXEL, min_weight=1e-4)

    nbr8 = nbrs[:, jnp.asarray(NEIGHBOR_COLS)]
    from isaac_ros_nvblox_tpu.ops.mesh_pallas import resolve_edge_soup
    verts_e, colors_e, mc_table = marching_cubes_fused(
        pool["tsdf_distance"], pool["tsdf_weight"], tuple(colors), nbr8,
        jnp.ones((len(slots),), jnp.int32), min_weight=1e-4,
        with_color=True, interpret=INTERP)
    verts, vcols = resolve_edge_soup(verts_e, colors_e, mc_table,
                                     with_color=True)

    # Reference soup -> per-slot layout matching the kernel's.
    v_ref = np.asarray(v_ref)           # [N,512,5,3,3] world meters
    c_ref = np.asarray(c_ref)
    valid_ref = np.asarray(valid_ref)   # [N,512,5]
    tris_ref = v_ref[valid_ref]
    assert tris_ref.shape[0] > 100

    world, mask = local_to_world_verts(verts, bidx, VOXEL)
    world = np.asarray(world)           # [N,3,16,512]
    mask = np.asarray(mask)             # [N,16,512]
    N = world.shape[0]
    pts = np.stack([world[:, 0], world[:, 1], world[:, 2]], axis=-1)
    pts = pts.transpose(0, 2, 1, 3)[:, :, :15, :]       # [N,512,15,3]
    m = mask.transpose(0, 2, 1)[:, :, :15]              # [N,512,15]
    tri_valid = m[..., 0::3]                            # [N,512,5]
    np.testing.assert_array_equal(tri_valid, valid_ref)

    tris_pal = pts.reshape(N, 512, 5, 3, 3)[valid_ref]
    # bf16 block-local quantization: |err| <= 2^-8 * 9 voxels * voxel size.
    atol = (2 ** -8) * 9 * VOXEL
    np.testing.assert_allclose(tris_pal, tris_ref, atol=atol)

    # Per-vertex colors: same edge interpolation as the XLA path (bf16).
    vc = np.asarray(vcols)              # [N,3,16,512]
    cols = np.stack([vc[:, 0], vc[:, 1], vc[:, 2]], axis=-1)
    cols = cols.transpose(0, 2, 1, 3)[:, :, :15, :]
    cols_pal = cols.reshape(N, 512, 5, 3, 3)[valid_ref]
    cols_ref = c_ref[valid_ref]
    np.testing.assert_allclose(cols_pal, cols_ref, atol=1.5)  # bf16 @ 255


def test_fused_mc_absent_neighbors_suppress_edge_cubes():
    """Cubes needing an absent +1 neighbor must emit nothing."""
    table, pool, idx, slots, colors = _make_pool()
    # Single block, no neighbors.
    s0 = slots[len(slots) // 2]
    nbr8 = np.full((1, 8), -1, np.int32)
    nbr8[0, 0] = s0
    from isaac_ros_nvblox_tpu.ops.mesh_pallas import resolve_edge_soup
    verts_e, _, mc_table = marching_cubes_fused(
        pool["tsdf_distance"], pool["tsdf_weight"], None,
        jnp.asarray(nbr8), jnp.ones((1,), jnp.int32), min_weight=1e-4,
        with_color=False, interpret=INTERP)
    verts, _ = resolve_edge_soup(verts_e, None, mc_table,
                                 with_color=False)
    verts = np.asarray(verts.astype(jnp.float32))  # [1,3,16,512]
    mask = verts[0, 0] >= 0                        # [16,512]
    lanes = np.arange(512)
    lx, ly, lz = lanes // 64, (lanes // 8) % 8, lanes % 8
    edge = (lx == 7) | (ly == 7) | (lz == 7)
    # Any cube on a +1 face requires a missing neighbor -> no triangles.
    assert not mask[:, edge].any()
