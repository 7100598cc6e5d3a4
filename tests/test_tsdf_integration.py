"""TSDF integration numeric tests against an analytic scene.

Pattern follows the reference's deterministic-layer unit tests
(nvblox_ros/test/unit_tests/test_esdf_and_gradient_conversions.cpp): build a
known scene, integrate, assert per-voxel values against ground truth.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from isaac_ros_nvblox_tpu.core.block_pool import BlockPool, BlockTable, pad_to_bucket
from isaac_ros_nvblox_tpu.core.types import (VOXELS_PER_BLOCK,
                                             voxel_centers_for_blocks)
from isaac_ros_nvblox_tpu.models.camera import Camera
from isaac_ros_nvblox_tpu.models.scene import (Scene, Sphere, default_test_scene,
                                               orbit_pose, render_depth)
from isaac_ros_nvblox_tpu.ops.tsdf import TsdfIntegratorParams, integrate_tsdf
from isaac_ros_nvblox_tpu.ops.view import blocks_in_view

VOXEL_SIZE = 0.05
CAMERA = Camera(fx=200.0, fy=200.0, cx=119.5, cy=89.5, width=240, height=180)


def make_pool(capacity=8192):
    table = BlockTable(capacity)
    pool = BlockPool(table, {
        "tsdf_distance": ((), jnp.float32),
        "tsdf_weight": ((), jnp.float32),
    })
    return table, pool


def integrate_frame(table, pool, depth, T_L_C, params):
    idx = blocks_in_view(depth, T_L_C, camera=CAMERA, voxel_size_m=VOXEL_SIZE,
                         max_distance_m=params.max_integration_distance_m,
                         truncation_m=params.truncation_m(VOXEL_SIZE))
    slots, fresh = table.allocate(idx)
    pool.reset_slots(slots[fresh])
    n_pad = pad_to_bucket(len(slots))
    slots_p = np.full((n_pad,), table.capacity, np.int32)
    slots_p[:len(slots)] = slots
    bidx_p = np.zeros((n_pad, 3), np.int32)
    bidx_p[:len(slots)] = idx
    d, w = integrate_tsdf(
        pool["tsdf_distance"], pool["tsdf_weight"],
        jnp.asarray(slots_p), jnp.asarray(bidx_p), depth,
        jnp.asarray(T_L_C), camera=CAMERA, voxel_size_m=VOXEL_SIZE,
        params=params)
    pool["tsdf_distance"] = d
    pool["tsdf_weight"] = w
    return idx


def test_blocks_in_view_cover_surface():
    scene = default_test_scene()
    T = jnp.asarray(orbit_pose(0.0))
    depth = render_depth(scene, CAMERA, T)
    assert float(jnp.max(depth)) > 1.0  # scene visible
    idx = blocks_in_view(depth, T, camera=CAMERA, voxel_size_m=VOXEL_SIZE,
                         max_distance_m=7.0, truncation_m=0.2)
    assert idx.shape[0] > 50
    # The camera's own block must be touched (rays start there).
    cam_block = np.floor(np.asarray(T)[:3, 3] / (8 * VOXEL_SIZE)).astype(np.int32)
    assert any((idx == cam_block).all(axis=1))


def test_touched_grid_never_clips_at_boundary():
    """The frustum-recentred view grid (enclosing-sphere geometry) must
    fully contain every block the touch criterion can mark: no touched
    cell may ever sit on the grid's outer shell, for any camera pitch."""
    from isaac_ros_nvblox_tpu.ops.view import touched_block_grid
    scene = default_test_scene()
    for k in range(6):
        T = jnp.asarray(orbit_pose(2 * np.pi * k / 6, radius=1.5,
                                   height=0.5 + 0.8 * np.sin(2.1 * k)))
        depth = render_depth(scene, CAMERA, T)
        grid, _ = touched_block_grid(
            depth, T, camera=CAMERA, voxel_size_m=VOXEL_SIZE,
            max_distance_m=5.0, truncation_m=0.2, subsample=1)
        g = np.asarray(grid)
        shell = int(g.sum() - g[1:-1, 1:-1, 1:-1].sum())
        assert shell == 0, f"frame {k}: {shell} touched cells clipped"


def test_tsdf_matches_analytic_sdf():
    """Fused TSDF near the surface should match the analytic SDF within ~a voxel."""
    scene = default_test_scene()
    params = TsdfIntegratorParams(
        weighting_mode=__import__(
            "isaac_ros_nvblox_tpu.ops.tsdf", fromlist=["WeightingFunctionType"]
        ).WeightingFunctionType.CONSTANT)
    table, pool = make_pool()
    for k in range(8):
        T = jnp.asarray(orbit_pose(2 * np.pi * k / 8))
        depth = render_depth(scene, CAMERA, T)
        integrate_frame(table, pool, depth, T, params)

    slots = table.allocated_slots()
    bidx = table.allocated_block_indices()
    centers = voxel_centers_for_blocks(jnp.asarray(bidx), VOXEL_SIZE)
    gt = np.asarray(scene.sdf(centers))
    dist = np.asarray(pool["tsdf_distance"])[slots]
    weight = np.asarray(pool["tsdf_weight"])[slots]

    trunc = params.truncation_m(VOXEL_SIZE)
    # Check well-observed voxels in the near-surface band.
    band = (np.abs(gt) < trunc * 0.5) & (weight >= 2.0)
    assert band.sum() > 1000
    err = np.abs(dist[band] - gt[band])
    # Projective distance over-estimates off-normal (silhouettes/grazing
    # angles) — same bias as the reference integrator. Median within a
    # voxel; tail within ~3 voxels.
    assert np.median(err) < VOXEL_SIZE
    assert np.percentile(err, 90) < 3.0 * VOXEL_SIZE


def test_weight_accumulates_and_caps():
    scene = Scene(primitives=(Sphere(center=(0.0, 0.0, 1.0), radius=0.5),))
    params = TsdfIntegratorParams(max_weight=5.0)
    table, pool = make_pool()
    T = jnp.asarray(orbit_pose(0.3, radius=2.5, height=1.0))
    depth = render_depth(scene, CAMERA, T)
    for _ in range(10):
        integrate_frame(table, pool, depth, T, params)
    w = np.asarray(pool["tsdf_weight"])
    assert w.max() <= params.max_weight + 1e-5
    assert w.max() > 1.0


def test_padding_slots_do_not_corrupt_pool():
    """Out-of-range padding slots must be dropped by the scatter."""
    scene = default_test_scene()
    params = TsdfIntegratorParams()
    table, pool = make_pool()
    before = np.asarray(pool["tsdf_distance"]).copy()
    T = jnp.asarray(orbit_pose(0.0))
    depth = render_depth(scene, CAMERA, T)
    integrate_frame(table, pool, depth, T, params)
    # Unallocated slots must remain untouched.
    unalloc = ~table.allocated
    after = np.asarray(pool["tsdf_distance"])
    np.testing.assert_array_equal(after[unalloc], before[unalloc])
