"""Tests for the gather-free dynamic-detection kernel (ops/detect_pallas.py)
and the device-resident small-component mask filter.

The kernel is voxel-granular by design (see its module docstring), so the
reference comparison asserts high agreement with the exact per-pixel gather
detector rather than bitwise equality: recall of exact-dynamic pixels, mask
precision, and no far-field false positives.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaac_ros_nvblox_tpu.core import world_grid as wg
from isaac_ros_nvblox_tpu.core.world_grid import WorldGridConfig
from isaac_ros_nvblox_tpu.mapper.multi_mapper import (MultiMapper,
                                                      _detect_dynamic_fused)
from isaac_ros_nvblox_tpu.mapper.params import (MappingType, MapperParams,
                                                MultiMapperParams)
from isaac_ros_nvblox_tpu.models.camera import Camera
from isaac_ros_nvblox_tpu.models.scene import (Box, RoomBox, Scene, Sphere,
                                               orbit_pose, render_depth)
from isaac_ros_nvblox_tpu.ops.detect_pallas import (
    detect_dynamic_fused_pallas, detect_dynamic_pallas)
from isaac_ros_nvblox_tpu.ops.tsdf import TsdfIntegratorParams

CAM = Camera(fx=160.0, fy=160.0, cx=79.5, cy=59.5, width=160, height=120)


@pytest.fixture(scope="module")
def built():
    """Static room mapped with freespace + a frame seeing a new sphere."""
    room = Scene(primitives=(
        RoomBox(center=(0.0, 0.0, 1.5), half_extents=(3.0, 2.2, 1.5)),
        Box(center=(-1.5, -1.0, 0.4), half_extents=(0.4, 0.4, 0.4)),
    ))
    dyn_scene = Scene(primitives=room.primitives + (
        Sphere(center=(0.5, 0.3, 1.0), radius=0.35),))
    params = MapperParams(projective=TsdfIntegratorParams(
        max_integration_distance_m=5.0))
    world = WorldGridConfig(dims=(64, 64, 32), capacity=8192,
                            origin_block=(-32, -32, -8))
    mm = MultiMapper(
        MultiMapperParams(mapping_type=MappingType.DYNAMIC,
                          block_capacity=8192,
                          static_mapper=dataclasses.replace(
                              params,
                              remove_small_connected_components=False)),
        world=world)
    sm = mm.static_mapper
    n = 8
    for k in range(n):
        T = jnp.asarray(orbit_pose(2 * np.pi * k / n, radius=1.5))
        sm.integrate_depth(render_depth(room, CAM, T), T, CAM)
        sm.update_freespace(k * 300.0, T, CAM)
    T = jnp.asarray(orbit_pose(0.0, radius=1.5))
    depth = render_depth(dyn_scene, CAM, T)
    ref_mask, _ = _detect_dynamic_fused(
        sm.state, sm.channels["freespace_high_confidence"], depth, T,
        camera=CAM, voxel_size_m=sm.voxel_size_m, max_depth_m=5.0,
        subsample=1)
    return sm, depth, T, np.asarray(ref_mask)


def _quality(mask, ref_mask):
    from scipy import ndimage
    inter = (mask & ref_mask).sum()
    recall = inter / max(ref_mask.sum(), 1)
    precision = inter / max(mask.sum(), 1)
    far_fp = (mask & ~ndimage.binary_dilation(ref_mask, iterations=8)).sum()
    return recall, precision, far_fp


def test_detect_kernel_matches_exact_detector(built):
    sm, depth, T, ref_mask = built
    assert ref_mask.sum() > 1000   # the sphere is detected by the reference
    from isaac_ros_nvblox_tpu.ops import view as view_ops
    p = sm.params.projective
    grid, origin = view_ops.touched_block_grid(
        depth, T, camera=CAM, voxel_size_m=sm.voxel_size_m,
        max_distance_m=p.max_integration_distance_m,
        truncation_m=p.truncation_m(sm.voxel_size_m))
    slots, bidx, _ = wg.view_batch(sm.state, grid, origin,
                                   max_blocks=sm.max_blocks_per_frame)
    mask = np.asarray(detect_dynamic_pallas(
        sm.state, sm.channels["freespace_high_confidence"], depth, T,
        slots, bidx, camera=CAM, voxel_size_m=sm.voxel_size_m,
        max_depth_m=5.0, interpret=True))
    recall, precision, far_fp = _quality(mask, ref_mask)
    assert recall > 0.9, recall
    assert precision > 0.85, precision
    # No detections away from the true dynamic region.
    assert far_fp < 0.02 * max(mask.sum(), 1), far_fp


def test_detect_fused_endpoint_filter_keeps_quality(built):
    sm, depth, T, ref_mask = built
    mask = np.asarray(detect_dynamic_fused_pallas(
        sm.state, sm.channels["freespace_high_confidence"], depth, T,
        camera=CAM, voxel_size_m=sm.voxel_size_m, max_depth_m=5.0,
        max_blocks=sm.max_blocks_per_frame, interpret=True))
    recall, precision, far_fp = _quality(mask, ref_mask)
    assert recall > 0.9, recall
    assert precision > 0.85, precision


def test_detect_static_scene_is_empty(built):
    """A frame of the static room alone must produce (almost) no mask."""
    sm, _, T, _ = built
    room = Scene(primitives=(
        RoomBox(center=(0.0, 0.0, 1.5), half_extents=(3.0, 2.2, 1.5)),
        Box(center=(-1.5, -1.0, 0.4), half_extents=(0.4, 0.4, 0.4)),
    ))
    depth = render_depth(room, CAM, T)
    mask = np.asarray(detect_dynamic_fused_pallas(
        sm.state, sm.channels["freespace_high_confidence"], depth, T,
        camera=CAM, voxel_size_m=sm.voxel_size_m, max_depth_m=5.0,
        max_blocks=sm.max_blocks_per_frame, interpret=True))
    # Static surfaces adjacent to freespace must NOT be over-detected
    # (the exact containment test, not a half-voxel slop).
    assert mask.sum() < 0.005 * mask.size, mask.sum()


def test_remove_small_components_device_matches_scipy():
    from isaac_ros_nvblox_tpu.ops.masking import (
        remove_small_connected_components,
        remove_small_connected_components_device)
    rng = np.random.default_rng(0)
    mask = np.zeros((120, 160), np.uint8)
    mask[30:70, 40:90] = 1          # big blob (kept)
    mask[100:104, 10:14] = 1        # 16 px blob (dropped at threshold 400)
    for _ in range(30):             # speck noise (dropped)
        y, x = rng.integers(0, 118), rng.integers(100, 158)
        mask[y:y + 2, x:x + 2] = 1
    ref = remove_small_connected_components(mask, 400)
    dev = np.asarray(remove_small_connected_components_device(
        jnp.asarray(mask), 400))
    # The big blob survives intact; specks vanish.
    assert (dev[30:70, 40:90] == 1).mean() > 0.99
    assert dev[95:, :].sum() <= mask[95:, :].sum() * 0.1
    agree = (dev == ref).mean()
    assert agree > 0.97, agree
