"""ESDF propagation tests against analytic distances."""

import jax.numpy as jnp
import numpy as np

from isaac_ros_nvblox_tpu.core.block_pool import BlockPool, BlockTable
from isaac_ros_nvblox_tpu.core.types import voxel_centers_for_blocks
from isaac_ros_nvblox_tpu.models.scene import Scene, Sphere
from isaac_ros_nvblox_tpu.ops import esdf as esdf_ops
from isaac_ros_nvblox_tpu.ops.esdf import EsdfIntegratorParams, update_esdf

VOXEL = 0.05


def _make_tsdf_pool(scene, lo_m, hi_m, trunc=4 * VOXEL):
    bs = 8 * VOXEL
    lo = np.floor(np.asarray(lo_m) / bs).astype(int)
    hi = np.floor(np.asarray(hi_m) / bs).astype(int)
    idx = np.array([(x, y, z)
                    for x in range(lo[0], hi[0] + 1)
                    for y in range(lo[1], hi[1] + 1)
                    for z in range(lo[2], hi[2] + 1)], np.int32)
    table = BlockTable(len(idx) + 8)
    pool = BlockPool(table, {
        "tsdf_distance": ((), jnp.float32),
        "tsdf_weight": ((), jnp.float32),
        "esdf_site": ((3,), jnp.float32),
        "esdf_sq_dist": ((), jnp.float32),
        "esdf_is_site": ((), jnp.bool_),
        "esdf_is_inside": ((), jnp.bool_),
        "esdf_observed": ((), jnp.bool_),
    }, init_values={"esdf_sq_dist": float(esdf_ops.INF_SQ)})
    slots, _ = table.allocate(idx)
    centers = voxel_centers_for_blocks(jnp.asarray(idx), VOXEL)
    sdf = scene.sdf(centers)
    pool["tsdf_distance"] = pool["tsdf_distance"].at[jnp.asarray(slots)].set(
        jnp.clip(sdf, -trunc, trunc))
    pool["tsdf_weight"] = pool["tsdf_weight"].at[jnp.asarray(slots)].set(1.0)
    return table, pool, idx, slots


def test_esdf_matches_analytic_distance():
    radius = 0.3
    center = (0.8, 0.8, 0.8)
    scene = Scene(primitives=(Sphere(center=center, radius=radius),))
    table, pool, idx, slots = _make_tsdf_pool(
        scene, lo_m=(0.0, 0.0, 0.0), hi_m=(1.6, 1.6, 1.6))
    params = EsdfIntegratorParams(max_esdf_distance_m=2.0,
                                  max_site_distance_vox=1.0)
    iters = update_esdf(pool, table, voxel_size_m=VOXEL, params=params)
    assert 1 <= iters <= 16

    centers = np.asarray(voxel_centers_for_blocks(jnp.asarray(idx), VOXEL))
    gt = np.asarray(scene.sdf(jnp.asarray(centers)))
    est = np.asarray(esdf_ops.esdf_distance_m(
        pool, VOXEL, params.max_esdf_distance_m))[slots]

    # Compare |distance| where the ESDF has propagated (outside voxels well
    # away from the surface but within range).
    m = (gt > 3 * VOXEL) & (gt < 0.5)
    err = np.abs(est[m] - gt[m])
    # Site discretization costs up to ~1 voxel; propagation is exact after.
    assert np.median(err) < VOXEL
    assert err.max() < 2.5 * VOXEL

    # Inside the sphere distances are negative.
    inside = gt < -2 * VOXEL
    assert inside.sum() > 50
    assert (est[inside] < 0).mean() > 0.95


def test_esdf_propagates_across_blocks():
    """Distances must propagate through blocks that contain no sites."""
    radius = 0.2
    center = (0.2, 0.2, 0.2)
    scene = Scene(primitives=(Sphere(center=center, radius=radius),))
    # Long domain in +x: blocks far from the sphere get distances only via
    # cross-block propagation.
    table, pool, idx, slots = _make_tsdf_pool(
        scene, lo_m=(0.0, 0.0, 0.0), hi_m=(2.4, 0.4, 0.4))
    params = EsdfIntegratorParams(max_esdf_distance_m=3.0)
    update_esdf(pool, table, voxel_size_m=VOXEL, params=params)

    centers = np.asarray(voxel_centers_for_blocks(jnp.asarray(idx), VOXEL))
    gt = np.asarray(scene.sdf(jnp.asarray(centers)))
    est = np.asarray(esdf_ops.esdf_distance_m(
        pool, VOXEL, params.max_esdf_distance_m))[slots]
    far = (centers[..., 0] > 1.5) & (np.abs(gt) < 2.5)
    assert far.sum() > 100
    err = np.abs(est[far] - gt[far])
    assert np.median(err) < VOXEL
    assert err.max() < 3 * VOXEL


def test_esdf_max_distance_clamp():
    scene = Scene(primitives=(Sphere(center=(0.2, 0.2, 0.2), radius=0.1),))
    table, pool, idx, slots = _make_tsdf_pool(
        scene, lo_m=(0.0, 0.0, 0.0), hi_m=(2.4, 0.4, 0.4))
    params = EsdfIntegratorParams(max_esdf_distance_m=0.5)
    update_esdf(pool, table, voxel_size_m=VOXEL, params=params)
    est = np.asarray(esdf_ops.esdf_distance_m(
        pool, VOXEL, params.max_esdf_distance_m))[slots]
    assert est.max() <= 0.5 + 1e-5
