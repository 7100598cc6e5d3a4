"""ShardedDeviceMapper: multi-device correctness on the 8-CPU-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaac_ros_nvblox_tpu.core import world_grid as wg
from isaac_ros_nvblox_tpu.core.types import voxel_centers_for_blocks
from isaac_ros_nvblox_tpu.mapper.device_mapper import DeviceMapper
from isaac_ros_nvblox_tpu.models.camera import Camera
from isaac_ros_nvblox_tpu.models.scene import (Scene, Sphere, orbit_pose,
                                               render_depth)
from isaac_ros_nvblox_tpu.mapper.params import MapperParams
from isaac_ros_nvblox_tpu.ops.esdf import EsdfIntegratorParams
from isaac_ros_nvblox_tpu.parallel.sharded_mapper import (ShardedDeviceMapper,
                                                          ShardedMapperConfig)
from isaac_ros_nvblox_tpu.parallel.spatial import make_spatial_mesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")

VOXEL = 0.05
CAM = Camera(fx=120.0, fy=120.0, cx=59.5, cy=44.5, width=120, height=90)


def _frames(scene, n=2):
    out = []
    for k in range(n):
        T = orbit_pose(2 * np.pi * k / 8, radius=2.0, height=1.0,
                       target=(0, 0, 1.0))
        out.append((render_depth(scene, CAM, jnp.asarray(T)), T))
    return out


def test_sharded_matches_single_device_tsdf():
    """Owned blocks of the sharded map must hold the same TSDF as the
    single-device mapper."""
    scene = Scene(primitives=(Sphere(center=(0.0, 0.0, 1.0), radius=0.6),))
    mesh = make_spatial_mesh(8)
    cfg = ShardedMapperConfig(
        n_shards=8, global_dims=(64, 32, 16), origin_block=(-32, -16, -4),
        capacity_per_shard=1024, voxel_size_m=VOXEL,
        max_blocks_per_frame=1024)
    sharded = ShardedDeviceMapper(mesh, CAM, cfg)
    single = DeviceMapper(
        voxel_size_m=VOXEL,
        world=wg.WorldGridConfig(dims=(64, 32, 16), capacity=8192,
                                 origin_block=(-32, -16, -4)),
        enable_color=False, enable_esdf=True, max_blocks_per_frame=4096)

    for depth, T in _frames(scene):
        sharded.integrate_depth(depth, T)
        single.integrate_depth(depth, T, CAM)

    # Sum of owned (non-ghost) blocks == single-device allocation.
    owned_total = sharded.total_owned_blocks()
    assert owned_total == single.block_count()

    single_d = np.asarray(single.channels["tsdf_distance"])
    single_w = np.asarray(single.channels["tsdf_weight"])
    state = jax.tree.map(np.asarray, sharded.state)
    mismatch = 0
    checked = 0
    for s in range(8):
        mask = sharded.owned_block_mask(s)
        count = int(state.alloc_count[s])
        bidx = state.block_index_of_slot[s][:count][mask]
        d = np.asarray(sharded.channels["tsdf_distance"])[s][:count][mask]
        w = np.asarray(sharded.channels["tsdf_weight"])[s][:count][mask]
        for i, bi in enumerate(bidx.tolist()):
            ss = int(np.asarray(single.state.slot_grid)[
                bi[0] + 32, bi[1] + 16, bi[2] + 4])
            assert ss >= 0, bi
            checked += 1
            if not (np.allclose(d[i], single_d[ss], atol=1e-5)
                    and np.allclose(w[i], single_w[ss], atol=1e-5)):
                mismatch += 1
    assert checked > 50
    assert mismatch == 0


def test_sharded_esdf_crosses_boundaries():
    """ESDF distances must propagate across slab boundaries via the ghost
    exchange (compare against the single-device ESDF)."""
    scene = Scene(primitives=(Sphere(center=(0.3, 0.0, 1.0), radius=0.5),))
    mesh = make_spatial_mesh(8)
    cfg = ShardedMapperConfig(
        n_shards=8, global_dims=(64, 32, 16), origin_block=(-32, -16, -4),
        capacity_per_shard=1024, voxel_size_m=VOXEL,
        max_blocks_per_frame=1024)
    params = MapperParams(esdf=EsdfIntegratorParams(max_esdf_distance_m=1.0))
    sharded = ShardedDeviceMapper(mesh, CAM, cfg, params)
    single = DeviceMapper(
        voxel_size_m=VOXEL, params=params,
        world=wg.WorldGridConfig(dims=(64, 32, 16), capacity=8192,
                                 origin_block=(-32, -16, -4)),
        enable_color=False, enable_esdf=True, max_blocks_per_frame=4096)
    for depth, T in _frames(scene, n=2):
        sharded.integrate_depth(depth, T)
        single.integrate_depth(depth, T, CAM)
    sharded.update_esdf()
    single.update_esdf()

    single_sq = np.asarray(single.channels["esdf_sq_dist"])
    state = jax.tree.map(np.asarray, sharded.state)
    err_max = 0.0
    n_checked = 0
    for s in range(8):
        mask = sharded.owned_block_mask(s)
        count = int(state.alloc_count[s])
        bidx = state.block_index_of_slot[s][:count][mask]
        sq = np.asarray(sharded.channels["esdf_sq_dist"])[s][:count][mask]
        for i, bi in enumerate(bidx.tolist()):
            ss = int(np.asarray(single.state.slot_grid)[
                bi[0] + 32, bi[1] + 16, bi[2] + 4])
            ref = single_sq[ss]
            got = sq[i]
            both = (ref < 1e11) & (got < 1e11)
            if both.any():
                n_checked += int(both.sum())
                # Sweep distances can only be >= the exact dense EDT (its
                # propagation is restricted to allocated halos; the dense
                # single-mapper EDT also crosses unallocated gaps).
                assert (np.sqrt(got[both])
                        >= np.sqrt(ref[both]) - 1e-3).all(), bi
                err_max += int((np.abs(np.sqrt(got[both])
                                       - np.sqrt(ref[both])) > 1e-3).sum())
            # No distances may be lost at shard boundaries: everything the
            # sharded sweep resolves, the single mapper resolves too. The
            # reverse can differ slightly: the single mapper's dense EDT
            # (ops/esdf_dense.py) is exact across unallocated gaps, while
            # the sharded sweep only propagates through allocated halos.
            assert not ((got < 1e11) & ~(ref < 1e11)).any(), bi
    assert n_checked > 10000
    # Voxel-exact propagation through ghosts for the overwhelming majority;
    # the rest differ only where the nearest site is across an unallocated
    # gap the sweep cannot traverse.
    assert err_max < 0.01 * n_checked, (err_max, n_checked)
