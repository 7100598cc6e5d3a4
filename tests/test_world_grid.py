"""WorldGrid device allocator + DeviceMapper tests."""

import jax.numpy as jnp
import numpy as np

from isaac_ros_nvblox_tpu.core import world_grid as wg
from isaac_ros_nvblox_tpu.core.block_pool import NEIGHBOR_OFFSETS
from isaac_ros_nvblox_tpu.mapper.device_mapper import DeviceMapper
from isaac_ros_nvblox_tpu.models.camera import Camera
from isaac_ros_nvblox_tpu.models.scene import (Scene, Sphere,
                                               default_test_scene, orbit_pose,
                                               render_depth)

VOXEL = 0.05
CAM = Camera(fx=160.0, fy=160.0, cx=79.5, cy=59.5, width=160, height=120)


def _mask_grid(indices, origin, G=8):
    grid = np.zeros((G, G, G), bool)
    for i in indices:
        grid[tuple(np.asarray(i) - origin)] = True
    return jnp.asarray(grid), jnp.asarray(origin, jnp.int32)


def test_allocate_and_view_batch():
    state = wg.create_world_grid(wg.WorldGridConfig(
        dims=(16, 16, 16), capacity=64, origin_block=(0, 0, 0)))
    grid, origin = _mask_grid([(1, 2, 3), (4, 5, 6)], (0, 0, 0))
    state = wg.allocate_from_mask(state, grid, origin)
    assert int(state.alloc_count) == 2
    # Idempotent: allocating again adds nothing.
    state = wg.allocate_from_mask(state, grid, origin)
    assert int(state.alloc_count) == 2

    slots, bidx, n = wg.view_batch(state, grid, origin, max_blocks=8)
    assert int(n) == 2
    got = {tuple(b) for b, s in zip(np.asarray(bidx)[:2].tolist(),
                                    np.asarray(slots)[:2].tolist())}
    assert got == {(1, 2, 3), (4, 5, 6)}
    # Padding slots are out of range (== capacity).
    assert np.all(np.asarray(slots)[2:] == 64)


def test_out_of_bounds_blocks_dropped():
    state = wg.create_world_grid(wg.WorldGridConfig(
        dims=(4, 4, 4), capacity=64, origin_block=(0, 0, 0)))
    grid, origin = _mask_grid([(-1, -1, -1)], (-2, -2, -2), G=8)
    # Mask marks world block (-1,-1,-1): out of bounds -> not allocated.
    state = wg.allocate_from_mask(state, grid, origin)
    assert int(state.alloc_count) == 0


def test_capacity_overflow_counted():
    state = wg.create_world_grid(wg.WorldGridConfig(
        dims=(8, 8, 8), capacity=3, origin_block=(0, 0, 0)))
    idx = [(i, j, 0) for i in range(3) for j in range(2)]  # 6 blocks
    grid, origin = _mask_grid(idx, (0, 0, 0))
    state = wg.allocate_from_mask(state, grid, origin)
    assert int(state.alloc_count) == 3
    assert int(state.overflow_count) == 3


def test_allocate_and_batch_matches_two_step_path():
    """The fused allocate_and_batch must produce the same allocation and
    batch as allocate_from_mask + view_batch (same slot assignment order),
    including recycled slots."""
    cfg = wg.WorldGridConfig(dims=(16, 16, 16), capacity=64,
                             origin_block=(0, 0, 0))
    idx = [(1, 2, 3), (4, 5, 6), (7, 0, 1)]
    grid, origin = _mask_grid(idx, (0, 0, 0))

    s_a = wg.create_world_grid(cfg)
    s_a = wg.allocate_from_mask(s_a, grid, origin)
    slots_a, bidx_a, n_a = wg.view_batch(s_a, grid, origin, max_blocks=8)

    s_b = wg.create_world_grid(cfg)
    s_b, slots_b, bidx_b, n_b = wg.allocate_and_batch(
        s_b, grid, origin, max_blocks=8)

    assert int(n_a) == int(n_b) == 3
    np.testing.assert_array_equal(np.asarray(slots_a), np.asarray(slots_b))
    np.testing.assert_array_equal(np.asarray(bidx_a), np.asarray(bidx_b))
    np.testing.assert_array_equal(np.asarray(s_a.slot_grid),
                                  np.asarray(s_b.slot_grid))
    # Recycling: free a slot, re-touch its block -> the freed slot returns.
    s_b = wg.free_slots(s_b, jnp.asarray([1], jnp.int32))
    grid1, origin1 = _mask_grid([(4, 5, 6)], (0, 0, 0))
    s_b, slots_r, bidx_r, n_r = wg.allocate_and_batch(
        s_b, grid1, origin1, max_blocks=4)
    assert int(n_r) == 1
    assert int(np.asarray(slots_r)[0]) == 1  # recycled LIFO
    np.testing.assert_array_equal(np.asarray(bidx_r)[0], (4, 5, 6))
    assert int(s_b.free_count) == 0


def test_allocate_and_batch_overflow_and_batch_clip():
    # Pool overflow: capacity 3, 6 touched -> 3 allocated, 3 overflow.
    state = wg.create_world_grid(wg.WorldGridConfig(
        dims=(8, 8, 8), capacity=3, origin_block=(0, 0, 0)))
    idx = [(i, j, 0) for i in range(3) for j in range(2)]
    grid, origin = _mask_grid(idx, (0, 0, 0))
    state, slots, _, n = wg.allocate_and_batch(state, grid, origin,
                                               max_blocks=8)
    assert int(state.alloc_count) == 3
    assert int(state.overflow_count) == 3
    # Failed allocations carry slot == capacity (not integrated).
    s = np.asarray(slots)[:int(n)]
    assert (s < 3).sum() == 3 and (s == 3).sum() == 3

    # Batch clip: max_blocks smaller than touched count -> the tail is
    # dropped this frame and counted as overflow.
    state2 = wg.create_world_grid(wg.WorldGridConfig(
        dims=(8, 8, 8), capacity=64, origin_block=(0, 0, 0)))
    state2, slots2, _, n2 = wg.allocate_and_batch(state2, grid, origin,
                                                  max_blocks=4)
    assert int(n2) == 4
    assert int(state2.alloc_count) == 4
    assert int(state2.overflow_count) == 2


def test_neighbor_slots_match_offsets():
    state = wg.create_world_grid(wg.WorldGridConfig(
        dims=(8, 8, 8), capacity=16, origin_block=(0, 0, 0)))
    grid, origin = _mask_grid([(2, 2, 2), (3, 2, 2)], (0, 0, 0))
    state = wg.allocate_from_mask(state, grid, origin)
    nbrs = np.asarray(wg.neighbor_slots_of(
        state, jnp.asarray([[2, 2, 2]], jnp.int32)))[0]
    slot_grid = np.asarray(state.slot_grid)
    n_plus_x = int(np.where((NEIGHBOR_OFFSETS == [1, 0, 0]).all(axis=1))[0][0])
    assert nbrs[13] == slot_grid[2, 2, 2]          # self
    assert nbrs[n_plus_x] == slot_grid[3, 2, 2]    # +x neighbor
    assert nbrs[0] == -1                            # (-1,-1,-1): unallocated


def test_free_slots_clears_grid():
    state = wg.create_world_grid(wg.WorldGridConfig(
        dims=(8, 8, 8), capacity=16, origin_block=(0, 0, 0)))
    grid, origin = _mask_grid([(1, 1, 1)], (0, 0, 0))
    state = wg.allocate_from_mask(state, grid, origin)
    slot = int(np.asarray(state.slot_grid)[1, 1, 1])
    state = wg.free_slots(state, jnp.asarray([slot], jnp.int32))
    assert int(np.asarray(state.slot_grid)[1, 1, 1]) == -1


def test_device_mapper_matches_host_mapper_tsdf():
    """DeviceMapper must produce the same TSDF as the host-table Mapper."""
    from isaac_ros_nvblox_tpu.mapper.mapper import Mapper
    scene = default_test_scene()
    frames = []
    for k in range(3):
        T = orbit_pose(2 * np.pi * k / 8)
        frames.append((np.asarray(render_depth(scene, CAM, jnp.asarray(T))), T))

    host = Mapper(voxel_size_m=VOXEL, capacity=8192, enable_color=False,
                  enable_esdf=False)
    dev = DeviceMapper(voxel_size_m=VOXEL,
                       world=wg.WorldGridConfig(dims=(64, 64, 32),
                                                capacity=8192,
                                                origin_block=(-32, -32, -8)),
                       enable_color=False, enable_esdf=False)
    for depth, T in frames:
        host.integrate_depth(depth, T, CAM)
        dev.integrate_depth(depth, T, CAM)

    assert dev.block_count() == host.table.num_allocated

    # Compare voxel values block-by-block.
    host_d = np.asarray(host.pool["tsdf_distance"])
    host_w = np.asarray(host.pool["tsdf_weight"])
    dev_d = np.asarray(dev.channels["tsdf_distance"])
    dev_w = np.asarray(dev.channels["tsdf_weight"])
    dev_bidx = np.asarray(dev.state.block_index_of_slot)[:dev.block_count()]
    mismatches = 0
    for s_dev, bi in enumerate(dev_bidx.tolist()):
        s_host = host.table.slot_of(tuple(bi))
        assert s_host >= 0, bi
        if not (np.allclose(host_d[s_host], dev_d[s_dev], atol=1e-5)
                and np.allclose(host_w[s_host], dev_w[s_dev], atol=1e-5)):
            mismatches += 1
    assert mismatches == 0


def test_device_mapper_esdf_runs():
    scene = Scene(primitives=(Sphere(center=(0.0, 0.0, 1.5), radius=0.5),))
    dev = DeviceMapper(voxel_size_m=VOXEL,
                       world=wg.WorldGridConfig(dims=(64, 64, 32),
                                                capacity=4096,
                                                origin_block=(-32, -32, -8)),
                       enable_color=False, enable_esdf=True)
    T = orbit_pose(0.0, radius=2.0, height=1.5, target=(0, 0, 1.5))
    depth = render_depth(scene, CAM, jnp.asarray(T))
    dev.integrate_depth(depth, T, CAM)
    dev.update_esdf()
    sq = np.asarray(dev.channels["esdf_sq_dist"])[:dev.block_count()]
    assert (sq < 1e11).any()  # distances propagated
    assert (sq == 0.0).any()  # sites exist


def test_device_mapper_mesh_export():
    scene = Scene(primitives=(Sphere(center=(0.0, 0.0, 1.5), radius=0.5),))
    dev = DeviceMapper(voxel_size_m=VOXEL,
                       world=wg.WorldGridConfig(dims=(64, 64, 32),
                                                capacity=4096,
                                                origin_block=(-32, -32, -8)),
                       enable_color=False, enable_esdf=False)
    for k in range(4):
        T = orbit_pose(2 * np.pi * k / 4, radius=2.0, height=1.5,
                       target=(0, 0, 1.5))
        dev.integrate_depth(render_depth(scene, CAM, jnp.asarray(T)), T, CAM)
    v, c, t = dev.export_mesh()
    assert t.shape[0] > 500
    # Vertices near the sphere surface.
    r = np.linalg.norm(v - np.asarray([0.0, 0.0, 1.5]), axis=1)
    assert np.abs(np.median(r) - 0.5) < 0.05


def test_device_mapper_esdf_matches_dense_reference():
    """update_esdf (dense banded EDT) must equal the numpy reference EDT."""
    from isaac_ros_nvblox_tpu.mapper.params import MapperParams
    from isaac_ros_nvblox_tpu.ops import esdf as esdf_ops
    from isaac_ros_nvblox_tpu.ops import esdf_dense as ed

    scene = Scene(primitives=(Sphere(center=(0.0, 0.0, 1.5), radius=0.5),))
    import dataclasses
    from isaac_ros_nvblox_tpu.ops.esdf import EsdfIntegratorParams
    params = MapperParams(
        esdf=EsdfIntegratorParams(max_esdf_distance_m=0.6))  # band 12
    dev = DeviceMapper(voxel_size_m=VOXEL, params=params,
                       world=wg.WorldGridConfig(dims=(64, 64, 32),
                                                capacity=2048,
                                                origin_block=(-32, -32, -8)),
                       enable_color=False, enable_esdf=True)
    T = orbit_pose(0.0, radius=2.0, height=1.5, target=(0, 0, 1.5))
    depth = render_depth(scene, CAM, jnp.asarray(T))
    dev.integrate_depth(depth, T, CAM)
    dev.update_esdf()
    n = dev.block_count()
    sq = np.asarray(dev.channels["esdf_sq_dist"])

    # Reference: numpy dense EDT over the same sites/region.
    band = dev.esdf_band_vox
    is_site, _, _ = esdf_ops.esdf_sites_from_tsdf(
        dev.channels["tsdf_distance"], dev.channels["tsdf_weight"],
        voxel_size_m=jnp.float32(VOXEL),
        max_site_distance_vox=float(params.esdf.max_site_distance_vox),
        min_weight=float(params.esdf.min_weight))
    bidx = np.asarray(dev.state.block_index_of_slot)
    origin = bidx[:n].min(axis=0)
    dims_b = tuple(
        int(np.ceil((e + 1) / 8) * 8)
        for e in (bidx[:n].max(axis=0) - origin))
    ref = ed.esdf_from_sites_reference(
        np.asarray(is_site), bidx - origin, n, dims_b, band)
    resolved = sq[:n] < 1e11
    assert resolved.sum() > 1000
    np.testing.assert_allclose(sq[:n][resolved], ref[:n][resolved],
                               atol=1e-3)


def test_device_mapper_esdf_incremental_matches_full():
    """A dirty-region incremental update must equal a full re-solve."""
    from isaac_ros_nvblox_tpu.mapper.params import MapperParams
    scene = Scene(primitives=(Sphere(center=(0.0, 0.0, 1.5), radius=0.5),))
    from isaac_ros_nvblox_tpu.ops.esdf import EsdfIntegratorParams
    params = MapperParams(
        esdf=EsdfIntegratorParams(max_esdf_distance_m=0.6))
    kwargs = dict(voxel_size_m=VOXEL, params=params,
                  world=wg.WorldGridConfig(dims=(64, 64, 32), capacity=4096,
                                           origin_block=(-32, -32, -8)),
                  enable_color=False, enable_esdf=True)
    inc = DeviceMapper(**kwargs)
    full = DeviceMapper(**kwargs)
    for k in range(3):
        T = orbit_pose(2 * np.pi * k / 8, radius=2.0, height=1.5,
                       target=(0, 0, 1.5))
        depth = render_depth(scene, CAM, jnp.asarray(T))
        inc.integrate_depth(depth, T, CAM)
        full.integrate_depth(depth, T, CAM)
        inc.update_esdf()          # full on k=0, incremental after
    full.update_esdf(full=True)
    n = full.block_count()
    sq_i = np.asarray(inc.channels["esdf_sq_dist"])[:n]
    sq_f = np.asarray(full.channels["esdf_sq_dist"])[:n]
    np.testing.assert_array_equal(sq_i, sq_f)
    # No-op update when nothing is dirty.
    inc.update_esdf()
    np.testing.assert_array_equal(
        np.asarray(inc.channels["esdf_sq_dist"])[:n], sq_f)
