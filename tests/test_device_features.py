"""DeviceMapper v2 features: recycling, decay, occupancy, masks, lidar,
freespace, clearing, workspace bounds — all on the device-resident path."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from isaac_ros_nvblox_tpu.core import world_grid as wg
from isaac_ros_nvblox_tpu.mapper.device_mapper import DeviceMapper
from isaac_ros_nvblox_tpu.mapper.params import MapperParams, ProjectiveLayerType
from isaac_ros_nvblox_tpu.models.camera import Camera
from isaac_ros_nvblox_tpu.models.scene import (Scene, Sphere, orbit_pose,
                                               render_depth)

VOXEL = 0.05
CAM = Camera(fx=120.0, fy=120.0, cx=59.5, cy=44.5, width=120, height=90)
WORLD = wg.WorldGridConfig(dims=(64, 64, 32), capacity=4096,
                           origin_block=(-32, -32, -8))


def _scene():
    return Scene(primitives=(Sphere(center=(0.0, 0.0, 1.2), radius=0.5),))


def _mapper(**kw):
    kw.setdefault("world", WORLD)
    kw.setdefault("enable_color", False)
    kw.setdefault("enable_esdf", True)
    return DeviceMapper(voxel_size_m=VOXEL, **kw)


def _frame(scene, t=0.0):
    T = orbit_pose(t, radius=1.8, height=1.2, target=(0, 0, 1.2))
    return np.asarray(render_depth(scene, CAM, jnp.asarray(T))), T


def test_slot_recycling_roundtrip():
    m = _mapper()
    depth, T = _frame(_scene())
    m.integrate_depth(depth, T, CAM)
    n0 = m.block_count()
    high_water0 = int(m.state.alloc_count)
    assert n0 > 50
    # Clear everything (radius 0 around origin frees all blocks).
    m.clear_outside_radius((0.0, 0.0, 0.0), 1e-3)
    assert m.block_count() == 0
    assert int(m.state.free_count) == high_water0
    # Channels of freed slots were reset.
    assert float(jnp.max(m.channels["tsdf_weight"])) == 0.0
    assert float(jnp.min(m.channels["esdf_sq_dist"])) >= 1e11
    # Re-integrating reuses freed slots: high-water must not grow.
    m.integrate_depth(depth, T, CAM)
    assert m.block_count() == n0
    assert int(m.state.alloc_count) == high_water0
    assert int(m.state.free_count) == 0
    # And the map contents are correct again (sites exist).
    m.update_esdf(full=True)
    sq = np.asarray(m.channels["esdf_sq_dist"])
    assert (sq == 0.0).any()


def test_tsdf_decay_and_deallocation():
    m = _mapper()
    depth, T = _frame(_scene())
    m.integrate_depth(depth, T, CAM)
    n0 = m.block_count()
    w0 = np.asarray(m.channels["tsdf_weight"])
    # Point the "last view" away from the map so nothing is excluded.
    away = orbit_pose(0.0, radius=2.0, height=1.2, target=(50.0, 0, 1.2))
    m.last_depth_T_L_C = jnp.asarray(away, jnp.float32)
    for _ in range(200):
        m.decay()
    w1 = np.asarray(m.channels["tsdf_weight"])
    assert w1.max() < max(w0.max() * 0.01, 1e-2)
    # Fully-decayed blocks were deallocated and recycled.
    assert m.block_count() < n0 // 4


def test_tsdf_decay_excludes_last_view():
    m = _mapper()
    depth, T = _frame(_scene())
    m.integrate_depth(depth, T, CAM)
    w0 = np.asarray(m.channels["tsdf_weight"])
    m.decay()  # last view = the integrated frame -> in-view voxels kept
    w1 = np.asarray(m.channels["tsdf_weight"])
    observed = w0 > 0.5
    # Most observed voxels sit in the last view and must be untouched.
    unchanged = np.isclose(w1[observed], w0[observed]).mean()
    assert unchanged > 0.9


def test_occupancy_device_layer():
    m = _mapper(projective_layer=ProjectiveLayerType.OCCUPANCY)
    scene = _scene()
    for k in range(2):
        depth, T = _frame(scene, t=0.4 * k)
        m.integrate_depth(depth, T, CAM)
    lo = np.asarray(m.channels["occupancy_log_odds"])
    obs = np.asarray(m.channels["occupancy_observed"])
    assert (lo > 0.5).any()        # occupied at the surface
    assert (lo < -0.5).any()       # free along rays
    assert obs.any()
    # ESDF from occupancy sites.
    m.update_esdf(full=True)
    sq = np.asarray(m.channels["esdf_sq_dist"])
    assert (sq == 0.0).any() and ((sq > 0) & (sq < 1e11)).any()
    # Occupancy decay pulls log odds toward zero and can deallocate.
    for _ in range(100):
        m.decay()
    lo2 = np.asarray(m.channels["occupancy_log_odds"])
    assert np.abs(lo2).max() <= 0.51
    assert m.block_count() == 0  # everything decayed away


def test_masked_integrate_splits_foreground():
    scene = _scene()
    depth, T = _frame(scene)
    # Mask the center region (the sphere) as foreground.
    mask = np.zeros(depth.shape, np.uint8)
    mask[30:60, 40:80] = 1

    bg = _mapper()
    fg = _mapper(projective_layer=ProjectiveLayerType.OCCUPANCY)
    bg.integrate_depth(depth, T, CAM, mask=mask, mask_mode=1)
    fg.integrate_depth(depth, T, CAM, mask=mask, mask_mode=2)

    full = _mapper()
    full.integrate_depth(depth, T, CAM)
    # The background map must have strictly fewer observed voxels than the
    # unmasked one; the foreground occupancy map must have content.
    assert (np.asarray(bg.channels["tsdf_weight"]) > 0).sum() \
        < (np.asarray(full.channels["tsdf_weight"]) > 0).sum()
    assert (np.asarray(fg.channels["occupancy_log_odds"]) > 0.5).any()


def test_lidar_device_integration():
    from isaac_ros_nvblox_tpu.models.lidar import Lidar
    lidar = Lidar.equal_vertical_fov(num_azimuth=512, num_elevation=32,
                                     vertical_fov_rad=np.deg2rad(40.0),
                                     min_range_m=0.3, max_range_m=20.0)
    # Synthetic cylindrical wall at 3 m around the sensor at height 1.0.
    az = np.linspace(-np.pi, np.pi, 2048, endpoint=False)
    el = np.linspace(-0.25, 0.25, 24)
    azg, elg = np.meshgrid(az, el)
    r = 3.0 / np.cos(elg)  # wall is vertical -> range grows with elevation
    pts = np.stack([r * np.cos(elg) * np.cos(azg),
                    r * np.cos(elg) * np.sin(azg),
                    r * np.sin(elg)], -1).reshape(-1, 3)
    T = np.eye(4, dtype=np.float32)
    T[2, 3] = 1.0  # sensor 1 m up
    m = _mapper()
    m.integrate_pointcloud(pts, T, lidar)
    assert m.block_count() > 50
    # TSDF near the wall (radius 3) crosses zero.
    from isaac_ros_nvblox_tpu.core.types import voxel_centers_for_blocks
    n = m.block_count()
    bidx = np.asarray(m.state.block_index_of_slot)[:n]
    centers = np.asarray(voxel_centers_for_blocks(jnp.asarray(bidx), VOXEL))
    d = np.asarray(m.channels["tsdf_distance"])[:n]
    w = np.asarray(m.channels["tsdf_weight"])[:n]
    rad = np.linalg.norm(centers[..., :2], axis=-1)
    # Inverse-square weighting gives w ~ 1/9 at 3 m from one scan.
    near_wall = (np.abs(rad - 3.0) < 0.04) & (w > 0.05) \
        & (np.abs(centers[..., 2] - 1.0) < 0.3)
    assert near_wall.sum() > 100
    assert np.abs(d[near_wall]).mean() < 0.1


def test_freespace_device_state_machine():
    from isaac_ros_nvblox_tpu.ops.freespace import FreespaceIntegratorParams
    params = MapperParams(freespace=FreespaceIntegratorParams(
        min_duration_since_occupied_for_freespace_ms=100.0,
        check_neighborhood=False))
    m = _mapper(params=params, enable_freespace=True)
    scene = _scene()
    depth, T = _frame(scene)
    m.integrate_depth(depth, T, CAM)
    for t_ms in (0.0, 60.0, 120.0, 200.0):
        m.update_freespace(t_ms, T, CAM)
    hc = np.asarray(m.channels["freespace_high_confidence"])
    w = np.asarray(m.channels["tsdf_weight"])
    d = np.asarray(m.channels["tsdf_distance"])
    free_observed = (w > 0.5) & (d > 0.2)
    assert hc[free_observed].mean() > 0.5   # free space promoted
    occupied = (w > 0.5) & (d < 0.0)
    assert hc[occupied].mean() < 0.1        # surfaces not freespace


def test_freespace_check_neighborhood_suppresses_thin_noise():
    """With check_neighborhood, occupancy dilates: voxels adjacent to the
    surface also count occupied, so fewer near-surface promotions."""
    from isaac_ros_nvblox_tpu.ops.freespace import FreespaceIntegratorParams
    base = dict(min_duration_since_occupied_for_freespace_ms=50.0)
    scene = _scene()
    depth, T = _frame(scene)
    hcs = {}
    for check in (False, True):
        params = MapperParams(freespace=FreespaceIntegratorParams(
            check_neighborhood=check, **base))
        m = _mapper(params=params, enable_freespace=True)
        m.integrate_depth(depth, T, CAM)
        for t_ms in (0.0, 80.0, 160.0):
            m.update_freespace(t_ms, T, CAM)
        hcs[check] = np.asarray(m.channels["freespace_high_confidence"]).sum()
    assert hcs[True] < hcs[False]


def test_clear_tsdf_inside_shapes():
    m = _mapper()
    depth, T = _frame(_scene())
    m.integrate_depth(depth, T, CAM)
    from isaac_ros_nvblox_tpu.core.types import voxel_centers_for_blocks
    n = m.block_count()
    bidx = np.asarray(m.state.block_index_of_slot)[:n]
    centers = np.asarray(voxel_centers_for_blocks(jnp.asarray(bidx), VOXEL))
    w0 = np.asarray(m.channels["tsdf_weight"])[:n]
    inside = np.linalg.norm(centers - np.array([0, 0, 1.2]), axis=-1) <= 0.7
    assert (w0[inside] > 0).any()
    m.clear_tsdf_inside_shapes(spheres=[((0.0, 0.0, 1.2), 0.7)])
    w1 = np.asarray(m.channels["tsdf_weight"])[:n]
    assert (w1[inside] == 0).all()
    outside_far = np.linalg.norm(centers - np.array([0, 0, 1.2]),
                                 axis=-1) > 0.8
    np.testing.assert_array_equal(w1[outside_far], w0[outside_far])


def test_workspace_bounds_on_device_path():
    from isaac_ros_nvblox_tpu.ops.view import (ViewCalculatorParams,
                                               WorkspaceBoundsType)
    params = MapperParams(view=ViewCalculatorParams(
        workspace_bounds_type=WorkspaceBoundsType.HEIGHT_BOUNDS,
        workspace_bounds_min_corner_m=(0, 0, 0.8),
        workspace_bounds_max_corner_m=(0, 0, 1.6)))
    m = _mapper(params=params)
    depth, T = _frame(_scene())
    m.integrate_depth(depth, T, CAM)
    n = m.block_count()
    assert n > 0
    bidx = np.asarray(m.state.block_index_of_slot)[:n]
    z_lo = bidx[:, 2] * 8 * VOXEL
    z_hi = z_lo + 8 * VOXEL
    assert (z_hi > 0.8).all() and (z_lo < 1.6).all()


def test_occupancy_decay_to_free():
    """occupancy_decay to_free: unobserved voxels drift to the free prior
    instead of unknown (mapper_initialization.cpp:406-428)."""
    import math
    from isaac_ros_nvblox_tpu.ops.decay import (OccupancyDecayParams,
                                                decay_occupancy)
    p_free = OccupancyDecayParams(to_free=True)
    p_unknown = OccupancyDecayParams(to_free=False)
    lo = jnp.asarray([[3.0, -3.0, 0.0]], jnp.float32)
    out_f = lo + 0  # decay donates its input
    out_u = lo + 0
    for _ in range(50):
        out_f, _ = decay_occupancy(out_f, params=p_free)
        out_u, _ = decay_occupancy(out_u, params=p_unknown)
    target = math.log(p_free.free_region_decay_probability
                      / (1 - p_free.free_region_decay_probability))
    np.testing.assert_allclose(np.asarray(out_f)[0], target, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_u)[0], 0.0, atol=1e-5)


def test_compact_dirty_small_capacity_mapper():
    """Regression: _compact_dirty with max_blocks > world capacity (e.g. a
    fused-submap mapper with a small pool) must keep static shapes instead
    of crashing (r2 verdict weak #1)."""
    small = wg.WorldGridConfig(dims=(16, 16, 16), capacity=256,
                               origin_block=(-8, -8, -4))
    m = _mapper(world=small, max_blocks_per_frame=2048)
    depth, T = _frame(_scene())
    m.integrate_depth(depth, T, CAM)
    assert m.block_count() > 0
    # update_mesh_dirty_device drove the crash: compaction with
    # max_blocks=2048 > capacity=256.
    from isaac_ros_nvblox_tpu.mapper.device_mapper import _compact_dirty_impl
    slots, bidx = _compact_dirty_impl(m.state, m.dirty, max_blocks=2048)
    assert slots.shape == (2048,)
    assert bidx.shape == (2048, 3)
    n_live = int(jnp.sum(slots < small.capacity))
    assert 0 < n_live <= m.block_count()
    # Live prefix indexes real allocated slots.
    live = np.asarray(slots[:n_live])
    assert (live < int(m.state.alloc_count)).all()


def test_workspace_bounds_on_lidar_path():
    """Workspace bounds apply to lidar integration too
    (mapper_initialization.cpp:330-358 bounds ALL projective integration)."""
    from isaac_ros_nvblox_tpu.models.lidar import Lidar
    from isaac_ros_nvblox_tpu.ops.view import (ViewCalculatorParams,
                                               WorkspaceBoundsType)
    lidar = Lidar.equal_vertical_fov(num_azimuth=512, num_elevation=32,
                                     vertical_fov_rad=np.deg2rad(40.0),
                                     min_range_m=0.3, max_range_m=20.0)
    az = np.linspace(-np.pi, np.pi, 1024, endpoint=False)
    el = np.linspace(-0.25, 0.25, 24)
    azg, elg = np.meshgrid(az, el)
    r = 3.0 / np.cos(elg)
    pts = np.stack([r * np.cos(elg) * np.cos(azg),
                    r * np.cos(elg) * np.sin(azg),
                    r * np.sin(elg)], -1).reshape(-1, 3)
    T = np.eye(4, dtype=np.float32)
    T[2, 3] = 1.0
    params = MapperParams(view=ViewCalculatorParams(
        workspace_bounds_type=WorkspaceBoundsType.HEIGHT_BOUNDS,
        workspace_bounds_min_corner_m=(0, 0, 0.8),
        workspace_bounds_max_corner_m=(0, 0, 1.6)))
    m = _mapper(params=params)
    m.integrate_pointcloud(pts, T, lidar)
    n = m.block_count()
    assert n > 0
    bidx = np.asarray(m.state.block_index_of_slot)[:n]
    z_lo = bidx[:, 2] * 8 * VOXEL
    z_hi = z_lo + 8 * VOXEL
    assert (z_hi > 0.8).all() and (z_lo < 1.6).all()


def test_freespace_fullpool_matches_batch_path():
    """The full-pool + dense-dilation freespace fast path must agree with
    the view-batch + sliced-halo formulation (same pose -> all allocated
    blocks in frustum, so the per-voxel vs per-block coverage semantics
    coincide)."""
    from isaac_ros_nvblox_tpu.mapper.device_mapper import _freespace_fused
    m = _mapper(enable_freespace=True)
    depth, T = _frame(_scene())
    m.integrate_depth(depth, T, CAM)
    assert m.block_count() > 0
    chans = {k: m.channels[k] + 0 for k in
             ("freespace_consecutive_ms", "freespace_last_occupied_ms",
              "freespace_high_confidence")}
    args = (m.state, m.channels["tsdf_distance"], m.channels["tsdf_weight"],
            jnp.asarray(T, jnp.float32))
    kw = dict(camera=CAM, voxel_size_m=VOXEL, params=m.params.freespace,
              view_distance_m=7.0, max_blocks=m.max_blocks_per_frame)
    outs = {}
    for name in ("batch", "dense"):
        if name == "dense":
            origin, dims = m.esdf_region(margin_blocks=0)
            extra = dict(dims_b=tuple(int(d) for d in dims))
            org = jnp.asarray(origin, jnp.int32)
        else:
            extra = dict(dims_b=None)
            org = None
        c = {k: v + 0 for k, v in chans.items()}
        cons, last, hc = c.values()
        for t_ms in (300.0, 1500.0, 3000.0):
            cons, last, hc = _freespace_fused(
                cons, last, hc, *args, jnp.float32(t_ms),
                jnp.float32(t_ms - 300.0), org, **kw, **extra)
        outs[name] = (np.asarray(cons), np.asarray(last), np.asarray(hc))
    n = m.block_count()
    for a, b in zip(outs["batch"], outs["dense"]):
        np.testing.assert_array_equal(a[:n], b[:n])
    assert outs["dense"][2][:n].sum() > 1000   # hc actually promoted


def test_mesh_surface_budget_overflow_stays_dirty():
    """Two-stage mesh compaction: crossing blocks beyond the surface budget
    keep their dirty bit and drain over later calls — the union of meshed
    surface blocks must equal the single-shot crossing set."""
    from isaac_ros_nvblox_tpu.mapper.device_mapper import _mesh_dirty_fused
    m = _mapper()
    depth, T = _frame(_scene())
    m.integrate_depth(depth, T, CAM)

    import jax.numpy as jnp2

    def run(dirty, pending, ms):
        return _mesh_dirty_fused(
            m.state, dirty, pending, m.channels["tsdf_distance"],
            m.channels["tsdf_weight"], None,
            min_weight=float(m.params.mesh.min_weight), max_blocks=256,
            with_color=False, interpret=True, max_surface_blocks=ms)

    zeros = jnp2.zeros_like(m.dirty)
    # Single shot with a huge budget: the full crossing set.
    (v, _, _, bidx_all, slots_all, _, _, leftover,
     pend) = run(m.dirty, zeros, 256)
    full = {tuple(map(int, b)) for b, s in
            zip(np.asarray(bidx_all), np.asarray(slots_all))
            if s < m.capacity}
    assert len(full) > 8
    assert not bool(np.asarray(leftover).any())
    assert not bool(np.asarray(pend).any())

    # Tiny budget: the backlog drains over iterations through the pending
    # channel; every iteration meshes <= ms blocks.
    seen = set()
    dirty, pending = m.dirty, zeros
    for it in range(60):
        (v, _, _, bidx, slots, _, _, dirty,
         pending) = run(dirty, pending, 8)
        keys = {tuple(map(int, b)) for b, s in
                zip(np.asarray(bidx), np.asarray(slots)) if s < m.capacity}
        assert len(keys) <= 8
        seen |= keys
        if not (bool(np.asarray(dirty).any())
                or bool(np.asarray(pending).any())):
            break
    assert not bool(np.asarray(dirty).any())
    assert not bool(np.asarray(pending).any())  # backlog drained
    # Every crossing block from the single-shot run was eventually meshed.
    assert full <= seen


def test_mesh_clear_list_drops_stale_blocks():
    """A block that loses its surface crossing lands on the clear list and
    update_mesh_layer drops its stale mesh-layer entry."""
    from isaac_ros_nvblox_tpu.mapper import device_io
    m = _mapper()
    depth, T = _frame(_scene())
    m.integrate_depth(depth, T, CAM)
    device_io.update_mesh_layer(m)  # CPU backend: XLA chunk path
    # Force the fused path once to populate the pending-clear machinery:
    m.dirty = m.dirty.at[:].set(False)
    m.dirty = m.dirty.at[0].set(True)
    verts, colors, mask, bidx, slots = m.update_mesh_dirty_device(
        max_blocks=64, use_pallas=True, return_slots=True)
    pending = m._mesh_clear_pending
    assert pending is not None
    # Wipe the map (all crossings gone), dirty everything that was meshed:
    keys_before = set(m.mesh_layer.blocks)
    assert keys_before
    m.channels["tsdf_weight"] = jnp.zeros_like(m.channels["tsdf_weight"])
    m.dirty = m.dirty.at[:].set(True)
    verts, colors, mask, bidx, slots = m.update_mesh_dirty_device(
        max_blocks=256, use_pallas=True, return_slots=True)
    assert not bool(np.asarray(mask).any())  # nothing crosses now
    cleared = set(m.take_mesh_clear_keys())
    assert keys_before <= cleared


def test_replay_slot_bucket_esdf_exact():
    """A slot_bucket-restricted replay yields bitwise-identical ESDF to the
    unrestricted replay (allocation is prefix-dense, bucket > high-water)."""
    scene = _scene()
    depths, poses = [], []
    for k in range(4):
        d, T = _frame(scene, t=0.4 * k)
        depths.append(jnp.asarray(d))
        poses.append(jnp.asarray(T, jnp.float32))
    depths = jnp.stack(depths)
    poses = jnp.stack(poses)

    def run(**kw):
        m = _mapper()
        m.replay_frames(depths, poses, CAM)  # build map (fixes region)
        region = m.esdf_region()
        m.replay_frames(depths, poses, CAM, esdf_every=1,
                        esdf_region=region, **kw)
        return m

    m_full = run()
    m_bucket = run(slot_bucket=1024)
    m_bucket.check_slot_bucket()
    np.testing.assert_array_equal(
        np.asarray(m_full.channels["esdf_sq_dist"]),
        np.asarray(m_bucket.channels["esdf_sq_dist"]))
    np.testing.assert_array_equal(
        np.asarray(m_full.channels["esdf_is_inside"]),
        np.asarray(m_bucket.channels["esdf_is_inside"]))

    # An undersized bucket is caught by the guard.
    m_bad = run(slot_bucket=8)
    import pytest as _pytest
    with _pytest.raises(AssertionError):
        m_bad.check_slot_bucket()


def test_freespace_slot_bucket_exact():
    """The slot-bucketed freespace fast path (live-prefix rows only) must
    match the full-pool update bit-for-bit (bucket >= alloc high-water)."""
    from isaac_ros_nvblox_tpu.mapper.device_mapper import _freespace_fused
    m = _mapper(enable_freespace=True)
    depth, T = _frame(_scene())
    m.integrate_depth(depth, T, CAM)
    origin, dims = m.esdf_region(margin_blocks=0, mult=1)
    origin_b = jnp.asarray(origin, jnp.int32)
    dims_b = tuple(int(d) for d in dims)
    args = (m.channels["freespace_consecutive_ms"],
            m.channels["freespace_last_occupied_ms"],
            m.channels["freespace_high_confidence"])
    kw = dict(camera=CAM, voxel_size_m=VOXEL, params=m.params.freespace,
              view_distance_m=5.0, max_blocks=m.max_blocks_per_frame,
              dims_b=dims_b)
    full = _freespace_fused(
        *(a + 0 if a.dtype != jnp.bool_ else a.copy() for a in args),
        m.state, m.channels["tsdf_distance"], m.channels["tsdf_weight"],
        jnp.asarray(T, jnp.float32), jnp.float32(400.0), jnp.float32(0.0),
        origin_b, **kw)
    assert int(m.state.alloc_count) <= 512
    bucketed = _freespace_fused(
        *(a + 0 if a.dtype != jnp.bool_ else a.copy() for a in args),
        m.state, m.channels["tsdf_distance"], m.channels["tsdf_weight"],
        jnp.asarray(T, jnp.float32), jnp.float32(400.0), jnp.float32(0.0),
        origin_b, slot_bucket=512, **kw)
    for f, b in zip(full, bucketed):
        np.testing.assert_array_equal(np.asarray(f), np.asarray(b))


def test_dilate_dense_grid_pallas_matches_xla():
    """The fused one-pass 3^3 max-dilation kernel (r5) must match the XLA
    roll formulation bit-for-bit (it replaces it on TPU inside the
    freespace neighborhood check)."""
    import jax
    import numpy as np

    from isaac_ros_nvblox_tpu.ops import halo

    rng = np.random.default_rng(7)
    lane = jnp.arange(512, dtype=jnp.int32)
    lxyz = (lane // 64, (lane // 8) % 8, lane % 8)

    def axis_max(d, cell_axis, lcoord, stride):
        cdim = d.shape[cell_axis]
        cidx = jax.lax.broadcasted_iota(jnp.int32, d.shape, cell_axis)
        up = jnp.where(lcoord < 7, jnp.roll(d, -stride, axis=-1),
                       jnp.roll(jnp.roll(d, -1, axis=cell_axis),
                                7 * stride, axis=-1))
        up = jnp.where((lcoord == 7) & (cidx == cdim - 1), 0.0, up)
        dn = jnp.where(lcoord > 0, jnp.roll(d, stride, axis=-1),
                       jnp.roll(jnp.roll(d, 1, axis=cell_axis),
                                -7 * stride, axis=-1))
        dn = jnp.where((lcoord == 0) & (cidx == 0), 0.0, dn)
        return jnp.maximum(d, jnp.maximum(up, dn))

    for dims_b in ((4, 3, 5), (2, 2, 1), (1, 3, 2)):
        dense = jnp.asarray(
            (rng.random(dims_b + (512,)) < 0.05).astype(np.float32))
        ref = axis_max(axis_max(axis_max(dense, 2, lxyz[2], 1),
                                1, lxyz[1], 8), 0, lxyz[0], 64)
        out = halo.dilate_dense_grid_pallas(dense, dims_b=dims_b,
                                            interpret=True)
        assert np.array_equal(np.asarray(out), np.asarray(ref)), dims_b
