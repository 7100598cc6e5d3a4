"""Device-mapper node-facing adapters: slicer, 2D ESDF, dense grid,
save/load, mesh layer + removal log."""

import numpy as np
import jax.numpy as jnp
import pytest

from isaac_ros_nvblox_tpu.core import world_grid as wg
from isaac_ros_nvblox_tpu.mapper import device_io as dio
from isaac_ros_nvblox_tpu.mapper.device_mapper import DeviceMapper
from isaac_ros_nvblox_tpu.models.camera import Camera
from isaac_ros_nvblox_tpu.models.scene import (RoomBox, Scene, Sphere,
                                               orbit_pose, render_depth,
                                               render_color)

VOXEL = 0.05
CAM = Camera(fx=120.0, fy=120.0, cx=59.5, cy=44.5, width=120, height=90)
WORLD = wg.WorldGridConfig(dims=(64, 64, 32), capacity=8192,
                           origin_block=(-32, -32, -8))


def _scene():
    return Scene(primitives=(
        RoomBox(center=(0, 0, 1.5), half_extents=(2.0, 1.8, 1.5)),
        Sphere(center=(0.6, 0.4, 1.0), radius=0.4)))


def _built_mapper(n_frames=3, color=False):
    m = DeviceMapper(voxel_size_m=VOXEL, world=WORLD, enable_color=color,
                     enable_esdf=True)
    scene = _scene()
    for k in range(n_frames):
        T = orbit_pose(2 * np.pi * k / 8, radius=1.2)
        d = render_depth(scene, CAM, jnp.asarray(T))
        m.integrate_depth(d, T, CAM)
        if color:
            m.integrate_color(render_color(scene, CAM, jnp.asarray(T)),
                              T, CAM, depth=d)
    return m


def test_device_slicer_matches_geometry():
    m = _built_mapper()
    m.update_esdf()
    res = dio.slice_esdf_device(m, slice_height_m=1.0, max_distance_m=2.0)
    assert res is not None
    spec, img = res
    known = img < 999.0
    assert known.mean() > 0.2
    # Just outside the sphere surface (sphere (0.6,0.4,1.0) r=0.4), the
    # distance is small and positive; the sphere interior is unobserved.
    xs = spec.origin_x_m + (np.arange(spec.width) + 0.5) * VOXEL
    ys = spec.origin_y_m + (np.arange(spec.height) + 0.5) * VOXEL
    ix = int(np.argmin(np.abs(xs - 0.05)))   # 0.55 m from sphere center
    iy = int(np.argmin(np.abs(ys - 0.4)))
    assert img[iy, ix] < 999.0
    assert abs(img[iy, ix] - 0.15) < 0.15


def test_esdf_2d_band_slicing():
    m = _built_mapper()
    m.update_esdf_2d(0.8, 1.2)
    assert m.esdf_2d is not None
    res = dio.slice_esdf_2d_device(m, max_distance_m=2.0)
    assert res is not None
    spec, img = res
    known = img < 999.0
    assert known.any()
    # Planar distance just outside the sphere's equator ring (r=0.4 at
    # z=1.0, inside the band): ~0.15 m at x=0.05.
    xs = spec.origin_x_m + (np.arange(spec.width) + 0.5) * VOXEL
    ys = spec.origin_y_m + (np.arange(spec.height) + 0.5) * VOXEL
    ix = int(np.argmin(np.abs(xs - 0.05)))
    iy = int(np.argmin(np.abs(ys - 0.4)))
    assert img[iy, ix] < 999.0
    assert abs(img[iy, ix] - 0.15) < 0.15
    # Band restriction: a band far above the scene yields no sites.
    m.update_esdf_2d(10.0, 11.0)
    _, img_hi = dio.slice_esdf_2d_device(m, max_distance_m=2.0)
    assert (np.abs(img_hi[img_hi < 999.0]) >= 0).all()
    assert (img_hi[img_hi < 999.0] < 0).sum() == 0  # nothing inside


def test_esdf_2d_matches_bruteforce():
    """The 2D field must hold exact planar distances to the band's sites."""
    from isaac_ros_nvblox_tpu.ops import esdf as esdf_ops
    m = _built_mapper()
    lo_z, hi_z = 0.9, 1.1
    m.update_esdf_2d(lo_z, hi_z)
    (ox_b, oy_b), sq2d, inside2d, observed2d = m.esdf_2d
    sq2d = np.asarray(sq2d)

    # Host brute force: collect band site columns from the TSDF.
    n = int(m.state.alloc_count)
    bidx = np.asarray(m.state.block_index_of_slot)[:n]
    is_site, _, _ = esdf_ops.esdf_sites_from_tsdf(
        m.channels["tsdf_distance"], m.channels["tsdf_weight"],
        voxel_size_m=jnp.float32(VOXEL),
        max_site_distance_vox=float(m.params.esdf.max_site_distance_vox),
        min_weight=float(m.params.esdf.min_weight))
    is_site = np.asarray(is_site)[:n].reshape(n, 8, 8, 8)
    cols = set()
    lz_all = np.arange(8)
    for s in range(n):
        z0 = bidx[s, 2] * 8
        z_ok = ((z0 + lz_all + 0.5) * VOXEL >= lo_z) \
            & ((z0 + lz_all + 0.5) * VOXEL <= hi_z)
        if not z_ok.any():
            continue
        sub = is_site[s][:, :, z_ok].any(axis=-1)
        for lx, ly in zip(*np.nonzero(sub)):
            cols.add((bidx[s, 0] * 8 + lx, bidx[s, 1] * 8 + ly))
    sites = np.asarray(sorted(cols))
    assert sites.shape[0] > 50
    band = m.esdf_band_vox
    rng = np.random.default_rng(0)
    X, Y = sq2d.shape
    for _ in range(60):
        px = rng.integers(0, X)
        py = rng.integers(0, Y)
        gx, gy = ox_b * 8 + px, oy_b * 8 + py
        d = np.min((sites[:, 0] - gx) ** 2 + (sites[:, 1] - gy) ** 2)
        if d <= band * band:
            assert sq2d[px, py] == d, (px, py, d, sq2d[px, py])
        else:
            assert sq2d[px, py] >= 1e11


def test_dense_esdf_grid_service():
    m = _built_mapper()
    m.update_esdf()
    grid, grads, origin = dio.esdf_and_gradients_device(
        m, (-1.0, -1.0, 0.5), (1.0, 1.0, 1.5))
    assert grid.shape == (40, 40, 20)
    assert grads.shape == (40, 40, 20, 3)
    known = grid < 999.0
    assert known.mean() > 0.3
    # Distance field gradient magnitudes are ~1 away from obstacles.
    gmag = np.linalg.norm(grads, axis=-1)
    interior = known.copy()
    interior[~known] = False
    sane = gmag[interior & (np.abs(grid) < 0.5) & (gmag > 0)]
    assert sane.size > 100


def test_device_map_save_load_roundtrip(tmp_path):
    m = _built_mapper(color=True)
    m.update_esdf()
    n0 = m.block_count()
    d0 = np.asarray(m.channels["tsdf_distance"]).copy()
    path = tmp_path / "map.nvblx"  # regression: exact-path save
    dio.save_map_device(m, path)
    assert path.exists()

    m2 = DeviceMapper(voxel_size_m=VOXEL, world=WORLD, enable_color=True,
                      enable_esdf=True)
    n = dio.load_map_device(m2, path)
    assert n == n0 == m2.block_count()
    # Per-block contents survive (slot order may differ: compare by key).
    sg1 = np.asarray(m.state.slot_grid)
    sg2 = np.asarray(m2.state.slot_grid)
    occupied = sg1 >= 0
    np.testing.assert_array_equal(occupied, sg2 >= 0)
    d2 = np.asarray(m2.channels["tsdf_distance"])
    s1 = sg1[occupied]
    s2 = sg2[occupied]
    np.testing.assert_allclose(d0[s1], d2[s2], atol=1e-6)


def test_mesh_layer_update_and_removals():
    m = _built_mapper(color=True)
    meshed = dio.update_mesh_layer(m)
    assert len(meshed) > 50
    v, c, t = m.mesh_layer.as_arrays()
    assert t.shape[0] > 500
    assert c.max() > 10  # colored
    n_blocks0 = len(m.mesh_layer.blocks)
    # Clear half the map -> removal log -> mesh blocks disappear.
    m.clear_outside_radius((0.6, 0.4, 1.0), 0.8)
    removed = dio.update_mesh_layer(m)
    assert len(m.mesh_layer.blocks) < n_blocks0


def test_esdf_2d_incremental_matches_full():
    """Incremental 2D ESDF (dirty-AABB + band re-solve + splice) is
    bitwise-equal to a full re-solve (the exactness argument of the 3D
    dirty path applied to the planar field)."""
    m = _built_mapper(n_frames=4)
    m.update_esdf_2d(0.8, 1.2)         # full solve (first call)
    assert m._esdf2d_frame is not None

    # A localized change: a small frame seeing only part of the scene.
    scene2 = Scene(primitives=(
        RoomBox(center=(0, 0, 1.5), half_extents=(2.0, 1.8, 1.5)),
        Sphere(center=(0.6, 0.4, 1.0), radius=0.4),
        Sphere(center=(-0.5, -0.3, 1.0), radius=0.25)))
    T = orbit_pose(np.pi / 7, radius=1.2)
    m.integrate_depth(render_depth(scene2, CAM, jnp.asarray(T)), T, CAM)
    assert m._dirty_lo is not None     # host-tracked dirty region exists

    m.update_esdf_2d(0.8, 1.2)         # incremental (same frame)
    _, sq_inc, in_inc, ob_inc = m.esdf_2d
    m.update_esdf_2d(0.8, 1.2, full=True)
    _, sq_full, in_full, ob_full = m.esdf_2d
    np.testing.assert_array_equal(np.asarray(sq_inc), np.asarray(sq_full))
    np.testing.assert_array_equal(np.asarray(in_inc), np.asarray(in_full))
    np.testing.assert_array_equal(np.asarray(ob_inc), np.asarray(ob_full))

    # No-op when nothing is dirty: the stored field object is unchanged.
    before = m.esdf_2d
    m.update_esdf_2d(0.8, 1.2)
    assert m.esdf_2d is before
