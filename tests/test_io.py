"""IO tests: PLY, map serialization, occupancy grid export, image preproc,
native library."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from isaac_ros_nvblox_tpu.io.occupancy_grid_io import save_occupancy_grid
from isaac_ros_nvblox_tpu.io.ply import write_mesh_ply, write_pointcloud_ply
from isaac_ros_nvblox_tpu.io.serialization import load_map, save_map
from isaac_ros_nvblox_tpu.mapper.mapper import Mapper
from isaac_ros_nvblox_tpu.ops.esdf_slicer import (OCC_FREE, OCC_OCCUPIED,
                                                  OCC_UNKNOWN)
from isaac_ros_nvblox_tpu.ops.image_preproc import (pad_or_crop,
                                                    rgb_semantic_to_mask,
                                                    semantic_labels_to_mask,
                                                    uncrop, undo_srgb_gamma)


def test_ply_round_trip_header(tmp_path):
    verts = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    tris = np.asarray([[0, 1, 2]], np.int32)
    colors = np.asarray([[255, 0, 0]] * 3, np.uint8)
    p = tmp_path / "m.ply"
    write_mesh_ply(p, verts, tris, colors)
    data = p.read_bytes()
    header_end = data.index(b"end_header\n") + len(b"end_header\n")
    header = data[:header_end].decode()
    assert "element vertex 3" in header
    assert "element face 1" in header
    assert "property uchar red" in header
    body = data[header_end:]
    # 3 verts * (12 + 3) bytes + 1 face * 13 bytes
    assert len(body) == 3 * 15 + 13


def test_pointcloud_ply(tmp_path):
    pts = np.random.rand(10, 3).astype(np.float32)
    p = tmp_path / "pc.ply"
    write_pointcloud_ply(p, pts, np.arange(10, dtype=np.float32))
    assert p.stat().st_size > 100


def test_save_load_map_roundtrip(tmp_path):
    m1 = Mapper(voxel_size_m=0.05, capacity=64, enable_color=True,
                enable_esdf=True)
    idx = np.asarray([[0, 0, 0], [1, 2, 3]], np.int32)
    slots, _ = m1.table.allocate(idx)
    m1.pool["tsdf_distance"] = m1.pool["tsdf_distance"].at[slots[0], 7].set(0.33)
    m1.pool["tsdf_weight"] = m1.pool["tsdf_weight"].at[slots[0], 7].set(2.0)
    # .nvblx (the reference map suffix): regression for
    # np.savez_compressed appending ".npz" to foreign suffixes.
    p = tmp_path / "map.nvblx"
    save_map(m1, p)
    assert p.exists()

    m2 = Mapper(voxel_size_m=0.05, capacity=64, enable_color=True,
                enable_esdf=True)
    n = load_map(m2, p)
    assert n == 2
    s = m2.table.slot_of((0, 0, 0))
    assert s >= 0
    assert float(m2.pool["tsdf_distance"][s, 7]) == pytest.approx(0.33)
    assert m2.table.slot_of((1, 2, 3)) >= 0


def test_load_map_rejects_mismatched_voxel_size(tmp_path):
    m1 = Mapper(voxel_size_m=0.05, capacity=16)
    # .nvblx (the reference map suffix): regression for
    # np.savez_compressed appending ".npz" to foreign suffixes.
    p = tmp_path / "map.nvblx"
    save_map(m1, p)
    assert p.exists()
    m2 = Mapper(voxel_size_m=0.1, capacity=16)
    with pytest.raises(ValueError, match="voxel size"):
        load_map(m2, p)


def test_occupancy_grid_export(tmp_path):
    grid = np.full((4, 6), OCC_UNKNOWN, np.int8)
    grid[1, 1] = OCC_FREE
    grid[2, 2] = OCC_OCCUPIED
    save_occupancy_grid(tmp_path, "map", grid, 0.05, -1.0, -2.0)
    assert (tmp_path / "map.png").exists()
    yaml_text = (tmp_path / "map.yaml").read_text()
    assert "resolution: 0.05" in yaml_text
    assert "origin: [-1.0, -2.0, 0.0]" in yaml_text
    import imageio.v2 as imageio
    img = imageio.imread(tmp_path / "map.png")
    assert img.shape == (4, 6)
    # Row flip: grid row 1 -> image row 4-1-1 = 2.
    assert img[2, 1] == 254 and img[1, 2] == 0 and img[0, 0] == 205


def test_pad_crop_roundtrip():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    padded, off = pad_or_crop(img, 5, 6, fill=99)
    assert padded.shape == (5, 6)
    restored = uncrop(padded, 3, 4, off)
    np.testing.assert_array_equal(restored, img)
    # Crop path.
    cropped, off2 = pad_or_crop(img, 2, 2)
    assert cropped.shape == (2, 2)


def test_semantic_masks():
    labels = np.asarray([[0, 5], [7, 5]])
    mask = semantic_labels_to_mask(labels, positive_labels=[5])
    np.testing.assert_array_equal(mask, [[0, 255], [0, 255]])
    rgb = np.zeros((2, 2, 3), np.uint8)
    rgb[0, 0] = (10, 20, 30)
    mask2 = rgb_semantic_to_mask(rgb, {(10, 20, 30): 1, (0, 0, 0): 2}, [1])
    assert mask2[0, 0] == 255 and mask2[1, 1] == 0


def test_srgb_lut():
    out = undo_srgb_gamma(np.asarray([0, 255, 128], np.uint8))
    assert out[0] == 0 and out[1] == 255
    assert 0 < out[2] < 128  # gamma expansion darkens midtones


def test_native_weld_matches_numpy_fallback():
    from isaac_ros_nvblox_tpu import native
    rng = np.random.RandomState(0)
    base = rng.rand(50, 3).astype(np.float32)
    tris_idx = rng.randint(0, 50, size=(30, 3))
    soup_v = base[tris_idx]
    soup_c = rng.rand(30, 3, 3).astype(np.float32) * 255
    v, c, t = native.weld_mesh(soup_v, soup_c, quantum=1e-4)
    assert t.shape == (30, 3)
    # Reconstructed triangles identical to input soup.
    np.testing.assert_allclose(v[t], soup_v, atol=1e-6)
    assert v.shape[0] <= 50 + 1
