"""PLY export for meshes and voxel layers.

Reference: `io::outputColorMeshLayerToPly` / `io::outputVoxelLayerToPly`
(nvblox/io/mesh_io.h; call-sites nvblox_node.cpp:1612-1628 in the save_ply
service). Binary little-endian PLY, colored vertices when available.
"""

from __future__ import annotations

import struct
from pathlib import Path
from typing import Optional

import numpy as np


def write_mesh_ply(path, vertices: np.ndarray, triangles: np.ndarray,
                   colors: Optional[np.ndarray] = None) -> None:
    """Write a triangle mesh as binary PLY.

    vertices f32[V,3], triangles i32[T,3], colors u8[V,3] (optional).
    """
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    V = int(vertices.shape[0])
    T = int(triangles.shape[0])
    has_color = colors is not None and len(colors) == V
    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {V}",
              "property float x", "property float y", "property float z"]
    if has_color:
        header += ["property uchar red", "property uchar green",
                   "property uchar blue"]
    header += [f"element face {T}", "property list uchar int vertex_indices",
               "end_header"]
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        if has_color:
            rec = np.zeros(V, dtype=[("xyz", "<f4", 3), ("rgb", "u1", 3)])
            rec["xyz"] = vertices.astype(np.float32)
            rec["rgb"] = colors.astype(np.uint8)
            f.write(rec.tobytes())
        else:
            f.write(vertices.astype("<f4").tobytes())
        face = np.zeros(T, dtype=[("n", "u1"), ("idx", "<i4", 3)])
        face["n"] = 3
        face["idx"] = triangles.astype(np.int32)
        f.write(face.tobytes())


def write_pointcloud_ply(path, points: np.ndarray,
                         intensities: Optional[np.ndarray] = None) -> None:
    """Write a point cloud (optionally with a float intensity property)."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    V = int(points.shape[0])
    has_i = intensities is not None
    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {V}",
              "property float x", "property float y", "property float z"]
    if has_i:
        header += ["property float intensity"]
    header += ["end_header"]
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode("ascii"))
        if has_i:
            rec = np.zeros(V, dtype=[("xyz", "<f4", 3), ("i", "<f4")])
            rec["xyz"] = points.astype(np.float32)
            rec["i"] = np.asarray(intensities, np.float32)
            f.write(rec.tobytes())
        else:
            f.write(points.astype("<f4").tobytes())


def write_voxel_layer_ply(path, mapper, channel: str,
                          min_weight: float = 1e-4) -> int:
    """Export a voxel channel as an intensity point cloud (parity:
    outputVoxelLayerToPly for tsdf/esdf/freespace). Returns #points."""
    from isaac_ros_nvblox_tpu.core.types import voxel_centers_for_blocks
    import jax.numpy as jnp

    table = mapper.table
    slots = table.allocated_slots()
    if slots.size == 0:
        write_pointcloud_ply(path, np.zeros((0, 3), np.float32),
                             np.zeros((0,), np.float32))
        return 0
    bidx = table.block_indices[slots]
    centers = np.asarray(voxel_centers_for_blocks(
        jnp.asarray(bidx), mapper.voxel_size_m)).reshape(-1, 3)
    if channel == "esdf":
        from isaac_ros_nvblox_tpu.ops.esdf import esdf_distance_m
        vals = np.asarray(esdf_distance_m(
            mapper.pool, mapper.voxel_size_m,
            mapper.params.esdf.max_esdf_distance_m))[slots].reshape(-1)
        mask = np.asarray(mapper.pool["esdf_observed"])[slots].reshape(-1)
    elif channel == "tsdf":
        vals = np.asarray(mapper.pool["tsdf_distance"])[slots].reshape(-1)
        mask = (np.asarray(mapper.pool["tsdf_weight"])[slots].reshape(-1)
                >= min_weight)
    elif channel == "occupancy":
        vals = np.asarray(mapper.pool["occupancy_log_odds"])[slots].reshape(-1)
        mask = np.asarray(
            mapper.pool["occupancy_observed"])[slots].reshape(-1) > 0
    elif channel == "freespace":
        vals = np.asarray(
            mapper.pool["freespace_high_confidence"])[slots].reshape(-1)
        mask = np.ones_like(vals, bool)
        vals = vals.astype(np.float32)
    else:
        raise ValueError(f"unknown channel {channel!r}")
    write_pointcloud_ply(path, centers[mask], vals[mask])
    return int(mask.sum())


def write_voxel_layer_ply_device(path, m, channel: str,
                                 min_weight: float = 1e-4) -> int:
    """write_voxel_layer_ply for a DeviceMapper (channels dict + WorldGrid)."""
    from isaac_ros_nvblox_tpu.core import world_grid as wg
    from isaac_ros_nvblox_tpu.core.types import voxel_centers_for_blocks
    import jax.numpy as jnp

    live = np.asarray(wg.live_slot_mask(m.state))
    slots = np.nonzero(live)[0]
    if slots.size == 0:
        write_pointcloud_ply(path, np.zeros((0, 3), np.float32),
                             np.zeros((0,), np.float32))
        return 0
    bidx = np.asarray(m.state.block_index_of_slot)[slots]
    centers = np.asarray(voxel_centers_for_blocks(
        jnp.asarray(bidx), m.voxel_size_m)).reshape(-1, 3)
    ch = {k: np.asarray(v)[slots] for k, v in m.channels.items()}
    if channel == "esdf":
        sq = np.minimum(ch["esdf_sq_dist"], 1e12)
        vals = np.minimum(np.sqrt(sq) * m.voxel_size_m,
                          m.params.esdf.max_esdf_distance_m)
        vals = np.where(ch["esdf_is_inside"], -vals, vals).reshape(-1)
        mask = ch["esdf_observed"].reshape(-1).astype(bool)
    elif channel == "tsdf":
        vals = ch["tsdf_distance"].reshape(-1)
        mask = ch["tsdf_weight"].reshape(-1) >= min_weight
    elif channel == "occupancy":
        vals = ch["occupancy_log_odds"].reshape(-1)
        mask = ch["occupancy_observed"].reshape(-1) > 0
    elif channel == "freespace":
        vals = ch["freespace_high_confidence"].reshape(-1).astype(np.float32)
        mask = np.ones_like(vals, bool)
    else:
        raise ValueError(f"unknown channel {channel!r}")
    write_pointcloud_ply(path, centers[mask], vals[mask].astype(np.float32))
    return int(mask.sum())
