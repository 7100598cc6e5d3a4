"""MultiMapper: static (background) + dynamic (foreground) map routing.

Reference: nvblox `MultiMapper` (nvblox/mapper/multi_mapper.h; ctor +
routing call-sites nvblox_node.cpp:187-210, 1057-1063, 1260-1265,
1382-1384) — owns a background mapper (TSDF or occupancy) and, in
dynamic/human modes, a foreground occupancy mapper fed by masked depth:

  * human modes: the mask comes from a people-segmentation DNN;
  * dynamic mode: the mask is derived from the freespace layer — depth
    points landing inside high-confidence freespace are dynamic.

Also hosts the ground-plane estimator and the dynamic debug outputs
(last dynamic pointcloud / mask overlays, nvblox_node.cpp:1098-1147).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isaac_ros_nvblox_tpu.mapper.mapper import Mapper
from isaac_ros_nvblox_tpu.mapper.params import (MappingType, MultiMapperParams,
                                                ProjectiveLayerType,
                                                projective_layer_type)
from isaac_ros_nvblox_tpu.models.camera import Camera
from isaac_ros_nvblox_tpu.models.lidar import (Lidar,
                                               motion_compensate_pointcloud,
                                               pointcloud_to_range_image)
from isaac_ros_nvblox_tpu.ops.masking import (mask_overlay,
                                              remove_small_connected_components,
                                              split_depth_by_mask)


class MultiMapper:
    def __init__(self, params: Optional[MultiMapperParams] = None):
        self.params = params or MultiMapperParams()
        p = self.params
        static_layer = projective_layer_type(p.mapping_type)
        self.is_dynamic_mode = p.mapping_type in (
            MappingType.DYNAMIC, MappingType.HUMAN_WITH_STATIC_TSDF,
            MappingType.HUMAN_WITH_STATIC_OCCUPANCY)
        self.uses_freespace = p.mapping_type == MappingType.DYNAMIC

        self.static_mapper = Mapper(
            voxel_size_m=p.voxel_size_m, params=p.static_mapper,
            projective_layer=static_layer, capacity=p.block_capacity,
            enable_color=(static_layer == ProjectiveLayerType.TSDF),
            enable_esdf=True,
            enable_freespace=self.uses_freespace,
            name="static_mapper")
        self.dynamic_mapper: Optional[Mapper] = None
        if self.is_dynamic_mode:
            self.dynamic_mapper = Mapper(
                voxel_size_m=p.voxel_size_m, params=p.dynamic_mapper,
                projective_layer=ProjectiveLayerType.OCCUPANCY,
                capacity=max(p.block_capacity // 4, 1024),
                enable_color=False, enable_esdf=True,
                name="dynamic_mapper")

        self.default_lidar = Lidar.equal_vertical_fov(
            num_azimuth=1024, num_elevation=64,
            vertical_fov_rad=np.deg2rad(45.0))
        # Debug outputs (parity: getLastDynamicPointcloud etc.).
        self.last_dynamic_pointcloud: Optional[np.ndarray] = None
        self.last_dynamic_mask: Optional[np.ndarray] = None
        self.last_mask_overlay: Optional[np.ndarray] = None
        self.last_depth_foreground: Optional[np.ndarray] = None

    # -------------------------------------------------------------- helpers
    def background_mapper(self) -> Mapper:
        return self.static_mapper

    def foreground_mapper(self) -> Optional[Mapper]:
        return self.dynamic_mapper

    # ------------------------------------------------------------ integrate
    def integrate_depth(self, depth, T_L_C, camera: Camera,
                        mask: Optional[np.ndarray] = None,
                        time_ms: float = 0.0) -> None:
        """Route a depth frame: unmasked -> static; masked/human modes split
        foreground into the dynamic occupancy mapper; dynamic mode derives
        the mask from high-confidence freespace."""
        depth = jnp.asarray(depth, jnp.float32)
        if self.params.static_mapper.do_depth_preprocessing:
            depth = dilate_invalid_depth(
                depth, self.params.static_mapper.depth_preprocessing_num_dilations)

        if not self.is_dynamic_mode:
            self.static_mapper.integrate_depth(depth, T_L_C, camera)
            return

        if self.uses_freespace and mask is None:
            mask = self.detect_dynamic(depth, T_L_C, camera)
        if mask is None:
            mask = np.zeros(depth.shape, np.uint8)
        elif self.params.static_mapper.remove_small_connected_components:
            mask = remove_small_connected_components(
                np.asarray(mask),
                self.params.static_mapper.connected_mask_component_size_threshold)

        background, foreground = split_depth_by_mask(depth, jnp.asarray(mask))
        self.static_mapper.integrate_depth(background, T_L_C, camera)
        if self.dynamic_mapper is not None:
            self.dynamic_mapper.integrate_depth(foreground, T_L_C, camera)
        if self.uses_freespace:
            self.static_mapper.update_freespace(time_ms, T_L_C, camera)
        self.last_dynamic_mask = np.asarray(mask)
        self.last_depth_foreground = np.asarray(foreground)
        self.last_mask_overlay = np.asarray(mask_overlay(
            jnp.clip(depth * 50.0, 0, 255), jnp.asarray(mask)))

    def integrate_color(self, color, T_L_C, camera: Camera,
                        mask: Optional[np.ndarray] = None,
                        depth=None) -> None:
        if self.static_mapper.projective_layer != ProjectiveLayerType.TSDF:
            return
        if mask is not None:
            color = np.asarray(color).copy()
            color[np.asarray(mask) > 0] = 0
        self.static_mapper.integrate_color(color, T_L_C, camera, depth=depth)

    def integrate_pointcloud(self, points, T_L_S,
                             lidar: Optional[Lidar] = None,
                             timestamps_s: Optional[np.ndarray] = None,
                             T_L_S_end=None, time_ms: float = 0.0) -> None:
        """3D LiDAR integration: (optional) motion compensation -> spherical
        range image -> projective TSDF fusion (nvblox_node.cpp:1382-1384)."""
        from isaac_ros_nvblox_tpu.core.block_pool import pad_to_bucket
        from isaac_ros_nvblox_tpu.ops.tsdf import integrate_tsdf_lidar
        from isaac_ros_nvblox_tpu.ops import view as view_ops

        lidar = lidar or self.default_lidar
        points = jnp.asarray(points, jnp.float32)
        T_L_S = jnp.asarray(T_L_S, jnp.float32)
        if timestamps_s is not None and T_L_S_end is not None:
            points = motion_compensate_pointcloud(
                points, jnp.asarray(timestamps_s, jnp.float32),
                T_L_S, jnp.asarray(T_L_S_end, jnp.float32), lidar)
            T_L_S = jnp.asarray(T_L_S_end, jnp.float32)
        range_image = pointcloud_to_range_image(points, lidar)

        m = self.static_mapper
        assert m.projective_layer == ProjectiveLayerType.TSDF, \
            "lidar integration currently requires a TSDF static layer"
        p = m.params.projective
        # Block allocation from the world-frame points directly (cheaper and
        # exact vs re-raycasting the range image).
        from isaac_ros_nvblox_tpu.core.types import block_size_m
        pts_L = np.asarray(points @ np.asarray(T_L_S)[:3, :3].T
                           + np.asarray(T_L_S)[:3, 3])
        r = np.linalg.norm(pts_L - np.asarray(T_L_S)[:3, 3], axis=1)
        ok = (r > 1e-3) & (r <= p.max_integration_distance_m)
        idx = touched_blocks_along_rays(
            np.asarray(T_L_S)[:3, 3], pts_L[ok], m.voxel_size_m,
            p.truncation_m(m.voxel_size_m))
        m.pool.ensure_capacity(needed_free=len(idx))
        slots, fresh = m.table.allocate(idx)
        m.pool.reset_slots(slots[fresh])
        from isaac_ros_nvblox_tpu.mapper.mapper import _padded_batch
        slots_d, idx_d = _padded_batch(m.table, slots, idx)
        d, w = integrate_tsdf_lidar(
            m.pool["tsdf_distance"], m.pool["tsdf_weight"], slots_d, idx_d,
            range_image, T_L_S, lidar=lidar, voxel_size_m=m.voxel_size_m,
            params=p)
        m.pool["tsdf_distance"] = d
        m.pool["tsdf_weight"] = w
        m._mark_mesh_dirty(slots)

    # -------------------------------------------------------------- dynamic
    def detect_dynamic(self, depth, T_L_C, camera: Camera) -> np.ndarray:
        """Dynamic-pixel mask from high-confidence freespace: back-project
        depth pixels, mark those landing in high-confidence-freespace voxels."""
        from isaac_ros_nvblox_tpu.ops.backproject import back_project_depth
        m = self.static_mapper
        if "freespace_high_confidence" not in m.pool.channels:
            return np.zeros(np.asarray(depth).shape, np.uint8)
        pts_C, valid = back_project_depth(
            jnp.asarray(depth), camera=camera,
            max_depth_m=m.params.projective.max_integration_distance_m)
        from isaac_ros_nvblox_tpu.core.types import Transform
        pts_L = Transform.apply(jnp.asarray(T_L_C, jnp.float32), pts_C)
        hc = lookup_voxel_flags(m, pts_L)
        mask = np.asarray(hc & valid).reshape(np.asarray(depth).shape)
        pts_np = np.asarray(pts_L)[np.asarray(hc & valid)]
        self.last_dynamic_pointcloud = pts_np
        return mask.astype(np.uint8)

    # --------------------------------------------------------------- update
    def update_esdf(self) -> None:
        self.static_mapper.update_esdf()
        if self.dynamic_mapper is not None:
            self.dynamic_mapper.update_esdf()

    def update_mesh(self, update_full_layer: bool = False) -> int:
        return self.static_mapper.update_mesh(update_full_layer)

    def decay(self) -> None:
        if self.static_mapper.projective_layer == ProjectiveLayerType.TSDF:
            if self.uses_freespace:
                self.static_mapper.decay_tsdf()
        else:
            self.static_mapper.decay_occupancy()
        if self.dynamic_mapper is not None:
            self.dynamic_mapper.decay_occupancy()


# ------------------------------------------------------------------ helpers
def dilate_invalid_depth(depth, num_dilations: int):
    """Invalid-depth dilation (parity: do_depth_preprocessing,
    mapper_initialization.cpp:239-244): grow invalid regions to suppress
    mixed-depth edge artifacts."""
    import jax.numpy as jnp
    d = depth
    for _ in range(int(num_dilations)):
        invalid = d <= 0.0
        for axis, shift in ((0, 1), (0, -1), (1, 1), (1, -1)):
            invalid = invalid | (jnp.roll(d, shift, axis) <= 0.0)
        d = jnp.where(invalid, 0.0, d)
    return d


def lookup_voxel_flags(mapper: Mapper, points_L) -> np.ndarray:
    """Check `freespace_high_confidence` at given world points (host-assisted
    slot lookup + device gather)."""
    import jax.numpy as jnp
    from isaac_ros_nvblox_tpu.core.types import (VOXELS_PER_SIDE,
                                                 block_size_m)
    B = VOXELS_PER_SIDE
    pts = np.asarray(points_L)
    vs = mapper.voxel_size_m
    gvox = np.floor(pts / vs).astype(np.int64)
    bidx, lidx = np.divmod(gvox, B)
    # Host slot lookup (vectorized dict via python loop over unique blocks).
    ub, inv = np.unique(bidx, axis=0, return_inverse=True)
    slot_of_ub = np.asarray([mapper.table.slot_of(tuple(b)) for b in ub.tolist()],
                            np.int32)
    slots = slot_of_ub[inv]
    lin = ((lidx[:, 0] * B + lidx[:, 1]) * B + lidx[:, 2]).astype(np.int32)
    hc_pool = np.asarray(mapper.pool["freespace_high_confidence"])
    ok = slots >= 0
    out = np.zeros(pts.shape[0], bool)
    out[ok] = hc_pool[slots[ok], lin[ok]]
    return out


def touched_blocks_along_rays(origin_m: np.ndarray, end_points_m: np.ndarray,
                              voxel_size_m: float, truncation_m: float,
                              max_points: int = 20000) -> np.ndarray:
    """Host: unique block indices along rays origin->point(+truncation).

    Subsamples to `max_points` rays for allocation (allocation only needs
    coverage; integration uses the full range image)."""
    from isaac_ros_nvblox_tpu.core.types import block_size_m
    bs = block_size_m(voxel_size_m)
    n = end_points_m.shape[0]
    if n == 0:
        return np.zeros((0, 3), np.int32)
    if n > max_points:
        sel = np.linspace(0, n - 1, max_points).astype(np.int64)
        end_points_m = end_points_m[sel]
    d = end_points_m - origin_m
    lengths = np.linalg.norm(d, axis=1)
    dirs = d / np.maximum(lengths[:, None], 1e-9)
    lengths = lengths + truncation_m
    max_len = lengths.max()
    n_steps = int(np.ceil(max_len / (bs * 0.5))) + 1
    ts = np.minimum(np.arange(n_steps)[None, :] * (bs * 0.5),
                    lengths[:, None])
    pts = origin_m[None, None, :] + dirs[:, None, :] * ts[..., None]
    blocks = np.floor(pts.reshape(-1, 3) / bs).astype(np.int64)
    packed = ((blocks[:, 0] + (1 << 20)) << 42) \
        + ((blocks[:, 1] + (1 << 20)) << 21) + (blocks[:, 2] + (1 << 20))
    uniq = np.unique(packed)
    out = np.empty((uniq.size, 3), np.int64)
    out[:, 0] = (uniq >> 42) - (1 << 20)
    out[:, 1] = ((uniq >> 21) & ((1 << 21) - 1)) - (1 << 20)
    out[:, 2] = (uniq & ((1 << 21) - 1)) - (1 << 20)
    return out.astype(np.int32)
