"""MultiMapper: static (background) + dynamic (foreground) map routing.

Reference: nvblox `MultiMapper` (nvblox/mapper/multi_mapper.h; ctor +
routing call-sites nvblox_node.cpp:187-210, 1057-1063, 1260-1265,
1382-1384) — owns a background mapper (TSDF or occupancy) and, in
dynamic/human modes, a foreground occupancy mapper fed by masked depth:

  * human modes: the mask comes from a people-segmentation DNN (optionally
    from a different camera than depth — `T_CM_CD` + mask intrinsics);
  * dynamic mode: the mask is derived from the freespace layer — depth
    points landing inside high-confidence freespace are dynamic.

Round 2: both mappers are device-resident DeviceMappers (zero host round
trips on the integration path). Also hosts the ground-plane estimator
(feeding ESDF slicing-above-plane, nvblox_node.cpp:1455-1474) and the
dynamic debug outputs (nvblox_node.cpp:1098-1147).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isaac_ros_nvblox_tpu.core import world_grid as wg
from isaac_ros_nvblox_tpu.mapper.device_mapper import DeviceMapper
from isaac_ros_nvblox_tpu.mapper.params import (EsdfMode, MappingType,
                                                MultiMapperParams,
                                                ProjectiveLayerType,
                                                projective_layer_type)
from isaac_ros_nvblox_tpu.models.camera import Camera, sample_image_nearest
from isaac_ros_nvblox_tpu.models.lidar import Lidar
from isaac_ros_nvblox_tpu.ops.ground_plane import (GroundPlaneEstimator,
                                                   Plane)
from isaac_ros_nvblox_tpu.ops.masking import (
    mask_overlay, remove_small_connected_components,
    remove_small_connected_components_device)


def _default_world(capacity: int) -> wg.WorldGridConfig:
    return wg.WorldGridConfig(dims=(128, 128, 32), capacity=capacity,
                              origin_block=(-64, -64, -8))


@functools.partial(jax.jit, static_argnames=("depth_camera", "mask_camera"))
def reproject_mask(depth, mask, T_CM_CD, *, depth_camera: Camera,
                   mask_camera: Camera):
    """Mask seen from a different camera -> per-depth-pixel mask.

    Back-projects each depth pixel, transforms into the mask camera via
    `T_CM_CD`, and samples the mask (parity: masked integrateDepth with
    mask_camera + T_CM_CD, nvblox_node.cpp:1057-1063). Pixels projecting
    outside the mask image count as unmasked.
    """
    from isaac_ros_nvblox_tpu.core.types import Transform
    H, W = depth.shape
    uu = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    vv = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    z = depth
    x = (uu - depth_camera.cx) / depth_camera.fx * z
    y = (vv - depth_camera.cy) / depth_camera.fy * z
    p = jnp.stack([x, y, z], -1).reshape(-1, 3)
    p_m = Transform.apply(T_CM_CD, p)
    uv, in_view = mask_camera.project(p_m)
    m = sample_image_nearest(mask.astype(jnp.float32), uv).reshape(H, W)
    ok = in_view.reshape(H, W) & (depth > 0)
    return jnp.where(ok, m, 0.0).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("camera", "voxel_size_m",
                                             "max_depth_m", "subsample"))
def _detect_dynamic_fused(state, high_confidence, depth, T_L_C, *,
                          camera: Camera, voxel_size_m: float,
                          max_depth_m: float, subsample: int = 1):
    """Dynamic-pixel mask: depth pixels landing in high-confidence
    freespace voxels (device slot_grid lookup, no host tables).

    `subsample` > 1 evaluates the lookup on a strided pixel grid and
    nearest-upsamples the mask — the per-pixel voxel lookup is TWO element
    gathers/pixel (~115 M elem/s on TPU), so full-res VGA detection costs
    ~5 ms; subsample=2 cuts it 4x with 2x2-pixel mask granularity."""
    from isaac_ros_nvblox_tpu.core.types import Transform
    B = 8
    cap = high_confidence.shape[0]
    H, W = depth.shape
    d_s = depth[::subsample, ::subsample] if subsample > 1 else depth
    Hs, Ws = d_s.shape
    uu = jax.lax.broadcasted_iota(jnp.float32, (Hs, Ws), 1) * subsample
    vv = jax.lax.broadcasted_iota(jnp.float32, (Hs, Ws), 0) * subsample
    z = d_s
    x = (uu - camera.cx) / camera.fx * z
    y = (vv - camera.cy) / camera.fy * z
    p_L = Transform.apply(T_L_C, jnp.stack([x, y, z], -1).reshape(-1, 3))
    gvox = jnp.floor(p_L / voxel_size_m).astype(jnp.int32)
    b = jnp.floor_divide(gvox, B)
    cell = b - state.origin_block[None, :]
    dims = jnp.asarray(state.slot_grid.shape, jnp.int32)
    in_b = jnp.all((cell >= 0) & (cell < dims), axis=-1)
    safe = jnp.clip(cell, 0, dims - 1)
    slot = state.slot_grid[safe[:, 0], safe[:, 1], safe[:, 2]]
    l = gvox - b * B
    vox = (l[:, 0] * B + l[:, 1]) * B + l[:, 2]
    hc = high_confidence[jnp.clip(slot, 0, cap - 1), vox]
    ok = in_b & (slot >= 0) & (d_s.reshape(-1) > 0) \
        & (d_s.reshape(-1) <= max_depth_m)
    mask = (hc & ok).reshape(Hs, Ws)
    if subsample > 1:
        mask = jnp.repeat(jnp.repeat(mask, subsample, axis=0), subsample,
                          axis=1)[:H, :W]
    return mask, p_L


@functools.partial(
    jax.jit,
    static_argnames=("camera", "voxel_size_m", "static_params", "occ_params",
                     "free_params", "max_blocks", "dyn_max_blocks",
                     "use_pallas", "max_depth_m", "detect_subsample",
                     "free_dims_b", "slot_bucket"),
    donate_argnums=(0, 1, 2, 3, 4, 5, 6, 7))
def _dynamic_replay_scan(s_state, s_ch, s_dirty, s_edirty,
                         d_state, d_ch, d_dirty, d_edirty,
                         depths, T_L_Cs, times_ms, last_ms0,
                         free_origin_b=None, *,
                         camera: Camera, voxel_size_m: float, static_params,
                         occ_params, free_params, max_blocks: int,
                         dyn_max_blocks: int, use_pallas: bool,
                         max_depth_m: float, detect_subsample: int = 1,
                         free_dims_b=None, slot_bucket: int = 0):
    """The WHOLE dynamic pipeline in ONE device program (lax.scan):
    freespace-driven dynamic detection -> masked static TSDF (background)
    -> masked dynamic occupancy (foreground) -> freespace update. The
    per-frame equivalent of the reference's people/dynamics components
    (BASELINE.md "Dynamics" row; detection semantics of
    _detect_dynamic_fused / dynamics.cpp)."""
    from isaac_ros_nvblox_tpu.mapper import device_mapper as dm

    def step(carry, inp):
        ss, sch, sd, sed, ds, dch, dd, ded, last_ms = carry
        depth, T, t_ms = inp
        if use_pallas:
            from isaac_ros_nvblox_tpu.ops.detect_pallas import (
                detect_dynamic_fused_pallas)
            mask = detect_dynamic_fused_pallas(
                ss, sch["freespace_high_confidence"], depth, T,
                camera=camera, voxel_size_m=voxel_size_m,
                max_depth_m=max_depth_m, max_blocks=max_blocks)
        else:
            mask, _ = _detect_dynamic_fused(
                ss, sch["freespace_high_confidence"], depth, T,
                camera=camera, voxel_size_m=voxel_size_m,
                max_depth_m=max_depth_m, subsample=detect_subsample)
        mask_u8 = mask.astype(jnp.uint8)
        ss, d, w, sd, sed = dm._integrate_frame_fused(
            ss, sch["tsdf_distance"], sch["tsdf_weight"], sd, sed, depth, T,
            mask_u8, camera=camera, voxel_size_m=voxel_size_m,
            params=static_params, max_blocks=max_blocks,
            use_pallas=use_pallas, mask_mode=1)
        sch = dict(sch, tsdf_distance=d, tsdf_weight=w)
        ds, lo, ob, dd, ded = dm._integrate_occupancy_fused(
            ds, dch["occupancy_log_odds"], dch["occupancy_observed"], dd,
            ded, depth, T, mask_u8, camera=camera,
            voxel_size_m=voxel_size_m, params=occ_params,
            proj_max_distance_m=float(occ_params.max_integration_distance_m),
            truncation_m=float(occ_params.occupied_region_half_width_m),
            max_blocks=dyn_max_blocks, mask_mode=2, use_pallas=use_pallas)
        dch = dict(dch, occupancy_log_odds=lo, occupancy_observed=ob)
        cons, last, hc = dm._freespace_fused(
            sch["freespace_consecutive_ms"],
            sch["freespace_last_occupied_ms"],
            sch["freespace_high_confidence"], ss, sch["tsdf_distance"],
            sch["tsdf_weight"], T, t_ms, last_ms, free_origin_b,
            camera=camera,
            voxel_size_m=voxel_size_m, params=free_params,
            view_distance_m=float(static_params.max_integration_distance_m),
            max_blocks=max_blocks, dims_b=free_dims_b,
            slot_bucket=slot_bucket)
        sch = dict(sch, freespace_consecutive_ms=cons,
                   freespace_last_occupied_ms=last,
                   freespace_high_confidence=hc)
        return (ss, sch, sd, sed, ds, dch, dd, ded, t_ms), None

    carry0 = (s_state, s_ch, s_dirty, s_edirty, d_state, d_ch, d_dirty,
              d_edirty, last_ms0)
    carry, _ = jax.lax.scan(step, carry0, (depths, T_L_Cs, times_ms))
    return carry


class MultiMapper:
    def __init__(self, params: Optional[MultiMapperParams] = None,
                 world: Optional[wg.WorldGridConfig] = None):
        self.params = params or MultiMapperParams()
        p = self.params
        static_layer = projective_layer_type(p.mapping_type)
        self.is_dynamic_mode = p.mapping_type in (
            MappingType.DYNAMIC, MappingType.HUMAN_WITH_STATIC_TSDF,
            MappingType.HUMAN_WITH_STATIC_OCCUPANCY)
        self.uses_freespace = p.mapping_type == MappingType.DYNAMIC

        world = world or _default_world(p.block_capacity)
        self.static_mapper = DeviceMapper(
            voxel_size_m=p.voxel_size_m, params=p.static_mapper,
            projective_layer=static_layer, world=world,
            enable_color=(static_layer == ProjectiveLayerType.TSDF),
            enable_esdf=True, enable_freespace=self.uses_freespace,
            max_blocks_per_frame=p.max_blocks_per_frame,
            name="static_mapper")
        self.dynamic_mapper: Optional[DeviceMapper] = None
        if self.is_dynamic_mode:
            dyn_world = wg.WorldGridConfig(
                dims=world.dims, capacity=max(p.block_capacity // 4, 1024),
                origin_block=world.origin_block)
            self.dynamic_mapper = DeviceMapper(
                voxel_size_m=p.voxel_size_m, params=p.dynamic_mapper,
                projective_layer=ProjectiveLayerType.OCCUPANCY,
                world=dyn_world, enable_color=False, enable_esdf=True,
                max_blocks_per_frame=p.dynamic_max_blocks_per_frame,
                name="dynamic_mapper")

        self.default_lidar = Lidar.equal_vertical_fov(
            num_azimuth=1024, num_elevation=64,
            vertical_fov_rad=np.deg2rad(45.0))
        # Ground-plane estimation (parity: multi_mapper.ground_plane_
        # estimator(), fed to ESDF slicing — nvblox_node.cpp:1455-1474).
        self.ground_plane_estimator = GroundPlaneEstimator()
        # Debug outputs (parity: getLastDynamicPointcloud etc.). Stored as
        # DEVICE arrays; the host-facing properties below sync lazily so
        # the per-frame path never pays a device->host readback.
        self._last_dynamic_mask_dev = None
        self._last_depth_dev = None
        self._last_T_L_C = None
        self._last_camera: Optional[Camera] = None

    # -------------------------------------------------------------- helpers
    def background_mapper(self) -> DeviceMapper:
        return self.static_mapper

    def foreground_mapper(self) -> Optional[DeviceMapper]:
        return self.dynamic_mapper

    # ------------------------------------------------------------ integrate
    def integrate_depth(self, depth, T_L_C, camera: Camera,
                        mask: Optional[np.ndarray] = None,
                        mask_camera: Optional[Camera] = None,
                        T_CM_CD=None,
                        time_ms: float = 0.0) -> None:
        """Route a depth frame: unmasked -> static; masked/human modes split
        foreground into the dynamic occupancy mapper; dynamic mode derives
        the mask from high-confidence freespace. A mask from a different
        camera is reprojected via `T_CM_CD` + `mask_camera`."""
        depth_j = jnp.asarray(depth, jnp.float32)
        if self.params.static_mapper.do_depth_preprocessing:
            depth_j = dilate_invalid_depth(
                depth_j,
                self.params.static_mapper.depth_preprocessing_num_dilations)

        if not self.is_dynamic_mode:
            self.static_mapper.integrate_depth(depth_j, T_L_C, camera)
            return

        # The whole dynamic tick stays on device: detection, mask
        # reprojection, the CC filter and the split integrations dispatch
        # without a single device->host readback (each sync costs ~30 ms on
        # tunneled devices; parity target: the reference's 1.7 ms dynamics
        # row runs entirely on-GPU, nvblox_node.cpp:1057-1147).
        if self.uses_freespace and mask is None:
            mask_j = self.detect_dynamic(depth_j, T_L_C, camera)
        elif mask is None:
            mask_j = jnp.zeros(depth_j.shape, jnp.uint8)
        else:
            mask_j = jnp.asarray(mask)
            if mask_camera is not None and T_CM_CD is not None:
                mask_j = reproject_mask(
                    depth_j, mask_j, jnp.asarray(T_CM_CD, jnp.float32),
                    depth_camera=camera, mask_camera=mask_camera)
        if self.params.static_mapper.remove_small_connected_components:
            mask_j = remove_small_connected_components_device(
                mask_j, self.params.static_mapper
                .connected_mask_component_size_threshold)

        self.static_mapper.integrate_depth(depth_j, T_L_C, camera,
                                           mask=mask_j, mask_mode=1)
        if self.dynamic_mapper is not None:
            self.dynamic_mapper.integrate_depth(depth_j, T_L_C, camera,
                                                mask=mask_j, mask_mode=2)
        if self.uses_freespace:
            self.static_mapper.update_freespace(time_ms, T_L_C, camera)
        # Debug outputs stay device-resident; the lazy getters sync only
        # when a subscriber actually asks (publish cadence).
        self._last_dynamic_mask_dev = mask_j
        self._last_depth_dev = depth_j
        self._last_T_L_C = T_L_C
        self._last_camera = camera

    def integrate_depth_with_esdf2d(self, depth, T_L_C, camera: Camera,
                                    min_height_m: float,
                                    max_height_m: float) -> bool:
        """Fused tick: one dispatch for depth integration + the 2D-ESDF
        solve (static TSDF mapping only — the relay's per-dispatch
        turnaround dominates the online tick). Returns False when the
        caller must fall back to integrate_depth() + update_esdf()."""
        if self.is_dynamic_mode or self.dynamic_mapper is not None:
            return False
        depth_j = jnp.asarray(depth, jnp.float32)
        if self.params.static_mapper.do_depth_preprocessing:
            depth_j = dilate_invalid_depth(
                depth_j,
                self.params.static_mapper.depth_preprocessing_num_dilations)
        return self.static_mapper.integrate_depth_with_esdf2d(
            depth_j, T_L_C, camera, min_height_m, max_height_m)

    def integrate_color(self, color, T_L_C, camera: Camera,
                        mask: Optional[np.ndarray] = None,
                        depth=None) -> None:
        if self.static_mapper.projective_layer != ProjectiveLayerType.TSDF:
            return
        if mask is not None:
            color = jnp.where(jnp.asarray(mask)[..., None] > 0, 0,
                              jnp.asarray(color))
        self.static_mapper.integrate_color(color, T_L_C, camera, depth=depth)

    def integrate_pointcloud(self, points, T_L_S,
                             lidar: Optional[Lidar] = None,
                             timestamps_s: Optional[np.ndarray] = None,
                             T_L_S_end=None, time_ms: float = 0.0) -> None:
        """3D LiDAR integration with optional per-point motion compensation
        (nvblox_node.cpp:1339-1384)."""
        self.static_mapper.integrate_pointcloud(
            points, T_L_S, lidar or self.default_lidar,
            timestamps_s=timestamps_s, T_L_S_end=T_L_S_end)

    def replay_frames_dynamic(self, depths, T_L_Cs, times_ms,
                              camera: Camera, region=None,
                              slot_bucket: int = 0) -> None:
        """Replay N frames through the full dynamic pipeline in ONE device
        program (detection -> masked split -> freespace); DYNAMIC mode
        only. The offline/bench analogue of integrate_depth's dynamic
        branch (minus the host-side CC mask filter, which is an optional
        post-process).

        `region=(origin_blocks, dims_blocks)` enables the freespace fast
        path (full-pool update + dense neighborhood dilation) over that
        block region; defaults to the static mapper's tracked AABB when
        known, else the first replay falls back to the batch/halo path."""
        assert self.uses_freespace and self.dynamic_mapper is not None
        sm, dmap = self.static_mapper, self.dynamic_mapper
        if region is None and not sm._region_unknown \
                and sm._aabb_lo is not None:
            # Replay regions are fixed per run: no bucket slack needed,
            # and the freespace dilation cost scales with region volume.
            region = sm.esdf_region(margin_blocks=0, mult=1)
        if region is not None:
            free_origin_b = jnp.asarray(region[0], jnp.int32)
            free_dims_b = tuple(int(d) for d in region[1])
        else:
            free_origin_b, free_dims_b = None, None
        use_pallas = (jax.default_backend() == "tpu"
                      if sm.use_pallas_integrate is None
                      else sm.use_pallas_integrate)
        (sm.state, sm.channels, sm.dirty, sm.esdf_dirty,
         dmap.state, dmap.channels, dmap.dirty, dmap.esdf_dirty,
         last_ms) = _dynamic_replay_scan(
            sm.state, sm.channels, sm.dirty, sm.esdf_dirty,
            dmap.state, dmap.channels, dmap.dirty, dmap.esdf_dirty,
            jnp.asarray(depths, jnp.float32), jnp.asarray(T_L_Cs, jnp.float32),
            jnp.asarray(times_ms, jnp.float32),
            jnp.float32(sm._freespace_last_update_ms), free_origin_b,
            camera=camera, voxel_size_m=sm.voxel_size_m,
            static_params=sm.params.projective,
            occ_params=dmap.params.occupancy,
            free_params=sm.params.freespace,
            max_blocks=sm.max_blocks_per_frame,
            dyn_max_blocks=dmap.max_blocks_per_frame, use_pallas=use_pallas,
            max_depth_m=float(sm.params.projective
                              .max_integration_distance_m),
            detect_subsample=int(self.params.dynamic_detection_subsample),
            free_dims_b=free_dims_b, slot_bucket=int(slot_bucket))
        sm._freespace_last_update_ms = float(np.asarray(last_ms))
        sm._region_unknown = True
        dmap._region_unknown = True
        if slot_bucket:
            # Deferred exactness guard (same contract as bucketed ESDF
            # replays): call sm.check_slot_bucket() after timing.
            prev = getattr(sm, "_slot_bucket_pending", 0)
            sm._slot_bucket_pending = (min(prev, slot_bucket) if prev
                                       else slot_bucket)

    # -------------------------------------------------------------- dynamic
    def detect_dynamic(self, depth, T_L_C, camera: Camera) -> jnp.ndarray:
        """Dynamic-pixel mask from high-confidence freespace.

        Returns a DEVICE uint8 mask (no host sync). On TPU backends the
        gather-free Pallas detector runs (ops/detect_pallas.py); elsewhere
        the exact per-pixel XLA lookup."""
        m = self.static_mapper
        depth_j = jnp.asarray(depth, jnp.float32)
        if "freespace_high_confidence" not in m.channels:
            return jnp.zeros(depth_j.shape, jnp.uint8)
        T_j = jnp.asarray(T_L_C, jnp.float32)
        maxd = float(m.params.projective.max_integration_distance_m)
        use_pallas = (jax.default_backend() == "tpu"
                      if m.use_pallas_integrate is None
                      else m.use_pallas_integrate)
        if use_pallas:
            from isaac_ros_nvblox_tpu.ops.detect_pallas import (
                detect_dynamic_fused_pallas)
            mask = detect_dynamic_fused_pallas(
                m.state, m.channels["freespace_high_confidence"], depth_j,
                T_j, camera=camera, voxel_size_m=m.voxel_size_m,
                max_depth_m=maxd, max_blocks=m.max_blocks_per_frame)
        else:
            mask, _ = _detect_dynamic_fused(
                m.state, m.channels["freespace_high_confidence"], depth_j,
                T_j, camera=camera, voxel_size_m=m.voxel_size_m,
                max_depth_m=maxd,
                subsample=int(self.params.dynamic_detection_subsample))
        return mask.astype(jnp.uint8)

    # Lazy host-facing debug getters (parity: getLastDynamicFrameMask /
    # getLastDynamicPointcloud / mask overlay getters,
    # nvblox_node.cpp:1098-1147) — each syncs only when called.
    @property
    def last_dynamic_mask(self) -> Optional[np.ndarray]:
        if self._last_dynamic_mask_dev is None:
            return None
        return np.asarray(self._last_dynamic_mask_dev)

    @property
    def last_depth_foreground(self) -> Optional[np.ndarray]:
        if self._last_dynamic_mask_dev is None:
            return None
        return np.asarray(jnp.where(self._last_dynamic_mask_dev > 0,
                                    self._last_depth_dev, 0.0))

    @property
    def last_mask_overlay(self) -> Optional[np.ndarray]:
        if self._last_dynamic_mask_dev is None:
            return None
        return np.asarray(mask_overlay(
            jnp.clip(self._last_depth_dev * 50.0, 0, 255),
            self._last_dynamic_mask_dev))

    @property
    def last_dynamic_pointcloud(self) -> Optional[np.ndarray]:
        """Back-projected dynamic-pixel points (layer frame) of the last
        frame — host-side assembly at call time."""
        if self._last_dynamic_mask_dev is None or self._last_T_L_C is None:
            return None
        from isaac_ros_nvblox_tpu.core.types import Transform
        from isaac_ros_nvblox_tpu.ops.backproject import back_project_depth
        pts, valid = back_project_depth(self._last_depth_dev,
                                        camera=self._last_camera)
        pts = Transform.apply(jnp.asarray(self._last_T_L_C, jnp.float32),
                              pts)
        mask_np = (np.asarray(self._last_dynamic_mask_dev) > 0).reshape(-1) \
            & np.asarray(valid).reshape(-1)
        return np.asarray(pts)[mask_np]

    # --------------------------------------------------------------- update
    def update_esdf(self) -> None:
        """ESDF update honoring esdf_mode: 3d solves the full field; 2d
        integrates only the height band (optionally referenced to the
        estimated ground plane) into a planar field
        (mapper_initialization.cpp:197-200, 255-260)."""
        if self.params.esdf_mode == EsdfMode.K2D:
            lo, hi = self.esdf_2d_band()
            self.static_mapper.update_esdf_2d(lo, hi)
            if self.dynamic_mapper is not None:
                self.dynamic_mapper.update_esdf_2d(lo, hi)
        else:
            self.static_mapper.update_esdf()
            if self.dynamic_mapper is not None:
                self.dynamic_mapper.update_esdf()

    def esdf_2d_band(self) -> Tuple[float, float]:
        """The 2D-ESDF integration band: [esdf_2d_min, max] heights, or
        referenced to the ground plane when one is estimated
        (slice_height_above_plane_m / slice_height_thickness_m,
        mapper_initialization.cpp:255-260, nvblox_node.cpp:1455-1474)."""
        sp = self.params.static_mapper.esdf_slice
        plane = self.ground_plane_estimator.last_plane
        if plane is not None:
            lo = plane.c + sp.slice_height_above_plane_m
            return lo, lo + sp.slice_height_thickness_m
        return sp.esdf_slice_min_height, sp.esdf_slice_max_height

    def update_ground_plane(self) -> Optional[Plane]:
        return self.ground_plane_estimator.estimate_device(self.static_mapper)

    def update_mesh(self, max_blocks: int = 2048):
        from isaac_ros_nvblox_tpu.mapper import device_io
        return device_io.update_mesh_layer(self.static_mapper,
                                           max_blocks=max_blocks)

    def decay_static(self) -> None:
        """Static-layer decay (node cadence: decay_tsdf_rate_hz)."""
        if self.static_mapper.projective_layer == ProjectiveLayerType.TSDF:
            if self.uses_freespace:
                self.static_mapper.decay()
        else:
            self.static_mapper.decay()

    def decay_dynamic(self) -> None:
        """Dynamic-occupancy decay (node cadence:
        decay_dynamic_occupancy_rate_hz)."""
        if self.dynamic_mapper is not None:
            self.dynamic_mapper.decay()

    def decay(self) -> None:
        self.decay_static()
        self.decay_dynamic()


# ------------------------------------------------------------------ helpers
def dilate_invalid_depth(depth, num_dilations: int):
    """Invalid-depth dilation (parity: do_depth_preprocessing,
    mapper_initialization.cpp:239-244): grow invalid regions to suppress
    mixed-depth edge artifacts."""
    d = depth
    for _ in range(int(num_dilations)):
        invalid = d <= 0.0
        for axis, shift in ((0, 1), (0, -1), (1, 1), (1, -1)):
            invalid = invalid | (jnp.roll(d, shift, axis) <= 0.0)
        d = jnp.where(invalid, 0.0, d)
    return d
