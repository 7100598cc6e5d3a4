"""Mapper: owns one map's layers + integrators.

Reference: nvblox `Mapper` (nvblox/mapper/mapper.h, reconstructed surface in
SURVEY.md §2.1 "Mapper") — owns TSDF/color/occupancy/ESDF/freespace/mesh
layers over a shared block set and exposes `integrateDepth`,
`integrateColor`, `updateEsdf`, `updateColorMesh`, decay, and clearing ops.

TPU design: all voxel layers share one BlockTable + BlockPool (they are
co-allocated per view, as in the reference); each `integrate*` call is
  view-calc (device) -> allocate (host dict) -> fused jit kernel (device)
with slot batches padded to power-of-two buckets. Mesh extraction tracks
dirty blocks (touched by depth integration + their -x/-y/-z neighbors whose
marching-cubes halo overlaps them).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Set, Tuple

import jax.numpy as jnp
import numpy as np

from isaac_ros_nvblox_tpu.core.block_pool import (NEIGHBOR_OFFSETS, BlockPool,
                                                  BlockTable, pad_to_bucket)
from isaac_ros_nvblox_tpu.core.types import block_size_m
from isaac_ros_nvblox_tpu.mapper.params import (MapperParams,
                                                ProjectiveLayerType)
from isaac_ros_nvblox_tpu.models.camera import Camera
from isaac_ros_nvblox_tpu.ops import esdf as esdf_ops
from isaac_ros_nvblox_tpu.ops import view as view_ops
from isaac_ros_nvblox_tpu.ops.color import integrate_color as color_kernel
from isaac_ros_nvblox_tpu.ops.decay import (deallocate_fully_decayed_blocks,
                                            decay_occupancy, decay_tsdf)
from isaac_ros_nvblox_tpu.ops.freespace import update_freespace
from isaac_ros_nvblox_tpu.ops.mesh import MeshLayer, mesh_dirty_blocks
from isaac_ros_nvblox_tpu.ops.occupancy import integrate_occupancy
from isaac_ros_nvblox_tpu.ops.tsdf import integrate_tsdf
from isaac_ros_nvblox_tpu.utils.timing import Timer


def _padded_batch(table: BlockTable, slots: np.ndarray, indices: np.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pad (slots, block_indices) to a bucket; padding slots = capacity
    (dropped by scatters)."""
    n_pad = pad_to_bucket(len(slots))
    slots_p = np.full((n_pad,), table.capacity, np.int32)
    slots_p[:len(slots)] = slots
    idx_p = np.zeros((n_pad, 3), np.int32)
    idx_p[:len(slots)] = indices
    return jnp.asarray(slots_p), jnp.asarray(idx_p)


class Mapper:
    """One map: shared block pool + all integrators.

    `enable_*` flags control which channels are materialized (the dynamic
    foreground mapper needs occupancy only; the static TSDF mapper needs
    tsdf/color/esdf/freespace).
    """

    def __init__(self, voxel_size_m: float,
                 params: Optional[MapperParams] = None,
                 projective_layer: ProjectiveLayerType = ProjectiveLayerType.TSDF,
                 capacity: int = 16384,
                 enable_color: bool = True,
                 enable_esdf: bool = True,
                 enable_freespace: bool = False,
                 name: str = "mapper"):
        self.name = name
        self.voxel_size_m = float(voxel_size_m)
        self.params = params or MapperParams()
        self.projective_layer = projective_layer
        self.table = BlockTable(capacity)

        specs: Dict[str, Tuple[Tuple[int, ...], jnp.dtype]] = {}
        init: Dict[str, float] = {}
        if projective_layer == ProjectiveLayerType.TSDF:
            specs["tsdf_distance"] = ((), jnp.float32)
            specs["tsdf_weight"] = ((), jnp.float32)
        else:
            specs["occupancy_log_odds"] = ((), jnp.float32)
            specs["occupancy_observed"] = ((), jnp.uint8)
        if enable_color:
            specs["color_rgb"] = ((3,), jnp.float32)
            specs["color_weight"] = ((), jnp.float32)
        if enable_esdf:
            specs["esdf_site"] = ((3,), jnp.float32)
            specs["esdf_sq_dist"] = ((), jnp.float32)
            init["esdf_sq_dist"] = float(esdf_ops.INF_SQ)
            specs["esdf_is_site"] = ((), jnp.bool_)
            specs["esdf_is_inside"] = ((), jnp.bool_)
            specs["esdf_observed"] = ((), jnp.bool_)
        if enable_freespace:
            specs["freespace_consecutive_ms"] = ((), jnp.float32)
            specs["freespace_last_occupied_ms"] = ((), jnp.float32)
            init["freespace_last_occupied_ms"] = -1e9
            specs["freespace_high_confidence"] = ((), jnp.bool_)

        self.pool = BlockPool(self.table, specs, init)
        self.mesh_layer = MeshLayer(self.voxel_size_m, self.params.mesh)
        self.last_meshed_keys: list = []
        self._mesh_dirty: Set[int] = set()       # slots
        self._cleared_blocks: list = []           # indices removed since last mesh
        self._last_freespace_update_ms: float = 0.0
        self.last_depth_T_L_C: Optional[np.ndarray] = None
        self.last_depth_camera: Optional[Camera] = None

    # ------------------------------------------------------------ allocation
    def _allocate_view(self, depth, T_L_C, camera: Camera,
                       max_distance_m: float, truncation_m: float
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, np.ndarray]:
        idx = view_ops.blocks_in_view(
            depth, T_L_C, camera=camera, voxel_size_m=self.voxel_size_m,
            max_distance_m=max_distance_m, truncation_m=truncation_m,
            params=self.params.view)
        self.pool.ensure_capacity(needed_free=len(idx))
        slots, fresh = self.table.allocate(idx)
        if fresh.any():
            self.pool.reset_slots(slots[fresh])
        slots_d, idx_d = _padded_batch(self.table, slots, idx)
        return slots_d, idx_d, slots

    # ------------------------------------------------------------- integrate
    def integrate_depth(self, depth, T_L_C, camera: Camera) -> int:
        """Fuse a depth frame into the projective layer. Returns #blocks."""
        p = self.params.projective
        depth = jnp.asarray(depth, jnp.float32)
        T_L_C = jnp.asarray(T_L_C, jnp.float32)
        with Timer(f"{self.name}/integrate_depth/allocate"):
            slots_d, idx_d, slots = self._allocate_view(
                depth, T_L_C, camera, p.max_integration_distance_m,
                p.truncation_m(self.voxel_size_m))
        with Timer(f"{self.name}/integrate_depth/kernel"):
            if self.projective_layer == ProjectiveLayerType.TSDF:
                d, w = integrate_tsdf(
                    self.pool["tsdf_distance"], self.pool["tsdf_weight"],
                    slots_d, idx_d, depth, T_L_C, camera=camera,
                    voxel_size_m=self.voxel_size_m, params=p)
                self.pool["tsdf_distance"] = d
                self.pool["tsdf_weight"] = w
            else:
                lo, ob = integrate_occupancy(
                    self.pool["occupancy_log_odds"],
                    self.pool["occupancy_observed"],
                    slots_d, idx_d, depth, T_L_C, camera=camera,
                    voxel_size_m=self.voxel_size_m, params=self.params.occupancy)
                self.pool["occupancy_log_odds"] = lo
                self.pool["occupancy_observed"] = ob
        self._mark_mesh_dirty(slots)
        self.last_depth_T_L_C = np.asarray(T_L_C)
        self.last_depth_camera = camera
        return int(len(slots))

    def integrate_color(self, color_image, T_L_C, camera: Camera,
                        depth: Optional[jnp.ndarray] = None) -> int:
        """Fuse a color frame onto the surface voxels. Returns #blocks."""
        if "color_rgb" not in self.pool.channels:
            return 0
        assert self.projective_layer == ProjectiveLayerType.TSDF, \
            "color integration requires a TSDF layer"
        p = self.params.projective
        T_L_C = jnp.asarray(T_L_C, jnp.float32)
        color_image = jnp.asarray(color_image)
        if depth is None:
            depth = jnp.zeros((1, 1), jnp.float32)  # disables occlusion check
        else:
            depth = jnp.asarray(depth, jnp.float32)
        # Color only touches existing surface blocks inside the color
        # camera's frustum (no new allocation): run the view test and keep
        # the already-allocated subset.
        if depth.shape[0] > 1:
            view_depth = depth
        else:
            view_depth = jnp.full((camera.height, camera.width),
                                  p.max_integration_distance_m, jnp.float32)
        idx_view = view_ops.blocks_in_view(
            view_depth, T_L_C, camera=camera, voxel_size_m=self.voxel_size_m,
            max_distance_m=p.max_integration_distance_m,
            truncation_m=p.truncation_m(self.voxel_size_m),
            params=self.params.view)
        slots_np = np.asarray(
            [self.table.slot_of(tuple(b)) for b in idx_view.tolist()],
            np.int32)
        keep = slots_np >= 0
        slots_np = slots_np[keep]
        if slots_np.size == 0:
            return 0
        idx_np = idx_view[keep]
        slots_d, idx_d = _padded_batch(self.table, slots_np, idx_np)
        with Timer(f"{self.name}/integrate_color/kernel"):
            c, w = color_kernel(
                self.pool["color_rgb"], self.pool["color_weight"],
                self.pool["tsdf_distance"], self.pool["tsdf_weight"],
                slots_d, idx_d, color_image, depth, T_L_C, camera=camera,
                voxel_size_m=self.voxel_size_m, params=p)
            self.pool["color_rgb"] = c
            self.pool["color_weight"] = w
        self._mark_mesh_dirty(slots_np)
        return int(slots_np.size)

    def update_freespace(self, time_ms: float, T_L_C=None,
                         camera: Optional[Camera] = None) -> None:
        """Update the freespace layer from the current TSDF + last view."""
        if "freespace_consecutive_ms" not in self.pool.channels:
            return
        T_L_C = T_L_C if T_L_C is not None else self.last_depth_T_L_C
        camera = camera or self.last_depth_camera
        if T_L_C is None or camera is None:
            return
        slots_np = self.table.allocated_slots()
        if slots_np.size == 0:
            return
        idx_np = self.table.block_indices[slots_np]
        slots_d, idx_d = _padded_batch(self.table, slots_np, idx_np)
        cons, last_occ, hc = update_freespace(
            self.pool["freespace_consecutive_ms"],
            self.pool["freespace_last_occupied_ms"],
            self.pool["freespace_high_confidence"],
            self.pool["tsdf_distance"], self.pool["tsdf_weight"],
            slots_d, idx_d, jnp.asarray(T_L_C, jnp.float32),
            jnp.float32(time_ms), jnp.float32(self._last_freespace_update_ms),
            camera=camera, voxel_size_m=self.voxel_size_m,
            params=self.params.freespace)
        self.pool["freespace_consecutive_ms"] = cons
        self.pool["freespace_last_occupied_ms"] = last_occ
        self.pool["freespace_high_confidence"] = hc
        self._last_freespace_update_ms = time_ms

    # ----------------------------------------------------------------- esdf
    def update_esdf(self) -> int:
        """Recompute the ESDF from the projective layer. Returns #sweeps."""
        if "esdf_site" not in self.pool.channels:
            return 0
        sites_from = ("tsdf" if self.projective_layer == ProjectiveLayerType.TSDF
                      else "occupancy")
        with Timer(f"{self.name}/update_esdf"):
            return esdf_ops.update_esdf(
                self.pool, self.table, voxel_size_m=self.voxel_size_m,
                params=self.params.esdf, sites_from=sites_from)

    # ----------------------------------------------------------------- mesh
    def _mark_mesh_dirty(self, slots: np.ndarray) -> None:
        self._mesh_dirty.update(int(s) for s in slots)

    def update_mesh(self, update_full_layer: bool = False) -> int:
        """Marching cubes over dirty blocks (parity: updateColorMesh).

        Returns number of blocks re-meshed."""
        if self.projective_layer != ProjectiveLayerType.TSDF:
            return 0
        if update_full_layer:
            dirty = set(int(s) for s in self.table.allocated_slots())
        else:
            dirty = self._mesh_dirty
            # A block's mesh reads the +1 halo, so blocks whose halo overlaps
            # a dirty block (its -1-side neighbors) are dirty too.
            expanded = set(dirty)
            for s in dirty:
                for n, (dx, dy, dz) in enumerate(NEIGHBOR_OFFSETS.tolist()):
                    if dx <= 0 and dy <= 0 and dz <= 0:
                        ns = int(self.table.neighbors[s, n])
                        if ns >= 0:
                            expanded.add(ns)
            dirty = expanded
        dirty &= set(int(s) for s in self.table.allocated_slots())
        if self._cleared_blocks:
            self.mesh_layer.remove_blocks(self._cleared_blocks)
            self._cleared_blocks = []
        if not dirty:
            self.last_meshed_keys = []
            return 0
        with Timer(f"{self.name}/update_mesh"):
            mesh_dirty_blocks(self.mesh_layer, self.pool, self.table,
                              np.asarray(sorted(dirty), np.int32))
        self.last_meshed_keys = [
            tuple(k) for k in
            self.table.block_indices[np.asarray(sorted(dirty))].tolist()]
        self._mesh_dirty.clear()
        return len(dirty)

    # ---------------------------------------------------------------- decay
    def decay_tsdf(self) -> int:
        """Decay TSDF weights; deallocates fully-decayed blocks."""
        if self.projective_layer != ProjectiveLayerType.TSDF:
            return 0
        T = (jnp.asarray(self.last_depth_T_L_C) if self.last_depth_T_L_C
             is not None else jnp.eye(4, dtype=jnp.float32))
        d, w, block_max = decay_tsdf(
            self.pool["tsdf_distance"], self.pool["tsdf_weight"],
            jnp.asarray(self.table.block_indices), T,
            params=self.params.tsdf_decay, voxel_size_m=self.voxel_size_m,
            camera=self.last_depth_camera)
        self.pool["tsdf_distance"] = d
        self.pool["tsdf_weight"] = w
        n = deallocate_fully_decayed_blocks(
            self.pool, self.table, np.asarray(block_max),
            self.params.tsdf_decay.decayed_weight_threshold)
        if n:
            self._note_deallocations()
        return n

    def decay_occupancy(self) -> int:
        if "occupancy_log_odds" not in self.pool.channels:
            return 0
        lo, block_max = decay_occupancy(
            self.pool["occupancy_log_odds"], params=self.params.occupancy_decay)
        self.pool["occupancy_log_odds"] = lo
        n = deallocate_fully_decayed_blocks(
            self.pool, self.table, np.asarray(block_max), threshold=1e-3)
        if n:
            self._note_deallocations()
        return n

    def _note_deallocations(self) -> None:
        # Blocks may have vanished; remember for mesh-layer cleanup.
        live = set(map(tuple, self.table.allocated_block_indices().tolist()))
        gone = [k for k in self.mesh_layer.blocks if k not in live]
        self._cleared_blocks.extend(gone)

    # ------------------------------------------------------------- clearing
    def clear_outside_radius(self, center_m, radius_m: float) -> int:
        """Deallocate blocks fully outside a sphere
        (parity: clearOutsideRadius, nvblox_node.cpp:1566-1583)."""
        idx = self.table.allocated_block_indices()
        if idx.size == 0:
            return 0
        bs = block_size_m(self.voxel_size_m)
        centers = (idx.astype(np.float64) + 0.5) * bs
        dist = np.linalg.norm(centers - np.asarray(center_m), axis=1)
        # Keep blocks whose nearest corner could be inside the radius.
        margin = bs * np.sqrt(3) / 2
        gone = idx[dist - margin > radius_m]
        if gone.size == 0:
            return 0
        keys = [tuple(k) for k in gone.tolist()]
        slots = np.asarray([self.table.slot_of(k) for k in keys], np.int32)
        self.table.free(keys)
        self.pool.reset_slots(slots)
        self._cleared_blocks.extend(keys)
        return len(keys)

    def clear_tsdf_inside_shapes(self, spheres=(), aabbs=()) -> None:
        """Set TSDF to free space inside given shapes
        (parity: clearTsdfInsideShapes, nvblox_node.cpp:1834)."""
        from isaac_ros_nvblox_tpu.core.types import voxel_centers_for_blocks
        slots_np = self.table.allocated_slots()
        if slots_np.size == 0:
            return
        idx_np = self.table.block_indices[slots_np]
        centers = voxel_centers_for_blocks(jnp.asarray(idx_np),
                                           self.voxel_size_m)
        inside = jnp.zeros(centers.shape[:2], jnp.bool_)
        for c, r in spheres:
            d = jnp.linalg.norm(centers - jnp.asarray(c, jnp.float32), axis=-1)
            inside = inside | (d <= r)
        for lo, hi in aabbs:
            lo_a = jnp.asarray(lo, jnp.float32)
            hi_a = jnp.asarray(hi, jnp.float32)
            inside = inside | jnp.all((centers >= lo_a) & (centers <= hi_a),
                                      axis=-1)
        trunc = self.params.projective.truncation_m(self.voxel_size_m)
        s = jnp.asarray(slots_np)
        d_old = self.pool["tsdf_distance"][s]
        w_old = self.pool["tsdf_weight"][s]
        self.pool["tsdf_distance"] = self.pool["tsdf_distance"].at[s].set(
            jnp.where(inside, trunc, d_old))
        self.pool["tsdf_weight"] = self.pool["tsdf_weight"].at[s].set(
            jnp.where(inside, 1.0, w_old))
        self._mark_mesh_dirty(slots_np)
