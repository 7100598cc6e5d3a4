"""NvbloxNode equivalent: the online mapping runtime.

Reference: `NvbloxNode` (nvblox_ros/src/lib/nvblox_node.cpp) — thread-safe
input queues fed by sensor callbacks, a periodic `tick()` that drains queues
(pose-gated), per-stream Hz rate limits, ESDF/mesh update cadences, layer
publishing, and services marshalled onto the tick thread
(SURVEY.md §3.1-3.4 call stacks).

TPU build: same architecture minus ROS — callbacks push into
DropOldestQueues; `tick()` is called by the host loop (or a timer thread);
outputs go to a MessageBus. All device work happens on the tick thread.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, Optional, Tuple

import numpy as np

from isaac_ros_nvblox_tpu.mapper.multi_mapper import MultiMapper
from isaac_ros_nvblox_tpu.mapper.params import MultiMapperParams
from isaac_ros_nvblox_tpu.models.camera import Camera
from isaac_ros_nvblox_tpu.ops.esdf_slicer import (combine_distance_images,
                                                  compute_slice_spec,
                                                  occupancy_grid_from_slice,
                                                  slice_esdf_layer)
from isaac_ros_nvblox_tpu.runtime.msgs import (DistanceMapSlice, Header,
                                               Index3D, MeshBlockMsg, MeshMsg,
                                               MessageBus)
from isaac_ros_nvblox_tpu.runtime.queues import (DropOldestQueue,
                                                 ServiceRequestQueue)
from isaac_ros_nvblox_tpu.runtime.transformer import Transformer
from isaac_ros_nvblox_tpu.utils.timing import Delays, Rates, Timer


@dataclasses.dataclass
class NodeParams:
    """Node-level parameters (parity: node_params.hpp:37-414 subset; names
    kept identical where sensible)."""
    global_frame: str = "odom"
    tick_period_ms: float = 10.0
    integrate_depth_rate_hz: float = 40.0
    integrate_color_rate_hz: float = 5.0
    integrate_lidar_rate_hz: float = 40.0
    update_mesh_rate_hz: float = 5.0
    update_esdf_rate_hz: float = 10.0
    decay_rate_hz: float = 1.0
    maximum_input_queue_length: int = 10
    esdf_2d: bool = True
    esdf_slice_height: float = 0.3
    esdf_2d_min_height: float = 0.1
    esdf_2d_max_height: float = 0.3
    distance_map_unknown_value_optimistic: float = 1000.0
    free_threshold_m: float = 0.2
    map_clearing_radius_m: float = -1.0  # <0 disables
    map_clearing_frame_id: str = "base_link"
    publish_layer_rate_hz: float = 5.0
    # Parity: layer_streamer_bandwidth_limit_mbps (node_params.hpp).
    layer_streamer_bandwidth_limit_mbps: float = 30.0


@dataclasses.dataclass
class _DepthItem:
    depth: np.ndarray
    camera: Camera
    frame_id: str
    stamp_s: float


@dataclasses.dataclass
class _ColorItem:
    color: np.ndarray
    camera: Camera
    frame_id: str
    stamp_s: float


class RateGate:
    """Per-stream Hz limiter (parity: shouldProcess, nvblox_node.cpp:571-580)."""

    def __init__(self):
        self._last: Dict[str, float] = {}

    def should_process(self, name: str, rate_hz: float, now_s: float) -> bool:
        if rate_hz <= 0:
            return False
        last = self._last.get(name)
        if last is not None and (now_s - last) < 1.0 / rate_hz - 1e-9:
            return False
        self._last[name] = now_s
        return True


class NvbloxNode:
    def __init__(self, params: Optional[NodeParams] = None,
                 mapper_params: Optional[MultiMapperParams] = None,
                 bus: Optional[MessageBus] = None,
                 clock=time.monotonic):
        self.params = params or NodeParams()
        self.multi_mapper = MultiMapper(mapper_params or MultiMapperParams())
        self.transformer = Transformer(global_frame=self.params.global_frame)
        self.bus = bus or MessageBus()
        self.clock = clock
        self._gate = RateGate()
        q = self.params.maximum_input_queue_length
        self.depth_queue: DropOldestQueue = DropOldestQueue("depth", q)
        self.color_queue: DropOldestQueue = DropOldestQueue("color", q)
        self.pointcloud_queue: DropOldestQueue = DropOldestQueue("pointcloud", q)
        self.service_queue = ServiceRequestQueue()
        self._published_mesh_blocks: set = set()
        self._mesh_streamer = None  # created lazily (needs voxel size)
        self.tick_count = 0

    # ------------------------------------------------------------- callbacks
    def add_depth_image(self, depth: np.ndarray, camera: Camera,
                        frame_id: str, stamp_s: float) -> None:
        Rates.tick("node/depth_image_callback")
        Delays.record("node/depth_image", self.clock() - stamp_s)
        self.depth_queue.push(_DepthItem(depth, camera, frame_id, stamp_s))

    def add_color_image(self, color: np.ndarray, camera: Camera,
                        frame_id: str, stamp_s: float) -> None:
        Rates.tick("node/color_image_callback")
        self.color_queue.push(_ColorItem(color, camera, frame_id, stamp_s))

    def add_pointcloud(self, points: np.ndarray, frame_id: str,
                       stamp_s: float,
                       timestamps_s: Optional[np.ndarray] = None) -> None:
        Rates.tick("node/pointcloud_callback")
        self.pointcloud_queue.push((points, frame_id, stamp_s, timestamps_s))

    def add_pose(self, frame_id: str, stamp_s: float, T_G_F) -> None:
        self.transformer.add_pose(frame_id, stamp_s, T_G_F)

    # ----------------------------------------------------------------- tick
    def tick(self) -> None:
        """One scheduler tick (parity: NvbloxNode::tick, nvblox_node.cpp:582-678)."""
        now = self.clock()
        with Timer("node/tick"):
            Rates.tick("node/tick")
            self.service_queue.process_all()
            self._process_depth_queue(now)
            self._process_color_queue(now)
            self._process_pointcloud_queue(now)
            if self._gate.should_process(
                    "esdf", self.params.update_esdf_rate_hz, now):
                self._process_esdf()
            if self._gate.should_process(
                    "mesh", self.params.update_mesh_rate_hz, now):
                self._process_mesh()
            if self._gate.should_process(
                    "decay", self.params.decay_rate_hz, now):
                self.multi_mapper.decay()
            if self._gate.should_process(
                    "layers", self.params.publish_layer_rate_hz, now):
                self._publish_voxel_layers()
            if self.params.map_clearing_radius_m > 0:
                self._clear_map_outside_radius(now)
        self.tick_count += 1

    # -------------------------------------------------------------- process
    def _pose_ready(self, item) -> bool:
        frame, stamp = item.frame_id, item.stamp_s
        return self.transformer.can_transform(frame, stamp)

    def _process_depth_queue(self, now: float) -> None:
        items = self.depth_queue.extract_ready(self._pose_ready)
        for item in items:
            if not self._gate.should_process(
                    f"depth/{item.frame_id}",
                    self.params.integrate_depth_rate_hz, now):
                continue
            T = self.transformer.lookup_transform_to_global_frame(
                item.frame_id, item.stamp_s)
            with Timer("node/depth/integrate"):
                self.multi_mapper.integrate_depth(
                    item.depth, T, item.camera,
                    time_ms=item.stamp_s * 1e3)
            Rates.tick("node/depth")

    def _process_color_queue(self, now: float) -> None:
        items = self.color_queue.extract_ready(self._pose_ready)
        for item in items:
            if not self._gate.should_process(
                    f"color/{item.frame_id}",
                    self.params.integrate_color_rate_hz, now):
                continue
            T = self.transformer.lookup_transform_to_global_frame(
                item.frame_id, item.stamp_s)
            with Timer("node/color/integrate"):
                self.multi_mapper.integrate_color(item.color, T, item.camera)
            Rates.tick("node/color")

    def _process_pointcloud_queue(self, now: float) -> None:
        items = self.pointcloud_queue.extract_ready(
            lambda it: self.transformer.can_transform(it[1], it[2]))
        for points, frame_id, stamp_s, timestamps in items:
            if not self._gate.should_process(
                    f"lidar/{frame_id}",
                    self.params.integrate_lidar_rate_hz, now):
                continue
            T = self.transformer.lookup_transform_to_global_frame(
                frame_id, stamp_s)
            with Timer("node/lidar/integrate"):
                self.multi_mapper.integrate_pointcloud(
                    points, T, timestamps_s=timestamps,
                    time_ms=stamp_s * 1e3)
            Rates.tick("node/lidar")

    def _process_esdf(self) -> None:
        with Timer("node/esdf/update"):
            self.multi_mapper.update_esdf()
        Rates.tick("node/esdf")
        if not self.params.esdf_2d:
            return
        if self.bus.num_subscribers("~/static_map_slice") == 0 \
                and self.bus.num_subscribers("~/combined_map_slice") == 0:
            return
        with Timer("node/esdf/slice"):
            self._publish_slices()

    def _publish_slices(self) -> None:
        p = self.params
        static_mapper = self.multi_mapper.static_mapper
        unknown = p.distance_map_unknown_value_optimistic
        res = slice_esdf_layer(
            static_mapper.pool, static_mapper.table,
            voxel_size_m=static_mapper.voxel_size_m,
            slice_height_m=p.esdf_slice_height,
            max_distance_m=static_mapper.params.esdf.max_esdf_distance_m,
            unknown_value=unknown)
        if res is None:
            return
        spec, img = res
        slices = [img]
        dyn = self.multi_mapper.dynamic_mapper
        if dyn is not None and dyn.table.num_allocated > 0:
            dres = slice_esdf_layer(
                dyn.pool, dyn.table, voxel_size_m=dyn.voxel_size_m,
                slice_height_m=p.esdf_slice_height,
                max_distance_m=dyn.params.esdf.max_esdf_distance_m,
                unknown_value=unknown, spec=spec)
            if dres is not None:
                slices.append(dres[1])
        header = Header(stamp_s=self.clock(), frame_id=p.global_frame)
        msg = DistanceMapSlice(
            header=header, origin_x_m=spec.origin_x_m,
            origin_y_m=spec.origin_y_m, resolution_m=spec.voxel_size_m,
            width=spec.width, height=spec.height, unknown_value=unknown,
            data=img)
        self.bus.publish("~/static_map_slice", msg)
        if len(slices) > 1:
            combined = combine_distance_images(slices, unknown)
            self.bus.publish("~/combined_map_slice", dataclasses.replace(
                msg, data=combined))
        if self.bus.num_subscribers("~/map_slice_occupancy_grid"):
            grid = occupancy_grid_from_slice(
                combine_distance_images(slices, unknown),
                p.free_threshold_m, unknown)
            self.bus.publish("~/map_slice_occupancy_grid", (spec, grid))

    def _process_mesh(self) -> None:
        static_mapper = self.multi_mapper.static_mapper
        if self.bus.num_subscribers("~/mesh") == 0:
            return
        with Timer("node/mesh/update"):
            static_mapper.update_mesh()
        Rates.tick("node/mesh")
        mesh_layer = static_mapper.mesh_layer
        current = set(mesh_layer.blocks.keys())
        # Budgeted incremental publishing (parity: serializeSelectedLayers'
        # bandwidth limit + proximity prioritization): never-yet-published
        # blocks queue through the streamer; removals always go out.
        if self._mesh_streamer is None:
            from isaac_ros_nvblox_tpu.runtime.layer_streaming import (
                LayerStreamer, StreamingParams)
            self._mesh_streamer = LayerStreamer(
                block_size_m=static_mapper.voxel_size_m * 8,
                params=StreamingParams(
                    bandwidth_mbps=self.params
                    .layer_streamer_bandwidth_limit_mbps),
                clock=self.clock)
        never_published = current - self._published_mesh_blocks
        remeshed = set(getattr(static_mapper, "last_meshed_keys", []))
        self._mesh_streamer.mark_dirty(never_published | (remeshed & current))
        selected = self._mesh_streamer.select_blocks()
        blocks = [MeshBlockMsg(index=Index3D(*key),
                               vertices=mesh_layer.blocks[key].vertices,
                               colors=mesh_layer.blocks[key].colors,
                               triangles=mesh_layer.blocks[key].triangles)
                  for key in selected if key in mesh_layer.blocks]
        removed = [Index3D(*k) for k in self._published_mesh_blocks - current]
        self._published_mesh_blocks |= set(selected)
        self._published_mesh_blocks &= current
        msg = MeshMsg(
            header=Header(stamp_s=self.clock(),
                          frame_id=self.params.global_frame),
            block_size_m=static_mapper.voxel_size_m * 8,
            blocks=blocks, removed_blocks=removed)
        self.bus.publish("~/mesh", msg)

    def _publish_voxel_layers(self) -> None:
        """Incremental voxel-layer streaming (parity: LayerPublisher
        serializeAndpublishSubscribedLayers, layer_publishing.cpp:675-826).

        Publishes `VoxelBlockLayerMsg`s for subscribed layers; serialization
        is skipped entirely when nobody subscribes (the reference's
        subscriber-bitmask gate)."""
        import numpy as np
        from isaac_ros_nvblox_tpu.core.types import voxel_centers_for_blocks
        import jax.numpy as jnp
        from isaac_ros_nvblox_tpu.runtime.msgs import (VoxelBlockLayerMsg,
                                                       VoxelBlockMsg)
        m = self.multi_mapper.static_mapper
        layer_channels = {
            "~/tsdf_layer": ("tsdf_distance", "tsdf_weight"),
            "~/color_layer": ("color_rgb", "color_weight"),
            "~/occupancy_layer": ("occupancy_log_odds", None),
            "~/esdf_layer": ("esdf_sq_dist", None),
            "~/freespace_layer": ("freespace_high_confidence", None),
        }
        for topic, (channel, weight_ch) in layer_channels.items():
            if self.bus.num_subscribers(topic) == 0:
                continue
            if channel not in m.pool.channels:
                continue
            slots = m.table.allocated_slots()
            if slots.size == 0:
                continue
            bidx = m.table.block_indices[slots]
            centers = np.asarray(voxel_centers_for_blocks(
                jnp.asarray(bidx), m.voxel_size_m))
            values = np.asarray(m.pool[channel])[slots]
            occupied = (np.asarray(m.pool[weight_ch])[slots] > 1e-4
                        if weight_ch and weight_ch in m.pool.channels
                        else np.ones(values.shape[:2], bool))
            blocks = []
            for i in range(slots.size):
                mask = occupied[i]
                if not mask.any():
                    continue
                blocks.append(VoxelBlockMsg(
                    index=Index3D(*bidx[i]),
                    centers=centers[i][mask].astype(np.float32),
                    values=values[i][mask]))
            self.bus.publish(topic, VoxelBlockLayerMsg(
                header=Header(stamp_s=self.clock(),
                              frame_id=self.params.global_frame),
                layer_name=channel, block_size_m=m.voxel_size_m * 8,
                voxel_size_m=m.voxel_size_m, blocks=blocks,
                removed_blocks=[]))

    def shutdown(self, output_dir=None) -> None:
        """Shutdown hook: export the 2D occupancy map (parity: the map-saving
        shutdown hook, nvblox_node.cpp:129-169)."""
        if output_dir is None:
            return
        from isaac_ros_nvblox_tpu.io.occupancy_grid_io import \
            save_occupancy_grid
        from isaac_ros_nvblox_tpu.ops.esdf_slicer import (
            occupancy_grid_from_slice, slice_esdf_layer)
        m = self.multi_mapper.static_mapper
        m.update_esdf()
        res = slice_esdf_layer(
            m.pool, m.table, voxel_size_m=m.voxel_size_m,
            slice_height_m=self.params.esdf_slice_height,
            max_distance_m=m.params.esdf.max_esdf_distance_m)
        if res is None:
            return
        spec, img = res
        grid = occupancy_grid_from_slice(img, self.params.free_threshold_m)
        save_occupancy_grid(output_dir, "map", grid, spec.voxel_size_m,
                            spec.origin_x_m, spec.origin_y_m)

    def _clear_map_outside_radius(self, now: float) -> None:
        if not self._gate.should_process("map_clearing", 1.0, now):
            return
        T = self.transformer.lookup_transform_to_global_frame(
            self.params.map_clearing_frame_id, now)
        if T is not None:
            self.multi_mapper.static_mapper.clear_outside_radius(
                T[:3, 3], self.params.map_clearing_radius_m)

    # -------------------------------------------------------------- services
    def save_map(self, path) -> bool:
        """Parity: save_map service (nvblox_node.cpp:1654-1686)."""
        from isaac_ros_nvblox_tpu.io.serialization import save_map
        fut = self.service_queue.submit(
            lambda: save_map(self.multi_mapper.static_mapper, path))
        self.tick()
        fut.result()
        return True

    def load_map(self, path) -> bool:
        from isaac_ros_nvblox_tpu.io.serialization import load_map
        fut = self.service_queue.submit(
            lambda: load_map(self.multi_mapper.static_mapper, path))
        self.tick()
        fut.result()
        return True

    def save_ply(self, directory) -> bool:
        """Parity: save_ply service (nvblox_node.cpp:1598-1652)."""
        from pathlib import Path
        from isaac_ros_nvblox_tpu.io.ply import (write_mesh_ply,
                                                 write_voxel_layer_ply)

        def work():
            d = Path(directory)
            m = self.multi_mapper.static_mapper
            m.update_mesh(update_full_layer=True)
            v, c, t = m.mesh_layer.as_arrays()
            write_mesh_ply(d / "mesh.ply", v, t, c)
            write_voxel_layer_ply(d / "tsdf.ply", m, "tsdf")
            if "esdf_site" in m.pool.channels:
                write_voxel_layer_ply(d / "esdf.ply", m, "esdf")
            return True

        fut = self.service_queue.submit(work)
        self.tick()
        return bool(fut.result())

    def save_timings(self, path) -> bool:
        """Parity: save_timings service (nvblox_node.cpp:1724-1748)."""
        from isaac_ros_nvblox_tpu.utils.timing import Timing
        with open(path, "w") as f:
            f.write(Timing.to_string() + "\n")
        return True

    def save_rates(self, path) -> bool:
        with open(path, "w") as f:
            f.write(Rates.to_string() + "\n")
        return True

    def get_esdf_and_gradients(self, aabb_min_m, aabb_max_m,
                               update_esdf: bool = True,
                               clear_spheres=(), clear_aabbs=()):
        """Parity: EsdfAndGradients service (nvblox_node.cpp:1776-1876)."""
        from isaac_ros_nvblox_tpu.ops.dense_grid import esdf_and_gradients

        def work():
            m = self.multi_mapper.static_mapper
            if clear_spheres or clear_aabbs:
                m.clear_tsdf_inside_shapes(spheres=clear_spheres,
                                           aabbs=clear_aabbs)
            if update_esdf:
                m.update_esdf()
            return esdf_and_gradients(m, aabb_min_m, aabb_max_m)

        fut = self.service_queue.submit(work)
        self.tick()
        return fut.result()
