"""Online node pipeline test (the launch-test analogue: feed frames, assert
outputs arrive — SURVEY.md §4 integration-test tier)."""

import numpy as np
import jax.numpy as jnp

from isaac_ros_nvblox_tpu.mapper.params import make_params
from isaac_ros_nvblox_tpu.models.camera import Camera
from isaac_ros_nvblox_tpu.models.scene import (Scene, Sphere, orbit_pose,
                                               render_color, render_depth)
from isaac_ros_nvblox_tpu.runtime.adapters import MeshLayerAdapter
from isaac_ros_nvblox_tpu.runtime.costmap import NvbloxCostmapLayer
from isaac_ros_nvblox_tpu.runtime.node import NodeParams, NvbloxNode

CAM = Camera(fx=120.0, fy=120.0, cx=59.5, cy=44.5, width=120, height=90)


def _make_node():
    node = NvbloxNode(NodeParams(),
                      make_params(overlay={"block_capacity": 8192}))
    t = [0.0]
    node.clock = lambda: t[0]
    return node, t


def test_full_pipeline_publishes_everything(tmp_path):
    node, t = _make_node()
    got = {"mesh": 0, "slice": 0, "tsdf_layer": 0}
    node.bus.subscribe("~/mesh", lambda m: got.__setitem__(
        "mesh", got["mesh"] + 1))
    node.bus.subscribe("~/static_map_slice", lambda m: got.__setitem__(
        "slice", got["slice"] + 1))
    node.bus.subscribe("~/tsdf_layer", lambda m: got.__setitem__(
        "tsdf_layer", got["tsdf_layer"] + 1))
    adapter_out = []
    MeshLayerAdapter(node.bus)
    node.bus.subscribe("~/mesh_serialized", adapter_out.append)
    costmap = NvbloxCostmapLayer(node.bus)

    # A small sphere keeps the block count (and CPU ESDF cost) low.
    scene = Scene(primitives=(Sphere(center=(0.0, 0.0, 1.0), radius=0.5),))
    for k in range(3):
        stamp = k * 0.2
        T = orbit_pose(2 * np.pi * k / 12)
        depth = np.asarray(render_depth(scene, CAM, jnp.asarray(T)))
        color = np.asarray(render_color(scene, CAM, jnp.asarray(T)))
        node.add_pose("cam", stamp, T)
        node.add_depth_image(depth, CAM, "cam", stamp)
        node.add_color_image(color, CAM, "cam", stamp)
        t[0] = stamp + 0.01
        node.tick()
        t[0] = stamp + 0.11
        node.tick()

    assert got["mesh"] >= 1
    assert got["slice"] >= 1
    assert got["tsdf_layer"] >= 1
    # Adapter flattened the incremental mesh.
    assert adapter_out and adapter_out[-1].triangles.shape[0] > 100
    # Costmap layer consumed the slice and answers queries.
    assert costmap.has_data

    # Shutdown hook writes the Nav2 occupancy map.
    node.shutdown(tmp_path)
    assert (tmp_path / "map.png").exists()
    assert (tmp_path / "map.yaml").exists()


def test_rate_gates_limit_processing():
    node, t = _make_node()
    node.params.integrate_depth_rate_hz = 1.0  # only 1 Hz allowed
    scene = Scene(primitives=(Sphere(center=(0.0, 0.0, 1.0), radius=0.5),))
    T = orbit_pose(0.0)
    depth = np.asarray(render_depth(scene, CAM, jnp.asarray(T)))
    processed_blocks = []
    for k in range(5):
        stamp = k * 0.01  # 100 Hz input
        node.add_pose("cam", stamp, T)
        node.add_depth_image(depth, CAM, "cam", stamp)
        t[0] = stamp
        node.tick()
        processed_blocks.append(
            node.multi_mapper.static_mapper.block_count())
    # Only the first frame within the 1 Hz window integrates.
    from isaac_ros_nvblox_tpu.utils.timing import Rates
    assert processed_blocks[-1] == processed_blocks[0]


def test_multi_camera_and_lidar_inputs():
    """Two cameras with different intrinsics plus a lidar scan feed one map
    (reference parity: multi-camera NITROS subs + pointcloud sub)."""
    node, t = _make_node()
    node.params.num_cameras = 2  # parity default is 1 (node_params.hpp:74)
    cam2 = Camera(fx=90.0, fy=90.0, cx=44.5, cy=34.5, width=90, height=70)
    scene = Scene(primitives=(Sphere(center=(0.0, 0.0, 1.0), radius=0.5),))
    T = orbit_pose(0.0)
    T2 = orbit_pose(np.pi / 2)
    d1 = np.asarray(render_depth(scene, CAM, jnp.asarray(T)))
    d2 = np.asarray(render_depth(scene, cam2, jnp.asarray(T2)))
    node.add_pose("cam_a", 0.0, T)
    node.add_pose("cam_b", 0.0, T2)
    node.add_depth_image(d1, CAM, "cam_a", 0.0)
    node.add_depth_image(d2, cam2, "cam_b", 0.0)
    t[0] = 0.01
    node.tick()
    n_after_cams = node.multi_mapper.static_mapper.block_count()
    assert n_after_cams > 0

    # Lidar scan: ring of points at 2 m.
    az = np.linspace(-np.pi, np.pi, 512, endpoint=False)
    pts = np.stack([2.0 * np.cos(az), 2.0 * np.sin(az),
                    np.zeros_like(az)], 1).astype(np.float32)
    T_l = np.eye(4, dtype=np.float32)
    T_l[2, 3] = 1.0
    node.add_pose("lidar", 0.05, T_l)
    node.add_pointcloud(pts, "lidar", 0.05)
    t[0] = 0.06
    node.tick()
    assert node.multi_mapper.static_mapper.block_count() > n_after_cams


def test_mesh_streaming_respects_budget():
    """With a tiny bandwidth limit, mesh messages carry few blocks per
    publish and the backlog drains over successive publishes."""
    node, t = _make_node()
    node.params.layer_streamer_bandwidth_limit_mbps = 1.0  # ~1 block/0.13s
    msgs = []
    node.bus.subscribe("~/mesh", msgs.append)
    scene = Scene(primitives=(Sphere(center=(0.0, 0.0, 1.0), radius=0.5),))
    T = orbit_pose(0.0)
    depth = np.asarray(render_depth(scene, CAM, jnp.asarray(T)))
    node.add_pose("cam", 0.0, T)
    node.add_depth_image(depth, CAM, "cam", 0.0)
    t[0] = 0.01
    node.tick()
    t[0] = 0.3
    node.tick()  # first mesh publish (budget-limited)
    assert msgs
    first_blocks = len(msgs[-1].blocks)
    total_mesh_blocks = len(
        node.multi_mapper.static_mapper.mesh_layer.blocks)
    assert 0 < first_blocks < total_mesh_blocks  # budget clipped the set
    # Subsequent publishes drain the backlog.
    for k in range(30):
        t[0] = 0.3 + 0.2 * (k + 1)
        node.tick()
    published = set()
    for m in msgs:
        published |= {(b.index.x, b.index.y, b.index.z) for b in m.blocks}
    assert len(published) == total_mesh_blocks


def test_late_subscriber_gets_full_mesh_resend():
    """A subscriber joining after blocks were published must receive the
    whole current mesh (per-subscriber state, layer_publishing.cpp:545-584)
    while existing subscribers keep getting only the incremental set."""
    node, t = _make_node()
    msgs_a = []
    node.bus.subscribe("~/mesh", msgs_a.append)
    scene = Scene(primitives=(Sphere(center=(0.0, 0.0, 1.0), radius=0.5),))
    T = orbit_pose(0.0)
    depth = np.asarray(render_depth(scene, CAM, jnp.asarray(T)))
    node.add_pose("cam", 0.0, T)
    node.add_depth_image(depth, CAM, "cam", 0.0)
    t[0] = 0.01
    node.tick()
    # Drain until A holds the full map (default bandwidth is generous).
    for k in range(10):
        t[0] = 0.3 + 0.2 * k
        node.tick()
    layer = node.multi_mapper.static_mapper.mesh_layer
    total = set(layer.blocks.keys())
    assert total
    seen_a = set()
    for m in msgs_a:
        seen_a |= {(b.index.x, b.index.y, b.index.z) for b in m.blocks}
    assert seen_a == total
    # Wire format is welded/indexed (mesh_conversions.cpp:62-104): blocks
    # carry shared vertices + index triples, not 3-vertices-per-triangle
    # soup.
    big = [b for m in msgs_a for b in m.blocks if b.triangles.shape[0] > 8]
    assert big
    for b in big:
        assert b.vertices.shape[0] < 3 * b.triangles.shape[0]
        assert b.triangles.max() < b.vertices.shape[0]

    # B joins late: it catches up on the whole current mesh, but UNDER the
    # bandwidth budget, spread over ticks (layer_publishing.cpp:545-584,
    # 702-711) — not as one unbounded dump.
    node.params.layer_streamer_bandwidth_limit_mbps = 8.0
    # 8 Mbps at the streamer's 0.1 s initial window / 16 KiB-block
    # estimate = ~6 blocks in B's first message.
    msgs_b = []
    node.bus.subscribe("~/mesh", msgs_b.append)
    n_a = len(msgs_a)
    t[0] = 10.0
    node.tick()
    assert msgs_b, "late subscriber got no mesh"
    first_b = {(b.index.x, b.index.y, b.index.z) for b in msgs_b[0].blocks}
    assert first_b and first_b < total, "first resend must be budgeted"
    # Over later ticks the backlog drains completely.
    seen_b = set(first_b)
    for k in range(12):
        t[0] = 10.2 + 0.2 * k
        node.tick()
        for m in msgs_b:
            seen_b |= {(b.index.x, b.index.y, b.index.z) for b in m.blocks}
        if seen_b == total:
            break
    assert seen_b == total
    # A's concurrent messages stay incremental only (nothing re-meshed).
    assert len(msgs_a) > n_a
    assert len(msgs_a[-1].blocks) < len(total)


def test_voxel_layer_publishes_removals_after_clearing():
    """Blocks freed by radius clearing must surface as removed_blocks on
    the voxel-layer topic (parity: cleared-block removal messages,
    layer_publishing.cpp:715-716)."""
    node, t = _make_node()
    msgs = []
    node.bus.subscribe("~/tsdf_layer", msgs.append)
    node.bus.subscribe("~/mesh", lambda m: None)  # drives re-mesh tracking
    scene = Scene(primitives=(Sphere(center=(0.0, 0.0, 1.0), radius=0.5),))
    T = orbit_pose(0.0)
    depth = np.asarray(render_depth(scene, CAM, jnp.asarray(T)))
    node.add_pose("cam", 0.0, T)
    node.add_depth_image(depth, CAM, "cam", 0.0)
    t[0] = 0.01
    node.tick()
    for k in range(5):   # mesh update + layer publishes
        t[0] = 0.3 + 0.2 * k
        node.tick()
    assert msgs and any(m.blocks for m in msgs)
    n_before = node.multi_mapper.static_mapper.block_count()

    # Clear everything outside a tiny radius around the camera.
    node.multi_mapper.static_mapper.clear_outside_radius(
        np.asarray(T, np.float32)[:3, 3], 0.5)
    assert node.multi_mapper.static_mapper.block_count() < n_before
    n_msgs = len(msgs)
    for k in range(3):
        t[0] = 2.0 + 0.2 * k
        node.tick()   # next publishes carry the removal log
    new_msgs = msgs[n_msgs:]
    removed = set()
    for m in new_msgs:
        removed |= {(i.x, i.y, i.z) for i in m.removed_blocks}
    assert removed, "no removed_blocks emitted after clearing"


def test_voxel_layer_publishes_without_mesh_subscriber():
    """Voxel-layer streaming must not depend on someone consuming ~/mesh:
    with no mesh subscriber, updated blocks derive from the device dirty
    flags (reference: layers serialize independently of meshing)."""
    node, t = _make_node()
    msgs = []
    node.bus.subscribe("~/tsdf_layer", msgs.append)
    scene = Scene(primitives=(Sphere(center=(0.0, 0.0, 1.0), radius=0.5),))
    T = orbit_pose(0.0)
    depth = np.asarray(render_depth(scene, CAM, jnp.asarray(T)))
    node.add_pose("cam", 0.0, T)
    node.add_depth_image(depth, CAM, "cam", 0.0)
    t[0] = 0.01
    node.tick()
    for k in range(3):
        t[0] = 0.3 + 0.2 * k
        node.tick()
    assert msgs and any(m.blocks for m in msgs)


def test_per_camera_rate_gates_interleaved():
    """Two cameras stream interleaved at 100 Hz with a 20 Hz depth gate:
    each camera integrates independently at the gated rate (parity:
    per-camera subscriber gating, nvblox_node.cpp:213-356)."""
    from isaac_ros_nvblox_tpu.utils.timing import Timing
    node, t = _make_node()
    node.params.num_cameras = 2
    node.params.integrate_depth_rate_hz = 20.0
    cam2 = Camera(fx=90.0, fy=90.0, cx=44.5, cy=34.5, width=90, height=70)
    scene = Scene(primitives=(Sphere(center=(0.0, 0.0, 1.0), radius=0.5),))
    d1 = np.asarray(render_depth(scene, CAM, jnp.asarray(orbit_pose(0.0))))
    d2 = np.asarray(render_depth(scene, cam2,
                                 jnp.asarray(orbit_pose(np.pi / 2))))
    Timing.reset()
    n_frames = 20
    for k in range(n_frames):          # 100 Hz per camera, interleaved
        stamp = k * 0.01
        t[0] = stamp
        node.add_pose("cam_a", stamp, orbit_pose(0.0))
        node.add_depth_image(d1, CAM, "cam_a", stamp)
        node.add_pose("cam_b", stamp, orbit_pose(np.pi / 2))
        node.add_depth_image(d2, cam2, "cam_b", stamp)
        node.tick()
    n_integrated = Timing.get("node/depth/integrate").count
    # 0.2 s of stream at 20 Hz/camera -> ~4-5 integrations per camera,
    # NOT 20: the gate is per camera (both cameras integrate frame 0, so
    # strictly more than one camera's share).
    assert 6 <= n_integrated <= 12, n_integrated
    assert node.multi_mapper.static_mapper.block_count() > 0
