"""MultiMapper (dynamic/human modes), ground plane, lidar integration."""

import jax.numpy as jnp
import numpy as np

from isaac_ros_nvblox_tpu.mapper.multi_mapper import MultiMapper
from isaac_ros_nvblox_tpu.mapper.params import (MappingType, MultiMapperParams,
                                                make_params)
from isaac_ros_nvblox_tpu.models.camera import Camera
from isaac_ros_nvblox_tpu.models.lidar import (Lidar,
                                               pointcloud_to_range_image)
from isaac_ros_nvblox_tpu.models.scene import (Scene, Sphere, orbit_pose,
                                               render_depth)
from isaac_ros_nvblox_tpu.ops.ground_plane import GroundPlaneEstimator

CAM = Camera(fx=120.0, fy=120.0, cx=59.5, cy=44.5, width=120, height=90)
VOXEL = 0.05


def test_human_mode_splits_masked_depth():
    params = make_params(mode="people_segmentation",
                         overlay={"block_capacity": 4096,
                                  "static_mapper": {
                                      "remove_small_connected_components": False}})
    mm = MultiMapper(params)
    assert mm.dynamic_mapper is not None
    scene = Scene(primitives=(Sphere(center=(0.0, 0.0, 1.0), radius=0.6),))
    T = orbit_pose(0.0, radius=2.0, height=1.0, target=(0, 0, 1.0))
    depth = np.asarray(render_depth(scene, CAM, jnp.asarray(T)))
    mask = np.zeros_like(depth, np.uint8)
    mask[:, :40] = 255  # left strip is "person"
    mm.integrate_depth(depth, T, CAM, mask=mask)
    # Static map got background; dynamic occupancy map got the foreground.
    assert mm.static_mapper.block_count() > 0
    assert mm.dynamic_mapper.block_count() > 0
    lo = np.asarray(mm.dynamic_mapper.channels["occupancy_log_odds"])
    assert (lo > 0).any()  # occupied evidence in the dynamic layer


def test_mask_connected_component_filter():
    from isaac_ros_nvblox_tpu.ops.masking import remove_small_connected_components
    mask = np.zeros((50, 50), np.uint8)
    mask[5:30, 5:30] = 1      # big component (625 px)
    mask[40:42, 40:42] = 1    # small component (4 px)
    out = remove_small_connected_components(mask, size_threshold=100)
    assert out[10, 10] == 1 and out[41, 41] == 0


def test_lidar_range_image_roundtrip():
    lidar = Lidar.equal_vertical_fov(num_azimuth=360, num_elevation=32,
                                     vertical_fov_rad=np.deg2rad(40))
    rng = np.random.RandomState(0)
    # Random points in the valid range/elevation band.
    az = rng.uniform(-np.pi, np.pi, 500)
    el = rng.uniform(-np.deg2rad(19), np.deg2rad(19), 500)
    r = rng.uniform(1.0, 20.0, 500)
    pts = np.stack([r * np.cos(el) * np.cos(az), r * np.cos(el) * np.sin(az),
                    r * np.sin(el)], 1).astype(np.float32)
    img = np.asarray(pointcloud_to_range_image(jnp.asarray(pts), lidar))
    assert img.shape == (32, 360)
    filled = (img > 0).sum()
    assert filled > 300  # most points land in distinct cells
    # Ranges preserved (min-combine keeps closest).
    assert 1.0 <= img[img > 0].min() and img[img > 0].max() <= 20.0


def test_lidar_tsdf_integration():
    params = make_params(overlay={"block_capacity": 4096})
    mm = MultiMapper(params)
    lidar = Lidar.equal_vertical_fov(num_azimuth=256, num_elevation=32,
                                     vertical_fov_rad=np.deg2rad(45),
                                     max_range_m=20.0)
    # A cylinder wall of points at 3 m around the sensor.
    az = np.linspace(-np.pi, np.pi, 2000, endpoint=False)
    z = np.tile(np.linspace(-0.5, 0.5, 4), 500)
    pts = np.stack([3.0 * np.cos(az), 3.0 * np.sin(az), z], 1).astype(np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = (0, 0, 1.0)
    mm.integrate_pointcloud(pts, T, lidar=lidar)
    m = mm.static_mapper
    assert m.block_count() > 50
    d = np.asarray(m.channels["tsdf_distance"])
    w = np.asarray(m.channels["tsdf_weight"])
    assert (w > 0).any()
    # Surface voxels (near radius 3) have near-zero tsdf.
    from isaac_ros_nvblox_tpu.core.types import voxel_centers_for_blocks
    slots = np.arange(int(m.state.alloc_count))
    centers = np.asarray(voxel_centers_for_blocks(
        jnp.asarray(np.asarray(m.state.block_index_of_slot)[slots]), VOXEL))
    rad = np.linalg.norm(centers[..., :2], axis=-1)
    # inverse-square weighting at r=3 m gives w ~= 1/9 per scan.
    near = (np.abs(rad - 3.0) < 0.05) & (w[slots] > 0.05) \
        & (np.abs(centers[..., 2] - 1.0) < 0.4)
    assert near.sum() > 100
    assert np.median(np.abs(d[slots][near])) < 2 * VOXEL


def test_ground_plane_estimator():
    from isaac_ros_nvblox_tpu.mapper.mapper import Mapper
    from isaac_ros_nvblox_tpu.models.scene import Plane
    # Scene: a floor plane at z=0 (normal +z).
    scene = Scene(primitives=(Plane(normal=(0, 0, 1), offset=0.0),))
    mapper = Mapper(voxel_size_m=VOXEL, capacity=4096, enable_color=False,
                    enable_esdf=False)
    # Camera above looking down-forward.
    for k in range(2):
        T = orbit_pose(0.3 * k, radius=1.5, height=1.2, target=(0.5, 0, 0))
        depth = render_depth(scene, CAM, jnp.asarray(T))
        mapper.integrate_depth(depth, T, CAM)
    est = GroundPlaneEstimator()
    plane = est.estimate(mapper)
    assert plane is not None
    # Fit should be near z = 0: small coefficients, height near 0.
    assert abs(plane.height_at(0.5, 0.0)) < 0.08
    n = plane.normal()
    assert n[2] > 0.95


def test_dynamic_replay_scan_matches_eager_and_detects():
    """replay_frames_dynamic (the in-scan dynamics pipeline) must equal
    the eager dynamic path channel-for-channel, and a freshly appearing
    object inside high-confidence freespace must land in the dynamic
    occupancy map (freespace-driven detection, the reference's dynamics
    mode)."""
    import dataclasses

    import jax.numpy as jnp

    from isaac_ros_nvblox_tpu.core import world_grid as wg
    from isaac_ros_nvblox_tpu.mapper.multi_mapper import MultiMapper
    from isaac_ros_nvblox_tpu.mapper.params import (MapperParams,
                                                    MappingType,
                                                    MultiMapperParams)
    from isaac_ros_nvblox_tpu.models.scene import (RoomBox, Scene, Sphere,
                                                   orbit_pose, render_depth)
    from isaac_ros_nvblox_tpu.ops.freespace import FreespaceIntegratorParams

    cam = Camera(fx=120.0, fy=120.0, cx=59.5, cy=44.5, width=120, height=90)
    world = wg.WorldGridConfig(dims=(32, 32, 16), capacity=4096,
                               origin_block=(-16, -16, -4))

    def mk():
        sp = MapperParams(
            freespace=FreespaceIntegratorParams(
                min_duration_since_occupied_for_freespace_ms=100.0))
        sp = dataclasses.replace(sp,
                                 remove_small_connected_components=False)
        p = MultiMapperParams(mapping_type=MappingType.DYNAMIC,
                              block_capacity=4096, static_mapper=sp)
        return MultiMapper(p, world=world)

    # Static room for the first frames; a person-sized sphere pops into
    # previously-free space on the last frame.
    room = (RoomBox(center=(0.0, 0.0, 1.25), half_extents=(2.2, 1.8, 1.25)),)
    static_scene = Scene(primitives=room)
    dynamic_scene = Scene(primitives=room + (
        Sphere(center=(0.6, 0.0, 1.0), radius=0.3),))
    T = orbit_pose(0.0, radius=1.8, height=1.0, target=(0, 0, 1.0))
    depths, poses, times = [], [], []
    for k in range(6):
        scene = dynamic_scene if k == 5 else static_scene
        depths.append(np.asarray(render_depth(scene, cam, jnp.asarray(T))))
        poses.append(np.asarray(T, np.float32))
        times.append(200.0 * k)

    m1 = mk()
    m1.replay_frames_dynamic(np.stack(depths), np.stack(poses),
                             np.asarray(times, np.float32), cam)
    m2 = mk()
    for k in range(6):
        m2.integrate_depth(depths[k], poses[k], cam, time_ms=times[k])

    for name, get in [
            ("tsdf_weight", lambda m: m.static_mapper.channels["tsdf_weight"]),
            ("occupancy_log_odds",
             lambda m: m.dynamic_mapper.channels["occupancy_log_odds"]),
            ("freespace_high_confidence",
             lambda m: m.static_mapper.channels[
                 "freespace_high_confidence"])]:
        a = np.asarray(get(m1), np.float64)
        b = np.asarray(get(m2), np.float64)
        assert abs(a.sum() - b.sum()) <= 1e-3 * max(abs(b.sum()), 1.0), name

    # The popped-in sphere was detected: dynamic occupancy gained mass.
    occ = np.asarray(m1.dynamic_mapper.channels["occupancy_log_odds"])
    assert (occ > 0).sum() > 50, (occ > 0).sum()


def test_dynamic_detection_subsample():
    """subsample=2 detection still finds the dynamic object (2x2 mask
    granularity) — the TPU knob for the gather-bound per-pixel lookup."""
    import dataclasses

    import jax.numpy as jnp

    from isaac_ros_nvblox_tpu.core import world_grid as wg
    from isaac_ros_nvblox_tpu.mapper.multi_mapper import MultiMapper
    from isaac_ros_nvblox_tpu.mapper.params import (MapperParams,
                                                    MappingType,
                                                    MultiMapperParams)
    from isaac_ros_nvblox_tpu.models.scene import (RoomBox, Scene, Sphere,
                                                   orbit_pose, render_depth)
    from isaac_ros_nvblox_tpu.ops.freespace import FreespaceIntegratorParams

    cam = Camera(fx=120.0, fy=120.0, cx=59.5, cy=44.5, width=120, height=90)
    world = wg.WorldGridConfig(dims=(32, 32, 16), capacity=4096,
                               origin_block=(-16, -16, -4))
    sp = dataclasses.replace(
        MapperParams(freespace=FreespaceIntegratorParams(
            min_duration_since_occupied_for_freespace_ms=100.0)),
        remove_small_connected_components=False)
    mm = MultiMapper(MultiMapperParams(
        mapping_type=MappingType.DYNAMIC, block_capacity=4096,
        static_mapper=sp, dynamic_detection_subsample=2), world=world)

    room = (RoomBox(center=(0.0, 0.0, 1.25), half_extents=(2.2, 1.8, 1.25)),)
    T = orbit_pose(0.0, radius=1.8, height=1.0, target=(0, 0, 1.0))
    static_d = np.asarray(render_depth(Scene(primitives=room), cam,
                                       jnp.asarray(T)))
    dyn_d = np.asarray(render_depth(
        Scene(primitives=room + (Sphere(center=(0.6, 0.0, 1.0),
                                        radius=0.3),)),
        cam, jnp.asarray(T)))
    for k in range(5):
        mm.integrate_depth(static_d, np.asarray(T, np.float32), cam,
                           time_ms=200.0 * k)
    mm.integrate_depth(dyn_d, np.asarray(T, np.float32), cam, time_ms=1000.0)
    assert mm.last_dynamic_mask is not None
    assert mm.last_dynamic_mask.sum() > 100   # object detected at stride 2
    occ = np.asarray(mm.dynamic_mapper.channels["occupancy_log_odds"])
    assert (occ > 0).sum() > 50
