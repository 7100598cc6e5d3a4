"""Pallas color integrator vs the XLA reference (ops/color.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from isaac_ros_nvblox_tpu.models.camera import Camera
from isaac_ros_nvblox_tpu.ops.color import integrate_color_planar
from isaac_ros_nvblox_tpu.ops.color_pallas import integrate_color_pallas
from isaac_ros_nvblox_tpu.ops.tsdf import (TsdfIntegratorParams,
                                           WeightingFunctionType)

CAM = Camera(fx=160.0, fy=160.0, cx=79.5, cy=59.5, width=160, height=120)
VOXEL = 0.05
INTERP = jax.default_backend() == "cpu"


def _setup(n_blocks=64, cap=256, seed=0):
    rng = np.random.RandomState(seed)
    bidx = np.stack([rng.randint(-6, 6, n_blocks),
                     rng.randint(-5, 5, n_blocks),
                     rng.randint(1, 11, n_blocks)], axis=1).astype(np.int32)
    bidx = np.unique(bidx, axis=0)
    n = bidx.shape[0]
    slots = np.concatenate([np.arange(n, dtype=np.int32),
                            [cap]]).astype(np.int32)
    bidx = np.concatenate([bidx, [[0, 0, 0]]]).astype(np.int32)
    T = np.eye(4, dtype=np.float32)
    T[2, 3] = -0.4
    # A "reconstructed" TSDF: every voxel near a z=2.0 plane is in-band.
    from isaac_ros_nvblox_tpu.core.types import voxel_centers_for_blocks
    centers = voxel_centers_for_blocks(jnp.asarray(bidx), VOXEL)
    d = jnp.clip(2.0 - 0.4 - centers[..., 2], -0.2, 0.2)
    w = jnp.ones_like(d)
    tsdf_d = jnp.zeros((cap, 512), jnp.float32).at[jnp.asarray(slots)].set(
        d, mode="drop")
    tsdf_w = jnp.zeros((cap, 512), jnp.float32).at[jnp.asarray(slots)].set(
        w, mode="drop")
    chans = [jnp.zeros((cap, 512), jnp.float32) for _ in range(4)]
    return chans, tsdf_d, tsdf_w, jnp.asarray(slots), jnp.asarray(bidx), \
        jnp.asarray(T)


def _run_both(color, depth, params, seed=0):
    chans, tsdf_d, tsdf_w, slots, bidx, T = _setup(seed=seed)
    ref = integrate_color_planar(
        *(c + 0 for c in chans), tsdf_d, tsdf_w, slots, bidx, color, depth,
        T, camera=CAM, voxel_size_m=VOXEL, params=params)
    pal = integrate_color_pallas(
        *(c + 0 for c in chans), tsdf_d, tsdf_w, slots, bidx, color, depth,
        T, camera=CAM, voxel_size_m=VOXEL, params=params, interpret=INTERP)
    return ref, pal


def test_flat_color_exact_match():
    """Constant color + constant depth are decimation-invariant -> exact."""
    color = jnp.full((CAM.height, CAM.width, 3), 0.0, jnp.float32) \
        + jnp.asarray([60.0, 120.0, 200.0])
    depth = jnp.full((CAM.height, CAM.width), 2.0, jnp.float32)
    params = TsdfIntegratorParams(
        weighting_mode=WeightingFunctionType.INVERSE_SQUARE_DROPOFF)
    ref, pal = _run_both(color, depth, params)
    assert float(jnp.max(ref[3])) > 0.0   # something was colored
    for r, p in zip(ref, pal):
        np.testing.assert_allclose(np.asarray(p), np.asarray(r), atol=2e-4)


def test_textured_color_statistical_match():
    rng = np.random.RandomState(1)
    base = 120.0 + 80.0 * np.sin(np.linspace(0, 8, CAM.width))[None, :, None]
    color = jnp.asarray(
        np.broadcast_to(base, (CAM.height, CAM.width, 3)).copy()
        + rng.rand(CAM.height, CAM.width, 3) * 4.0, jnp.float32)
    depth = jnp.asarray(
        2.0 + 0.2 * np.sin(np.linspace(0, 5, CAM.width))[None, :]
        * np.ones((CAM.height, 1)), jnp.float32)
    params = TsdfIntegratorParams()
    ref, pal = _run_both(color, depth, params)
    m_ref = np.asarray(ref[3]) > 0
    m_pal = np.asarray(pal[3]) > 0
    agree = (m_ref == m_pal).mean()
    assert agree > 0.995, agree
    both = m_ref & m_pal
    err = np.abs(np.asarray(pal[0])[both] - np.asarray(ref[0])[both])
    assert np.median(err) < 2.0        # sub-intensity-step differences
    assert np.percentile(err, 99) < 30.0   # decimated sampling near blocks


def test_occlusion_respected():
    """Voxels behind the measured surface must stay uncolored (both paths)."""
    color = jnp.full((CAM.height, CAM.width, 3), 200.0, jnp.float32)
    # Measured surface at 1.0 m: the z=2.0 TSDF band sits far behind it.
    depth = jnp.full((CAM.height, CAM.width), 1.0, jnp.float32)
    params = TsdfIntegratorParams()
    ref, pal = _run_both(color, depth, params)
    assert float(jnp.max(ref[3])) == 0.0
    assert float(jnp.max(pal[3])) == 0.0


def test_padding_rows_untouched():
    color = jnp.full((CAM.height, CAM.width, 3), 100.0, jnp.float32)
    depth = jnp.full((CAM.height, CAM.width), 2.0, jnp.float32)
    params = TsdfIntegratorParams()
    chans, tsdf_d, tsdf_w, slots, bidx, T = _setup()
    chans[0] = chans[0].at[100].set(7.0)
    out = integrate_color_pallas(
        *chans, tsdf_d, tsdf_w, slots[:1], bidx[:1], color, depth, T,
        camera=CAM, voxel_size_m=VOXEL, params=params, interpret=INTERP)
    np.testing.assert_array_equal(np.asarray(out[0])[100], 7.0)


def test_replay_scan_color_matches_eager():
    """Color fusion inside replay_frames (the bench path) must match the
    eager integrate_color path exactly (same fused program, scan-hosted)."""
    from isaac_ros_nvblox_tpu.core.world_grid import WorldGridConfig
    from isaac_ros_nvblox_tpu.mapper.device_mapper import DeviceMapper
    from isaac_ros_nvblox_tpu.models.scene import (Scene, Sphere, orbit_pose,
                                                   render_color, render_depth)

    cam = Camera(fx=120.0, fy=120.0, cx=59.5, cy=44.5, width=120, height=90)
    scene = Scene(primitives=(Sphere(center=(0.0, 0.0, 1.0), radius=0.5),))

    def mk():
        return DeviceMapper(
            voxel_size_m=0.05,
            world=WorldGridConfig(dims=(32, 32, 16), capacity=2048,
                                  origin_block=(-16, -16, -4)),
            enable_color=True, enable_esdf=False, max_blocks_per_frame=1024)

    depths, poses, colors = [], [], []
    for k in range(3):
        T = jnp.asarray(orbit_pose(2 * np.pi * k / 8, radius=1.6, height=1.0,
                                   target=(0, 0, 1.0)))
        depths.append(render_depth(scene, cam, T))
        poses.append(T)
        colors.append(render_color(scene, cam, T).astype(jnp.uint8))
    depths = jnp.stack(depths)
    poses = jnp.stack(poses)
    colors = jnp.stack(colors)

    m1 = mk()
    m1.replay_frames(depths, poses, cam, colors=colors, color_every=1)
    m2 = mk()
    for k in range(3):
        m2.integrate_depth(depths[k], np.asarray(poses[k]), cam)
        m2.integrate_color(colors[k].astype(jnp.float32),
                           np.asarray(poses[k]), cam, depth=depths[k])
    w1 = float(jnp.sum(m1.channels["color_weight"]))
    w2 = float(jnp.sum(m2.channels["color_weight"]))
    assert w1 > 0
    np.testing.assert_allclose(np.asarray(m1.channels["color_r"]),
                               np.asarray(m2.channels["color_r"]), atol=1e-3)
    assert abs(w1 - w2) / w2 < 1e-5
