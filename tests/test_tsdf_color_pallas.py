"""Fused TSDF+color kernel vs the sequential composition (bitwise)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaac_ros_nvblox_tpu.models.camera import Camera
from isaac_ros_nvblox_tpu.ops.color_pallas import integrate_color_pallas
from isaac_ros_nvblox_tpu.ops.tsdf import (TsdfIntegratorParams,
                                           WeightingFunctionType)
from isaac_ros_nvblox_tpu.ops.tsdf_color_pallas import (
    integrate_tsdf_color_pallas)
from isaac_ros_nvblox_tpu.ops.tsdf_pallas import integrate_tsdf_pallas

CAM = Camera(fx=160.0, fy=160.0, cx=79.5, cy=59.5, width=160, height=120)
VOXEL = 0.05
INTERP = jax.default_backend() == "cpu"


def _setup(cap=256, seed=0):
    rng = np.random.RandomState(seed)
    bidx = np.stack([rng.randint(-6, 6, 64),
                     rng.randint(-5, 5, 64),
                     rng.randint(1, 11, 64)], axis=1).astype(np.int32)
    bidx = np.unique(bidx, axis=0)
    n = bidx.shape[0]
    slots = np.concatenate([np.arange(n, dtype=np.int32),
                            [cap]]).astype(np.int32)
    bidx = np.concatenate([bidx, [[0, 0, 0]]]).astype(np.int32)
    T = np.eye(4, dtype=np.float32)
    T[2, 3] = -0.4
    # Prior map state: mild random TSDF/color content.
    d0 = jnp.asarray(rng.uniform(-0.2, 0.2, (cap, 512)), jnp.float32)
    w0 = jnp.asarray(rng.uniform(0.0, 2.0, (cap, 512)), jnp.float32)
    cr = jnp.asarray(rng.uniform(0, 255, (cap, 512)), jnp.float32)
    cg = jnp.asarray(rng.uniform(0, 255, (cap, 512)), jnp.float32)
    cb = jnp.asarray(rng.uniform(0, 255, (cap, 512)), jnp.float32)
    cw = jnp.asarray(rng.uniform(0.0, 1.0, (cap, 512)), jnp.float32)
    depth = jnp.asarray(
        2.0 + 0.2 * np.sin(np.arange(CAM.height)[:, None] / 7.0)
        + 0.1 * np.cos(np.arange(CAM.width)[None, :] / 11.0), jnp.float32)
    color = jnp.asarray(rng.uniform(0, 255, (CAM.height, CAM.width, 3)),
                        jnp.float32)
    return (d0, w0, cr, cg, cb, cw, jnp.asarray(slots), jnp.asarray(bidx),
            depth, color, jnp.asarray(T))


@pytest.mark.parametrize("mode", [
    WeightingFunctionType.INVERSE_SQUARE_DROPOFF,
    WeightingFunctionType.CONSTANT,
    WeightingFunctionType.LINEAR_WITH_MAX,
])
def test_fused_matches_sequential(mode):
    params = TsdfIntegratorParams(max_integration_distance_m=5.0,
                                  weighting_mode=mode)
    (d0, w0, cr, cg, cb, cw, slots, bidx, depth, color, T) = _setup()

    # Sequential reference: TSDF kernel, then color kernel reading the
    # UPDATED tsdf channels, both on the same batch.
    d1, w1 = integrate_tsdf_pallas(
        d0 + 0, w0 + 0, slots, bidx, depth, T, camera=CAM,
        voxel_size_m=VOXEL, params=params, interpret=INTERP)
    cr1, cg1, cb1, cw1 = integrate_color_pallas(
        cr + 0, cg + 0, cb + 0, cw + 0, d1, w1, slots, bidx, color, depth,
        T, camera=CAM, voxel_size_m=VOXEL, params=params, interpret=INTERP)

    outs = integrate_tsdf_color_pallas(
        d0 + 0, w0 + 0, cr + 0, cg + 0, cb + 0, cw + 0, slots, bidx, depth,
        color, T, camera=CAM, voxel_size_m=VOXEL, params=params,
        interpret=INTERP)
    for got, want, name in zip(
            outs, (d1, w1, cr1, cg1, cb1, cw1),
            ("d", "w", "r", "g", "b", "cw")):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=name)


def test_replay_scan_uses_fused_color_on_cadence():
    """End-to-end: a replay with color_every=2 on the CPU (XLA) path vs the
    per-frame eager path — the scan plumbing must produce identical maps
    regardless of the fused-branch gating."""
    from isaac_ros_nvblox_tpu.core import world_grid as wg
    from isaac_ros_nvblox_tpu.mapper.device_mapper import DeviceMapper
    from isaac_ros_nvblox_tpu.models.scene import (Scene, Sphere,
                                                   orbit_pose, render_color,
                                                   render_depth)
    scene = Scene(primitives=(Sphere(center=(0.0, 0.0, 1.2), radius=0.5),))
    world = wg.WorldGridConfig(dims=(64, 64, 32), capacity=2048,
                               origin_block=(-32, -32, -8))
    depths, poses, colors = [], [], []
    for k in range(4):
        T = orbit_pose(0.4 * k, radius=1.8, height=1.2, target=(0, 0, 1.2))
        depths.append(render_depth(scene, CAM, jnp.asarray(T)))
        poses.append(jnp.asarray(T, jnp.float32))
        colors.append(render_color(scene, CAM, jnp.asarray(T))
                      .astype(jnp.uint8))
    m = DeviceMapper(voxel_size_m=VOXEL, world=world, enable_color=True,
                     enable_esdf=False)
    m.replay_frames(jnp.stack(depths), jnp.stack(poses), CAM,
                    colors=jnp.stack(colors), color_every=2)
    assert float(jnp.max(m.channels["color_weight"])) > 0.0
