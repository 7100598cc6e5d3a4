"""Depth back-projection + pointcloud transforms.

Reference: `DepthImageBackProjector::backProjectOnGPU` and
`transformPointcloudOnGPU` (call-sites nvblox_node.cpp:1128-1131,1155-1184)
— used for the back-projected-depth debug output and dynamic detection.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from isaac_ros_nvblox_tpu.core.types import Transform
from isaac_ros_nvblox_tpu.models.camera import Camera


@functools.partial(jax.jit, static_argnames=("camera", "max_depth_m"))
def back_project_depth(depth, *, camera: Camera, max_depth_m: float = 1e6):
    """Depth image -> camera-frame points `f32[H*W, 3]` + valid mask.

    Invalid (0 / non-finite / too-far) pixels get the origin and
    valid=False, keeping shapes static.
    """
    us = jnp.arange(camera.width, dtype=jnp.float32)
    vs = jnp.arange(camera.height, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(us, vs, indexing="xy")
    valid = (depth > 0.0) & jnp.isfinite(depth) & (depth <= max_depth_m)
    z = jnp.where(valid, depth, 0.0)
    pts = camera.unproject(uu, vv, z).reshape(-1, 3)
    return pts, valid.reshape(-1)


@jax.jit
def transform_pointcloud(points, T_A_B):
    """Transform points from frame B to A (parity: transformPointcloudOnGPU)."""
    return Transform.apply(T_A_B, points)
