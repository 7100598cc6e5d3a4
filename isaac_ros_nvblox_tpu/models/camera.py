"""Pinhole camera model (nvblox `nvblox/sensors/camera.h` equivalent).

The reference constructs `Camera(fx, fy, cx, cy, width, height)` from ROS
`CameraInfo` (nvblox_ros/src/lib/conversions/image_conversions.cpp:27-32).
Here a camera is a small frozen dataclass whose projection math is plain
jnp — usable under jit and vmap. Width/height are static Python ints (they
determine array shapes).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Camera:
    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int

    def intrinsics(self) -> jnp.ndarray:
        return jnp.asarray([self.fx, self.fy, self.cx, self.cy], jnp.float32)

    def project(self, p_C):
        """Project camera-frame points `f32[..., 3]` to pixels.

        Returns (uv f32[..., 2], valid bool[...]). Valid requires z > 0 and
        the pixel center inside the image bounds.
        """
        z = p_C[..., 2]
        eps = 1e-6
        u = self.fx * p_C[..., 0] / jnp.where(z > eps, z, 1.0) + self.cx
        v = self.fy * p_C[..., 1] / jnp.where(z > eps, z, 1.0) + self.cy
        uv = jnp.stack([u, v], axis=-1)
        valid = ((z > eps)
                 & (u >= 0.0) & (u <= self.width - 1.0)
                 & (v >= 0.0) & (v <= self.height - 1.0))
        return uv, valid

    def unproject(self, u, v, depth):
        """Pixel (u, v) + depth (z-depth, meters) -> camera-frame point."""
        x = (u - self.cx) / self.fx * depth
        y = (v - self.cy) / self.fy * depth
        return jnp.stack([x, y, jnp.broadcast_to(depth, jnp.shape(x))], axis=-1)

    def ray_directions(self):
        """Unit ray direction per pixel, `f32[H, W, 3]` in camera frame."""
        us = jnp.arange(self.width, dtype=jnp.float32)
        vs = jnp.arange(self.height, dtype=jnp.float32)
        uu, vv = jnp.meshgrid(us, vs, indexing="xy")
        d = jnp.stack([(uu - self.cx) / self.fx,
                       (vv - self.cy) / self.fy,
                       jnp.ones_like(uu)], axis=-1)
        return d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    def frustum_corner_directions(self, max_depth: float) -> jnp.ndarray:
        """The 4 far-plane corners in the camera frame, `f32[4, 3]`."""
        corners_uv = jnp.asarray(
            [[0.0, 0.0], [self.width - 1.0, 0.0],
             [0.0, self.height - 1.0], [self.width - 1.0, self.height - 1.0]],
            jnp.float32)
        return self.unproject(corners_uv[:, 0], corners_uv[:, 1],
                              jnp.full((4,), max_depth, jnp.float32))

    def scaled(self, factor: float) -> "Camera":
        """Camera for an image scaled by `factor` (e.g. mask at half res)."""
        return Camera(self.fx * factor, self.fy * factor,
                      self.cx * factor, self.cy * factor,
                      int(round(self.width * factor)),
                      int(round(self.height * factor)))


def sample_image_nearest(image, uv, fill=0.0):
    """Nearest-neighbor sample `image[H, W, ...]` at pixel coords `uv[..., 2]`."""
    H, W = image.shape[0], image.shape[1]
    u = jnp.clip(jnp.round(uv[..., 0]).astype(jnp.int32), 0, W - 1)
    v = jnp.clip(jnp.round(uv[..., 1]).astype(jnp.int32), 0, H - 1)
    return image[v, u]


def sample_image_bilinear(image, uv):
    """Bilinear sample `image[H, W]` (single channel) at `uv[..., 2]`."""
    H, W = image.shape[0], image.shape[1]
    u = jnp.clip(uv[..., 0], 0.0, W - 1.0)
    v = jnp.clip(uv[..., 1], 0.0, H - 1.0)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    u1 = jnp.minimum(u0 + 1, W - 1)
    v1 = jnp.minimum(v0 + 1, H - 1)
    fu = u - u0.astype(jnp.float32)
    fv = v - v0.astype(jnp.float32)
    i00 = image[v0, u0]
    i01 = image[v0, u1]
    i10 = image[v1, u0]
    i11 = image[v1, u1]
    return ((i00 * (1 - fu) + i01 * fu) * (1 - fv)
            + (i10 * (1 - fu) + i11 * fu) * fv)
