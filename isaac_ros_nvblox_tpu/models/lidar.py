"""Spherical-projection LiDAR model.

Reference: nvblox `Lidar` (nvblox/sensors/camera.h sibling; ctor variants at
nvblox_node.cpp:1315-1323, kernel usage in
pointcloud_conversions.cu:86-149) — an azimuth x elevation "camera" with
equal or non-equal vertical FoV, `project`, `isInValidRange`, depth-image
conversion of pointclouds (last-write-wins per cell in the reference's CUDA
kernel; here a scatter-min, which is deterministic).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Lidar:
    num_azimuth_divisions: int
    num_elevation_divisions: int
    min_valid_range_m: float
    max_valid_range_m: float
    # Equal-FoV model: symmetric vertical fov. Non-equal: explicit angles.
    min_angle_below_zero_elevation_rad: float
    max_angle_above_zero_elevation_rad: float

    @staticmethod
    def equal_vertical_fov(num_azimuth: int, num_elevation: int,
                           vertical_fov_rad: float,
                           min_range_m: float = 0.4,
                           max_range_m: float = 100.0) -> "Lidar":
        half = vertical_fov_rad / 2.0
        return Lidar(num_azimuth, num_elevation, min_range_m, max_range_m,
                     half, half)

    @property
    def elevation_range_rad(self) -> float:
        return (self.min_angle_below_zero_elevation_rad
                + self.max_angle_above_zero_elevation_rad)

    def project(self, p_L):
        """Points `f32[..., 3]` (sensor frame, z up) -> (uv f32[..., 2],
        depth f32[...], valid bool[...]).

        u: azimuth column in [0, num_azimuth); v: elevation row with 0 at the
        top (max elevation), matching image convention.
        """
        x, y, z = p_L[..., 0], p_L[..., 1], p_L[..., 2]
        r = jnp.sqrt(x * x + y * y + z * z)
        azimuth = jnp.arctan2(y, x)  # [-pi, pi)
        elevation = jnp.arcsin(jnp.clip(z / jnp.maximum(r, 1e-9), -1.0, 1.0))
        u = (azimuth + jnp.pi) / (2 * jnp.pi) * self.num_azimuth_divisions
        rads_per_row = self.elevation_range_rad / max(
            self.num_elevation_divisions - 1, 1)
        v = ((self.max_angle_above_zero_elevation_rad - elevation)
             / rads_per_row)
        valid = (self.is_in_valid_range(r)
                 & (elevation >= -self.min_angle_below_zero_elevation_rad - rads_per_row / 2)
                 & (elevation <= self.max_angle_above_zero_elevation_rad + rads_per_row / 2))
        uv = jnp.stack([u, v], axis=-1)
        return uv, r, valid

    def is_in_valid_range(self, r):
        return (r >= self.min_valid_range_m) & (r <= self.max_valid_range_m)

    def unproject(self):
        """Unit ray directions `f32[rows, cols, 3]` per range-image cell."""
        az = (jnp.arange(self.num_azimuth_divisions, dtype=jnp.float32) + 0.5) \
            / self.num_azimuth_divisions * (2 * jnp.pi) - jnp.pi
        rads_per_row = self.elevation_range_rad / max(
            self.num_elevation_divisions - 1, 1)
        el = (self.max_angle_above_zero_elevation_rad
              - jnp.arange(self.num_elevation_divisions, dtype=jnp.float32)
              * rads_per_row)
        azg, elg = jnp.meshgrid(az, el, indexing="xy")
        ce = jnp.cos(elg)
        return jnp.stack([ce * jnp.cos(azg), ce * jnp.sin(azg),
                          jnp.sin(elg)], axis=-1)


@functools.partial(jax.jit, static_argnames=("lidar",))
def pointcloud_to_range_image(points, lidar: Lidar):
    """Pointcloud `f32[N, 3]` -> range image `f32[rows, cols]` (0 invalid).

    Scatter-min resolves cell collisions deterministically (the reference's
    CUDA kernel is last-write-wins, pointcloud_conversions.cu:144-149; min
    keeps the closest return, strictly better for integration).
    """
    uv, r, valid = lidar.project(points)
    rows, cols = lidar.num_elevation_divisions, lidar.num_azimuth_divisions
    u = jnp.clip(uv[..., 0].astype(jnp.int32), 0, cols - 1)
    v = jnp.clip(uv[..., 1].astype(jnp.int32), 0, rows - 1)
    img = jnp.full((rows, cols), jnp.inf, jnp.float32)
    r_masked = jnp.where(valid, r, jnp.inf)
    img = img.at[v, u].min(r_masked)
    return jnp.where(jnp.isfinite(img), img, 0.0)


@functools.partial(jax.jit, static_argnames=("lidar",))
def motion_compensate_pointcloud(points, timestamps_s, T_L_S_start, T_L_S_end,
                                 lidar: Lidar):
    """Undistort a scan: per-point pose interpolation between scan start/end
    (parity: lidar motion compensation plumbing, nvblox_node.cpp:1339-1384).

    timestamps_s are per-point times relative to scan start; scan duration =
    max timestamp (reference computes it with a thrust reduce,
    pointcloud_conversions.cu:345-378).
    """
    from isaac_ros_nvblox_tpu.core.types import Transform
    duration = jnp.maximum(jnp.max(timestamps_s), 1e-9)
    alpha = jnp.clip(timestamps_s / duration, 0.0, 1.0)

    # Transform each point by the pose interpolated at its own timestamp,
    # expressed relative to scan end (so the output cloud is consistent with
    # T_L_S_end). Small-rotation nlerp via Transform.interpolate, vmapped
    # over a small set of discrete alpha bins for efficiency.
    n_bins = 16
    bin_alphas = jnp.linspace(0.0, 1.0, n_bins)
    Ts = jax.vmap(lambda a: Transform.interpolate(T_L_S_start, T_L_S_end, a))(
        bin_alphas)  # [n_bins, 4, 4]
    bin_idx = jnp.clip((alpha * (n_bins - 1)).astype(jnp.int32), 0, n_bins - 1)
    T_pp = Ts[bin_idx]  # [N, 4, 4]
    p_world = jnp.einsum("nij,nj->ni", T_pp[:, :3, :3], points) + T_pp[:, :3, 3]
    # Back into the scan-end sensor frame.
    T_S_L_end = Transform.inverse(T_L_S_end)
    return p_world @ T_S_L_end[:3, :3].T + T_S_L_end[:3, 3]
