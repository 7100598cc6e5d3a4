"""Projective TSDF integrator.

Reference: nvblox's CUDA projective TSDF integrator — frustum-raycast depth
fusion with configurable weighting functions and truncation (SURVEY.md §2.1
"Projective TSDF integrator"; weighting-mode names from
nvblox_ros/src/lib/mapper_initialization.cpp:27-51, params at
:171-180,262-305).

TPU-native design: one fused jitted kernel over a batch of gathered blocks.
For the ~1-4k blocks a frame touches, that is a `[N, 512]` elementwise
pipeline: voxel centers -> camera frame (one small matmul) -> pinhole
projection -> depth-image gather -> SDF + weighting -> fused running-average
update -> scatter back into the pool with `mode="drop"` (padding lanes use an
out-of-range slot and fall away for free). No per-voxel control flow; every
branch is a `where`.
"""

from __future__ import annotations

import dataclasses
import enum
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from isaac_ros_nvblox_tpu.core.types import Transform, voxel_centers_for_blocks
from isaac_ros_nvblox_tpu.models.camera import Camera, sample_image_nearest


class WeightingFunctionType(enum.Enum):
    """The six weighting modes (mapper_initialization.cpp:27-51)."""
    CONSTANT = "constant"
    CONSTANT_DROPOFF = "constant_dropoff"
    INVERSE_SQUARE = "inverse_square"
    INVERSE_SQUARE_DROPOFF = "inverse_square_dropoff"
    INVERSE_SQUARE_TSDF_DISTANCE_PENALTY = "inverse_square_tsdf_distance_penalty"
    LINEAR_WITH_MAX = "linear_with_max"


@dataclasses.dataclass(frozen=True)
class TsdfIntegratorParams:
    """Static (compile-time) projective-integrator parameters.

    Mirrors the reference param names (mapper_initialization.cpp:262-305):
    `projective_integrator_max_integration_distance_m`,
    `projective_integrator_truncation_distance_vox`,
    `projective_integrator_max_weight`, `projective_integrator_weighting_mode`.
    """
    max_integration_distance_m: float = 7.0
    truncation_distance_vox: float = 4.0
    max_weight: float = 5.0
    weighting_mode: WeightingFunctionType = (
        WeightingFunctionType.INVERSE_SQUARE_DROPOFF)

    def truncation_m(self, voxel_size_m: float) -> float:
        return self.truncation_distance_vox * voxel_size_m


def compute_weight(mode: WeightingFunctionType, z, sdf, truncation_m: float,
                   dropoff_epsilon_m: float):
    """Per-sample fusion weight.

    `z` is the voxel's z-depth in the camera frame, `sdf` the unclamped
    projective signed distance (measured_depth - z). Dropoff linearly fades
    the weight to zero between `-dropoff_epsilon` and `-truncation` behind
    the surface (voxblox/nvblox-style constant-dropoff).
    """
    one = jnp.ones_like(z)
    inv_sq = 1.0 / jnp.maximum(z * z, 1e-4)
    denom = max(truncation_m - dropoff_epsilon_m, 1e-6)
    dropoff = jnp.clip((truncation_m + sdf) / denom, 0.0, 1.0)
    if mode == WeightingFunctionType.CONSTANT:
        return one
    if mode == WeightingFunctionType.CONSTANT_DROPOFF:
        return dropoff
    if mode == WeightingFunctionType.INVERSE_SQUARE:
        return inv_sq
    if mode == WeightingFunctionType.INVERSE_SQUARE_DROPOFF:
        return inv_sq * dropoff
    if mode == WeightingFunctionType.INVERSE_SQUARE_TSDF_DISTANCE_PENALTY:
        penalty = jnp.clip(1.0 - jnp.abs(sdf) / max(truncation_m, 1e-6), 0.0, 1.0)
        return inv_sq * penalty
    if mode == WeightingFunctionType.LINEAR_WITH_MAX:
        # Constant up to 1 m, then 1/z falloff.
        return jnp.minimum(one, 1.0 / jnp.maximum(z, 1e-4))
    raise ValueError(f"unknown weighting mode {mode}")


@functools.partial(
    jax.jit,
    static_argnames=("camera", "voxel_size_m", "params"),
    donate_argnums=(0, 1))
def integrate_tsdf(distance, weight, slots, block_indices, depth, T_L_C,
                   *, camera: Camera, voxel_size_m: float,
                   params: TsdfIntegratorParams) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fuse one depth frame into the TSDF pool.

    Args:
      distance, weight: pool channels `f32[cap, 512]` (donated).
      slots: `i32[N]` pool slots to update; padding entries must be >= cap
        (they drop out of the scatter).
      block_indices: `i32[N, 3]` block index per slot.
      depth: `f32[H, W]` z-depth image, 0 / non-finite = invalid.
      T_L_C: layer_T_camera `f32[4, 4]`.

    Returns updated (distance, weight).
    """
    truncation = params.truncation_m(voxel_size_m)
    centers_L = voxel_centers_for_blocks(block_indices, voxel_size_m)  # [N,512,3]
    T_C_L = Transform.inverse(T_L_C)
    p_C = Transform.apply(T_C_L, centers_L)  # [N, 512, 3]
    uv, in_view = camera.project(p_C)
    z = p_C[..., 2]

    measured = sample_image_nearest(depth, uv)  # [N, 512]
    depth_valid = (measured > 0.0) & jnp.isfinite(measured)

    sdf = measured - z
    update = (in_view & depth_valid
              & (z <= params.max_integration_distance_m)
              & (sdf >= -truncation))

    w_new = compute_weight(params.weighting_mode, z, sdf, truncation,
                           dropoff_epsilon_m=voxel_size_m)
    w_new = jnp.where(update, w_new, 0.0)

    d_old = distance[slots]  # OOB gather clamps; masked out below.
    w_old = weight[slots]
    sdf_clamped = jnp.minimum(sdf, truncation)
    w_sum = w_old + w_new
    d_fused = jnp.where(w_sum > 1e-6,
                        (d_old * w_old + sdf_clamped * w_new) / jnp.maximum(w_sum, 1e-6),
                        d_old)
    w_fused = jnp.minimum(w_sum, params.max_weight)

    d_out = jnp.where(update, d_fused, d_old)
    w_out = jnp.where(update, w_fused, w_old)
    distance = distance.at[slots].set(d_out, mode="drop")
    weight = weight.at[slots].set(w_out, mode="drop")
    return distance, weight


@functools.partial(
    jax.jit,
    static_argnames=("lidar", "voxel_size_m", "params"),
    donate_argnums=(0, 1))
def integrate_tsdf_lidar(distance, weight, slots, block_indices, range_image,
                         T_L_S, *, lidar, voxel_size_m: float,
                         params: TsdfIntegratorParams
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fuse one LiDAR range image (spherical projection model).

    Same fused update as `integrate_tsdf` but distances are measured along
    the ray (range), not z-depth — the projective model the reference's
    templated integrator uses for its `Lidar` sensor.
    """
    truncation = params.truncation_m(voxel_size_m)
    centers_L = voxel_centers_for_blocks(block_indices, voxel_size_m)
    T_S_L = Transform.inverse(T_L_S)
    p_S = Transform.apply(T_S_L, centers_L)
    uv, r_vox, in_view = lidar.project(p_S)

    measured = sample_image_nearest(range_image, uv)
    depth_valid = (measured > 0.0) & jnp.isfinite(measured)

    sdf = measured - r_vox
    update = (in_view & depth_valid
              & (r_vox <= params.max_integration_distance_m)
              & (sdf >= -truncation))

    w_new = compute_weight(params.weighting_mode, r_vox, sdf, truncation,
                           dropoff_epsilon_m=voxel_size_m)
    w_new = jnp.where(update, w_new, 0.0)

    d_old = distance[slots]
    w_old = weight[slots]
    sdf_clamped = jnp.minimum(sdf, truncation)
    w_sum = w_old + w_new
    d_fused = jnp.where(w_sum > 1e-6,
                        (d_old * w_old + sdf_clamped * w_new)
                        / jnp.maximum(w_sum, 1e-6), d_old)
    w_fused = jnp.minimum(w_sum, params.max_weight)

    d_out = jnp.where(update, d_fused, d_old)
    w_out = jnp.where(update, w_fused, w_old)
    distance = distance.at[slots].set(d_out, mode="drop")
    weight = weight.at[slots].set(w_out, mode="drop")
    return distance, weight
