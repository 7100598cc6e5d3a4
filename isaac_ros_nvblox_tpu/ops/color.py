"""Projective color integrator.

Reference: nvblox's CUDA color integrator — projects color onto voxels near
the reconstructed surface, running-average blended with per-frame weights
(SURVEY.md §2.1 "Projective color integrator"; call-sites
nvblox_node.cpp:1260-1265; shares projective params with TSDF,
mapper_initialization.cpp:170-180).

Same fused-batch design as the TSDF integrator: colors are only fused into
voxels that are (a) in view, (b) within the TSDF truncation band of the
surface (|tsdf| <= truncation), and (c) already observed — matching the
reference's behavior of coloring surface voxels only.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from isaac_ros_nvblox_tpu.core.types import Transform, voxel_centers_for_blocks
from isaac_ros_nvblox_tpu.models.camera import Camera, sample_image_nearest
from isaac_ros_nvblox_tpu.ops.tsdf import TsdfIntegratorParams, compute_weight


@functools.partial(
    jax.jit,
    static_argnames=("camera", "voxel_size_m", "params"),
    donate_argnums=(0, 1))
def integrate_color(color_rgb, color_weight, tsdf_distance, tsdf_weight,
                    slots, block_indices, color_image, depth, T_L_C,
                    *, camera: Camera, voxel_size_m: float,
                    params: TsdfIntegratorParams) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fuse one color frame.

    Args:
      color_rgb: `f32[cap, 512, 3]` (0-255 scale), donated.
      color_weight: `f32[cap, 512]`, donated.
      tsdf_distance, tsdf_weight: TSDF channels (read-only).
      color_image: `u8/f32[H, W, 3]`.
      depth: matching `f32[Hd, Wd]` depth for occlusion checks (may be a
        different resolution than color; pass the depth camera's image
        re-projected or simply the same-frame depth when aligned). Pass an
        all-zero image to skip occlusion checking.

    Returns updated (color_rgb, color_weight).
    """
    truncation = params.truncation_m(voxel_size_m)
    centers_L = voxel_centers_for_blocks(block_indices, voxel_size_m)
    T_C_L = Transform.inverse(T_L_C)
    p_C = Transform.apply(T_C_L, centers_L)
    uv, in_view = camera.project(p_C)
    z = p_C[..., 2]

    rgb = sample_image_nearest(color_image.astype(jnp.float32), uv)  # [N,512,3]

    d_vox = tsdf_distance[slots]
    w_vox = tsdf_weight[slots]
    near_surface = (w_vox > 1e-6) & (jnp.abs(d_vox) <= truncation)

    update = in_view & near_surface & (z <= params.max_integration_distance_m)

    # Occlusion check against the depth frame when available.
    Hd = depth.shape[0]
    has_depth = jnp.any(depth > 0.0)
    scale = jnp.float32(Hd) / jnp.float32(camera.height)
    measured = sample_image_nearest(depth, uv * scale)
    not_occluded = (~has_depth) | ((measured > 0.0) & (z <= measured + truncation))
    update = update & not_occluded

    w_new = compute_weight(params.weighting_mode, z, jnp.zeros_like(z),
                           truncation, dropoff_epsilon_m=voxel_size_m)
    w_new = jnp.where(update, w_new, 0.0)

    c_old = color_rgb[slots]
    w_old = color_weight[slots]
    w_sum = w_old + w_new
    c_fused = jnp.where(
        (w_sum > 1e-6)[..., None],
        (c_old * w_old[..., None] + rgb * w_new[..., None])
        / jnp.maximum(w_sum, 1e-6)[..., None],
        c_old)
    w_fused = jnp.minimum(w_sum, params.max_weight)

    c_out = jnp.where(update[..., None], c_fused, c_old)
    w_out = jnp.where(update, w_fused, w_old)
    color_rgb = color_rgb.at[slots].set(c_out, mode="drop")
    color_weight = color_weight.at[slots].set(w_out, mode="drop")
    return color_rgb, color_weight


@functools.partial(
    jax.jit,
    static_argnames=("camera", "voxel_size_m", "params"),
    donate_argnums=(0, 1, 2, 3))
def integrate_color_planar(color_r, color_g, color_b, color_weight,
                           tsdf_distance, tsdf_weight, slots, block_indices,
                           color_image, depth, T_L_C, *, camera: Camera,
                           voxel_size_m: float, params: TsdfIntegratorParams):
    """integrate_color over planar r/g/b channels `f32[cap, 512]` each.

    The DeviceMapper stores color planar so the Pallas mesh kernel
    (ops/mesh_pallas.py) can read per-channel rows directly; the fusion
    math is identical to integrate_color.
    """
    truncation = params.truncation_m(voxel_size_m)
    centers_L = voxel_centers_for_blocks(block_indices, voxel_size_m)
    T_C_L = Transform.inverse(T_L_C)
    p_C = Transform.apply(T_C_L, centers_L)
    uv, in_view = camera.project(p_C)
    z = p_C[..., 2]

    rgb = sample_image_nearest(color_image.astype(jnp.float32), uv)  # [N,512,3]

    d_vox = tsdf_distance[slots]
    w_vox = tsdf_weight[slots]
    near_surface = (w_vox > 1e-6) & (jnp.abs(d_vox) <= truncation)
    update = in_view & near_surface & (z <= params.max_integration_distance_m)

    Hd = depth.shape[0]
    has_depth = jnp.any(depth > 0.0)
    scale = jnp.float32(Hd) / jnp.float32(camera.height)
    measured = sample_image_nearest(depth, uv * scale)
    not_occluded = (~has_depth) | ((measured > 0.0)
                                   & (z <= measured + truncation))
    update = update & not_occluded

    w_new = compute_weight(params.weighting_mode, z, jnp.zeros_like(z),
                           truncation, dropoff_epsilon_m=voxel_size_m)
    w_new = jnp.where(update, w_new, 0.0)
    w_old = color_weight[slots]
    w_sum = w_old + w_new
    inv = 1.0 / jnp.maximum(w_sum, 1e-6)
    blend_ok = w_sum > 1e-6

    outs = []
    for ch, pool in enumerate((color_r, color_g, color_b)):
        c_old = pool[slots]
        c_fused = jnp.where(blend_ok,
                            (c_old * w_old + rgb[..., ch] * w_new) * inv,
                            c_old)
        c_out = jnp.where(update, c_fused, c_old)
        outs.append(pool.at[slots].set(c_out, mode="drop"))
    w_fused = jnp.minimum(w_sum, params.max_weight)
    w_out = jnp.where(update, w_fused, w_old)
    color_weight = color_weight.at[slots].set(w_out, mode="drop")
    return outs[0], outs[1], outs[2], color_weight
