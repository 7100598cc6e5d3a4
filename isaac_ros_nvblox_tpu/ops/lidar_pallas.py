"""Pallas TPU path for LiDAR TSDF integration (spherical projection).

The XLA lidar integrator (ops/tsdf.py::integrate_tsdf_lidar) samples the
range image with per-voxel element gathers (~1M/frame at ~115 M elem/s on
TPU) at the reference's 40 Hz lidar cadence (nvblox_base.yaml:16).

The fusion math is IDENTICAL to the pinhole TSDF kernel with range in
place of z-depth, so this module only builds the spherical footprint
prepass and reuses ops/tsdf_pallas.py's fusion kernel. Azimuth wrap is
handled by extending the range image with a TILE_U-column wrap margin and
re-centring each block's voxel coordinates on its (unwrapped) azimuth —
blocks straddling the -pi/pi seam sample the extension, which is exact
(the XLA path clamps at the seam instead).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isaac_ros_nvblox_tpu.core.types import Transform
from isaac_ros_nvblox_tpu.ops.tsdf import TsdfIntegratorParams
from isaac_ros_nvblox_tpu.ops.tsdf_pallas import (N_LEVELS, TILE_U, TILE_V,
                                                  UW, V, _run_fusion_kernel,
                                                  pad_batch)


@functools.partial(
    jax.jit,
    static_argnames=("lidar", "voxel_size_m", "params", "interpret"),
    donate_argnums=(0, 1))
def integrate_tsdf_lidar_pallas(distance, weight, slots, block_indices,
                                range_image, T_L_S, *, lidar,
                                voxel_size_m: float,
                                params: TsdfIntegratorParams,
                                interpret: bool = False
                                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for ops/tsdf.integrate_tsdf_lidar on TPU."""
    cap = distance.shape[0]
    slots, block_indices = pad_batch(slots, block_indices, cap)

    A = lidar.num_azimuth_divisions
    E = lidar.num_elevation_divisions
    rads_per_row = lidar.elevation_range_rad / max(E - 1, 1)
    ppr_u = A / (2.0 * np.pi)
    ppr_v = 1.0 / max(rads_per_row, 1e-9)

    img = jnp.where(jnp.isfinite(range_image) & (range_image > 0.0),
                    range_image, 0.0)
    # Wrap margin: blocks near the -pi/pi seam sample columns [A, A+TILE_U).
    img_ext = jnp.concatenate([img, img[:, :TILE_U]], axis=1)
    from isaac_ros_nvblox_tpu.ops.tsdf_pallas import build_decimation_levels
    levels = build_decimation_levels(img_ext)
    W_EXT = A + TILE_U

    # --- per-block tile parameters (spherical analogue of the camera
    # footprint_prepass; same alignment rules).
    bs = voxel_size_m * 8.0
    centers = (block_indices.astype(jnp.float32) + 0.5) * bs
    T_S_L = Transform.inverse(T_L_S)
    c_S = centers @ T_S_L[:3, :3].T + T_S_L[:3, 3]
    r_c = jnp.maximum(jnp.linalg.norm(c_S, axis=-1), 1e-3)
    az_c = jnp.arctan2(c_S[:, 1], c_S[:, 0])
    el_c = jnp.arcsin(jnp.clip(c_S[:, 2] / r_c, -1.0, 1.0))
    uc = (az_c + np.pi) / (2.0 * np.pi) * A
    # Re-centre so the 256-wide window never needs a left wrap margin.
    uc_eff = jnp.where(uc < 128.0, uc + A, uc)
    vc = (lidar.max_angle_above_zero_elevation_rad - el_c) / rads_per_row

    fp = bs / r_c * max(ppr_u, ppr_v)
    level = jnp.clip(jnp.ceil(jnp.log2(fp / (TILE_V * 0.5))), 0,
                     N_LEVELS - 1).astype(jnp.int32)
    scale = jnp.exp2(-level.astype(jnp.float32))
    dims_w = jnp.asarray([max((W_EXT + (1 << l) - 1) >> l, TILE_U)
                          for l in range(N_LEVELS)])
    dims_h = jnp.asarray([max((E + (1 << l) - 1) >> l, TILE_V)
                          for l in range(N_LEVELS)])
    w_l = dims_w[level]
    h_l = dims_h[level]
    v0 = jnp.clip((vc * scale).astype(jnp.int32) - TILE_V // 2, 0,
                  h_l - TILE_V)
    v0 = (v0 // 8) * 8
    u0 = (jnp.round(uc_eff * scale / 128.0).astype(jnp.int32) - 1) * 128
    u0 = jnp.clip(u0, 0, w_l - TILE_U)
    utc = jnp.round(uc_eff * scale).astype(jnp.int32) - u0
    # 32-quantized window start (8-aligned dynamic sublane offset for
    # write_window_onehot; see footprint_prepass).
    shift = jnp.clip(((utc - 16) // 32) * 32, 0, TILE_U - UW)
    valid = (slots < cap).astype(jnp.int32)
    safe_slots = jnp.where(slots < cap, slots, 0)

    # --- per-voxel spherical projection.
    lane = jnp.arange(V, dtype=jnp.int32)[None, :]
    lx = (lane // 64).astype(jnp.float32)
    ly = ((lane // 8) % 8).astype(jnp.float32)
    lz = (lane % 8).astype(jnp.float32)
    bi = block_indices.astype(jnp.float32)
    wx = (bi[:, 0:1] * 8.0 + lx + 0.5) * voxel_size_m
    wy = (bi[:, 1:2] * 8.0 + ly + 0.5) * voxel_size_m
    wz = (bi[:, 2:3] * 8.0 + lz + 0.5) * voxel_size_m
    R, t = T_S_L[:3, :3], T_S_L[:3, 3]
    px = R[0, 0] * wx + R[0, 1] * wy + R[0, 2] * wz + t[0]
    py = R[1, 0] * wx + R[1, 1] * wy + R[1, 2] * wz + t[1]
    pz = R[2, 0] * wx + R[2, 1] * wy + R[2, 2] * wz + t[2]
    r = jnp.sqrt(px * px + py * py + pz * pz)
    r_safe = jnp.maximum(r, 1e-9)
    az = jnp.arctan2(py, px)
    el = jnp.arcsin(jnp.clip(pz / r_safe, -1.0, 1.0))
    u_px = (az + np.pi) / (2.0 * np.pi) * A
    # Unwrap each voxel's azimuth relative to its block centre.
    u_rel = jnp.mod(u_px - uc[:, None] + A / 2.0, float(A)) - A / 2.0
    u_eff = uc_eff[:, None] + u_rel
    # The XLA sampler clips to the image; the elevation tolerance
    # (+- rads_per_row/2 in `valid`) admits half-row overshoot, so clamp
    # to match (otherwise edge-row voxels drop here but update there).
    v_px = jnp.clip(
        (lidar.max_angle_above_zero_elevation_rad - el) / rads_per_row,
        0.0, float(E - 1))
    in_view = ((r >= lidar.min_valid_range_m)
               & (r <= lidar.max_valid_range_m)
               & (el >= -lidar.min_angle_below_zero_elevation_rad
                  - rads_per_row / 2)
               & (el <= lidar.max_angle_above_zero_elevation_rad
                  + rads_per_row / 2))
    inv_scale = scale[:, None]
    # Clamp to each level's REAL decimated extent (edge overshoot: at the
    # last row/col, round(coord * scale) can exceed the decimated image).
    real_w = jnp.asarray([(W_EXT + (1 << l) - 1) >> l
                          for l in range(N_LEVELS)])
    real_h = jnp.asarray([(E + (1 << l) - 1) >> l for l in range(N_LEVELS)])
    u_lvl = jnp.clip(jnp.round(u_eff * inv_scale).astype(jnp.int32), 0,
                     real_w[level][:, None] - 1)
    v_lvl = jnp.clip(jnp.round(v_px * inv_scale).astype(jnp.int32), 0,
                     real_h[level][:, None] - 1)
    ut = u_lvl - u0[:, None] - shift[:, None]
    vt = v_lvl - v0[:, None]
    ok = (in_view & (valid[:, None] > 0)
          & (ut >= 0) & (ut < UW) & (vt >= 0) & (vt < TILE_V))
    ut = jnp.where(ok, ut, -1)
    vt = jnp.where(ok, vt, -1)

    return _run_fusion_kernel(
        distance, weight, slots, safe_slots, levels, level, u0, v0, shift,
        valid, ut, vt, r, voxel_size_m=voxel_size_m, params=params,
        interpret=interpret)
