"""Projective occupancy integrator (log-odds fusion).

Reference: nvblox's occupancy integrator — used for `static_occupancy`
mapping mode and the dynamic foreground mapper (SURVEY.md §2.1 "Occupancy
integrator"; params free/occupied/unobserved probability + half width at
mapper_initialization.cpp:307-328).

Projective model per voxel vs the depth frame:
  z < d - half_width      -> free          (log-odds += l_free)
  |z - d| <= half_width   -> occupied      (log-odds += l_occupied)
  z > d + half_width      -> unobserved    (no update)
with log-odds clamped to bounds. Same fused block-batch shape as tsdf.py.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp

from isaac_ros_nvblox_tpu.core.types import Transform, voxel_centers_for_blocks
from isaac_ros_nvblox_tpu.models.camera import Camera, sample_image_nearest


def _log_odds(p: float) -> float:
    return math.log(p / (1.0 - p))


@dataclasses.dataclass(frozen=True)
class OccupancyIntegratorParams:
    """Mirrors occupancy_integrator_* params
    (mapper_initialization.cpp:307-328)."""
    free_region_occupancy_probability: float = 0.3
    occupied_region_occupancy_probability: float = 0.7
    unobserved_region_occupancy_probability: float = 0.5
    occupied_region_half_width_m: float = 0.1
    max_integration_distance_m: float = 7.0
    min_log_odds: float = -10.0
    max_log_odds: float = 10.0


@functools.partial(
    jax.jit,
    static_argnames=("camera", "voxel_size_m", "params"),
    donate_argnums=(0, 1))
def integrate_occupancy(log_odds, observed, slots, block_indices, depth,
                        T_L_C, *, camera: Camera, voxel_size_m: float,
                        params: OccupancyIntegratorParams
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fuse one depth frame into the occupancy pool.

    log_odds: `f32[cap, 512]` (donated); observed: `u8[cap, 512]` (donated).
    Returns updated (log_odds, observed).
    """
    centers_L = voxel_centers_for_blocks(block_indices, voxel_size_m)
    T_C_L = Transform.inverse(T_L_C)
    p_C = Transform.apply(T_C_L, centers_L)
    uv, in_view = camera.project(p_C)
    z = p_C[..., 2]

    measured = sample_image_nearest(depth, uv)
    depth_valid = (measured > 0.0) & jnp.isfinite(measured)
    in_range = z <= params.max_integration_distance_m

    hw = params.occupied_region_half_width_m
    is_free = z < measured - hw
    is_occ = jnp.abs(z - measured) <= hw

    l_free = _log_odds(params.free_region_occupancy_probability)
    l_occ = _log_odds(params.occupied_region_occupancy_probability)

    update = in_view & depth_valid & in_range & (is_free | is_occ)
    delta = jnp.where(is_occ, l_occ, l_free)
    delta = jnp.where(update, delta, 0.0)

    lo_old = log_odds[slots]
    obs_old = observed[slots]
    lo_new = jnp.clip(lo_old + delta, params.min_log_odds, params.max_log_odds)
    obs_new = jnp.maximum(obs_old, update.astype(observed.dtype))

    log_odds = log_odds.at[slots].set(lo_new, mode="drop")
    observed = observed.at[slots].set(obs_new, mode="drop")
    return log_odds, observed
