"""Freespace integrator: temporal high-confidence-freespace estimation.

Reference: nvblox's freespace integrator drives dynamic-object detection: a
voxel that has been free for long enough becomes "high-confidence freespace";
anything later observed occupied inside such freespace is dynamic
(SURVEY.md §2.1 "Freespace integrator"; params at
mapper_initialization.cpp:430-463).

State machine per voxel (FreespaceVoxel parity — layer_publishing.cpp:129-165):
  consecutive_occupancy_duration_ms: how long the voxel has been continuously
    occupied; reset when observed free.
  last_occupied_time_ms: timestamp bookkeeping for the unobserved grace
    period (`max_unobserved_to_keep_consecutive_occupancy_ms`).
  is_high_confidence_freespace: set once the voxel has been free for
    `min_duration_since_occupied_for_freespace_ms`; reset when continuously
    occupied for `min_consecutive_occupancy_duration_for_reset_ms`.

Occupancy evidence comes from the TSDF: occupied iff
tsdf_distance < max_tsdf_distance_for_occupancy_m (and observed this frame).
The whole update is one elementwise jitted pass over the view's blocks.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from isaac_ros_nvblox_tpu.core.types import Transform, voxel_centers_for_blocks
from isaac_ros_nvblox_tpu.models.camera import Camera, sample_image_nearest


@dataclasses.dataclass(frozen=True)
class FreespaceIntegratorParams:
    """Mirrors freespace_integrator_* params
    (mapper_initialization.cpp:430-463)."""
    max_tsdf_distance_for_occupancy_m: float = 0.15
    max_unobserved_to_keep_consecutive_occupancy_ms: float = 250.0
    min_duration_since_occupied_for_freespace_ms: float = 1000.0
    min_consecutive_occupancy_duration_for_reset_ms: float = 2000.0
    check_neighborhood: bool = True
    initialize_to_high_confidence_freespace: bool = False


@functools.partial(
    jax.jit,
    static_argnames=("camera", "voxel_size_m", "params"),
    donate_argnums=(0, 1, 2))
def update_freespace(consecutive_ms, last_occupied_ms, high_confidence,
                     tsdf_distance, tsdf_weight, slots, block_indices,
                     T_L_C, time_ms, last_update_ms, *,
                     camera: Camera, voxel_size_m: float,
                     params: FreespaceIntegratorParams,
                     distance_rows=None
                     ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One freespace update over the view's blocks at time `time_ms`.

    consecutive_ms, last_occupied_ms: f32[cap, 512] (donated).
    high_confidence: bool[cap, 512] (donated).
    `distance_rows` (f32[N, 512], optional): pre-gathered effective
    distances for the batch (the device path's neighborhood-dilated values)
    — avoids materializing a full-capacity modified copy of the channel.
    Returns the three updated channels.
    """
    dt_ms = time_ms - last_update_ms

    centers_L = voxel_centers_for_blocks(block_indices, voxel_size_m)
    p_C = Transform.apply(Transform.inverse(T_L_C), centers_L)
    _, in_view = camera.project(p_C)

    d = tsdf_distance[slots] if distance_rows is None else distance_rows
    w = tsdf_weight[slots]
    observed = in_view & (w > 1e-6)
    occupied_now = observed & (d < params.max_tsdf_distance_for_occupancy_m)

    cons = consecutive_ms[slots]
    last_occ = last_occupied_ms[slots]
    hc = high_confidence[slots]

    # Unobserved grace: keep accumulating occupancy while briefly unobserved.
    recently_occupied = (time_ms - last_occ) \
        <= params.max_unobserved_to_keep_consecutive_occupancy_ms
    keep_streak = occupied_now | ((~observed) & recently_occupied & (cons > 0))
    cons_new = jnp.where(keep_streak, cons + dt_ms, 0.0)
    last_occ_new = jnp.where(occupied_now, time_ms, last_occ)

    # Promote to high-confidence freespace after a long free duration.
    free_duration = time_ms - last_occ_new
    promote = observed & (~occupied_now) & (
        free_duration >= params.min_duration_since_occupied_for_freespace_ms)
    demote = cons_new >= params.min_consecutive_occupancy_duration_for_reset_ms
    hc_new = jnp.where(demote, False, hc | promote)

    consecutive_ms = consecutive_ms.at[slots].set(
        jnp.where(observed | keep_streak, cons_new, cons), mode="drop")
    last_occupied_ms = last_occupied_ms.at[slots].set(last_occ_new, mode="drop")
    high_confidence = high_confidence.at[slots].set(hc_new, mode="drop")
    return consecutive_ms, last_occupied_ms, high_confidence


@functools.partial(jax.jit, static_argnames=("params",),
                   donate_argnums=(0, 1, 2))
def update_freespace_fullpool(consecutive_ms, last_occupied_ms,
                              high_confidence, eff_distance, tsdf_weight,
                              in_view, time_ms, last_update_ms, *,
                              params: FreespaceIntegratorParams
                              ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                         jnp.ndarray]:
    """Full-pool elementwise freespace update (zero gathers/scatters).

    The batch variant above row-gathers a view batch (sorted compaction +
    row gathers + scatters, ~ms-scale on TPU); this form evaluates the
    same per-voxel state machine over the WHOLE pool with a precomputed
    per-voxel `in_view` mask — pure fused elementwise passes, the shape
    TPUs like. Observation granularity is per-voxel (the batch form
    processed whole frustum blocks); the unobserved-grace branch applies
    exactly per voxel, which matches the parameter's intent
    (max_unobserved_to_keep_consecutive_occupancy_ms).
    """
    dt_ms = time_ms - last_update_ms
    d = eff_distance
    w = tsdf_weight
    observed = in_view & (w > 1e-6)
    occupied_now = observed & (d < params.max_tsdf_distance_for_occupancy_m)

    cons = consecutive_ms
    last_occ = last_occupied_ms
    recently_occupied = (time_ms - last_occ) \
        <= params.max_unobserved_to_keep_consecutive_occupancy_ms
    keep_streak = occupied_now | ((~observed) & recently_occupied
                                 & (cons > 0))
    cons_new = jnp.where(keep_streak, cons + dt_ms, 0.0)
    last_occ_new = jnp.where(occupied_now, time_ms, last_occ)

    free_duration = time_ms - last_occ_new
    promote = observed & (~occupied_now) & (
        free_duration >= params.min_duration_since_occupied_for_freespace_ms)
    demote = cons_new >= params.min_consecutive_occupancy_duration_for_reset_ms
    hc_new = jnp.where(demote, False, high_confidence | promote)

    touched = observed | keep_streak
    consecutive_ms = jnp.where(touched, cons_new, cons)
    last_occupied_ms = last_occ_new
    high_confidence = jnp.where(observed | demote, hc_new, high_confidence)
    return consecutive_ms, last_occupied_ms, high_confidence
