"""TSDF / occupancy decay integrators.

Reference: nvblox's decay integrators — exponential weight decay of TSDF
voxels (optionally excluding the last camera view's frustum), occupancy
log-odds decay toward the unknown prior, and deallocation of fully-decayed
blocks (SURVEY.md §2.1 "TSDF/occupancy decay integrators"; params at
mapper_initialization.cpp:382-428; call-sites `decayTsdfExcludeLastView`
nvblox_node.cpp:931-936, `decayOccupancyAllVoxels` :925-929).

TPU-native: decay is a pure elementwise pass over the whole pool (no
gather/scatter needed — decay applies to every allocated slot; unallocated
slots hold zeros and decay is a no-op on them). Frustum exclusion is a
per-voxel mask computed from the last camera pose. Block deallocation
candidates (max weight below threshold) are computed on device and reduced
to a per-block bit, then freed on the host.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isaac_ros_nvblox_tpu.core.types import Transform, voxel_centers_for_blocks
from isaac_ros_nvblox_tpu.models.camera import Camera


@dataclasses.dataclass(frozen=True)
class TsdfDecayParams:
    """Mirrors tsdf_decay_* params (mapper_initialization.cpp:382-404)."""
    decay_factor: float = 0.95
    decayed_weight_threshold: float = 1e-3
    set_free_distance_on_decayed: bool = False
    free_distance_vox: float = 4.0
    exclude_last_view: bool = True


@dataclasses.dataclass(frozen=True)
class OccupancyDecayParams:
    """Mirrors occupancy_decay_* params (mapper_initialization.cpp:406-428)."""
    free_region_decay_probability: float = 0.55   # pulls free voxels up
    occupied_region_decay_probability: float = 0.4  # pulls occupied down
    to_free: bool = False  # decay_to_free_region_probability behavior


@functools.partial(jax.jit,
                   static_argnames=("params", "voxel_size_m", "camera",
                                    "view_distance_m"),
                   donate_argnums=(0, 1))
def decay_tsdf(distance, weight, block_indices_all, T_L_C, *,
               params: TsdfDecayParams, voxel_size_m: float,
               camera: Optional[Camera] = None,
               view_distance_m: float = 7.0
               ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decay all TSDF weights; returns (distance, weight, block_max_weight).

    If `camera` is given and `params.exclude_last_view`, voxels inside the
    camera frustum (positive z, projecting into the image, within
    `view_distance_m`) are excluded — parity with
    decayTsdfExcludeLastView<Camera>.
    `block_max_weight: f32[cap]` lets the host deallocate decayed blocks.
    """
    w = weight * params.decay_factor
    if camera is not None and params.exclude_last_view:
        centers = voxel_centers_for_blocks(block_indices_all, voxel_size_m)
        p_C = Transform.apply(Transform.inverse(T_L_C), centers)
        _, in_view = camera.project(p_C)
        in_view = in_view & (p_C[..., 2] <= view_distance_m)
        w = jnp.where(in_view, weight, w)
    decayed = w < params.decayed_weight_threshold
    if params.set_free_distance_on_decayed:
        distance = jnp.where(
            decayed & (weight > 0),
            params.free_distance_vox * voxel_size_m, distance)
    w = jnp.where(decayed, 0.0, w)
    return distance, w, jnp.max(w, axis=1)


@functools.partial(jax.jit, static_argnames=("params",), donate_argnums=(0,))
def decay_occupancy(log_odds, *, params: OccupancyDecayParams
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decay occupancy log-odds toward the prior.

    Matches the reference's asymmetric decay: occupied voxels decay with
    the occupied_region_decay_probability step, free voxels with the free
    one. With `to_free` (occupancy_decay_to_free, mapper_initialization
    .cpp:406-428), the decay target is the free-region probability instead
    of the 0.5 unknown prior — voxels not re-observed drift toward free.
    Returns (log_odds, block_max_distance_from_target) for deallocation.
    """
    import math
    l_occ_step = math.log((1 - params.occupied_region_decay_probability)
                          / params.occupied_region_decay_probability)
    l_free_step = math.log(params.free_region_decay_probability
                           / (1 - params.free_region_decay_probability))
    if params.to_free:
        target = math.log(params.free_region_decay_probability
                          / (1 - params.free_region_decay_probability))
    else:
        target = 0.0
    # Move toward the target without overshooting.
    decayed_down = jnp.maximum(log_odds - l_occ_step, target)
    decayed_up = jnp.minimum(log_odds + l_free_step, target)
    out = jnp.where(log_odds > target, decayed_down,
                    jnp.where(log_odds < target, decayed_up, log_odds))
    return out, jnp.max(jnp.abs(out - target), axis=1)


def deallocate_fully_decayed_blocks(pool, table, block_metric: np.ndarray,
                                    threshold: float) -> int:
    """Free blocks whose per-block metric fell below threshold. Returns count."""
    slots = table.allocated_slots()
    dead = slots[block_metric[slots] < threshold]
    if dead.size == 0:
        return 0
    keys = [tuple(k) for k in table.block_indices[dead].tolist()]
    table.free(keys)
    pool.reset_slots(dead)
    return int(dead.size)
