"""Pallas TPU kernel for projective occupancy (log-odds) integration.

The XLA occupancy integrator (ops/occupancy.py) samples the depth image
with per-voxel element gathers — ~1M/frame at the TPU's ~115 M elem/s.
This matters doubly because the occupancy integrator runs EVERY frame for
the dynamic foreground mapper (MultiMapper dynamic/human modes,
nvblox_node.cpp:1057-1063) and for static_occupancy mode.

Sampling is the shared footprint-window machinery of the TSDF v3 kernel
(ops/tsdf_pallas.py::footprint_prepass + dynamic-roll one-hot MXU
sampling); the fusion is the reference's projective log-odds model
(free / occupied / unobserved bands, clamped — ops/occupancy.py,
mapper_initialization.cpp:307-328).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from isaac_ros_nvblox_tpu.models.camera import Camera
from isaac_ros_nvblox_tpu.ops.occupancy import OccupancyIntegratorParams
from isaac_ros_nvblox_tpu.ops.tsdf_pallas import (write_window_onehot,
                                                  zero_window_onehot,
                                                  N_LEVELS, OHU_ROWS, TILE_U,
                                                  TILE_V, UW, V, NB,
                                                  footprint_prepass,
                                                  pad_batch)


def _kernel(level_ref, u0_ref, v0_ref, shift_ref, valid_ref, scal_ref,
            p0, p1, p2, p3, p4, ut_ref, vt_ref, pcz_ref, lo_ref, obs_ref,
            lo_out, obs_out, tile_scratch, ohu_scratch, meas_scratch):
    """Eight blocks: one-hot depth sampling + (8,512) log-odds fusion."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        ohu_scratch[:, :] = jnp.zeros((OHU_ROWS, V), jnp.float32)

    nv = valid_ref[i * NB]
    for j in range(1, NB):
        nv = nv + valid_ref[i * NB + j]

    @pl.when(nv == 0)
    def _():
        lo_out[:, :] = lo_ref[:, :]
        obs_out[:, :] = obs_ref[:, :]

    @pl.when(nv > 0)
    def _():
        _occ_body(level_ref, u0_ref, v0_ref, shift_ref, valid_ref, scal_ref,
                  p0, p1, p2, p3, p4, ut_ref, vt_ref, pcz_ref, lo_ref,
                  obs_ref, lo_out, obs_out, tile_scratch, ohu_scratch,
                  meas_scratch, i)


def _occ_body(level_ref, u0_ref, v0_ref, shift_ref, valid_ref, scal_ref,
              p0, p1, p2, p3, p4, ut_ref, vt_ref, pcz_ref, lo_ref, obs_ref,
              lo_out, obs_out, tile_scratch, ohu_scratch, meas_scratch, i):
    hw = scal_ref[0]
    max_dist = scal_ref[1]
    l_free = scal_ref[2]
    l_occ = scal_ref[3]
    min_lo = scal_ref[4]
    max_lo = scal_ref[5]

    for j in range(NB):
        valid_j = valid_ref[i * NB + j]

        @pl.when(valid_j == 0)
        def _(j=j):
            meas_scratch[j:j + 1] = jnp.zeros((1, V), jnp.float32)

        @pl.when(valid_j > 0)
        def _(j=j):
            level = level_ref[i * NB + j]
            u0 = pl.multiple_of(u0_ref[i * NB + j], 128)
            v0 = pl.multiple_of(v0_ref[i * NB + j], 8)
            for lvl, ref in enumerate((p0, p1, p2, p3, p4)):
                @pl.when(level == lvl)
                def _():
                    tile_scratch[:, :] = ref[pl.ds(v0, TILE_V),
                                             pl.ds(u0, TILE_U)]
            sh = shift_ref[i * NB + j]
            ut = ut_ref[j:j + 1]
            vt = vt_ref[j:j + 1]
            iota_v = jax.lax.broadcasted_iota(jnp.int32, (TILE_V, V), 0)
            # Offset-write one-hot; no in-kernel roll (tsdf_pallas r5).
            write_window_onehot(ohu_scratch, ut, sh)
            ohv = (iota_v == vt).astype(jnp.float32)
            tmp = jnp.dot(tile_scratch[:, :], ohu_scratch[:, :],
                          preferred_element_type=jnp.float32)
            meas_scratch[j:j + 1] = jnp.sum(ohv * tmp, axis=0, keepdims=True)
            zero_window_onehot(ohu_scratch, sh)

    # --- vectorized log-odds fusion on (8, 512) (ops/occupancy.py).
    measured = meas_scratch[:, :]
    z = pcz_ref[:, :]
    samp_ok = ut_ref[:, :] >= 0
    depth_valid = measured > 0.0
    in_range = z <= max_dist
    is_free = z < measured - hw
    is_occ = jnp.abs(z - measured) <= hw
    update = samp_ok & depth_valid & in_range & (is_free | is_occ)
    delta = jnp.where(is_occ, l_occ, l_free)
    delta = jnp.where(update, delta, 0.0)
    lo_out[:, :] = jnp.clip(lo_ref[:, :] + delta, min_lo, max_lo)
    obs_out[:, :] = jnp.maximum(obs_ref[:, :], update.astype(jnp.int32))


def _log_odds(p: float) -> float:
    return math.log(p / (1.0 - p))


@functools.partial(
    jax.jit,
    static_argnames=("camera", "voxel_size_m", "params", "interpret"),
    donate_argnums=(0,))
def integrate_occupancy_pallas(log_odds, observed, slots, block_indices,
                               depth, T_L_C, *, camera: Camera,
                               voxel_size_m: float,
                               params: OccupancyIntegratorParams,
                               interpret: bool = False
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for ops/occupancy.integrate_occupancy on TPU."""
    cap = log_odds.shape[0]
    slots, block_indices = pad_batch(slots, block_indices, cap)
    N = slots.shape[0]

    depth = jnp.where(jnp.isfinite(depth), depth, 0.0)
    from isaac_ros_nvblox_tpu.ops.tsdf_pallas import build_decimation_levels
    levels = build_decimation_levels(depth)
    H, W = depth.shape

    (level, u0, v0, shift, valid, safe_slots, ut, vt,
     pcz) = footprint_prepass(slots, block_indices, T_L_C, camera=camera,
                              voxel_size_m=voxel_size_m, cap=cap, H=H, W=W)

    scalars = jnp.asarray(
        [params.occupied_region_half_width_m,
         params.max_integration_distance_m,
         _log_odds(params.free_region_occupancy_probability),
         _log_odds(params.occupied_region_occupancy_probability),
         params.min_log_odds, params.max_log_odds], jnp.float32)

    levels = [jnp.pad(l, ((0, max(0, TILE_V - l.shape[0])),
                          (0, max(0, TILE_U - l.shape[1]))))
              if (l.shape[0] < TILE_V or l.shape[1] < TILE_U) else l
              for l in levels]

    lo_b = log_odds[safe_slots]
    obs_b = observed[safe_slots].astype(jnp.int32)

    def _blk(i, *_prefetch):
        return (i, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,   # level/u0/v0/shift/valid
        grid=(N // NB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]      # scalars
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * N_LEVELS  # depth levels
        + [pl.BlockSpec((NB, V), _blk, memory_space=pltpu.VMEM)] * 5,
        out_specs=[pl.BlockSpec((NB, V), _blk, memory_space=pltpu.VMEM)] * 2,
        scratch_shapes=[
            pltpu.VMEM((TILE_V, TILE_U), jnp.float32),  # sampling tile
            pltpu.VMEM((OHU_ROWS, V), jnp.float32),     # embedded one-hot
            pltpu.VMEM((NB, V), jnp.float32),           # measured depths
        ],
    )

    lo_o, obs_o = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((N, V), jnp.float32),
                   jax.ShapeDtypeStruct((N, V), jnp.int32)],
        input_output_aliases={14: 0, 15: 1},  # lo_b/obs_b buffers reused
        interpret=interpret,
    )(level, u0, v0, shift, valid, scalars, *levels, ut, vt, pcz,
      lo_b, obs_b)

    log_odds = log_odds.at[slots].set(lo_o, mode="drop")
    observed = observed.at[slots].set(obs_o.astype(observed.dtype),
                                      mode="drop")
    return log_odds, observed
