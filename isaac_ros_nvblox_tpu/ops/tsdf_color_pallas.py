"""Fused TSDF + color projective integration in ONE Pallas dispatch.

At color cadence the replay scan used to run two kernels over the same
view: the TSDF fusion kernel (ops/tsdf_pallas.py) and the color kernel
(ops/color_pallas.py) — each with its own view batch, footprint prepass,
decimation pyramid and per-block one-hot build. This kernel samples FOUR
image planes (depth, r, g, b) through one shared one-hot per block and
runs both fusion updates on (NB, 512), writing all six channel rows in
one pass — the one-hot build and tile loads (the dominant per-block cost)
amortize across both integrators.

View-batch parity note: the fused path colors the blocks of the DEPTH
frame's view batch. That matches the reference more closely than the
standalone color path's full-frustum pseudo-depth batch: nvblox's
ProjectiveColorIntegrator computes its block list by raycasting the
depth frame (nvblox color integrator; node call-site
nvblox_node.cpp:1260-1265). Voxels outside the depth batch could only be
painted if unoccluded AND near a surface, which the occlusion term
(z <= sampled_depth + truncation) already confines to the current
surface band — i.e. to the depth batch.

Correctness mirror: tests assert bitwise equality with running
integrate_tsdf_pallas followed by integrate_color_pallas on the same
batch (interpret mode on CPU).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from isaac_ros_nvblox_tpu.models.camera import Camera
from isaac_ros_nvblox_tpu.ops.tsdf import (TsdfIntegratorParams,
                                           WeightingFunctionType)
from isaac_ros_nvblox_tpu.ops.tsdf_pallas import (N_LEVELS, NB, OHU_ROWS,
                                                  TILE_U, TILE_V, UW, V,
                                                  build_decimation_levels,
                                                  footprint_prepass,
                                                  pad_batch,
                                                  write_window_onehot,
                                                  zero_window_onehot)

NC = 4   # sampled planes: depth, r, g, b


def _kernel(level_ref, u0_ref, v0_ref, shift_ref, valid_ref, scal_ref,
            p0, p1, p2, p3, p4, ut_ref, vt_ref, pcz_ref,
            d_ref, w_ref, cr_ref, cg_ref, cb_ref, cw_ref,
            d_out, w_out, cr_out, cg_out, cb_out, cw_out,
            tile_scratch, ohu_scratch, meas_scratch, *,
            mode: WeightingFunctionType):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        ohu_scratch[:, :] = jnp.zeros((OHU_ROWS, V), jnp.float32)

    nv = valid_ref[i * NB]
    for j in range(1, NB):
        nv = nv + valid_ref[i * NB + j]

    @pl.when(nv == 0)
    def _():
        d_out[:, :] = d_ref[:, :]
        w_out[:, :] = w_ref[:, :]
        cr_out[:, :] = cr_ref[:, :]
        cg_out[:, :] = cg_ref[:, :]
        cb_out[:, :] = cb_ref[:, :]
        cw_out[:, :] = cw_ref[:, :]

    @pl.when(nv > 0)
    def _():
        _body(level_ref, u0_ref, v0_ref, shift_ref, valid_ref, scal_ref,
              p0, p1, p2, p3, p4, ut_ref, vt_ref, pcz_ref,
              d_ref, w_ref, cr_ref, cg_ref, cb_ref, cw_ref,
              d_out, w_out, cr_out, cg_out, cb_out, cw_out,
              tile_scratch, ohu_scratch, meas_scratch, i, mode)


def _body(level_ref, u0_ref, v0_ref, shift_ref, valid_ref, scal_ref,
          p0, p1, p2, p3, p4, ut_ref, vt_ref, pcz_ref,
          d_ref, w_ref, cr_ref, cg_ref, cb_ref, cw_ref,
          d_out, w_out, cr_out, cg_out, cb_out, cw_out,
          tile_scratch, ohu_scratch, meas_scratch, i,
          mode: WeightingFunctionType):
    truncation = scal_ref[0]
    max_dist = scal_ref[1]
    max_weight = scal_ref[2]
    dropoff_eps = scal_ref[3]

    # --- shared 4-plane sampling: one one-hot build per block.
    for j in range(NB):
        valid_j = valid_ref[i * NB + j]

        @pl.when(valid_j == 0)
        def _(j=j):
            for ch in range(NC):
                meas_scratch[ch, j:j + 1] = jnp.zeros((1, V), jnp.float32)

        @pl.when(valid_j > 0)
        def _(j=j):
            level = level_ref[i * NB + j]
            u0 = pl.multiple_of(u0_ref[i * NB + j], 128)
            v0 = pl.multiple_of(v0_ref[i * NB + j], 8)
            for lvl, ref in enumerate((p0, p1, p2, p3, p4)):
                @pl.when(level == lvl)
                def _():
                    for ch in range(NC):
                        tile_scratch[ch] = ref[ch, pl.ds(v0, TILE_V),
                                               pl.ds(u0, TILE_U)]
            sh = shift_ref[i * NB + j]
            ut = ut_ref[j:j + 1]
            vt = vt_ref[j:j + 1]
            iota_v = jax.lax.broadcasted_iota(jnp.int32, (TILE_V, V), 0)
            # One offset-write one-hot feeds all four channel dots
            # (tsdf_pallas.write_window_onehot: no in-kernel roll).
            write_window_onehot(ohu_scratch, ut, sh)
            ohv = (iota_v == vt).astype(jnp.float32)
            for ch in range(NC):
                tmp = jnp.dot(tile_scratch[ch], ohu_scratch[:, :],
                              preferred_element_type=jnp.float32)
                meas_scratch[ch, j:j + 1] = jnp.sum(ohv * tmp, axis=0,
                                                    keepdims=True)
            zero_window_onehot(ohu_scratch, sh)

    # --- TSDF fusion (ops/tsdf_pallas.py::_tsdf_body semantics, bitwise).
    measured = meas_scratch[0]
    pcz = pcz_ref[:, :]
    samp_ok = ut_ref[:, :] >= 0
    depth_valid = measured > 0.0
    sdf = measured - pcz
    update = (samp_ok & depth_valid
              & (pcz <= max_dist) & (sdf >= -truncation))

    one = jnp.ones_like(pcz)
    inv_sq = 1.0 / jnp.maximum(pcz * pcz, 1e-4)
    dropoff = jnp.clip((truncation + sdf)
                       / jnp.maximum(truncation - dropoff_eps, 1e-6),
                       0.0, 1.0)
    if mode == WeightingFunctionType.CONSTANT:
        w_new = one
    elif mode == WeightingFunctionType.CONSTANT_DROPOFF:
        w_new = dropoff
    elif mode == WeightingFunctionType.INVERSE_SQUARE:
        w_new = inv_sq
    elif mode == WeightingFunctionType.INVERSE_SQUARE_DROPOFF:
        w_new = inv_sq * dropoff
    elif mode == WeightingFunctionType.INVERSE_SQUARE_TSDF_DISTANCE_PENALTY:
        w_new = inv_sq * jnp.clip(1.0 - jnp.abs(sdf)
                                  / jnp.maximum(truncation, 1e-6), 0.0, 1.0)
    else:  # LINEAR_WITH_MAX
        w_new = jnp.minimum(one, 1.0 / jnp.maximum(pcz, 1e-4))
    w_new = jnp.where(update, w_new, 0.0)

    d_old = d_ref[:, :]
    w_old = w_ref[:, :]
    w_sum = w_old + w_new
    d_fused = jnp.where(
        w_sum > 1e-6,
        (d_old * w_old + jnp.minimum(sdf, truncation) * w_new)
        / jnp.maximum(w_sum, 1e-6), d_old)
    w_fused = jnp.minimum(w_sum, max_weight)

    d_upd = jnp.where(update, d_fused, d_old)
    w_upd = jnp.where(update, w_fused, w_old)
    d_out[:, :] = d_upd
    w_out[:, :] = w_upd

    # --- color fusion (ops/color_pallas.py semantics) against the POST-
    # update TSDF rows (sequential parity: the scan's color branch reads
    # the channels the TSDF pass just wrote).
    z = pcz
    near_surface = (w_upd > 1e-6) & (jnp.abs(d_upd) <= truncation)
    not_occluded = (measured > 0.0) & (z <= measured + truncation)
    c_update = (samp_ok & near_surface & (z <= max_dist) & not_occluded)

    dropoff_c = jnp.clip(truncation
                         / jnp.maximum(truncation - dropoff_eps, 1e-6),
                         0.0, 1.0)
    if mode == WeightingFunctionType.CONSTANT:
        cw_new = one
    elif mode == WeightingFunctionType.CONSTANT_DROPOFF:
        cw_new = one * dropoff_c
    elif mode == WeightingFunctionType.INVERSE_SQUARE:
        cw_new = inv_sq
    elif mode == WeightingFunctionType.INVERSE_SQUARE_DROPOFF:
        cw_new = inv_sq * dropoff_c
    elif mode == WeightingFunctionType.INVERSE_SQUARE_TSDF_DISTANCE_PENALTY:
        cw_new = inv_sq   # |sdf| = 0 -> penalty factor 1
    else:  # LINEAR_WITH_MAX
        cw_new = jnp.minimum(one, 1.0 / jnp.maximum(z, 1e-4))
    cw_new = jnp.where(c_update, cw_new, 0.0)

    cw_old = cw_ref[:, :]
    cw_sum = cw_old + cw_new
    inv = 1.0 / jnp.maximum(cw_sum, 1e-6)
    blend_ok = cw_sum > 1e-6
    for meas_ch, c_in, c_out in ((1, cr_ref, cr_out), (2, cg_ref, cg_out),
                                 (3, cb_ref, cb_out)):
        c_old = c_in[:, :]
        c_fused = jnp.where(blend_ok,
                            (c_old * cw_old + meas_scratch[meas_ch] * cw_new)
                            * inv, c_old)
        c_out[:, :] = jnp.where(c_update, c_fused, c_old)
    cw_out[:, :] = jnp.where(c_update, jnp.minimum(cw_sum, max_weight),
                             cw_old)


@functools.partial(
    jax.jit,
    static_argnames=("camera", "voxel_size_m", "params", "interpret"),
    donate_argnums=(0, 1, 2, 3, 4, 5))
def integrate_tsdf_color_pallas(distance, weight, color_r, color_g, color_b,
                                color_weight, slots, block_indices, depth,
                                color_image, T_L_C, *, camera: Camera,
                                voxel_size_m: float,
                                params: TsdfIntegratorParams,
                                interpret: bool = False
                                ) -> Tuple[jnp.ndarray, ...]:
    """Fused drop-in for integrate_tsdf_pallas + integrate_color_pallas on
    one shared (depth-frame) view batch. Requires aligned RGB-D."""
    cap = distance.shape[0]
    H, W = camera.height, camera.width
    assert depth.shape == (H, W), "fused kernel needs aligned RGB-D"
    slots, block_indices = pad_batch(slots, block_indices, cap)
    N = slots.shape[0]

    depth_c = jnp.where(jnp.isfinite(depth), depth, 0.0)
    color_image = color_image.astype(jnp.float32)
    planes = jnp.stack([depth_c, color_image[..., 0], color_image[..., 1],
                        color_image[..., 2]])                  # (4, H, W)
    levels = build_decimation_levels(planes)
    levels = [jnp.pad(l, ((0, 0), (0, max(0, TILE_V - l.shape[1])),
                          (0, max(0, TILE_U - l.shape[2]))))
              if (l.shape[1] < TILE_V or l.shape[2] < TILE_U) else l
              for l in levels]

    (level, u0, v0, shift, valid, safe_slots, ut, vt,
     pcz) = footprint_prepass(slots, block_indices, T_L_C, camera=camera,
                              voxel_size_m=voxel_size_m, cap=cap, H=H, W=W)

    scalars = jnp.asarray(
        [params.truncation_m(voxel_size_m),
         params.max_integration_distance_m, params.max_weight,
         voxel_size_m], jnp.float32)

    rows = [ch[safe_slots] for ch in (distance, weight, color_r, color_g,
                                      color_b, color_weight)]

    def _blk(i, *_prefetch):
        return (i, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,   # level/u0/v0/shift/valid
        grid=(N // NB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]      # scalars
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * N_LEVELS  # plane levels
        + [pl.BlockSpec((NB, V), _blk, memory_space=pltpu.VMEM)] * 9,
        out_specs=[pl.BlockSpec((NB, V), _blk, memory_space=pltpu.VMEM)] * 6,
        scratch_shapes=[
            pltpu.VMEM((NC, TILE_V, TILE_U), jnp.float32),  # sampling tiles
            pltpu.VMEM((OHU_ROWS, V), jnp.float32),         # embedded one-hot
            pltpu.VMEM((NC, NB, V), jnp.float32),           # sampled planes
        ],
    )

    kernel = functools.partial(_kernel, mode=params.weighting_mode)
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((N, V), jnp.float32)] * 6,
        input_output_aliases={14: 0, 15: 1, 16: 2, 17: 3, 18: 4, 19: 5},
        interpret=interpret,
    )(level, u0, v0, shift, valid, scalars, *levels, ut, vt, pcz, *rows)

    chans = (distance, weight, color_r, color_g, color_b, color_weight)
    return tuple(ch.at[slots].set(o, mode="drop")
                 for ch, o in zip(chans, outs))
