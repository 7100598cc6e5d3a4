"""Pallas TPU kernel for projective color integration.

The XLA color integrator (ops/color.py) samples the color image and the
occlusion depth with per-voxel element gathers (`image[v, u]` over
[N, 512] coords) — ~1M gathers/frame at the TPU's ~115 M elem/s, i.e.
~10+ ms for a cost the reference covers in 0.7 ms (BASELINE.md color row;
color_integrator behavior per SURVEY.md §2.1 "Projective color
integrator", call-site nvblox_node.cpp:1260-1265).

Same design as the TSDF v3 kernel (ops/tsdf_pallas.py): an XLA pre-pass
computes per-block tile parameters (decimation level, 128-aligned tile
origin, footprint-window shift) and per-voxel window coordinates; the
kernel rolls the footprint window to column 0 and samples via separable
one-hot MXU matmuls. Color adds THREE more sampled channels (r, g, b
planes alongside the occlusion depth) which all share ONE one-hot build
per block — the dominant VPU cost amortizes 4x. Requires the occlusion
depth to share the color camera's resolution (the aligned-RGBD case);
callers fall back to the XLA path otherwise.
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
from isaac_ros_nvblox_tpu.ops.tsdf_pallas import (N_LEVELS, OHU_ROWS, TILE_U,
                                                  TILE_V, UW, V, NB,
                                                  write_window_onehot,
                                                  zero_window_onehot)

NC = 4   # sampled channels: r, g, b, occlusion depth


def _kernel(level_ref, u0_ref, v0_ref, shift_ref, valid_ref, scal_ref,
            p0, p1, p2, p3, p4, ut_ref, vt_ref, pcz_ref,
            d_vox_ref, w_vox_ref, cr_ref, cg_ref, cb_ref, cw_ref,
            cr_out, cg_out, cb_out, cw_out,
            tile_scratch, ohu_scratch, meas_scratch, *,
            mode: WeightingFunctionType):
    """Eight blocks: shared one-hot, 4-channel sampling, (8,512) fusion."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        ohu_scratch[:, :] = jnp.zeros((OHU_ROWS, V), jnp.float32)

    truncation = scal_ref[0]
    max_dist = scal_ref[1]
    max_weight = scal_ref[2]
    dropoff_eps = scal_ref[3]
    has_depth = scal_ref[4]

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

    # --- vectorized fusion on (8, 512) (ops/color.py semantics).
    z = pcz_ref[:, :]
    samp_ok = ut_ref[:, :] >= 0
    d_vox = d_vox_ref[:, :]
    w_vox = w_vox_ref[:, :]
    near_surface = (w_vox > 1e-6) & (jnp.abs(d_vox) <= truncation)
    measured = meas_scratch[3]
    not_occluded = (has_depth < 0.5) | ((measured > 0.0)
                                        & (z <= measured + truncation))
    update = (samp_ok & near_surface & (z <= max_dist) & not_occluded)

    one = jnp.ones_like(z)
    inv_sq = 1.0 / jnp.maximum(z * z, 1e-4)
    # compute_weight with sdf = 0 (ops/tsdf.py::compute_weight).
    dropoff = jnp.clip(truncation
                       / jnp.maximum(truncation - dropoff_eps, 1e-6),
                       0.0, 1.0)
    if mode == WeightingFunctionType.CONSTANT:
        w_new = one
    elif mode == WeightingFunctionType.CONSTANT_DROPOFF:
        w_new = one * dropoff
    elif mode == WeightingFunctionType.INVERSE_SQUARE:
        w_new = inv_sq
    elif mode == WeightingFunctionType.INVERSE_SQUARE_DROPOFF:
        w_new = inv_sq * dropoff
    elif mode == WeightingFunctionType.INVERSE_SQUARE_TSDF_DISTANCE_PENALTY:
        w_new = inv_sq   # |sdf| = 0 -> penalty factor 1
    else:  # LINEAR_WITH_MAX
        w_new = jnp.minimum(one, 1.0 / jnp.maximum(z, 1e-4))
    w_new = jnp.where(update, w_new, 0.0)

    w_old = cw_ref[:, :]
    w_sum = w_old + w_new
    inv = 1.0 / jnp.maximum(w_sum, 1e-6)
    blend_ok = w_sum > 1e-6
    for meas_ch, c_ref_in, c_out in ((0, cr_ref, cr_out), (1, cg_ref, cg_out),
                                     (2, cb_ref, cb_out)):
        c_old = c_ref_in[:, :]
        c_fused = jnp.where(blend_ok,
                            (c_old * w_old + meas_scratch[meas_ch] * w_new)
                            * inv, c_old)
        c_out[:, :] = jnp.where(update, c_fused, c_old)
    cw_out[:, :] = jnp.where(update, jnp.minimum(w_sum, max_weight), w_old)


@functools.partial(
    jax.jit,
    static_argnames=("camera", "voxel_size_m", "params", "interpret"),
    donate_argnums=(0, 1, 2, 3))
def integrate_color_pallas(color_r, color_g, color_b, color_weight,
                           tsdf_distance, tsdf_weight, slots, block_indices,
                           color_image, depth, T_L_C, *, camera: Camera,
                           voxel_size_m: float, params: TsdfIntegratorParams,
                           interpret: bool = False
                           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                      jnp.ndarray]:
    """Drop-in replacement for ops/color.integrate_color_planar on TPU.

    Requires `depth` at the color camera's resolution (pass zeros to skip
    occlusion checking, as the XLA path does)."""
    cap = color_r.shape[0]
    H, W = camera.height, camera.width
    assert depth.shape == (H, W), "pallas color needs aligned RGB-D"
    from isaac_ros_nvblox_tpu.ops.tsdf_pallas import (footprint_prepass,
                                                      pad_batch)
    slots, block_indices = pad_batch(slots, block_indices, cap)
    N = slots.shape[0]

    color_image = color_image.astype(jnp.float32)
    d_valid = jnp.where(jnp.isfinite(depth) & (depth > 0.0), depth, 0.0)
    has_depth = jnp.any(d_valid > 0.0).astype(jnp.float32)
    planes = jnp.stack([color_image[..., 0], color_image[..., 1],
                        color_image[..., 2], d_valid])        # (4, H, W)
    from isaac_ros_nvblox_tpu.ops.tsdf_pallas import build_decimation_levels
    levels = build_decimation_levels(planes)

    (level, u0, v0, shift, valid, safe_slots, ut, vt,
     pcz) = footprint_prepass(slots, block_indices, T_L_C, camera=camera,
                              voxel_size_m=voxel_size_m, cap=cap, H=H, W=W)

    scalars = jnp.asarray(
        [params.truncation_m(voxel_size_m),
         params.max_integration_distance_m, params.max_weight,
         voxel_size_m, 0.0], jnp.float32).at[4].set(has_depth)

    levels = [jnp.pad(l, ((0, 0), (0, max(0, TILE_V - l.shape[1])),
                          (0, max(0, TILE_U - l.shape[2]))))
              if (l.shape[1] < TILE_V or l.shape[2] < TILE_U) else l
              for l in levels]

    d_vox = tsdf_distance[safe_slots]
    w_vox = tsdf_weight[safe_slots]
    cr_b = color_r[safe_slots]
    cg_b = color_g[safe_slots]
    cb_b = color_b[safe_slots]
    cw_b = color_weight[safe_slots]

    def _blk(i, *_prefetch):
        return (i, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,   # level/u0/v0/shift/valid
        grid=(N // NB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]      # scalars
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * N_LEVELS  # image levels
        + [pl.BlockSpec((NB, V), _blk, memory_space=pltpu.VMEM)] * 9,
        out_specs=[pl.BlockSpec((NB, V), _blk, memory_space=pltpu.VMEM)] * 4,
        scratch_shapes=[
            pltpu.VMEM((NC, TILE_V, TILE_U), jnp.float32),  # sampling tiles
            pltpu.VMEM((OHU_ROWS, V), jnp.float32),          # embedded one-hot
            pltpu.VMEM((NC, NB, V), jnp.float32),           # sampled values
        ],
    )

    kernel = functools.partial(_kernel, mode=params.weighting_mode)
    cr_o, cg_o, cb_o, cw_o = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((N, V), jnp.float32)] * 4,
        input_output_aliases={16: 0, 17: 1, 18: 2, 19: 3},
        interpret=interpret,
    )(level, u0, v0, shift, valid, scalars, *levels, ut, vt, pcz,
      d_vox, w_vox, cr_b, cg_b, cb_b, cw_b)

    color_r = color_r.at[slots].set(cr_o, mode="drop")
    color_g = color_g.at[slots].set(cg_o, mode="drop")
    color_b = color_b.at[slots].set(cb_o, mode="drop")
    color_weight = color_weight.at[slots].set(cw_o, mode="drop")
    return color_r, color_g, color_b, color_weight
