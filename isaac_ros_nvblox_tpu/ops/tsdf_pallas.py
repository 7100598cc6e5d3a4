"""Pallas TPU kernel for projective TSDF integration.

The XLA integrator (ops/tsdf.py) is bottlenecked by the per-voxel depth
image lookup: XLA lowers it to an element gather (~115 M elem/s on v5e), so
~2M samples cost ~20 ms. TPUs have no gather hardware — but they have an
MXU, and a gather is a one-hot matmul.

Kernel design (one program per voxel block, sequential TPU grid):
  * the depth image and 4 decimated levels stay VMEM-resident across the
    whole grid (constant index maps; ~1.6 MB total);
  * per block, a 32x32 tile containing the block's projected footprint is
    sliced from the decimation level whose tile covers the footprint
    (sampling stride 2^level is at most ~half the voxel's own angular
    footprint, so nothing below the voxel scale is lost);
  * per-voxel sampling is **separable one-hot**: with OHU[c,v] = (u_v == c)
    and OHV[r,v] = (v_v == r),
        measured[v] = sum_r OHV[r,v] * (tile @ OHU)[r,v]
    — one 32x32x512 MXU matmul + a masked sublane reduce. Zero gathers,
    zero lane reshuffles;
  * TSDF fusion math runs on the VPU; pool rows are read and written
    **in place** via scalar-prefetched slot index maps with input/output
    aliasing — no XLA-side gather/scatter of pool rows. Padding programs
    rewrite row 0 unchanged (benign: the TPU grid is sequential).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from isaac_ros_nvblox_tpu.core.types import Transform
from isaac_ros_nvblox_tpu.models.camera import Camera
from isaac_ros_nvblox_tpu.ops.tsdf import TsdfIntegratorParams, WeightingFunctionType

TILE_V = 32        # tile rows (pixels at the chosen level)
TILE_U = 256       # tile cols: 2 x 128; with u0 = round(uc/128)*128 - 128
                   # the footprint center sits within [u0+64, u0+192), so
                   # both margins are >= 64 px >> the <=16 px footprint
                   # (lane-dim slice origins must be 128-aligned on TPU)
N_LEVELS = 5       # decimation levels 0..4 (footprints up to ~512 px)
V = 512


def _kernel(slots_ref, level_ref, u0_ref, v0_ref, valid_ref,
            bx_ref, by_ref, bz_ref, scal_ref, p0, p1, p2, p3, p4,
            d_ref, w_ref, d_out, w_out, tile_scratch, *,
            mode: WeightingFunctionType):
    """One block: tile slice -> separable one-hot sampling -> fused update."""
    i = pl.program_id(0)
    level = level_ref[i]
    u0 = u0_ref[i]
    v0 = v0_ref[i]
    valid_blk = valid_ref[i]
    bx = bx_ref[i]
    by = by_ref[i]
    bz = bz_ref[i]

    # Padding programs (slots >= capacity, valid == 0) skip all sampling
    # and fusion work — they only rewrite their (row 0) block unchanged.
    # The view batch is padded to a static max_blocks, but typical frames
    # touch ~1/3 of that; predicating the tile copy + MXU matmul on
    # validity makes the padded tail nearly free.
    @pl.when(valid_blk == 0)
    def _():
        d_out[0] = d_ref[0]
        w_out[0] = w_ref[0]

    @pl.when(valid_blk > 0)
    def _():
        _kernel_body(level, u0, v0, bx, by, bz, scal_ref,
                     (p0, p1, p2, p3, p4), d_ref, w_ref, d_out, w_out,
                     tile_scratch, mode=mode)


def _kernel_body(level, u0, v0, bx, by, bz, scal_ref, pyramid,
                 d_ref, w_ref, d_out, w_out, tile_scratch, *,
                 mode: WeightingFunctionType):
    r00, r01, r02, t0 = scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[3]
    r10, r11, r12, t1 = scal_ref[4], scal_ref[5], scal_ref[6], scal_ref[7]
    r20, r21, r22, t2 = scal_ref[8], scal_ref[9], scal_ref[10], scal_ref[11]
    fx, fy, cx, cy = scal_ref[12], scal_ref[13], scal_ref[14], scal_ref[15]
    voxel_size = scal_ref[16]
    truncation = scal_ref[17]
    max_dist = scal_ref[18]
    max_weight = scal_ref[19]
    dropoff_eps = scal_ref[20]
    img_w = scal_ref[21]
    img_h = scal_ref[22]

    # Copy the sampling tile from the selected level (VMEM->VMEM slice).
    # v0 is 8-aligned (sublanes), u0 is 128-aligned (lanes) — Mosaic
    # dynamic-slice constraints; assert the alignment to the compiler.
    v0a = pl.multiple_of(v0, 8)
    u0a = pl.multiple_of(u0, 128)
    for lvl, ref in enumerate(pyramid):
        @pl.when(level == lvl)
        def _():
            tile_scratch[:, :] = ref[pl.ds(v0a, TILE_V), pl.ds(u0a, TILE_U)]

    # Voxel centers in the layer frame; lanes laid out (x*64 + y*8 + z).
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1)
    lx = (lane // 64).astype(jnp.float32)
    ly = ((lane // 8) % 8).astype(jnp.float32)
    lz = (lane % 8).astype(jnp.float32)
    wx = (bx.astype(jnp.float32) * 8.0 + lx + 0.5) * voxel_size
    wy = (by.astype(jnp.float32) * 8.0 + ly + 0.5) * voxel_size
    wz = (bz.astype(jnp.float32) * 8.0 + lz + 0.5) * voxel_size

    # Camera frame + projection.
    pcx = r00 * wx + r01 * wy + r02 * wz + t0
    pcy = r10 * wx + r11 * wy + r12 * wz + t1
    pcz = r20 * wx + r21 * wy + r22 * wz + t2
    z_safe = jnp.where(pcz > 1e-6, pcz, 1.0)
    u = fx * pcx / z_safe + cx
    v = fy * pcy / z_safe + cy
    in_view = ((pcz > 1e-6) & (u >= 0.0) & (u <= img_w - 1.0)
               & (v >= 0.0) & (v <= img_h - 1.0))

    # Tile-space nearest cell.
    inv_scale = 1.0 / jnp.exp2(level.astype(jnp.float32))
    ut = jnp.round(u * inv_scale).astype(jnp.int32) - u0   # (1, V)
    vt = jnp.round(v * inv_scale).astype(jnp.int32) - v0
    in_tile = (ut >= 0) & (ut < TILE_U) & (vt >= 0) & (vt < TILE_V)
    ut = jnp.where(in_tile, ut, -1)
    vt = jnp.where(in_tile, vt, -1)

    # Separable one-hot sampling on the MXU.
    iota_u = jax.lax.broadcasted_iota(jnp.int32, (TILE_U, V), 0)
    iota_v = jax.lax.broadcasted_iota(jnp.int32, (TILE_V, V), 0)
    ohu = (iota_u == ut).astype(jnp.float32)               # (TILE_U, V)
    ohv = (iota_v == vt).astype(jnp.float32)               # (TILE_V, V)
    tmp = jnp.dot(tile_scratch[:, :], ohu,
                  preferred_element_type=jnp.float32)       # (TILE_V, V)
    measured = jnp.sum(ohv * tmp, axis=0, keepdims=True)    # (1, V)

    depth_valid = measured > 0.0
    sdf = measured - pcz
    update = (in_view & in_tile & depth_valid
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

    d_old = d_ref[0]   # (1, V)
    w_old = w_ref[0]
    w_sum = w_old + w_new
    d_fused = jnp.where(
        w_sum > 1e-6,
        (d_old * w_old + jnp.minimum(sdf, truncation) * w_new)
        / jnp.maximum(w_sum, 1e-6), d_old)
    w_fused = jnp.minimum(w_sum, max_weight)

    d_out[0] = jnp.where(update, d_fused, d_old)
    w_out[0] = jnp.where(update, w_fused, w_old)


@functools.partial(
    jax.jit,
    static_argnames=("camera", "voxel_size_m", "params", "interpret"),
    donate_argnums=(0, 1))
def integrate_tsdf_pallas(distance, weight, slots, block_indices, depth,
                          T_L_C, *, camera: Camera, voxel_size_m: float,
                          params: TsdfIntegratorParams,
                          interpret: bool = False
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for ops/tsdf.integrate_tsdf on TPU."""
    cap = distance.shape[0]
    N = slots.shape[0]

    # Decimated pyramid levels (sampling semantics -> strided views).
    depth = jnp.where(jnp.isfinite(depth), depth, 0.0)
    levels = [depth[:: 2 ** l, :: 2 ** l] for l in range(N_LEVELS)]
    H, W = depth.shape

    # Per-block tile parameters (vectorized XLA pre-pass).
    bs = voxel_size_m * 8.0
    centers = (block_indices.astype(jnp.float32) + 0.5) * bs
    T_C_L = Transform.inverse(T_L_C)
    c_C = centers @ T_C_L[:3, :3].T + T_C_L[:3, 3]
    z = jnp.maximum(c_C[:, 2], 1e-3)
    fp = max(camera.fx, camera.fy) * bs / z
    # Footprint must fit the tile rows minus alignment slack (half).
    level = jnp.clip(jnp.ceil(jnp.log2(fp / (TILE_V * 0.5))), 0,
                     N_LEVELS - 1).astype(jnp.int32)
    scale = jnp.exp2(-level.astype(jnp.float32))
    uc = camera.fx * c_C[:, 0] / z + camera.cx
    vc = camera.fy * c_C[:, 1] / z + camera.cy
    dims_w = jnp.asarray([max((W + (1 << l) - 1) >> l, TILE_U)
                          for l in range(N_LEVELS)])
    dims_h = jnp.asarray([max((H + (1 << l) - 1) >> l, TILE_V)
                          for l in range(N_LEVELS)])
    w_l = dims_w[level]
    h_l = dims_h[level]
    # Aligned tile origins (Mosaic dynamic-slice constraints): v0 8-aligned
    # with the footprint centered in 32 rows (level guarantees fp <= 16 px,
    # slack >= 8 px either side); u0 128-aligned with 384 columns, which
    # covers [uc-128, uc+128) regardless of alignment.
    v0 = jnp.clip((vc * scale).astype(jnp.int32) - TILE_V // 2, 0,
                  h_l - TILE_V)
    v0 = (v0 // 8) * 8
    u0 = (jnp.round(uc * scale / 128.0).astype(jnp.int32) - 1) * 128
    u0 = jnp.clip(u0, 0, w_l - TILE_U)
    valid = (slots < cap).astype(jnp.int32)
    safe_slots = jnp.where(slots < cap, slots, 0)

    prefetch = [safe_slots.astype(jnp.int32), level, u0, v0, valid,
                block_indices[:, 0].astype(jnp.int32),
                block_indices[:, 1].astype(jnp.int32),
                block_indices[:, 2].astype(jnp.int32)]

    scalars = jnp.concatenate([
        T_C_L[:3, :4].reshape(-1),
        jnp.asarray([camera.fx, camera.fy, camera.cx, camera.cy,
                     voxel_size_m, params.truncation_m(voxel_size_m),
                     params.max_integration_distance_m, params.max_weight,
                     voxel_size_m, float(W), float(H)], jnp.float32),
    ]).astype(jnp.float32)  # [23]

    # Pad small levels up to the tile size.
    levels = [jnp.pad(l, ((0, max(0, TILE_V - l.shape[0])),
                          (0, max(0, TILE_U - l.shape[1]))))
              if (l.shape[0] < TILE_V or l.shape[1] < TILE_U) else l
              for l in levels]

    d3 = distance.reshape(cap, 1, V)
    w3 = weight.reshape(cap, 1, V)

    def _row(i, slots_p, *_rest):
        return (slots_p[i], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,   # slot/level/u0/v0/valid/bx/by/bz
        grid=(N,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # scalars (full)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # p0 (full, resident)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # p1
            pl.BlockSpec(memory_space=pltpu.VMEM),   # p2
            pl.BlockSpec(memory_space=pltpu.VMEM),   # p3
            pl.BlockSpec(memory_space=pltpu.VMEM),   # p4
            pl.BlockSpec((1, 1, V), _row,
                         memory_space=pltpu.VMEM),   # distance row
            pl.BlockSpec((1, 1, V), _row,
                         memory_space=pltpu.VMEM),   # weight row
        ],
        out_specs=[
            pl.BlockSpec((1, 1, V), _row, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, V), _row, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE_V, TILE_U), jnp.float32),  # sampling tile
        ],
    )

    kernel = functools.partial(_kernel, mode=params.weighting_mode)
    d_out, w_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(d3.shape, jnp.float32),
                   jax.ShapeDtypeStruct(w3.shape, jnp.float32)],
        input_output_aliases={14: 0, 15: 1},  # distance/weight in-place
        interpret=interpret,
    )(*prefetch, scalars, *levels, d3, w3)
    return d_out.reshape(cap, V), w_out.reshape(cap, V)
