"""Pallas TPU kernel for freespace-driven dynamic-pixel detection.

The XLA detector (`mapper/multi_mapper.py::_detect_dynamic_fused`) looks up
the high-confidence-freespace bit of every depth pixel's endpoint voxel —
TWO element gathers per pixel (slot_grid + channel), ~6.6 ms/VGA frame on
v5e (measured, tools/ablate_dynamics.py) against the reference's 1.7 ms for
its ENTIRE dynamics stack (reference behavior: depth points landing inside
high-confidence freespace are dynamic — nvblox_node.cpp:1057-1147,
dynamics detection per SURVEY.md §2.1 "Freespace integrator").

TPU-native reformulation — run the lookup in the *voxel* direction and
scatter to pixels with the MXU (zero gathers):

  * batch = allocated blocks in the depth footprint (view_batch, no alloc);
  * per block, sample the depth image at each voxel's nearest decimated
    pixel with the SAME separable one-hot machinery as the TSDF kernel
    (footprint window, rolled tile, one-hot matmuls);
  * a voxel is a *dynamic endpoint* iff it is high-confidence freespace AND
    the sampled depth's backprojected point lands inside that exact voxel
    (no half-voxel slop, so static surfaces adjacent to freespace are NOT
    over-detected). The containment test is precomputed OUTSIDE the kernel
    as a per-voxel depth interval [d_lo, d_hi) — the backprojected point
    is affine in the sampled depth, so each voxel-bound check is a
    d-interval; the kernel compares the sampled d against two rows
    instead of running the 30-op backproject chain on (1, 512) shapes;
  * dynamic voxels mark their pixel via the TRANSPOSED one-hots:
        M[r, c] = sum_v ohv[r, v] * dyn[v] * ohu[c, v]
    one more MXU matmul per block, accumulated into per-level mask images
    resident in VMEM across the whole grid;
  * per-level masks are dilated by one decimated pixel (a voxel's footprint
    spans up to ~2 decimated pixels but one-hot sampling marks only the
    nearest — the dilation closes those coverage holes) and max-upsampled
    to full resolution.

The mask is therefore *voxel-granular* (granularity = the marking voxel's
projected footprint) rather than pixel-exact like the gather path — which
matches how the mask is consumed: it splits integration into voxel-granular
static/dynamic maps. Blocks with no high-confidence voxels skip all math
(scalar-prefetch whole-program skip).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from isaac_ros_nvblox_tpu.models.camera import Camera
from isaac_ros_nvblox_tpu.ops.tsdf_pallas import (N_LEVELS, OHU_ROWS, TILE_U,
                                                  TILE_V, UW, V, NB,
                                                  footprint_prepass,
                                                  pad_batch,
                                                  write_window_onehot,
                                                  zero_window_onehot)


def _level_shapes(H: int, W: int):
    """Padded per-level mask-image shapes, mirroring footprint_prepass's
    level geometry (w_l/h_l floors at the tile size)."""
    shapes = []
    for l in range(N_LEVELS):
        h_l = max((H + (1 << l) - 1) >> l, TILE_V)
        w_l = max((W + (1 << l) - 1) >> l, TILE_U)
        shapes.append((((h_l + 7) // 8) * 8, ((w_l + 127) // 128) * 128))
    return shapes


def _kernel(level_ref, u0_ref, v0_ref, shift_ref, active_ref,
            p0, p1, p2, p3, p4, ut_ref, vt_ref, dlo_ref, dhi_ref, hc_ref,
            m0, m1, m2, m3, m4, tile_scratch, ohu_scratch, *,
            mask_shapes):
    i = pl.program_id(0)
    outs = (m0, m1, m2, m3, m4)

    @pl.when(i == 0)
    def _():
        ohu_scratch[:, :] = jnp.zeros((OHU_ROWS, V), jnp.float32)
        for lvl in range(N_LEVELS):
            outs[lvl][:, :] = jnp.zeros(mask_shapes[lvl], jnp.float32)

    nact = active_ref[i * NB]
    for j in range(1, NB):
        nact = nact + active_ref[i * NB + j]

    @pl.when(nact > 0)
    def _():
        for j in range(NB):
            @pl.when(active_ref[i * NB + j] > 0)
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
                d = jnp.sum(ohv * tmp, axis=0, keepdims=True)   # (1, V)

                # Containment as a precomputed per-voxel depth interval
                # (r5): the sampled point lands inside THIS voxel iff
                # d in [d_lo, d_hi) — the whole backproject+rotate+bounds
                # chain (~30 (1,512) VPU ops/block, 7/8 sublanes wasted)
                # is batched (N, V) XLA outside the kernel.
                dyn = (hc_ref[j:j + 1]
                       * ((ut >= 0) & (d >= dlo_ref[j:j + 1])
                          & (d < dhi_ref[j:j + 1])).astype(jnp.float32))

                # Transposed one-hot scatter: M[r, c] = sum_v ohv*dyn*ohu.
                # With the 256-row tile-space one-hot, M's columns map
                # DIRECTLY to image cols [u0, u0+256): one 128-aligned
                # strip RMW, no roll at all (the old full-image-width
                # pad+roll+RMW cost ~6x more VPU work per block at
                # level 0 and dominated the kernel).
                M = jax.lax.dot_general(
                    ohv * dyn, ohu_scratch[:, :],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # (TILE_V, 256)
                for lvl in range(N_LEVELS):
                    @pl.when(level == lvl)
                    def _(lvl=lvl):
                        prev = outs[lvl][pl.ds(v0, TILE_V),
                                         pl.ds(u0, TILE_U)]
                        outs[lvl][pl.ds(v0, TILE_V), pl.ds(u0, TILE_U)] = \
                            jnp.maximum(prev, M)
                zero_window_onehot(ohu_scratch, sh)


@functools.partial(
    jax.jit,
    static_argnames=("camera", "voxel_size_m", "max_depth_m", "interpret"))
def detect_dynamic_pallas(state, high_confidence, depth, T_L_C, slots,
                          block_indices, *, camera: Camera,
                          voxel_size_m: float, max_depth_m: float,
                          interpret: bool = False) -> jnp.ndarray:
    """Dynamic-pixel mask (bool[H, W]) — gather-free Pallas path.

    `slots`/`block_indices`: allocated blocks in the depth footprint
    (wg.view_batch over touched_block_grid; endpoint blocks are a subset).
    Semantics parity: `_detect_dynamic_fused` (multi_mapper.py), at voxel
    granularity (see module docstring).
    """
    cap = high_confidence.shape[0]
    H, W = depth.shape
    slots, block_indices = pad_batch(slots, block_indices, cap)
    N = slots.shape[0]

    from isaac_ros_nvblox_tpu.ops.tsdf_pallas import build_decimation_levels
    depth = jnp.where(jnp.isfinite(depth), depth, 0.0)
    levels = build_decimation_levels(depth)
    levels = [jnp.pad(l, ((0, max(0, TILE_V - l.shape[0])),
                          (0, max(0, TILE_U - l.shape[1]))))
              if (l.shape[0] < TILE_V or l.shape[1] < TILE_U) else l
              for l in levels]

    (level, u0, v0, shift, valid, safe_slots, ut, vt,
     pcz) = footprint_prepass(slots, block_indices, T_L_C, camera=camera,
                              voxel_size_m=voxel_size_m, cap=cap, H=H, W=W)

    # Reconstructed full-resolution sample pixel (the decimated grid point
    # the one-hot sampled: decimated (i, j) <-> full-res (i*2^l, j*2^l)).
    scale_up = jnp.exp2(level.astype(jnp.float32))[:, None]
    u_px = (ut + shift[:, None] + u0[:, None]).astype(jnp.float32) * scale_up
    v_px = (vt + v0[:, None]).astype(jnp.float32) * scale_up

    # Voxel centers in voxel units (for the exact containment test).
    lane = jnp.arange(V, dtype=jnp.int32)[None, :]
    bi = block_indices.astype(jnp.float32)
    cxv = bi[:, 0:1] * 8.0 + (lane // 64).astype(jnp.float32) + 0.5
    cyv = bi[:, 1:2] * 8.0 + ((lane // 8) % 8).astype(jnp.float32) + 0.5
    czv = bi[:, 2:3] * 8.0 + (lane % 8).astype(jnp.float32) + 0.5

    # Containment -> per-voxel depth interval (r5): the backprojected
    # point along the sampled pixel's ray is p(d) = (pxs d, pys d, d) in
    # camera, so each local voxel coordinate is affine in d:
    # l_i(d) = a_i d + b_i (voxel units). |l_i - c_i| within the +-0.5
    # bound is a d-interval per axis; their intersection with (0, maxd]
    # and the behind-camera guard leaves the kernel two compares per
    # voxel. (Interval endpoints round through a division, so voxels
    # exactly ON a face boundary may flip vs the direct affine test —
    # below the kernel's voxel-granular contract; see module docstring.)
    vs = jnp.float32(voxel_size_m)
    R = T_L_C[:3, :3].astype(jnp.float32)
    t = T_L_C[:3, 3].astype(jnp.float32)
    pxs = (u_px - camera.cx) / camera.fx          # (N, V)
    pys = (v_px - camera.cy) / camera.fy
    INFP = jnp.float32(3e38)
    d_lo = jnp.full_like(pxs, 1e-6)               # d > 0
    d_hi = jnp.full_like(pxs, np.nextafter(np.float32(max_depth_m),
                                           np.float32(np.inf)))  # d <= maxd
    for a_i, b_i, c_i in (
            (R[0, 0] * pxs + R[0, 1] * pys + R[0, 2], t[0] / vs, cxv),
            (R[1, 0] * pxs + R[1, 1] * pys + R[1, 2], t[1] / vs, cyv),
            (R[2, 0] * pxs + R[2, 1] * pys + R[2, 2], t[2] / vs, czv)):
        a_i = a_i / vs
        lo_raw = (c_i - 0.5) - b_i                # bounds on a_i * d
        hi_raw = (c_i + 0.5) - b_i
        pos = a_i > 0
        zero = a_i == 0
        inv = jnp.where(zero, 1.0, 1.0 / jnp.where(zero, 1.0, a_i))
        lo_i = jnp.where(pos, lo_raw * inv, hi_raw * inv)
        hi_i = jnp.where(pos, hi_raw * inv, lo_raw * inv)
        # a == 0: the condition is d-independent — keep or empty.
        static_ok = (lo_raw <= 0.0) & (0.0 < hi_raw)
        lo_i = jnp.where(zero, jnp.where(static_ok, -INFP, INFP), lo_i)
        hi_i = jnp.where(zero, jnp.where(static_ok, INFP, -INFP), hi_i)
        d_lo = jnp.maximum(d_lo, lo_i)
        d_hi = jnp.minimum(d_hi, hi_i)
    # Behind-camera guard (voxel-center camera z from the prepass).
    d_hi = jnp.where(pcz > 0.0, d_hi, -INFP)

    hc_rows = high_confidence[safe_slots].astype(jnp.float32)
    active = (valid > 0) & jnp.any(hc_rows > 0, axis=1)
    active = active.astype(jnp.int32)

    mask_shapes = tuple(_level_shapes(H, W))

    def _blk(i, *_prefetch):
        return (i, 0)

    def _full(i, *_prefetch):
        return (0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,   # level/u0/v0/shift/active
        grid=(N // NB,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * N_LEVELS
        + [pl.BlockSpec((NB, V), _blk, memory_space=pltpu.VMEM)] * 5,
        out_specs=[pl.BlockSpec(mask_shapes[l], _full,
                                memory_space=pltpu.VMEM)
                   for l in range(N_LEVELS)],
        scratch_shapes=[
            pltpu.VMEM((TILE_V, TILE_U), jnp.float32),
            pltpu.VMEM((OHU_ROWS, V), jnp.float32),
        ],
    )

    kernel = functools.partial(_kernel, mask_shapes=mask_shapes)
    masks = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(mask_shapes[l], jnp.float32)
                   for l in range(N_LEVELS)],
        interpret=interpret,
    )(level, u0, v0, shift, active, *levels, ut, vt,
      d_lo.astype(jnp.float32), d_hi.astype(jnp.float32), hc_rows)

    # Per-level closing dilation (one-hot marks only each voxel's nearest
    # decimated pixel; footprints span up to ~2), then max-upsample.
    full = jnp.zeros((H, W), jnp.float32)
    for l in range(N_LEVELS):
        h_l = (H + (1 << l) - 1) >> l
        w_l = (W + (1 << l) - 1) >> l
        m = jax.lax.reduce_window(masks[l], -jnp.inf, jax.lax.max,
                                  (3, 3), (1, 1), "SAME")[:h_l, :w_l]
        if l > 0:
            m = jnp.repeat(jnp.repeat(m, 1 << l, axis=0), 1 << l,
                           axis=1)[:H, :W]
        full = jnp.maximum(full, m)
    return (full > 0.5) & (depth > 0.0) & (depth <= max_depth_m)


@functools.partial(
    jax.jit,
    static_argnames=("camera", "voxel_size_m", "max_depth_m", "max_blocks",
                     "interpret"))
def detect_dynamic_fused_pallas(state, high_confidence, depth, T_L_C, *,
                                camera: Camera, voxel_size_m: float,
                                max_depth_m: float, max_blocks: int,
                                interpret: bool = False) -> jnp.ndarray:
    """depth footprint -> endpoint-block batch -> detection kernel, one
    program. The drop-in gather-free replacement for
    `_detect_dynamic_fused` (no allocation — view_batch only).

    The batch is pre-filtered to *endpoint* blocks: a block can contain
    depth endpoints only if its camera-depth span intersects the measured
    depth range over its pixel footprint (coarse min/max depth pyramids,
    one-hot sampled — zero gathers). Everything else in the frustum (free
    space the rays pass through, occluded blocks) skips the kernel body via
    the scalar-prefetch `active` flag.
    """
    from isaac_ros_nvblox_tpu.core import world_grid as wg
    from isaac_ros_nvblox_tpu.core.types import Transform, block_size_m
    from isaac_ros_nvblox_tpu.ops import view as view_ops

    grid, origin = view_ops.touched_block_grid(
        depth, T_L_C, camera=camera, voxel_size_m=voxel_size_m,
        max_distance_m=max_depth_m, truncation_m=2.0 * voxel_size_m)
    slots, bidx, _ = wg.view_batch(state, grid, origin,
                                   max_blocks=max_blocks)

    # Endpoint filter: project block centers, sample footprint min/max
    # measured depth, keep blocks whose +-half-diagonal depth span overlaps.
    bs = block_size_m(voxel_size_m)
    centers = (bidx.astype(jnp.float32) + 0.5) * bs
    T_C_L = Transform.inverse(T_L_C)
    c_C = centers @ T_C_L[:3, :3].T + T_C_L[:3, 3]
    z = c_C[:, 2]
    zs = jnp.where(z > 1e-6, z, 1.0)
    u = camera.fx * c_C[:, 0] / zs + camera.cx
    v = camera.fy * c_C[:, 1] / zs + camera.cy
    fp = max(camera.fx, camera.fy) * bs / jnp.maximum(z, 1e-6)
    mind, maxd_w = view_ops.footprint_depth_minmax(depth, u, v, fp)
    half_diag = bs * float(np.sqrt(3.0) / 2.0)
    endpoint = ((z > 0) & (maxd_w > 0.0)
                & (maxd_w >= z - half_diag) & (mind <= z + half_diag))

    cap = high_confidence.shape[0]
    slots = jnp.where(endpoint, slots, cap)   # padded entries skip
    return detect_dynamic_pallas(
        state, high_confidence, depth, T_L_C, slots, bidx, camera=camera,
        voxel_size_m=voxel_size_m, max_depth_m=max_depth_m,
        interpret=interpret)
