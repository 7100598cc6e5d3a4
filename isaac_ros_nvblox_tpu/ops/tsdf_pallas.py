"""Pallas TPU kernel for projective TSDF integration.

The XLA integrator (ops/tsdf.py) is bottlenecked by the per-voxel depth
image lookup: XLA lowers it to an element gather (~115 M elem/s on v5e), so
~2M samples cost ~20 ms. TPUs have no gather hardware — but they have an
MXU, and a gather is a one-hot matmul.

Kernel design (round 2, v3 — 8 blocks per program, footprint-centred
window):
  * XLA pre-pass (fused elementwise, no gathers) computes per-voxel
    tile-space sample coordinates `ut/vt` (-1 = invalid) and camera-frame
    depth `pcz` for the whole batch, plus per-block tile parameters
    (decimation level, 128-aligned tile origin, footprint window shift);
  * batch pool rows are gathered once as contiguous ROW gathers
    (fast on TPU — element gathers are not), the kernel runs on dense
    (8, 512) blocks, and results scatter back by row;
  * one program handles EIGHT voxel blocks: all fusion math runs on
    (8, 512) arrays (full 8x128 vreg utilization — the v1 kernel's
    (1, 512) ops wasted 7/8 sublanes and its per-program overhead
    dominated: measured 1.7 of 2.0 ms with sampling disabled);
  * per block, a 32x256 tile of the decimation level whose cell size
    covers the block's footprint is sliced into VMEM, then **rotated so
    the 32-px footprint window starts at column 0** (pltpu.roll with a
    dynamic shift — lane-dim dynamic slices must be 128-aligned, rolls
    need not) and sliced to 128 lanes. Per-voxel sampling is separable
    one-hot on the MXU:
        measured[v] = sum_r OHV[r,v] * (window @ OHU)[r,v]
    with OHU only 32 live rows (embedded in a once-zeroed 128-row
    scratch): the v2 kernel's dominant VPU cost was building a 128-row
    one-hot per block; the window trick cuts the build 4x and halves the
    matmul. Invalid/padding blocks skip the tile copy and the matmul.
    Voxels whose sample falls outside the 32-px window are skipped (no
    update) — same policy as the 32-row v-window, affecting only very
    near, far-off-axis blocks whose per-voxel spread exceeds the block
    footprint estimate.

Reference behavior: ProjectiveTsdfIntegrator (SURVEY.md §2.1) — per-voxel
projective SDF fusion with the 6 weighting functions of
nvblox's WeightingFunction, truncation, max distance/weight.
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
UW = 64            # footprint window width after the quantized roll
                   # (shifts are 32-quantized so the roll is 3 conditional
                   # STATIC lane rotates; the window widens 32->64 to keep
                   # every footprint voxel inside: ut in [7, 57))
OHU_ROWS = 256     # one-hot scratch rows == TILE_U: the contraction runs
                   # over the FULL tile width, with only the UW rows at
                   # sublane offset `shift` live — r5: measured (v5e,
                   # TSDF_FIXED.json) the MXU dot is ~free (nodot delta
                   # 0.01 ms) while ANY in-kernel roll of the tile costs
                   # ~0.1 ms/frame; a dynamic-sublane-offset one-hot write
                   # needs no roll at all (shift is 32-quantized, so the
                   # offset is 8-aligned as Mosaic requires)
N_LEVELS = 5       # decimation levels 0..4 (footprints up to ~512 px)
V = 512
NB = 32            # voxel blocks per program (sublane-dim batching; r5:
                   # 32 halves the per-program fixed cost vs 16 — the
                   # fusion math runs on (32, 512) = four vregs, and the
                   # ~0.5-1 us per-program overhead amortizes over twice
                   # the blocks; VMEM/program stays ~2.5 MB of ~16 MB)


def write_window_onehot(ohu_scratch, ut, sh):
    """Write the footprint-window one-hot into the 256-row scratch at
    sublane offset `sh` (32-quantized => 8-aligned): row c of the scratch
    selects tile column c, and only rows [sh, sh+UW) can be live for this
    block. Returns nothing; callers must zero the same span after their
    dots (zero_window_onehot) so the next block sees a clean scratch.
    Invalid voxels (ut == -1) produce an all-zero one-hot column."""
    iota_u = jax.lax.broadcasted_iota(jnp.int32, (UW, V), 0)
    sh = pl.multiple_of(sh, 32)
    ohu_scratch[pl.ds(sh, UW), :] = (iota_u == ut).astype(jnp.float32)


def zero_window_onehot(ohu_scratch, sh):
    sh = pl.multiple_of(sh, 32)
    ohu_scratch[pl.ds(sh, UW), :] = jnp.zeros((UW, V), jnp.float32)


def _kernel(level_ref, u0_ref, v0_ref, shift_ref, valid_ref, scal_ref,
            p0, p1, p2, p3, p4, ut_ref, vt_ref, pcz_ref, d_ref, w_ref,
            d_out, w_out, tile_scratch, ohu_scratch, meas_scratch, *,
            mode: WeightingFunctionType, ablate: str = ""):
    """Eight blocks: per-block one-hot sampling, vectorized (8,512) fusion."""
    i = pl.program_id(0)

    # One-hot scratch: only rows [0, UW) are ever written per block; the
    # rest stay zero for the whole grid (zeroed once here), so the 128-row
    # contraction only ever sees the live window.
    @pl.when(i == 0)
    def _():
        ohu_scratch[:, :] = jnp.zeros((OHU_ROWS, V), jnp.float32)

    # Whole-program skip: trailing programs of a part-full batch (padding
    # slots) pass their rows through untouched instead of running the
    # sampling loop + fusion math.
    nv = valid_ref[i * NB]
    for j in range(1, NB):
        nv = nv + valid_ref[i * NB + j]

    @pl.when(nv == 0)
    def _():
        d_out[:, :] = d_ref[:, :]
        w_out[:, :] = w_ref[:, :]

    @pl.when(nv > 0)
    def _():
        _tsdf_body(level_ref, u0_ref, v0_ref, shift_ref, valid_ref, scal_ref,
                   p0, p1, p2, p3, p4, ut_ref, vt_ref, pcz_ref, d_ref, w_ref,
                   d_out, w_out, tile_scratch, ohu_scratch, meas_scratch, i,
                   mode, ablate)


def _tsdf_body(level_ref, u0_ref, v0_ref, shift_ref, valid_ref, scal_ref,
               p0, p1, p2, p3, p4, ut_ref, vt_ref, pcz_ref, d_ref, w_ref,
               d_out, w_out, tile_scratch, ohu_scratch, meas_scratch, i,
               mode: WeightingFunctionType, ablate: str = ""):
    truncation = scal_ref[0]
    max_dist = scal_ref[1]
    max_weight = scal_ref[2]
    dropoff_eps = scal_ref[3]

    # --- per-block separable one-hot sampling (MXU) -> meas_scratch rows.
    for j in range(NB if ablate != "nosample" else 0):
        valid_j = valid_ref[i * NB + j]

        @pl.when(valid_j == 0)
        def _(j=j):
            meas_scratch[j:j + 1] = jnp.zeros((1, V), jnp.float32)

        @pl.when(valid_j > 0)
        def _(j=j):
            level = level_ref[i * NB + j]
            u0 = pl.multiple_of(u0_ref[i * NB + j], 128)
            v0 = pl.multiple_of(v0_ref[i * NB + j], 8)
            if ablate != "notile":
                for lvl, ref in enumerate((p0, p1, p2, p3, p4)):
                    @pl.when(level == lvl)
                    def _():
                        tile_scratch[:, :] = ref[pl.ds(v0, TILE_V),
                                                 pl.ds(u0, TILE_U)]
            # Rotate the footprint window to column 0 (dynamic roll: lane
            # slices must be 128-aligned, rolls need not) and keep 128
            # lanes for the contraction.
            sh = shift_ref[i * NB + j]
            ut = ut_ref[j:j + 1]                           # (1, V), in [0,UW)
            vt = vt_ref[j:j + 1]
            iota_v = jax.lax.broadcasted_iota(jnp.int32, (TILE_V, V), 0)
            if ablate != "noonehot":
                write_window_onehot(ohu_scratch, ut, sh)
            ohv = (iota_v == vt).astype(jnp.float32)       # (TILE_V, V)
            if ablate == "nodot":
                tmp = (tile_scratch[:, :1]
                       + jnp.zeros((TILE_V, V), jnp.float32))
            else:
                tmp = jnp.dot(tile_scratch[:, :], ohu_scratch[:, :],
                              preferred_element_type=jnp.float32)
            meas_scratch[j:j + 1] = jnp.sum(ohv * tmp, axis=0, keepdims=True)
            if ablate != "noonehot":
                zero_window_onehot(ohu_scratch, sh)

    # --- vectorized fusion on (8, 512).
    measured = meas_scratch[:, :]
    pcz = pcz_ref[:, :]
    samp_ok = ut_ref[:, :] >= 0     # in view, in tile, valid block
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

    d_out[:, :] = jnp.where(update, d_fused, d_old)
    w_out[:, :] = jnp.where(update, w_fused, w_old)


def _decimation_onehot(n: int):
    """One-hot column-select matrix f32[n, ceil(n/2)]: X @ S == X[:, ::2].

    Lane-dim strided slices ([::2] on the minor axis) lower to cross-lane
    shuffles on TPU — measured ~1 ms/frame for the 5-level pyramid — while
    a one-hot select is an MXU matmul (~free). f32 one-hots keep the
    selection bit-exact.
    """
    m = (n + 1) // 2
    i = jnp.arange(m, dtype=jnp.int32)[None, :]
    j = jnp.arange(n, dtype=jnp.int32)[:, None]
    return (j == 2 * i).astype(jnp.float32)


def build_decimation_levels(img, n_levels: int = N_LEVELS):
    """Nearest-sample decimation pyramid [img, img[::2,::2], ...].

    Row (sublane-dim) striding is a plain strided slice — cheap on TPU;
    only LANE-dim strides lower to cross-lane shuffles (~1 ms/frame for
    the 5-level pyramid, measured r2), so the column striding stays a
    one-hot MXU matmul (bit-exact equal to strided slicing; see
    _decimation_onehot). r5: dropping the row-side matmul halved the
    pyramid's measured cost. `img` may carry leading batch axes (e.g.
    the color kernel's 4 planes)."""
    levels = [img]
    cur = img
    for _ in range(1, n_levels):
        w = cur.shape[-1]
        sw = _decimation_onehot(w)   # (w, w2)
        cur = cur[..., ::2, :]
        cur = jnp.matmul(cur, sw, preferred_element_type=jnp.float32)
        levels.append(cur)
    return levels


def pad_batch(slots, block_indices, cap: int):
    """Pad a view batch to a multiple of NB (padding slots carry `cap`)."""
    N = slots.shape[0]
    N8 = ((N + NB - 1) // NB) * NB
    if N8 != N:
        pad = N8 - N
        slots = jnp.concatenate([slots, jnp.full((pad,), cap, jnp.int32)])
        block_indices = jnp.concatenate(
            [block_indices, jnp.zeros((pad, 3), block_indices.dtype)])
    return slots, block_indices


def footprint_prepass(slots, block_indices, T_L_C, *, camera: Camera,
                      voxel_size_m: float, cap: int, H: int, W: int):
    """Shared XLA pre-pass of the footprint-window sampling kernels
    (TSDF / color / occupancy): per-block tile parameters (decimation
    level, Mosaic-aligned tile origins, footprint-window shift) and
    per-voxel window coordinates + camera-frame depth.

    Returns (level, u0, v0, shift, valid, safe_slots, ut, vt, pcz).
    """
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
    # slack >= 8 px either side); u0 128-aligned with the footprint center
    # in the middle half of 256 columns.
    v0 = jnp.clip((vc * scale).astype(jnp.int32) - TILE_V // 2, 0,
                  h_l - TILE_V)
    v0 = (v0 // 8) * 8
    u0 = (jnp.round(uc * scale / 128.0).astype(jnp.int32) - 1) * 128
    u0 = jnp.clip(u0, 0, w_l - TILE_U)
    # Footprint window start within the tile (the kernel rolls this to
    # column 0): 32-QUANTIZED so the roll decomposes into static lane
    # rotates (roll_window_q32); utc - shift lands in [16, 48) and every
    # footprint voxel (spread <= ~9 px) in [7, 57) ⊂ [0, UW).
    utc = jnp.round(uc * scale).astype(jnp.int32) - u0
    shift = jnp.clip(((utc - 16) // 32) * 32, 0, TILE_U - UW)
    valid = (slots < cap).astype(jnp.int32)
    safe_slots = jnp.where(slots < cap, slots, 0)

    # Per-voxel projection (fused XLA elementwise over [N, 512]) -> the
    # kernel consumes tile-space integer coords and camera depth only.
    lane = jnp.arange(V, dtype=jnp.int32)[None, :]
    lx = (lane // 64).astype(jnp.float32)
    ly = ((lane // 8) % 8).astype(jnp.float32)
    lz = (lane % 8).astype(jnp.float32)
    bi = block_indices.astype(jnp.float32)
    wx = (bi[:, 0:1] * 8.0 + lx + 0.5) * voxel_size_m
    wy = (bi[:, 1:2] * 8.0 + ly + 0.5) * voxel_size_m
    wz = (bi[:, 2:3] * 8.0 + lz + 0.5) * voxel_size_m
    R, t = T_C_L[:3, :3], T_C_L[:3, 3]
    pcx = R[0, 0] * wx + R[0, 1] * wy + R[0, 2] * wz + t[0]
    pcy = R[1, 0] * wx + R[1, 1] * wy + R[1, 2] * wz + t[1]
    pcz = R[2, 0] * wx + R[2, 1] * wy + R[2, 2] * wz + t[2]
    z_safe = jnp.where(pcz > 1e-6, pcz, 1.0)
    u = camera.fx * pcx / z_safe + camera.cx
    v = camera.fy * pcy / z_safe + camera.cy
    in_view = ((pcz > 1e-6) & (u >= 0.0) & (u <= W - 1.0)
               & (v >= 0.0) & (v <= H - 1.0))
    inv_scale = scale[:, None]
    # Clamp to each level's REAL decimated extent: at the image edge,
    # round(coord * scale) can overshoot the last decimated pixel by one
    # (the nearest-sampling clip the XLA path applies at full resolution).
    real_w = jnp.asarray([(W + (1 << l) - 1) >> l for l in range(N_LEVELS)])
    real_h = jnp.asarray([(H + (1 << l) - 1) >> l for l in range(N_LEVELS)])
    u_lvl = jnp.clip(jnp.round(u * inv_scale).astype(jnp.int32), 0,
                     real_w[level][:, None] - 1)
    v_lvl = jnp.clip(jnp.round(v * inv_scale).astype(jnp.int32), 0,
                     real_h[level][:, None] - 1)
    ut = u_lvl - u0[:, None] - shift[:, None]
    vt = v_lvl - v0[:, None]
    ok = (in_view & (valid[:, None] > 0)
          & (ut >= 0) & (ut < UW) & (vt >= 0) & (vt < TILE_V))
    ut = jnp.where(ok, ut, -1)
    vt = jnp.where(ok, vt, -1)
    return level, u0, v0, shift, valid, safe_slots, ut, vt, pcz


@functools.partial(
    jax.jit,
    static_argnames=("camera", "voxel_size_m", "params", "interpret",
                     "ablate"),
    donate_argnums=(0, 1))
def integrate_tsdf_pallas(distance, weight, slots, block_indices, depth,
                          T_L_C, *, camera: Camera, voxel_size_m: float,
                          params: TsdfIntegratorParams,
                          interpret: bool = False,
                          ablate: str = ""
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for ops/tsdf.integrate_tsdf on TPU.

    `ablate` (diagnosis only, wrong results): "nosample" skips the
    per-block sampling loop (fusion math on zero measurements), "notile"
    samples from whatever is in the tile scratch (skips the tile copies).
    """
    cap = distance.shape[0]
    slots, block_indices = pad_batch(slots, block_indices, cap)
    N = slots.shape[0]

    # Decimated pyramid levels (sampling semantics -> strided views).
    depth = jnp.where(jnp.isfinite(depth), depth, 0.0)
    levels = build_decimation_levels(depth)
    H, W = depth.shape

    (level, u0, v0, shift, valid, safe_slots, ut, vt,
     pcz) = footprint_prepass(slots, block_indices, T_L_C, camera=camera,
                              voxel_size_m=voxel_size_m, cap=cap, H=H, W=W)

    return _run_fusion_kernel(
        distance, weight, slots, safe_slots, levels, level, u0, v0, shift,
        valid, ut, vt, pcz, voxel_size_m=voxel_size_m, params=params,
        interpret=interpret, ablate=ablate)


def _run_fusion_kernel(distance, weight, slots, safe_slots, levels, level,
                       u0, v0, shift, valid, ut, vt, pcz, *,
                       voxel_size_m: float, params: TsdfIntegratorParams,
                       interpret: bool, ablate: str = ""):
    """Shared pallas_call for the TSDF fusion kernel: consumes a prepared
    footprint-window prepass (camera OR lidar — `pcz` is the measurement
    axis: z-depth for the pinhole model, range for the spherical one) and
    the decimated sampling pyramid."""
    N = slots.shape[0]
    scalars = jnp.asarray(
        [params.truncation_m(voxel_size_m),
         params.max_integration_distance_m, params.max_weight,
         voxel_size_m], jnp.float32)

    # Pad small levels up to the tile size.
    levels = [jnp.pad(l, ((0, max(0, TILE_V - l.shape[0])),
                          (0, max(0, TILE_U - l.shape[1]))))
              if (l.shape[0] < TILE_V or l.shape[1] < TILE_U) else l
              for l in levels]

    # Contiguous batch rows (row gather — fast on TPU).
    d_b = distance[safe_slots]
    w_b = weight[safe_slots]

    def _blk(i, *_prefetch):
        return (i, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,   # level/u0/v0/shift/valid
        grid=(N // NB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # scalars (full)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # p0 (full, resident)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # p1
            pl.BlockSpec(memory_space=pltpu.VMEM),   # p2
            pl.BlockSpec(memory_space=pltpu.VMEM),   # p3
            pl.BlockSpec(memory_space=pltpu.VMEM),   # p4
            pl.BlockSpec((NB, V), _blk, memory_space=pltpu.VMEM),  # ut
            pl.BlockSpec((NB, V), _blk, memory_space=pltpu.VMEM),  # vt
            pl.BlockSpec((NB, V), _blk, memory_space=pltpu.VMEM),  # pcz
            pl.BlockSpec((NB, V), _blk, memory_space=pltpu.VMEM),  # d rows
            pl.BlockSpec((NB, V), _blk, memory_space=pltpu.VMEM),  # w rows
        ],
        out_specs=[
            pl.BlockSpec((NB, V), _blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((NB, V), _blk, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE_V, TILE_U), jnp.float32),  # sampling tile
            pltpu.VMEM((OHU_ROWS, V), jnp.float32),     # embedded one-hot
            pltpu.VMEM((NB, V), jnp.float32),           # measured depths
        ],
    )

    kernel = functools.partial(_kernel, mode=params.weighting_mode,
                               ablate=ablate)
    d_o, w_o = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((N, V), jnp.float32),
                   jax.ShapeDtypeStruct((N, V), jnp.float32)],
        input_output_aliases={14: 0, 15: 1},  # d_b/w_b buffers reused
        interpret=interpret,
    )(level, u0, v0, shift, valid, scalars, *levels, ut, vt, pcz, d_b, w_b)

    # Scatter updated rows back (row scatter; padding slots == cap drop).
    distance = distance.at[slots].set(d_o, mode="drop")
    weight = weight.at[slots].set(w_o, mode="drop")
    return distance, weight
