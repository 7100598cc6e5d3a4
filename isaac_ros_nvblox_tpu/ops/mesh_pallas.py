"""Pallas TPU kernel for marching-cubes triangle emission (fused halo).

Reference: nvblox's CUDA mesh integrator — incremental marching cubes over
updated TSDF blocks with per-vertex color (SURVEY.md §2.1 "Mesh
integrator"; mesh_conversions.cpp:62-104 for the colored-mesh wire format).

The XLA meshing path (ops/mesh.py) is dominated by element gathers; the
round-1 kernel replaced the lookups with one-hot matmuls but still paid
~5 ms per batch building +1-halo corner stacks with XLA row gathers, and
~270 MB of f32 triangle-soup output. This version fuses everything:

  * the kernel reads the pool rows of each block and its 7 positive-octant
    neighbors directly via scalar-prefetched index maps (pipelined DMA, no
    XLA gather, no materialized halo arrays);
  * the 8 cube-corner samples are assembled in VMEM with lane rolls: the
    corner (cx,cy,cz) value of voxel lane v is `src[v + 64cx+8cy+cz -
    64ky - 8kz]` where (kx,ky,kz) are the per-axis block carries — one
    roll per (neighbor, shift) pair, selected by carry masks;
  * the 256-case triangle table and triangle counts are ONE one-hot MXU
    matmul; edge endpoint values/positions are small MXU matmuls; the
    per-slot edge select stays a masked VPU reduce;
  * per-vertex COLOR is interpolated along the crossing edge from the
    corner color stacks (three planar channels), matching the XLA
    reference's `edge_col` formula exactly;
  * output is bf16 triangle soup in BLOCK-LOCAL voxel coordinates
    (range (0, 9); quantization ~0.03 voxel = 1.5 mm at 5 cm voxels) with
    the sentinel -1 marking empty slots — 2.7x less HBM write traffic
    than f32 + separate mask, and the caller reconstructs world
    coordinates from the block index.

Correctness mirror: tests assert exact bf16 equality with ops/mesh.py's
XLA marching_cubes_blocks (interpret mode on CPU).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from isaac_ros_nvblox_tpu.ops.mesh_tables import (CORNERS, EDGES,
                                                  MAX_TRIS_PER_CUBE,
                                                  build_tables)

V = 512
K_SLOTS = MAX_TRIS_PER_CUBE * 3      # 15 triangle-vertex slots
K_PAD = 16
SENTINEL = -1.0

# Positive-octant neighbor directions (dx, dy, dz) and their columns in the
# core/block_pool.NEIGHBOR_OFFSETS 27-neighborhood order.
_DIRS = [(0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1),
         (1, 1, 0), (1, 0, 1), (0, 1, 1), (1, 1, 1)]
NEIGHBOR_COLS = [13, 22, 16, 14, 25, 23, 17, 26]


@functools.lru_cache(maxsize=1)
def _edge_constants():
    ea = np.asarray([e[0] for e in EDGES])
    eb = np.asarray([e[1] for e in EDGES])
    A = np.zeros((12, 8), np.float32)
    Bm = np.zeros((12, 8), np.float32)
    A[np.arange(12), ea] = 1.0
    Bm[np.arange(12), eb] = 1.0
    pa = CORNERS[ea].astype(np.float32)   # [12, 3]
    pb = CORNERS[eb].astype(np.float32)
    tri_table, tri_counts, _, _ = build_tables()
    # Combined table: row 0 = triangle counts, rows 1..15 = edge ids.
    TT = np.concatenate([tri_counts.astype(np.float32)[None, :],
                         tri_table.astype(np.float32).T], axis=0)  # (16,256)
    return A, Bm, pa, pb, TT


_N_PREFETCH = 17  # valid + 8 distance-row indices + 8 weight-row indices


def _make_kernel(with_color: bool, min_weight: float):
    n_ch = 5 if with_color else 2

    def kernel(*refs):
        valid_ref = refs[0]
        # refs[1:17] are the prefetched row-index arrays (used by the index
        # maps only).
        tt_ref, a_ref, b_ref, pp_ref = refs[_N_PREFETCH:_N_PREFETCH + 4]
        rows = refs[_N_PREFETCH + 4:_N_PREFETCH + 4 + n_ch * 8]
        outs = refs[_N_PREFETCH + 4 + n_ch * 8:]
        if with_color:
            vout_ref, cout_ref = outs
        else:
            (vout_ref,) = outs
        i = pl.program_id(0)
        ok_blk = valid_ref[i] > 0

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1)
        lx = lane // 64
        ly = (lane // 8) % 8
        lz = lane % 8
        mx = lx == 7
        my = ly == 7
        mz = lz == 7

        # Channel rows per direction: ch 0 = distance, 1 = weight, 2.. = rgb.
        ch_rows = []
        for c in range(n_ch):
            ch_rows.append({d: rows[c * 8 + k][0]
                            for k, d in enumerate(_DIRS)})

        roll_cache = {}

        def rolled(ch, d, amt):
            amt = amt % V
            key = (ch, d, amt)
            if key not in roll_cache:
                src = ch_rows[ch][d]
                roll_cache[key] = (pltpu.roll(src, (V - amt) % V, axis=1)
                                   if amt else src)
            return roll_cache[key]

        def corner_value(ch, cx, cy, cz):
            off = cx * 64 + cy * 8 + cz
            combos = [(kx, ky, kz)
                      for kx in ((0, 1) if cx else (0,))
                      for ky in ((0, 1) if cy else (0,))
                      for kz in ((0, 1) if cz else (0,))]
            combos.sort(key=lambda k: sum(k))
            v = None
            for (kx, ky, kz) in combos:
                cand = rolled(ch, (kx, ky, kz), off - 64 * ky - 8 * kz)
                if v is None:
                    v = cand
                else:
                    cond = jnp.ones_like(mx)
                    if kx:
                        cond = cond & mx
                    if ky:
                        cond = cond & my
                    if kz:
                        cond = cond & mz
                    v = jnp.where(cond, cand, v)
            return v

        def stack(ch):
            return jnp.concatenate(
                [corner_value(ch, cx, cy, cz)
                 for (cx, cy, cz) in np.asarray(CORNERS).tolist()], axis=0)

        cd = stack(0)                             # (8, 512)
        cw = stack(1)
        cube_ok = (jnp.min(cw, axis=0, keepdims=True) >= min_weight) & ok_blk

        bits = (cd < 0.0).astype(jnp.float32)
        pow2 = jnp.exp2(jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
                        .astype(jnp.float32))
        config = jnp.sum(bits * pow2, axis=0, keepdims=True)
        config = jnp.where(cube_ok, config, 0.0)
        config_i = config.astype(jnp.int32)

        # 128-split one-hot: build a half-width one-hot of config mod 128
        # and pick the table half by the high bit — half the one-hot build
        # cost (the kernel's largest VPU write) for two cheap MXU dots.
        iota128 = jax.lax.broadcasted_iota(jnp.int32, (128, V), 0)
        oh = (iota128 == jax.lax.rem(config_i, 128)).astype(jnp.float32)
        t_lo = jnp.dot(tt_ref[:, :128], oh,
                       preferred_element_type=jnp.float32)        # (16,512)
        t_hi = jnp.dot(tt_ref[:, 128:], oh,
                       preferred_element_type=jnp.float32)
        table = jnp.where(config_i >= 128, t_hi, t_lo)
        n_tris = table[0:1, :]
        edges = table[1:16, :]

        da = jnp.dot(a_ref[:, :], cd, preferred_element_type=jnp.float32)
        db = jnp.dot(b_ref[:, :], cd, preferred_element_type=jnp.float32)
        denom = da - db
        t = jnp.clip(da / jnp.where(jnp.abs(denom) > 1e-12, denom, 1e-12),
                     0.0, 1.0)
        pax, pay, paz = pp_ref[:, 0:1], pp_ref[:, 1:2], pp_ref[:, 2:3]
        pbx, pby, pbz = pp_ref[:, 3:4], pp_ref[:, 4:5], pp_ref[:, 5:6]
        ex = pax + t * (pbx - pax)                                # (12,512)
        ey = pay + t * (pby - pay)
        ez = paz + t * (pbz - paz)
        if with_color:
            ecs = []
            for ch in (2, 3, 4):
                cc = stack(ch)                                    # (8,512)
                ca = jnp.dot(a_ref[:, :], cc,
                             preferred_element_type=jnp.float32)
                cb = jnp.dot(b_ref[:, :], cc,
                             preferred_element_type=jnp.float32)
                ecs.append(ca + t * (cb - ca))

        base_x = lx.astype(jnp.float32)
        base_y = ly.astype(jnp.float32)
        base_z = lz.astype(jnp.float32)

        # Edge -> slot selection, iterated over the 12 EDGES instead of the
        # 15 slots: each slot's edge id selects exactly one edge value, so
        # accumulating equality-masked adds over e is exactly equal to the
        # per-slot one-hot reduce (one nonzero term per slot) at ~1/3 the
        # VPU ops ((15,512) elementwise vs (12,512) reduces per slot).
        slot_i = jax.lax.broadcasted_iota(jnp.int32, (K_SLOTS, V), 0) \
            .astype(jnp.float32)
        valid_s = cube_ok & (slot_i < n_tris * 3.0) & (edges >= 0.0)
        vx = jnp.zeros((K_SLOTS, V), jnp.float32)
        vy = jnp.zeros((K_SLOTS, V), jnp.float32)
        vz = jnp.zeros((K_SLOTS, V), jnp.float32)
        if with_color:
            cr = jnp.zeros((K_SLOTS, V), jnp.float32)
            cg = jnp.zeros((K_SLOTS, V), jnp.float32)
            cb = jnp.zeros((K_SLOTS, V), jnp.float32)
        for e in range(12):
            sel = (edges == jnp.float32(e)).astype(jnp.float32)  # (15, V)
            vx = vx + sel * ex[e:e + 1]
            vy = vy + sel * ey[e:e + 1]
            vz = vz + sel * ez[e:e + 1]
            if with_color:
                cr = cr + sel * ecs[0][e:e + 1]
                cg = cg + sel * ecs[1][e:e + 1]
                cb = cb + sel * ecs[2][e:e + 1]
        sent = jnp.float32(SENTINEL)
        pad = jnp.full((K_PAD - K_SLOTS, V), SENTINEL, jnp.float32)
        zpad = jnp.zeros((K_PAD - K_SLOTS, V), jnp.float32)
        for c, (comp, base) in enumerate(
                ((vx, base_x), (vy, base_y), (vz, base_z))):
            rows = jnp.where(valid_s, comp + base + 0.5, sent)
            vout_ref[0, c] = jnp.concatenate([rows, pad], axis=0) \
                .astype(jnp.bfloat16)
        if with_color:
            for c, comp in enumerate((cr, cg, cb)):
                rows = jnp.where(valid_s, comp, 0.0)
                cout_ref[0, c] = jnp.concatenate([rows, zpad], axis=0) \
                    .astype(jnp.bfloat16)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("min_weight", "with_color", "interpret"))
def marching_cubes_fused(tsdf_rows, weight_rows, color_rows, nbr8, valid, *,
                         min_weight: float, with_color: bool,
                         interpret: bool = False
                         ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Marching cubes over pool rows with in-kernel +1 halo.

    Args:
      tsdf_rows, weight_rows: f32[cap, 512] pool channels.
      color_rows: (r, g, b) planar f32[cap, 512] channels, or None.
      nbr8: i32[N, 8] slot of self + 7 positive-octant neighbors (order
        _DIRS; -1 = absent).
      valid: i32[N] (0 = padding block).

    Returns:
      verts:  bf16[N, 3, 16, 512] block-LOCAL voxel coords; empty slots
              carry SENTINEL (-1) in all three components.
      colors: bf16[N, 3, 16, 512] per-vertex RGB (0-255), or None.
    """
    cap = tsdf_rows.shape[0]
    N = nbr8.shape[0]
    A, Bm, pa, pb, TT = _edge_constants()
    pp = np.concatenate([pa, pb, np.zeros((12, 2), np.float32)], axis=1)

    safe = jnp.clip(nbr8, 0, cap - 1).astype(jnp.int32)
    present = nbr8 >= 0
    # Absent neighbors must contribute weight 0 (-> cube_ok false at their
    # corners). Instead of masking rows in-kernel, route them to a zero-
    # weight row: pool row gathers clamp to row `cap - 1` only when that
    # row is itself in use, so mask via a weight multiplier row set.
    d3 = tsdf_rows.reshape(cap, 1, V)
    # Weight rows with one extra all-zero row for absent neighbors.
    w_pad = jnp.concatenate(
        [weight_rows, jnp.zeros((1, V), weight_rows.dtype)], axis=0)
    w3 = w_pad.reshape(cap + 1, 1, V)
    w_idx = jnp.where(present, safe, cap).astype(jnp.int32)

    n_ch = 5 if with_color else 2
    prefetch = [valid.astype(jnp.int32)]
    prefetch += [safe[:, k] for k in range(8)]          # d index per dir
    prefetch += [w_idx[:, k] for k in range(8)]         # w index per dir

    def _row_spec(arg_pos):
        # arg_pos: which prefetch array holds this input's row index.
        return pl.BlockSpec(
            (1, 1, V),
            lambda i, *pf, ap=arg_pos: (pf[ap][i], 0, 0),
            memory_space=pltpu.VMEM)

    const_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
    d_specs = [_row_spec(1 + k) for k in range(8)]
    w_specs = [_row_spec(9 + k) for k in range(8)]
    c_specs = []
    inputs = [jnp.asarray(TT), jnp.asarray(A), jnp.asarray(Bm),
              jnp.asarray(pp)]
    inputs += [d3] * 8 + [w3] * 8
    if with_color:
        cr, cg, cb = color_rows
        c3 = [c.reshape(cap, 1, V) for c in (cr, cg, cb)]
        c_specs = ([_row_spec(1 + k) for k in range(8)]
                   + [_row_spec(1 + k) for k in range(8)]
                   + [_row_spec(1 + k) for k in range(8)])
        inputs += [c3[0]] * 8 + [c3[1]] * 8 + [c3[2]] * 8

    out_specs = [pl.BlockSpec((1, 3, K_PAD, V), lambda i, *pf: (i, 0, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((N, 3, K_PAD, V), jnp.bfloat16)]
    if with_color:
        out_specs = out_specs * 2
        out_shape = out_shape * 2

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=(N,),
        in_specs=const_specs + d_specs + w_specs + c_specs,
        out_specs=out_specs,
    )
    kernel = _make_kernel(with_color, float(min_weight))
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(*prefetch, *inputs)
    if with_color:
        return outs[0], outs[1]
    return outs[0], None


def local_to_world_verts(verts_local, block_indices, voxel_size_m: float):
    """bf16 block-local soup -> f32 world coords + validity mask (XLA).

    verts_local: bf16[N, 3, 16, 512]; returns (f32[N,3,16,512] meters,
    bool[N,16,512])."""
    mask = verts_local[:, 0] >= 0.0
    origin = (block_indices.astype(jnp.float32) * 8.0)  # [N,3]
    world = (verts_local.astype(jnp.float32)
             + origin[:, :, None, None]) * voxel_size_m
    return world, mask
