"""Pallas TPU kernel for the ESDF relaxation sweep.

The XLA formulation of the block-local sweep (ops/esdf.py esdf_sweep_pass)
materializes 26 shifted copies of the [N,10,10,10] site arrays per inner
iteration — HBM-bound at ~150 GB per ESDF update. This kernel keeps a tile
of blocks' padded neighborhoods resident in VMEM for all 8 inner
iterations, cutting HBM traffic to one read + one write of the halo arrays
per outer sweep (the speed-of-light minimum for this op).

Layout: SoA over flattened padded blocks — `site_{x,y,z}: f32[N, 1024]`
(10^3 = 1000 lanes used, padded to 8x128 tiles). A 26-neighbor shift in
flattened (x*100 + y*10 + z) space is a lane roll by `100dx + 10dy + dz`
with a precomputed edge-validity mask; invalid sites carry the sentinel
coordinate 1e6 so their candidate distance always exceeds the max and no
separate validity array is needed.

Correctness mirror: tests assert exact equality with ops/esdf.py's XLA
sweep; CPU runs use interpret mode.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 10             # padded block side (8 + halo)
V = P ** 3         # 1000 padded voxels
V_PAD = 1024       # lane-padded
SENTINEL = 1.0e6   # invalid-site coordinate

_SHIFTS = [(dx, dy, dz)
           for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)
           if (dx, dy, dz) != (0, 0, 0)]


@functools.lru_cache(maxsize=1)
def _shift_masks() -> np.ndarray:
    """bool[26, V_PAD]: lane l valid for shift s iff the source voxel
    (l + flat_offset) is a real in-bounds padded voxel."""
    lanes = np.arange(V_PAD)
    x, y, z = lanes // 100, (lanes // 10) % 10, lanes % 10
    in_block = lanes < V
    masks = np.zeros((len(_SHIFTS), V_PAD), bool)
    for s, (dx, dy, dz) in enumerate(_SHIFTS):
        sx, sy, sz = x + dx, y + dy, z + dz
        ok = ((sx >= 0) & (sx < P) & (sy >= 0) & (sy < P)
              & (sz >= 0) & (sz < P) & in_block)
        masks[s] = ok
    return masks


@functools.lru_cache(maxsize=1)
def _local_coords() -> np.ndarray:
    """f32[3, V_PAD]: padded-local voxel coordinates (halo cell 0 == -1)."""
    lanes = np.arange(V_PAD)
    x, y, z = lanes // 100, (lanes // 10) % 10, lanes % 10
    return np.stack([x - 1, y - 1, z - 1]).astype(np.float32)


def _relax_kernel(bx_ref, by_ref, bz_ref, sx_ref, sy_ref, sz_ref,
                  masks_ref, lcoord_ref,
                  *, inner_iters: int, max_sq: float):
    """One block-tile: `inner_iters` 26-neighbor relaxations in VMEM.

    bx/by/bz: f32[Bt, 1] block-origin voxel coords (block_index * 8).
    sx/sy/sz: f32[Bt, V_PAD] site coordinates (global voxel units).
    masks:    f32[26, V_PAD] shift validity (1.0 / 0.0).
    lcoord:   f32[3, V_PAD] padded-local voxel coords.
    """
    cx = bx_ref[:] + lcoord_ref[0:1, :]   # [Bt, V_PAD] global voxel coords
    cy = by_ref[:] + lcoord_ref[1:2, :]
    cz = bz_ref[:] + lcoord_ref[2:3, :]

    sx = sx_ref[:]
    sy = sy_ref[:]
    sz = sz_ref[:]

    def sq_to(px, py, pz):
        dx = cx - px
        dy = cy - py
        dz = cz - pz
        return dx * dx + dy * dy + dz * dz

    def one_iter(_, state):
        sx, sy, sz = state
        best_sq = jnp.minimum(sq_to(sx, sy, sz), jnp.float32(1e18))
        for s, (dx, dy, dz) in enumerate(_SHIFTS):
            off = 100 * dx + 10 * dy + dz
            shift = (-off) % V_PAD  # pltpu.roll requires non-negative shifts
            rx = pltpu.roll(sx, shift, axis=1)
            ry = pltpu.roll(sy, shift, axis=1)
            rz = pltpu.roll(sz, shift, axis=1)
            m = masks_ref[s:s + 1, :]  # [1, V_PAD]
            rx = jnp.where(m > 0.5, rx, SENTINEL)
            cand = sq_to(rx, ry, rz)
            better = (cand < best_sq) & (cand <= max_sq)
            best_sq = jnp.where(better, cand, best_sq)
            sx = jnp.where(better, rx, sx)
            sy = jnp.where(better, ry, sy)
            sz = jnp.where(better, rz, sz)
        return sx, sy, sz

    sx, sy, sz = jax.lax.fori_loop(0, inner_iters, one_iter, (sx, sy, sz))
    sx_ref[:] = sx
    sy_ref[:] = sy
    sz_ref[:] = sz


@functools.partial(jax.jit,
                   static_argnames=("inner_iters", "max_sq", "interpret"))
def relax_blocks_pallas(block_origin_vox, site_x, site_y, site_z, *,
                        inner_iters: int, max_sq: float,
                        interpret: bool = False
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run the in-VMEM relaxation over all blocks.

    Args:
      block_origin_vox: f32[N, 3] block index * 8 per block.
      site_{x,y,z}: f32[N, V_PAD] padded SoA site coords (SENTINEL = none).
    Returns updated site arrays.
    """
    N = site_x.shape[0]
    Bt = 8  # block rows per tile (sublane dimension)
    n_tiles = (N + Bt - 1) // Bt
    masks = jnp.asarray(_shift_masks(), jnp.float32)
    lcoord = jnp.asarray(_local_coords())

    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((Bt, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # bx
            pl.BlockSpec((Bt, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # by
            pl.BlockSpec((Bt, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # bz
            pl.BlockSpec((Bt, V_PAD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # sx
            pl.BlockSpec((Bt, V_PAD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # sy
            pl.BlockSpec((Bt, V_PAD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),  # sz
            pl.BlockSpec((26, V_PAD), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),  # masks
            pl.BlockSpec((3, V_PAD), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),  # lcoord
        ],
        out_specs=[
            pl.BlockSpec((Bt, V_PAD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, V_PAD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bt, V_PAD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )

    kernel = functools.partial(_relax_kernel, inner_iters=inner_iters,
                               max_sq=float(max_sq))

    def wrapped(bx, by, bz, sx, sy, sz, masks, lcoord):
        return pl.pallas_call(
            _kernel_io_adapter(kernel),
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct(sx.shape, sx.dtype)] * 3,
            input_output_aliases={3: 0, 4: 1, 5: 2},
            interpret=interpret,
        )(bx, by, bz, sx, sy, sz, masks, lcoord)

    bx = block_origin_vox[:, 0:1]
    by = block_origin_vox[:, 1:2]
    bz = block_origin_vox[:, 2:3]
    sx, sy, sz = wrapped(bx, by, bz, site_x, site_y, site_z, masks, lcoord)
    return sx, sy, sz


def _kernel_io_adapter(kernel):
    """Adapt (in..., out...) refs to the aliased in-place kernel signature."""
    def run(bx, by, bz, sx_in, sy_in, sz_in, masks, lcoord,
            sx_out, sy_out, sz_out):
        # With input_output_aliases the out refs are the same buffers; copy
        # once for safety in interpret mode (no aliasing there).
        sx_out[:] = sx_in[:]
        sy_out[:] = sy_in[:]
        sz_out[:] = sz_in[:]
        kernel(bx, by, bz, sx_out, sy_out, sz_out, masks, lcoord)
    return run


# --------------------------------------------------------------------------
# Packed-site variant: one int32 per voxel instead of three f32 coordinates.
#
# Sites are stored *relative to the voxel's own block origin* with one byte
# per axis (bias +128; relative range needed is +-(max_esdf_vox + 8) << 127).
# Relative coordinates make the packing world-size independent, and the
# owner shift of halo lanes (a neighbor's value is relative to *its* block)
# is a per-lane constant (+-8 per crossed axis) applied at unpack time. HBM
# traffic for the halo build + scatter drops 3x vs the f32 SoA form.
# --------------------------------------------------------------------------

INVALID_PACKED = -1


def _relax_packed_kernel(packed_in, packed_out, masks_ref, lcoord_ref,
                         *, inner_iters: int, max_sq: float):
    p = packed_in[:]                                   # (Bt, V_PAD) int32
    lx = lcoord_ref[0:1, :]                            # padded-local coords
    ly = lcoord_ref[1:2, :]
    lz = lcoord_ref[2:3, :]
    # Owner shift: halo lanes hold values relative to the neighbor block.
    ox = jnp.where(lx < 0.0, -8.0, jnp.where(lx > 7.0, 8.0, 0.0))
    oy = jnp.where(ly < 0.0, -8.0, jnp.where(ly > 7.0, 8.0, 0.0))
    oz = jnp.where(lz < 0.0, -8.0, jnp.where(lz > 7.0, 8.0, 0.0))

    valid = p >= 0
    sx = ((p & 255) - 128).astype(jnp.float32) + ox
    sy = (((p >> 8) & 255) - 128).astype(jnp.float32) + oy
    sz = (((p >> 16) & 255) - 128).astype(jnp.float32) + oz
    sx = jnp.where(valid, sx, SENTINEL)
    sy = jnp.where(valid, sy, SENTINEL)
    sz = jnp.where(valid, sz, SENTINEL)

    cx, cy, cz = lx, ly, lz

    def sq_to(px, py, pz):
        dx = cx - px
        dy = cy - py
        dz = cz - pz
        return dx * dx + dy * dy + dz * dz

    def one_iter(_, state):
        sx, sy, sz = state
        best_sq = jnp.minimum(sq_to(sx, sy, sz), jnp.float32(1e18))
        for s, (dx, dy, dz) in enumerate(_SHIFTS):
            off = 100 * dx + 10 * dy + dz
            shift = (-off) % V_PAD
            rx = pltpu.roll(sx, shift, axis=1)
            ry = pltpu.roll(sy, shift, axis=1)
            rz = pltpu.roll(sz, shift, axis=1)
            m = masks_ref[s:s + 1, :]
            rx = jnp.where(m > 0.5, rx, SENTINEL)
            # Rolled sites are relative to the *source lane's* block frame
            # only when crossing block boundaries — but all lanes in this
            # padded array share one frame (the center block), so no
            # adjustment is needed here.
            cand = sq_to(rx, ry, rz)
            better = (cand < best_sq) & (cand <= max_sq)
            best_sq = jnp.where(better, cand, best_sq)
            sx = jnp.where(better, rx, sx)
            sy = jnp.where(better, ry, sy)
            sz = jnp.where(better, rz, sz)
        return sx, sy, sz

    sx, sy, sz = jax.lax.fori_loop(0, inner_iters, one_iter, (sx, sy, sz))

    ok = sx < SENTINEL * 0.5
    xi = jnp.clip(jnp.round(sx).astype(jnp.int32) + 128, 0, 255)
    yi = jnp.clip(jnp.round(sy).astype(jnp.int32) + 128, 0, 255)
    zi = jnp.clip(jnp.round(sz).astype(jnp.int32) + 128, 0, 255)
    packed_out[:] = jnp.where(ok, xi | (yi << 8) | (zi << 16),
                              INVALID_PACKED)


@functools.partial(jax.jit,
                   static_argnames=("inner_iters", "max_sq", "interpret"))
def relax_blocks_packed(packed, *, inner_iters: int, max_sq: float,
                        interpret: bool = False) -> jnp.ndarray:
    """Packed-site relaxation over all blocks; packed: i32[N, V_PAD]."""
    N = packed.shape[0]
    Bt = 8
    n_tiles = (N + Bt - 1) // Bt
    masks = jnp.asarray(_shift_masks(), jnp.float32)
    lcoord = jnp.asarray(_local_coords())

    grid_spec = pl.GridSpec(
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((Bt, V_PAD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((26, V_PAD), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, V_PAD), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Bt, V_PAD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )

    def run(pk_in, masks_ref, lcoord_ref, pk_out):
        _relax_packed_kernel(pk_in, pk_out, masks_ref, lcoord_ref,
                             inner_iters=inner_iters, max_sq=float(max_sq))

    (out,) = pl.pallas_call(
        run,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct(packed.shape, jnp.int32)],
        interpret=interpret,
    )(packed, masks, lcoord)
    return out
