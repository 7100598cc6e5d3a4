"""Device-resident block allocation: the WorldGrid.

The round-1 host BlockTable (core/block_pool.py) keeps the block index in a
Python dict — correct, but it puts a device->host->device round trip on the
per-frame path (fetch touched-block grid, allocate, upload slots). On TPU
the whole tick should stay on device (SURVEY.md §7 hard part (d): "keeping
the whole tick on-device and avoiding host round-trips per frame").

WorldGrid is the TPU-native replacement: a bounded world volume of blocks
holds a dense `slot_grid: i32[Dx, Dy, Dz]` (-1 = unallocated). Allocation,
view compaction, and neighbor lookup are all O(1) gathers/scatters under
jit:

  * allocate: candidate cells (touched & unallocated) get slots
    `alloc_count + prefix_sum` via a cumsum — a classic parallel allocator;
  * view batch: `jnp.nonzero(mask, size=K)` compacts touched cells to a
    static-size slot batch for the integrators;
  * neighbors: `slot_grid[cell + offset]` — no host neighbor table.

The world bounds are static per compilation (default 128x128x32 blocks =
51 x 51 x 13 m at 0.05 m voxels); re-centering or growing recompiles, which
is rare and acceptable. Out-of-bounds blocks are simply not mapped (the
moral equivalent of the reference's workspace bounds).

State lives in a WorldGridState pytree so every op is a pure jitted
function; the host only ever reads back tiny scalars (allocation count) or
cold-path exports.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isaac_ros_nvblox_tpu.core.types import VOXELS_PER_SIDE, block_size_m

B = VOXELS_PER_SIDE

# 27-neighborhood offsets, same order as core/block_pool.NEIGHBOR_OFFSETS.
_NEIGHBOR_OFFSETS = np.array(
    [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
    dtype=np.int32)

# block_index_of_slot value marking a freed (recyclable) slot. Far outside
# any reachable world so freed slots never alias a real region cell.
FREED_BLOCK_SENTINEL = 1 << 20


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class WorldGridState:
    """Device state of the allocator (a pytree; static fields in aux).

    `alloc_count` is the fresh-slot high-water mark; freed slots are pushed
    onto `free_stack` and recycled by the next allocation (their
    block_index_of_slot rows carry FREED_BLOCK_SENTINEL while free). The
    live-block count is `alloc_count - free_count`.
    """
    slot_grid: jnp.ndarray        # i32[Dx, Dy, Dz], -1 = unallocated
    block_index_of_slot: jnp.ndarray  # i32[cap, 3] world block index per slot
    alloc_count: jnp.ndarray      # i32[] fresh-slot high-water mark
    overflow_count: jnp.ndarray   # i32[] blocks dropped due to full pool
    origin_block: jnp.ndarray     # i32[3] world block index of grid cell 0
    free_stack: jnp.ndarray       # i32[cap] recyclable slot ids
    free_count: jnp.ndarray       # i32[] number of entries in free_stack


@dataclasses.dataclass(frozen=True)
class WorldGridConfig:
    dims: Tuple[int, int, int] = (128, 128, 32)
    capacity: int = 32768
    origin_block: Tuple[int, int, int] = (-64, -64, -8)


def create_world_grid(config: WorldGridConfig) -> WorldGridState:
    return WorldGridState(
        slot_grid=jnp.full(config.dims, -1, jnp.int32),
        block_index_of_slot=jnp.zeros((config.capacity, 3), jnp.int32),
        alloc_count=jnp.zeros((), jnp.int32),
        overflow_count=jnp.zeros((), jnp.int32),
        origin_block=jnp.asarray(config.origin_block, jnp.int32),
        free_stack=jnp.zeros((config.capacity,), jnp.int32),
        free_count=jnp.zeros((), jnp.int32),
    )


@jax.jit
def live_slot_mask(state: WorldGridState) -> jnp.ndarray:
    """bool[cap]: slot holds a live (allocated, not freed) block."""
    cap = state.block_index_of_slot.shape[0]
    return ((jnp.arange(cap) < state.alloc_count)
            & (state.block_index_of_slot[:, 0] < FREED_BLOCK_SENTINEL))


def _world_cells_of_mask(mask_grid, mask_origin_block, state: WorldGridState):
    """Map a touched-mask grid (from ops/view.touched_block_grid) into world
    grid cells. Returns (cells i32[G^3, 3], in_bounds bool[G^3], flat mask)."""
    G = mask_grid.shape[0]
    Dx, Dy, Dz = state.slot_grid.shape
    ii = jax.lax.broadcasted_iota(jnp.int32, (G, G, G), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (G, G, G), 1)
    kk = jax.lax.broadcasted_iota(jnp.int32, (G, G, G), 2)
    world = jnp.stack([ii, jj, kk], -1) + (mask_origin_block
                                           - state.origin_block)[None, None, None]
    cells = world.reshape(-1, 3)
    in_bounds = ((cells[:, 0] >= 0) & (cells[:, 0] < Dx)
                 & (cells[:, 1] >= 0) & (cells[:, 1] < Dy)
                 & (cells[:, 2] >= 0) & (cells[:, 2] < Dz))
    return cells, in_bounds, mask_grid.reshape(-1)


def _mask_window(mask_grid, mask_origin_block, state: WorldGridState):
    """Align the touched mask with a contiguous window of the slot grid.

    Returns (touched bool[Wx, Wy, Wz], st i32[3]) with W = min(G, D) per
    axis: st is the window's start cell in the slot grid and touched[w] is
    the mask value of world grid cell st + w (False outside the mask). All
    reads are contiguous dynamic slices — no element gathers (TPU element
    gathers run ~115 M elem/s; a G^3 ~ 24k-cell gather costs ~0.2 ms).

    Alignment: the window start is st = clip(o, 0, D - W) with
    o = mask origin in grid cells, so every in-bounds masked cell lies in
    the window (W >= overlap extent). The mask is read at offset st - o,
    padded by G zeros per side; the clamp on the padded offset only
    activates when mask and map don't overlap at all, in which case the
    slice lands entirely in the zero padding.
    """
    G = mask_grid.shape[0]
    D = state.slot_grid.shape
    W = tuple(min(G, d) for d in D)
    o = mask_origin_block - state.origin_block
    st = jnp.clip(o, 0, jnp.asarray(D, jnp.int32) - jnp.asarray(W, jnp.int32))
    mask_p = jnp.pad(mask_grid, G)
    start = jnp.clip(st - o + G, 0,
                     jnp.asarray(mask_p.shape, jnp.int32)
                     - jnp.asarray(W, jnp.int32))
    touched = jax.lax.dynamic_slice(mask_p, (start[0], start[1], start[2]), W)
    return touched, st


@functools.partial(jax.jit, static_argnames=("max_blocks",))
def allocate_and_batch(state: WorldGridState, mask_grid, mask_origin_block,
                       *, max_blocks: int):
    """Fused allocate_from_mask + view_batch: one compaction pass.

    Touched cells are compacted to a static max_blocks batch FIRST; new
    cells among them get slots (recycled, then fresh). The expensive dense
    work is one contiguous mask window + one nonzero; every gather/scatter
    is max_blocks-sized instead of G^3-sized.

    Returns (state, slots i32[max_blocks], block_indices i32[max_blocks, 3],
    n_valid i32[]). Padding/dropped entries carry slot == capacity.
    Touched cells beyond max_blocks are not allocated this frame (counted
    in overflow_count; they re-enter the view next frame).
    """
    cap = state.block_index_of_slot.shape[0]
    touched, st = _mask_window(mask_grid, mask_origin_block, state)
    Wx, Wy, Wz = touched.shape
    flat = touched.reshape(-1)
    # Compact touched cells with a SORT instead of jnp.nonzero: nonzero
    # lowers to a cumsum + a serializing element scatter (~0.2 ms at this
    # window size on TPU), while a bitonic sort of the masked iota is
    # vectorized. Ascending sort puts touched cells first in scan order —
    # identical output to nonzero(size=, fill_value=M-1).
    M = flat.shape[0]
    big = jnp.int32(2 ** 30)
    keys = jnp.where(flat, jnp.arange(M, dtype=jnp.int32), big)
    keys = jax.lax.sort(keys)[:max_blocks]
    idx = jnp.where(keys < big, keys, M - 1)
    n_touched = jnp.sum(flat.astype(jnp.int32))
    n_sel = jnp.minimum(n_touched, max_blocks)
    lane = jnp.arange(max_blocks) < n_sel
    safe_idx = jnp.where(lane, idx, 0)
    cells = jnp.stack([safe_idx // (Wy * Wz), (safe_idx // Wz) % Wy,
                       safe_idx % Wz], -1) + st
    current = state.slot_grid[cells[:, 0], cells[:, 1], cells[:, 2]]
    is_new = lane & (current < 0)
    order = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    # Recycle freed slots first (LIFO), then take fresh ones.
    reuse = is_new & (order < state.free_count)
    stack_idx = jnp.clip(state.free_count - 1 - order, 0, cap - 1)
    recycled = state.free_stack[stack_idx]
    fresh = state.alloc_count + (order - state.free_count)
    new_slot = jnp.where(reuse, recycled, fresh)
    ok = is_new & (new_slot < cap)
    slots = jnp.where(ok, new_slot,
                      jnp.where(lane & ~is_new, current, cap))

    # Write new slots into the grid (drop non-new via OOB trick).
    dims_v = jnp.asarray(state.slot_grid.shape, jnp.int32)
    cells_w = jnp.where(ok[:, None], cells, dims_v)
    slot_grid = state.slot_grid.at[
        cells_w[:, 0], cells_w[:, 1], cells_w[:, 2]
    ].set(jnp.where(ok, new_slot, -1), mode="drop")

    world_block = cells + state.origin_block
    bidx = jnp.where(lane[:, None], world_block, 0)
    slot_for_record = jnp.where(ok, new_slot, cap)
    block_index_of_slot = state.block_index_of_slot.at[slot_for_record].set(
        world_block, mode="drop")

    n_ok = jnp.sum(ok.astype(jnp.int32))
    n_reused = jnp.sum(reuse.astype(jnp.int32))
    n_overflow = (jnp.sum((is_new & ~ok).astype(jnp.int32))
                  + (n_touched - n_sel))
    state = dataclasses.replace(
        state,
        slot_grid=slot_grid,
        block_index_of_slot=block_index_of_slot,
        alloc_count=state.alloc_count + (n_ok - n_reused),
        overflow_count=state.overflow_count + n_overflow,
        free_count=state.free_count - n_reused)
    return state, slots, bidx, n_sel


@jax.jit
def allocate_from_mask(state: WorldGridState, mask_grid, mask_origin_block
                       ) -> WorldGridState:
    """Allocate slots for touched, in-bounds, unallocated cells (device-only).

    Parallel allocation: the i-th new cell (in flat order) gets slot
    `alloc_count + i`; cells past capacity are dropped and counted in
    overflow_count.
    """
    cap = state.block_index_of_slot.shape[0]
    cells, in_bounds, touched = _world_cells_of_mask(
        mask_grid, mask_origin_block, state)
    safe_cells = jnp.clip(cells, 0,
                          jnp.asarray(state.slot_grid.shape, jnp.int32) - 1)
    current = state.slot_grid[safe_cells[:, 0], safe_cells[:, 1],
                              safe_cells[:, 2]]
    is_new = touched & in_bounds & (current < 0)
    order = jnp.cumsum(is_new.astype(jnp.int32)) - 1  # prefix index
    # Recycle freed slots first (LIFO), then take fresh ones.
    reuse = order < state.free_count
    stack_idx = jnp.clip(state.free_count - 1 - order, 0, cap - 1)
    recycled = state.free_stack[stack_idx]
    fresh = state.alloc_count + (order - state.free_count)
    new_slot = jnp.where(reuse, recycled, fresh)
    ok = is_new & (new_slot < cap)
    write_slot = jnp.where(ok, new_slot, -1)

    # Scatter new slots into the grid (drop non-new via OOB trick).
    cells_for_write = jnp.where(ok[:, None], cells,
                                jnp.asarray(state.slot_grid.shape, jnp.int32))
    slot_grid = state.slot_grid.at[
        cells_for_write[:, 0], cells_for_write[:, 1], cells_for_write[:, 2]
    ].set(write_slot, mode="drop")

    # Record block index per new slot.
    world_block = cells + state.origin_block
    slot_for_record = jnp.where(ok, new_slot, cap)
    block_index_of_slot = state.block_index_of_slot.at[slot_for_record].set(
        world_block, mode="drop")

    n_ok = jnp.sum(ok.astype(jnp.int32))
    n_reused = jnp.sum((ok & reuse).astype(jnp.int32))
    n_overflow = jnp.sum((is_new & ~ok).astype(jnp.int32))
    return dataclasses.replace(
        state,
        slot_grid=slot_grid,
        block_index_of_slot=block_index_of_slot,
        alloc_count=state.alloc_count + (n_ok - n_reused),
        overflow_count=state.overflow_count + n_overflow,
        free_count=state.free_count - n_reused)


@functools.partial(jax.jit, static_argnames=("max_blocks",))
def view_batch(state: WorldGridState, mask_grid, mask_origin_block,
               *, max_blocks: int):
    """Compact the touched cells into a static-size integration batch.

    Returns (slots i32[max_blocks], block_indices i32[max_blocks, 3],
    n_valid i32[]). Padding entries carry slot == capacity (dropped by
    integrator scatters) and block index 0.
    """
    cap = state.block_index_of_slot.shape[0]
    cells, in_bounds, touched = _world_cells_of_mask(
        mask_grid, mask_origin_block, state)
    safe_cells = jnp.clip(cells, 0,
                          jnp.asarray(state.slot_grid.shape, jnp.int32) - 1)
    slot = state.slot_grid[safe_cells[:, 0], safe_cells[:, 1], safe_cells[:, 2]]
    good = touched & in_bounds & (slot >= 0)
    # Sort-based compaction (see allocate_and_batch: nonzero lowers to a
    # serializing scatter on TPU).
    M = good.shape[0]
    big = jnp.int32(2 ** 30)
    keys = jnp.where(good, jnp.arange(M, dtype=jnp.int32), big)
    keys = jax.lax.sort(keys)[:max_blocks]
    idx = jnp.where(keys < big, keys, M - 1)
    # fill may point at a real cell; mask separately.
    n_valid = jnp.sum(good.astype(jnp.int32))
    lane = jnp.arange(max_blocks) < n_valid
    slots = jnp.where(lane, slot[idx], cap)
    bidx = jnp.where(lane[:, None], cells[idx] + state.origin_block, 0)
    return slots, bidx, n_valid


@jax.jit
def neighbor_slots_of(state: WorldGridState, block_indices):
    """Neighbor slot rows `i32[N, 27]` for world block indices `i32[N, 3]`.

    Order matches core/block_pool.NEIGHBOR_OFFSETS; out-of-world neighbors
    and unallocated cells give -1 — drop-in compatible with
    ops/halo.gather_halo.
    """
    offs = jnp.asarray(_NEIGHBOR_OFFSETS)  # [27, 3]
    cells = block_indices[:, None, :] - state.origin_block + offs[None]
    dims = jnp.asarray(state.slot_grid.shape, jnp.int32)
    in_bounds = jnp.all((cells >= 0) & (cells < dims), axis=-1)
    safe = jnp.clip(cells, 0, dims - 1)
    slots = state.slot_grid[safe[..., 0], safe[..., 1], safe[..., 2]]
    return jnp.where(in_bounds, slots, -1)


def neighbor_slots8_of(state: WorldGridState, block_indices):
    """Positive-octant neighbor slot rows `i32[N, 8]` (self + 7 {0,1}^3
    directions, ops/mesh_pallas._DIRS order). Element gathers run at
    ~115 M elem/s on TPU, so the mesh path gathers only the 8 columns it
    consumes instead of the full 27-neighborhood table."""
    offs = jnp.asarray([(0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1),
                        (1, 1, 0), (1, 0, 1), (0, 1, 1), (1, 1, 1)],
                       jnp.int32)
    cells = block_indices[:, None, :] - state.origin_block + offs[None]
    dims = jnp.asarray(state.slot_grid.shape, jnp.int32)
    in_bounds = jnp.all((cells >= 0) & (cells < dims), axis=-1)
    safe = jnp.clip(cells, 0, dims - 1)
    slots = state.slot_grid[safe[..., 0], safe[..., 1], safe[..., 2]]
    return jnp.where(in_bounds, slots, -1)


@functools.partial(jax.jit, static_argnames=("max_blocks",))
def allocated_batch(state: WorldGridState, *, max_blocks: int):
    """All allocated slots as a static-size batch (slots beyond alloc_count
    padded with capacity). Used by full-map passes (ESDF, full meshing)."""
    cap = state.block_index_of_slot.shape[0]
    slots = jnp.arange(max_blocks, dtype=jnp.int32)
    valid = slots < state.alloc_count
    bidx = jnp.where(valid[:, None],
                     state.block_index_of_slot[jnp.minimum(slots, cap - 1)], 0)
    return jnp.where(valid, slots, cap), bidx, jnp.minimum(
        state.alloc_count, max_blocks)


@functools.partial(jax.jit, static_argnames=("max_blocks",))
def allocated_batch_range(state: WorldGridState, start, *, max_blocks: int):
    """Allocated slots [start, start+max_blocks) as a static-size batch."""
    cap = state.block_index_of_slot.shape[0]
    slots = start + jnp.arange(max_blocks, dtype=jnp.int32)
    valid = slots < state.alloc_count
    bidx = jnp.where(valid[:, None],
                     state.block_index_of_slot[jnp.minimum(slots, cap - 1)], 0)
    n = jnp.clip(state.alloc_count - start, 0, max_blocks)
    return jnp.where(valid, slots, cap), bidx, n


@jax.jit
def free_slots(state: WorldGridState, slots_to_free) -> WorldGridState:
    """Deallocate given slots (device-side) and recycle their storage.

    Clears the slot_grid cells, marks the slots' block indices with
    FREED_BLOCK_SENTINEL, and pushes them onto the free stack so the next
    allocation reuses them (parity: the reference's decay integrators
    deallocate and the GPU hash reuses blocks,
    mapper_initialization.cpp:382-387). Callers must also reset the freed
    slots' voxel channels (weights/log-odds to zero) so the recycled rows
    start clean. Already-freed or out-of-range entries are ignored.
    """
    cap = state.block_index_of_slot.shape[0]
    safe = jnp.clip(slots_to_free, 0, cap - 1)
    bidx = state.block_index_of_slot[safe]
    ok = ((slots_to_free >= 0) & (slots_to_free < cap)
          & (safe < state.alloc_count)
          & (bidx[:, 0] < FREED_BLOCK_SENTINEL))
    cells = bidx - state.origin_block
    dims = jnp.asarray(state.slot_grid.shape, jnp.int32)
    cells = jnp.where(ok[:, None], jnp.clip(cells, 0, dims - 1), dims)
    slot_grid = state.slot_grid.at[cells[:, 0], cells[:, 1], cells[:, 2]].set(
        -1, mode="drop")
    # Mark freed rows so region/AABB math never sees their stale indices.
    mark = jnp.where(ok, safe, cap)
    block_index_of_slot = state.block_index_of_slot.at[mark].set(
        FREED_BLOCK_SENTINEL, mode="drop")
    # Push onto the free stack.
    order = jnp.cumsum(ok.astype(jnp.int32)) - 1
    push = jnp.where(ok, state.free_count + order, cap)
    free_stack = state.free_stack.at[push].set(safe, mode="drop")
    return dataclasses.replace(
        state, slot_grid=slot_grid, block_index_of_slot=block_index_of_slot,
        free_stack=free_stack,
        free_count=state.free_count + jnp.sum(ok.astype(jnp.int32)))
