"""Block pool: the TPU-native replacement for nvblox's GPU voxel hash map.

The reference stores each layer as a stdgpu spatial hash of 8x8x8 voxel
blocks (SURVEY.md §2.1 "VoxelBlock layers"). A GPU hash table is a poor fit
for XLA (dynamic shapes, pointer chasing), so the TPU design is:

  * a fixed-capacity **slot pool**: every voxel channel is a dense, statically
    shaped device array `[capacity, 512, ...]` (512 = 8^3 voxels, flattened);
  * a **host-side index**: `dict[(bx,by,bz) -> slot]` plus a free-list. Block
    allocation is slot assignment on the host (cheap: thousands of dict ops
    per frame); all voxel math stays on device over gathered slot batches;
  * an incrementally maintained **neighbor table** `i32[capacity, 27]` giving
    the slot of each of a block's 27-neighborhood blocks (-1 if absent). This
    is what makes halo exchange for ESDF sweeps and marching cubes a pair of
    static gathers instead of hash probes.

All jitted kernels take `(channel arrays, slots, block_indices)` with slot
batches padded to power-of-two buckets, so the number of distinct compiled
shapes is O(log capacity) per kernel.

Reference parity notes: `allocateBlockAtIndex` / `getAABBOfAllocatedBlocks` /
`callFunctionOnAllVoxels` (call-sites in
nvblox_ros/test/unit_tests/test_esdf_and_gradient_conversions.cpp:87-114,
nvblox_ros/src/lib/conversions/esdf_and_gradients_conversions.cu:65) map to
`allocate`, `aabb_of_allocated_blocks`, and plain vectorized array ops here.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isaac_ros_nvblox_tpu.core.types import (
    VOXELS_PER_BLOCK,
    VOXELS_PER_SIDE,
    block_size_m,
)

# 27-neighborhood offsets in a fixed order; index 13 is (0,0,0) == self.
NEIGHBOR_OFFSETS: np.ndarray = np.array(
    [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)],
    dtype=np.int32,
)
SELF_NEIGHBOR_INDEX: int = 13


def pad_to_bucket(n: int, minimum: int = 64) -> int:
    """Round `n` up to a power-of-two bucket to bound jit recompiles."""
    if n <= 0:
        return minimum
    b = minimum
    while b < n:
        b *= 2
    return b


class BlockTable:
    """Host-side block index: (bx,by,bz) -> slot, free-list, neighbor table.

    One table is shared by all voxel layers of a mapper (they are allocated
    together by the view calculator, mirroring how the reference allocates
    TSDF/color/mesh/ESDF blocks for the same view).
    """

    def __init__(self, capacity: int = 4096):
        self.capacity = int(capacity)
        self._index: Dict[Tuple[int, int, int], int] = {}
        self._free: List[int] = list(range(self.capacity - 1, -1, -1))
        # Host mirrors.
        self.block_indices = np.zeros((self.capacity, 3), np.int32)
        self.allocated = np.zeros((self.capacity,), bool)
        self.neighbors = np.full((self.capacity, 27), -1, np.int32)
        self._generation = 0  # bumped on every allocate/free batch

    # ------------------------------------------------------------------ sizes
    @property
    def num_allocated(self) -> int:
        return self.capacity - len(self._free)

    @property
    def generation(self) -> int:
        return self._generation

    def __contains__(self, idx: Tuple[int, int, int]) -> bool:
        return tuple(int(v) for v in idx) in self._index

    def slot_of(self, idx: Tuple[int, int, int]) -> int:
        """Slot of block `idx`, or -1."""
        return self._index.get(tuple(int(v) for v in idx), -1)

    def allocated_slots(self) -> np.ndarray:
        return np.nonzero(self.allocated)[0].astype(np.int32)

    def allocated_block_indices(self) -> np.ndarray:
        return self.block_indices[self.allocated]

    # ------------------------------------------------------------- allocation
    def allocate(self, indices: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Ensure blocks exist; return (slots i32[M], newly_allocated bool[M]).

        `indices` is `i32[M, 3]` (duplicates allowed). Raises if capacity is
        exhausted — callers should `grow()` the pool first (see
        `BlockPool.ensure_capacity`).
        """
        indices = np.asarray(indices, np.int32).reshape(-1, 3)
        slots = np.empty((indices.shape[0],), np.int32)
        fresh = np.zeros((indices.shape[0],), bool)
        new_any = False
        for i, key in enumerate(map(tuple, indices.tolist())):
            slot = self._index.get(key)
            if slot is None:
                if not self._free:
                    raise MemoryError(
                        f"BlockTable capacity {self.capacity} exhausted")
                slot = self._free.pop()
                self._index[key] = slot
                self.block_indices[slot] = key
                self.allocated[slot] = True
                self._wire_neighbors(key, slot)
                fresh[i] = True
                new_any = True
            slots[i] = slot
        if new_any:
            self._generation += 1
        return slots, fresh

    def free(self, indices: Iterable[Tuple[int, int, int]]) -> np.ndarray:
        """Deallocate blocks; returns the freed slots."""
        freed = []
        for key in indices:
            key = tuple(int(v) for v in key)
            slot = self._index.pop(key, None)
            if slot is None:
                continue
            self.allocated[slot] = False
            self._unwire_neighbors(key, slot)
            self._free.append(slot)
            freed.append(slot)
        if freed:
            self._generation += 1
        return np.asarray(freed, np.int32)

    def _wire_neighbors(self, key: Tuple[int, int, int], slot: int) -> None:
        bx, by, bz = key
        for n, (dx, dy, dz) in enumerate(NEIGHBOR_OFFSETS.tolist()):
            nkey = (bx + dx, by + dy, bz + dz)
            nslot = self._index.get(nkey)
            self.neighbors[slot, n] = -1 if nslot is None else nslot
            if nslot is not None:
                # The reciprocal offset position: 26 - n.
                self.neighbors[nslot, 26 - n] = slot

    def _unwire_neighbors(self, key: Tuple[int, int, int], slot: int) -> None:
        bx, by, bz = key
        for n, (dx, dy, dz) in enumerate(NEIGHBOR_OFFSETS.tolist()):
            nkey = (bx + dx, by + dy, bz + dz)
            nslot = self._index.get(nkey)
            if nslot is not None:
                self.neighbors[nslot, 26 - n] = -1
        self.neighbors[slot, :] = -1

    # -------------------------------------------------------------- geometry
    def aabb_of_allocated_blocks(self, voxel_size_m: float):
        """(min_m f64[3], max_m f64[3]) over allocated blocks, or None.

        Parity: `getAABBOfAllocatedBlocks`
        (esdf_and_gradients_conversions.cu:65).
        """
        if self.num_allocated == 0:
            return None
        bs = block_size_m(voxel_size_m)
        idx = self.allocated_block_indices().astype(np.float64)
        return idx.min(axis=0) * bs, (idx.max(axis=0) + 1.0) * bs

    def grow(self, new_capacity: int) -> None:
        assert new_capacity > self.capacity
        extra = new_capacity - self.capacity
        self.block_indices = np.concatenate(
            [self.block_indices, np.zeros((extra, 3), np.int32)])
        self.allocated = np.concatenate([self.allocated, np.zeros((extra,), bool)])
        self.neighbors = np.concatenate(
            [self.neighbors, np.full((extra, 27), -1, np.int32)])
        self._free = list(range(new_capacity - 1, self.capacity - 1, -1)) + self._free
        self.capacity = new_capacity
        self._generation += 1


class BlockPool:
    """A set of named voxel channels over one shared BlockTable.

    Channels are device arrays with leading shape `[capacity, 512]` plus
    optional trailing dims, e.g. `tsdf_distance: f32[cap, 512]`,
    `esdf_site: f32[cap, 512, 3]`. New slots are zero-initialized at
    allocation time via a masked scatter (`reset_slots`).
    """

    def __init__(self, table: BlockTable,
                 channel_specs: Dict[str, Tuple[Tuple[int, ...], jnp.dtype]],
                 init_values: Optional[Dict[str, float]] = None):
        self.table = table
        self.channel_specs = dict(channel_specs)
        self.init_values = dict(init_values or {})
        self.channels: Dict[str, jnp.ndarray] = {}
        for name, (trailing, dtype) in self.channel_specs.items():
            shape = (table.capacity, VOXELS_PER_BLOCK) + tuple(trailing)
            fill = self.init_values.get(name, 0)
            self.channels[name] = jnp.full(shape, fill, dtype=dtype)

    def reset_slots(self, slots: np.ndarray) -> None:
        """Re-initialize the given slots to their fill values (on device)."""
        if slots.size == 0:
            return
        s = jnp.asarray(slots, jnp.int32)
        for name in self.channels:
            fill = self.init_values.get(name, 0)
            ch = self.channels[name]
            self.channels[name] = ch.at[s].set(jnp.asarray(fill, ch.dtype))

    def ensure_capacity(self, needed_free: int) -> None:
        """Grow table + channels if fewer than `needed_free` slots remain."""
        free = self.table.capacity - self.table.num_allocated
        if free >= needed_free:
            return
        new_cap = max(self.table.capacity * 2,
                      self.table.capacity + needed_free)
        old_cap = self.table.capacity
        self.table.grow(new_cap)
        for name, arr in self.channels.items():
            fill = self.init_values.get(name, 0)
            pad = jnp.full((new_cap - old_cap,) + arr.shape[1:], fill, arr.dtype)
            self.channels[name] = jnp.concatenate([arr, pad], axis=0)

    # Convenience accessors -------------------------------------------------
    def __getitem__(self, name: str) -> jnp.ndarray:
        return self.channels[name]

    def __setitem__(self, name: str, value: jnp.ndarray) -> None:
        assert value.shape == self.channels[name].shape, (
            name, value.shape, self.channels[name].shape)
        self.channels[name] = value

    def gather(self, name: str, slots) -> jnp.ndarray:
        return self.channels[name][jnp.asarray(slots, jnp.int32)]

    def voxel_grid_view(self, name: str) -> jnp.ndarray:
        """Channel reshaped to `[cap, 8, 8, 8, ...]` (x, y, z voxel order)."""
        arr = self.channels[name]
        return arr.reshape((arr.shape[0],) + (VOXELS_PER_SIDE,) * 3 + arr.shape[2:])
