"""BlockTable / BlockPool unit tests."""

import jax.numpy as jnp
import numpy as np

from isaac_ros_nvblox_tpu.core.block_pool import (NEIGHBOR_OFFSETS,
                                                  SELF_NEIGHBOR_INDEX,
                                                  BlockPool, BlockTable,
                                                  pad_to_bucket)


def test_allocate_and_lookup():
    t = BlockTable(64)
    idx = np.array([[0, 0, 0], [1, 0, 0], [0, 0, 0]], np.int32)
    slots, fresh = t.allocate(idx)
    assert slots[0] == slots[2]
    assert fresh.tolist() == [True, True, False]
    assert t.num_allocated == 2
    assert t.slot_of((1, 0, 0)) == slots[1]
    assert t.slot_of((9, 9, 9)) == -1


def test_neighbor_table_wiring():
    t = BlockTable(64)
    (s0, s1), _ = t.allocate(np.array([[0, 0, 0], [1, 0, 0]], np.int32))
    assert t.neighbors[s0, SELF_NEIGHBOR_INDEX] == s0
    # Neighbor offset (+1, 0, 0) of block 0 is block 1.
    n_plus_x = int(np.where((NEIGHBOR_OFFSETS == [1, 0, 0]).all(axis=1))[0][0])
    n_minus_x = int(np.where((NEIGHBOR_OFFSETS == [-1, 0, 0]).all(axis=1))[0][0])
    assert t.neighbors[s0, n_plus_x] == s1
    assert t.neighbors[s1, n_minus_x] == s0
    t.free([(1, 0, 0)])
    assert t.neighbors[s0, n_plus_x] == -1
    assert t.slot_of((1, 0, 0)) == -1
    # Reallocation reuses the freed slot and rewires.
    (s1b,), _ = t.allocate(np.array([[1, 0, 0]], np.int32))
    assert t.neighbors[s0, n_plus_x] == s1b


def test_pool_grow_preserves_contents():
    t = BlockTable(4)
    pool = BlockPool(t, {"d": ((), jnp.float32)}, init_values={"d": -7.0})
    slots, _ = t.allocate(np.array([[0, 0, 0]], np.int32))
    pool["d"] = pool["d"].at[slots[0], 0].set(3.5)
    pool.ensure_capacity(needed_free=10)
    assert t.capacity >= 8
    assert float(pool["d"][slots[0], 0]) == 3.5
    assert float(pool["d"][t.capacity - 1, 0]) == -7.0


def test_aabb_of_allocated_blocks():
    t = BlockTable(16)
    t.allocate(np.array([[0, 0, 0], [2, -1, 1]], np.int32))
    lo, hi = t.aabb_of_allocated_blocks(voxel_size_m=0.1)  # block size 0.8
    np.testing.assert_allclose(lo, [0.0, -0.8, 0.0])
    np.testing.assert_allclose(hi, [2.4, 0.8, 1.6])


def test_pad_to_bucket():
    assert pad_to_bucket(0) == 64
    assert pad_to_bucket(64) == 64
    assert pad_to_bucket(65) == 128
    assert pad_to_bucket(1000) == 1024
