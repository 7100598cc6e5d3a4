"""Multi-device spatial sharding tests (8 virtual CPU devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaac_ros_nvblox_tpu.models.camera import Camera
from isaac_ros_nvblox_tpu.ops.tsdf import TsdfIntegratorParams
from isaac_ros_nvblox_tpu.parallel.spatial import (ShardedMapConfig,
                                                   make_example_sharded_state,
                                                   make_sharded_frame_step,
                                                   make_spatial_mesh)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 devices")


def test_sharded_frame_step_runs_and_allocates():
    mesh = make_spatial_mesh(8)
    camera = Camera(fx=80.0, fy=80.0, cx=39.5, cy=29.5, width=80, height=60)
    config = ShardedMapConfig(capacity_per_shard=64, blocks_per_frame=32)
    step = make_sharded_frame_step(mesh, camera, config,
                                   TsdfIntegratorParams())
    state = make_example_sharded_state(mesh, camera, config)
    distance, weight, esdf_sq, changed = step(*state)
    jax.block_until_ready(distance)
    assert distance.shape == (8 * 64, 512)
    # The depth frame (2 m wall) must have produced non-zero weights.
    assert float(jnp.max(weight)) > 0.0
    # psum'd change count is replicated identically across shards.
    ch = np.asarray(changed)
    assert ch.shape == (8,)
    assert (ch == ch[0]).all()


def test_sharded_step_is_deterministic():
    mesh = make_spatial_mesh(8)
    camera = Camera(fx=80.0, fy=80.0, cx=39.5, cy=29.5, width=80, height=60)
    config = ShardedMapConfig(capacity_per_shard=64, blocks_per_frame=32)
    step = make_sharded_frame_step(mesh, camera, config,
                                   TsdfIntegratorParams())
    out1 = step(*make_example_sharded_state(mesh, camera, config))
    out2 = step(*make_example_sharded_state(mesh, camera, config))
    np.testing.assert_array_equal(np.asarray(out1[0]), np.asarray(out2[0]))
    np.testing.assert_array_equal(np.asarray(out1[2]), np.asarray(out2[2]))


def test_dryrun_multichip_entry():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    # (state, distance, weight, dirty, esdf_dirty): the fused frame step
    # allocated blocks and fused the flat wall.
    state, distance = out[0], out[1]
    assert int(state.alloc_count) > 0
    assert distance.shape == args[1].shape
    assert float(jax.numpy.sum(jax.numpy.abs(distance))) > 0.0
