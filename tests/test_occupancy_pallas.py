"""Pallas occupancy integrator vs the XLA reference (ops/occupancy.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from isaac_ros_nvblox_tpu.models.camera import Camera
from isaac_ros_nvblox_tpu.ops.occupancy import (OccupancyIntegratorParams,
                                                integrate_occupancy)
from isaac_ros_nvblox_tpu.ops.occupancy_pallas import (
    integrate_occupancy_pallas)

CAM = Camera(fx=160.0, fy=160.0, cx=79.5, cy=59.5, width=160, height=120)
VOXEL = 0.05
INTERP = jax.default_backend() == "cpu"


def _setup(n_blocks=64, cap=256, seed=0):
    rng = np.random.RandomState(seed)
    bidx = np.stack([rng.randint(-6, 6, n_blocks),
                     rng.randint(-5, 5, n_blocks),
                     rng.randint(1, 11, n_blocks)], axis=1).astype(np.int32)
    bidx = np.unique(bidx, axis=0)
    n = bidx.shape[0]
    slots = np.concatenate([np.arange(n, dtype=np.int32),
                            [cap]]).astype(np.int32)
    bidx = np.concatenate([bidx, [[0, 0, 0]]]).astype(np.int32)
    T = np.eye(4, dtype=np.float32)
    T[2, 3] = -0.4
    lo = jnp.zeros((cap, 512), jnp.float32)
    obs = jnp.zeros((cap, 512), jnp.uint8)
    return lo, obs, jnp.asarray(slots), jnp.asarray(bidx), jnp.asarray(T)


def _run_both(depth, params, seed=0):
    lo, obs, slots, bidx, T = _setup(seed=seed)
    ref = integrate_occupancy(lo + 0, obs + 0, slots, bidx, depth, T,
                              camera=CAM, voxel_size_m=VOXEL, params=params)
    pal = integrate_occupancy_pallas(lo + 0, obs + 0, slots, bidx, depth, T,
                                     camera=CAM, voxel_size_m=VOXEL,
                                     params=params, interpret=INTERP)
    return ref, pal


def test_flat_wall_exact_match():
    depth = jnp.full((CAM.height, CAM.width), 2.0, jnp.float32)
    params = OccupancyIntegratorParams()
    (lo_r, obs_r), (lo_p, obs_p) = _run_both(depth, params)
    assert float(jnp.max(obs_r.astype(jnp.int32))) > 0
    np.testing.assert_allclose(np.asarray(lo_p), np.asarray(lo_r), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(obs_p), np.asarray(obs_r))


def test_textured_depth_statistical_match():
    rng = np.random.RandomState(1)
    base = 2.0 + 0.3 * np.sin(np.linspace(0, 6, CAM.width))[None, :]
    depth = jnp.asarray(np.broadcast_to(base, (CAM.height, CAM.width))
                        + rng.rand(CAM.height, CAM.width) * 0.01, jnp.float32)
    params = OccupancyIntegratorParams()
    (lo_r, obs_r), (lo_p, obs_p) = _run_both(depth, params)
    m_r = np.asarray(obs_r) > 0
    m_p = np.asarray(obs_p) > 0
    assert (m_r == m_p).mean() > 0.995
    both = m_r & m_p
    # Log-odds deltas are band assignments; decimated sampling may flip
    # voxels near band edges only.
    agree = (np.asarray(lo_p)[both] == np.asarray(lo_r)[both]).mean()
    assert agree > 0.97, agree


def test_padding_rows_untouched():
    depth = jnp.full((CAM.height, CAM.width), 2.0, jnp.float32)
    params = OccupancyIntegratorParams()
    lo, obs, slots, bidx, T = _setup()
    lo = lo.at[100].set(7.0)
    lo_p, obs_p = integrate_occupancy_pallas(
        lo, obs, slots[:1], bidx[:1], depth, T, camera=CAM,
        voxel_size_m=VOXEL, params=params, interpret=INTERP)
    np.testing.assert_array_equal(np.asarray(lo_p)[100], 7.0)


def test_lowers_for_tpu():
    depth = jnp.full((CAM.height, CAM.width), 2.0, jnp.float32)
    params = OccupancyIntegratorParams()
    lo, obs, slots, bidx, T = _setup()

    def f(lo, obs):
        return integrate_occupancy_pallas(lo, obs, slots, bidx, depth, T,
                                          camera=CAM, voxel_size_m=VOXEL,
                                          params=params)
    jax.jit(f).trace(lo, obs).lower(lowering_platforms=("tpu",))
