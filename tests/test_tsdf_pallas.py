"""Pallas TSDF integrator vs the XLA reference."""

import jax
import jax.numpy as jnp
import numpy as np

from isaac_ros_nvblox_tpu.models.camera import Camera
from isaac_ros_nvblox_tpu.ops.tsdf import (TsdfIntegratorParams,
                                           WeightingFunctionType,
                                           integrate_tsdf)
from isaac_ros_nvblox_tpu.ops.tsdf_pallas import integrate_tsdf_pallas

CAM = Camera(fx=160.0, fy=160.0, cx=79.5, cy=59.5, width=160, height=120)
VOXEL = 0.05
INTERP = jax.default_backend() == "cpu"


def _setup(depth, n_blocks=64, cap=256, seed=0):
    rng = np.random.RandomState(seed)
    # Blocks scattered in front of the camera (z in ~[0.4, 4.4] m).
    bidx = np.stack([rng.randint(-6, 6, n_blocks),
                     rng.randint(-5, 5, n_blocks),
                     rng.randint(1, 11, n_blocks)], axis=1).astype(np.int32)
    bidx = np.unique(bidx, axis=0)
    n = bidx.shape[0]
    slots = np.arange(n, dtype=np.int32)
    # Pad with an out-of-range (dropped) entry to exercise padding handling.
    slots = np.concatenate([slots, [cap]]).astype(np.int32)
    bidx = np.concatenate([bidx, [[0, 0, 0]]]).astype(np.int32)
    T = np.eye(4, dtype=np.float32)
    T[2, 3] = -0.4  # camera slightly behind the layer origin
    d0 = jnp.zeros((cap, 512), jnp.float32)
    w0 = jnp.zeros((cap, 512), jnp.float32)
    return d0, w0, jnp.asarray(slots), jnp.asarray(bidx), jnp.asarray(T)


def test_flat_wall_exact_match():
    """Constant-depth image is decimation-invariant -> exact agreement."""
    depth = jnp.full((CAM.height, CAM.width), 2.0, jnp.float32)
    params = TsdfIntegratorParams(
        weighting_mode=WeightingFunctionType.INVERSE_SQUARE_DROPOFF)
    d0, w0, slots, bidx, T = _setup(depth)
    d_ref, w_ref = integrate_tsdf(d0 + 0, w0 + 0, slots, bidx, depth, T,
                                  camera=CAM, voxel_size_m=VOXEL,
                                  params=params)
    d_pal, w_pal = integrate_tsdf_pallas(d0 + 0, w0 + 0, slots, bidx, depth,
                                         T, camera=CAM, voxel_size_m=VOXEL,
                                         params=params, interpret=INTERP)
    assert float(jnp.max(w_ref)) > 0.0  # something was integrated
    np.testing.assert_allclose(np.asarray(d_pal), np.asarray(d_ref),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(w_pal), np.asarray(w_ref),
                               atol=2e-5)


def test_textured_depth_statistical_match():
    """Varying depth: pallas samples decimated levels for near blocks, so
    values may differ at sub-voxel scale; distributions must agree."""
    rng = np.random.RandomState(1)
    base = 2.0 + 0.3 * np.sin(np.linspace(0, 6, CAM.width))[None, :]
    depth = jnp.asarray(np.broadcast_to(base, (CAM.height, CAM.width))
                        + rng.rand(CAM.height, CAM.width) * 0.01,
                        jnp.float32)
    params = TsdfIntegratorParams()
    d0, w0, slots, bidx, T = _setup(depth)
    d_ref, w_ref = integrate_tsdf(d0 + 0, w0 + 0, slots, bidx, depth, T,
                                  camera=CAM, voxel_size_m=VOXEL,
                                  params=params)
    d_pal, w_pal = integrate_tsdf_pallas(d0 + 0, w0 + 0, slots, bidx, depth,
                                         T, camera=CAM, voxel_size_m=VOXEL,
                                         params=params, interpret=INTERP)
    m_ref = np.asarray(w_ref) > 0
    m_pal = np.asarray(w_pal) > 0
    # Same voxels observed (tile always covers the footprint).
    agree = (m_ref == m_pal).mean()
    assert agree > 0.999, agree
    both = m_ref & m_pal
    err = np.abs(np.asarray(d_pal)[both] - np.asarray(d_ref)[both])
    assert np.median(err) < 0.01     # sub-voxel sampling differences only
    assert np.percentile(err, 99) < 0.05


def test_padding_rows_untouched():
    depth = jnp.full((CAM.height, CAM.width), 2.0, jnp.float32)
    params = TsdfIntegratorParams()
    d0, w0, slots, bidx, T = _setup(depth)
    d0 = d0.at[100].set(7.0)  # an unrelated allocated row
    d_pal, w_pal = integrate_tsdf_pallas(
        d0, w0, slots[:1], bidx[:1], depth, T, camera=CAM,
        voxel_size_m=VOXEL, params=params, interpret=INTERP)
    # Row 100 was not in the batch -> unchanged.
    np.testing.assert_array_equal(np.asarray(d_pal)[100], 7.0)
