"""Pallas lidar TSDF integrator vs the XLA reference (spherical model)."""

import jax
import jax.numpy as jnp
import numpy as np

from isaac_ros_nvblox_tpu.models.lidar import Lidar
from isaac_ros_nvblox_tpu.ops.lidar_pallas import integrate_tsdf_lidar_pallas
from isaac_ros_nvblox_tpu.ops.tsdf import (TsdfIntegratorParams,
                                           integrate_tsdf_lidar)

VOXEL = 0.05
INTERP = jax.default_backend() == "cpu"
LIDAR = Lidar.equal_vertical_fov(num_azimuth=512, num_elevation=32,
                                 vertical_fov_rad=np.deg2rad(30.0),
                                 min_range_m=0.4, max_range_m=20.0)


def _setup(n_blocks=64, cap=256, seed=0, near_seam=False):
    rng = np.random.RandomState(seed)
    if near_seam:
        # Blocks clustered around -x (azimuth ~ +-pi, the wrap seam).
        bidx = np.stack([rng.randint(-12, -4, n_blocks),
                         rng.randint(-3, 3, n_blocks),
                         rng.randint(-2, 2, n_blocks)], 1).astype(np.int32)
    else:
        bidx = np.stack([rng.randint(-10, 10, n_blocks),
                         rng.randint(-10, 10, n_blocks),
                         rng.randint(-2, 2, n_blocks)], 1).astype(np.int32)
    bidx = np.unique(bidx, axis=0)
    n = bidx.shape[0]
    slots = np.concatenate([np.arange(n, dtype=np.int32),
                            [cap]]).astype(np.int32)
    bidx = np.concatenate([bidx, [[0, 0, 0]]]).astype(np.int32)
    T = np.eye(4, dtype=np.float32)
    d0 = jnp.zeros((cap, 512), jnp.float32)
    w0 = jnp.zeros((cap, 512), jnp.float32)
    return d0, w0, jnp.asarray(slots), jnp.asarray(bidx), jnp.asarray(T)


def _run_both(range_image, params, **kw):
    d0, w0, slots, bidx, T = _setup(**kw)
    ref = integrate_tsdf_lidar(d0 + 0, w0 + 0, slots, bidx, range_image, T,
                               lidar=LIDAR, voxel_size_m=VOXEL,
                               params=params)
    pal = integrate_tsdf_lidar_pallas(d0 + 0, w0 + 0, slots, bidx,
                                      range_image, T, lidar=LIDAR,
                                      voxel_size_m=VOXEL, params=params,
                                      interpret=INTERP)
    return ref, pal


def test_constant_range_exact_match():
    """A constant-range shell is decimation-invariant -> exact agreement."""
    ri = jnp.full((LIDAR.num_elevation_divisions,
                   LIDAR.num_azimuth_divisions), 3.0, jnp.float32)
    params = TsdfIntegratorParams(max_integration_distance_m=5.0)
    (d_r, w_r), (d_p, w_p) = _run_both(ri, params)
    assert float(jnp.max(w_r)) > 0.0
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_r), atol=2e-5)
    np.testing.assert_allclose(np.asarray(w_p), np.asarray(w_r), atol=2e-5)


def test_wrap_seam_blocks_match():
    """Blocks straddling the -pi/pi azimuth seam sample the wrap margin;
    the XLA path clamps at the seam, so compare statistically."""
    rng = np.random.RandomState(2)
    base = 3.0 + 0.3 * np.sin(
        np.linspace(0, 4 * np.pi, LIDAR.num_azimuth_divisions))[None, :]
    ri = jnp.asarray(np.broadcast_to(
        base, (LIDAR.num_elevation_divisions,
               LIDAR.num_azimuth_divisions)).copy()
        + rng.rand(LIDAR.num_elevation_divisions,
                   LIDAR.num_azimuth_divisions) * 0.01, jnp.float32)
    params = TsdfIntegratorParams(max_integration_distance_m=6.0)
    (d_r, w_r), (d_p, w_p) = _run_both(ri, params, near_seam=True)
    m_r = np.asarray(w_r) > 0
    m_p = np.asarray(w_p) > 0
    assert m_r.sum() > 1000
    assert (m_r == m_p).mean() > 0.995
    both = m_r & m_p
    err = np.abs(np.asarray(d_p)[both] - np.asarray(d_r)[both])
    assert np.median(err) < 0.01
    assert np.percentile(err, 99) < 0.05


def test_padding_rows_untouched():
    ri = jnp.full((LIDAR.num_elevation_divisions,
                   LIDAR.num_azimuth_divisions), 3.0, jnp.float32)
    params = TsdfIntegratorParams()
    d0, w0, slots, bidx, T = _setup()
    d0 = d0.at[100].set(7.0)
    d_p, _ = integrate_tsdf_lidar_pallas(
        d0, w0, slots[:1], bidx[:1], ri, T, lidar=LIDAR, voxel_size_m=VOXEL,
        params=params, interpret=INTERP)
    np.testing.assert_array_equal(np.asarray(d_p)[100], 7.0)


def test_lowers_for_tpu():
    ri = jnp.full((LIDAR.num_elevation_divisions,
                   LIDAR.num_azimuth_divisions), 3.0, jnp.float32)
    params = TsdfIntegratorParams()
    d0, w0, slots, bidx, T = _setup()

    def f(d, w):
        return integrate_tsdf_lidar_pallas(d, w, slots, bidx, ri, T,
                                           lidar=LIDAR, voxel_size_m=VOXEL,
                                           params=params)
    jax.jit(f).trace(d0, w0).lower(lowering_platforms=("tpu",))
