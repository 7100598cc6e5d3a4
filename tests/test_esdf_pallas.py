"""Pallas ESDF relaxation kernel vs the XLA reference sweep."""

import jax
import jax.numpy as jnp
import numpy as np

from isaac_ros_nvblox_tpu.ops import esdf_pallas as ep


def _random_state(n_blocks=16, seed=0, site_frac=0.05):
    """Random padded SoA site arrays + block origins."""
    rng = np.random.RandomState(seed)
    origins = rng.randint(-4, 4, size=(n_blocks, 3)).astype(np.float32) * 8.0
    sx = np.full((n_blocks, ep.V_PAD), ep.SENTINEL, np.float32)
    sy = np.full((n_blocks, ep.V_PAD), ep.SENTINEL, np.float32)
    sz = np.full((n_blocks, ep.V_PAD), ep.SENTINEL, np.float32)
    lanes = np.arange(ep.V)
    x, y, z = lanes // 100, (lanes // 10) % 10, lanes % 10
    for b in range(n_blocks):
        m = rng.rand(ep.V) < site_frac
        sx[b, :ep.V][m] = origins[b, 0] - 1 + x[m]
        sy[b, :ep.V][m] = origins[b, 1] - 1 + y[m]
        sz[b, :ep.V][m] = origins[b, 2] - 1 + z[m]
    return origins, sx, sy, sz


def _reference_relax(origins, sx, sy, sz, inner_iters, max_sq):
    """Straightforward numpy implementation of the same relaxation."""
    n = origins.shape[0]
    lanes = np.arange(ep.V_PAD)
    lx, ly, lz = lanes // 100, (lanes // 10) % 10, lanes % 10
    cx = origins[:, 0:1] - 1 + lx[None]
    cy = origins[:, 1:2] - 1 + ly[None]
    cz = origins[:, 2:3] - 1 + lz[None]
    masks = ep._shift_masks()
    sx, sy, sz = sx.copy(), sy.copy(), sz.copy()
    for _ in range(inner_iters):
        best = np.minimum((cx - sx) ** 2 + (cy - sy) ** 2 + (cz - sz) ** 2,
                          1e18)
        nsx, nsy, nsz = sx.copy(), sy.copy(), sz.copy()
        for s, (dx, dy, dz) in enumerate(ep._SHIFTS):
            off = 100 * dx + 10 * dy + dz
            rx = np.roll(sx, -off, axis=1)
            ry = np.roll(sy, -off, axis=1)
            rz = np.roll(sz, -off, axis=1)
            rx = np.where(masks[s][None], rx, ep.SENTINEL)
            cand = (cx - rx) ** 2 + (cy - ry) ** 2 + (cz - rz) ** 2
            better = (cand < best) & (cand <= max_sq)
            best = np.where(better, cand, best)
            nsx = np.where(better, rx, nsx)
            nsy = np.where(better, ry, nsy)
            nsz = np.where(better, rz, nsz)
            sx, sy, sz = nsx, nsy, nsz
        sx, sy, sz = nsx, nsy, nsz
    return sx, sy, sz


def test_pallas_kernel_matches_reference():
    origins, sx, sy, sz = _random_state(n_blocks=16)
    max_sq = 40.0 ** 2
    ref = _reference_relax(origins, sx, sy, sz, inner_iters=8, max_sq=max_sq)
    got = ep.relax_blocks_pallas(
        jnp.asarray(origins), jnp.asarray(sx), jnp.asarray(sy),
        jnp.asarray(sz), inner_iters=8, max_sq=max_sq,
        interpret=jax.default_backend() == "cpu")
    for g, r, name in zip(got, ref, "xyz"):
        g = np.asarray(g)[:, :ep.V]
        r = r[:, :ep.V]
        np.testing.assert_allclose(g, r, atol=1e-4,
                                   err_msg=f"site_{name} mismatch")


def test_pallas_kernel_propagates_distance():
    """A single site at a block corner should fill the block with itself."""
    origins = np.zeros((8, 3), np.float32)
    sx = np.full((8, ep.V_PAD), ep.SENTINEL, np.float32)
    sy = np.full((8, ep.V_PAD), ep.SENTINEL, np.float32)
    sz = np.full((8, ep.V_PAD), ep.SENTINEL, np.float32)
    # Site at padded-local (1,1,1) -> global (0,0,0) for block 0.
    lane = 1 * 100 + 1 * 10 + 1
    sx[0, lane] = 0.0
    sy[0, lane] = 0.0
    sz[0, lane] = 0.0
    got = ep.relax_blocks_pallas(
        jnp.asarray(origins), jnp.asarray(sx), jnp.asarray(sy),
        jnp.asarray(sz), inner_iters=8, max_sq=1e6,
        interpret=jax.default_backend() == "cpu")
    gx = np.asarray(got[0])[0, :ep.V]
    # Every real voxel of block 0 now references the site.
    assert (gx == 0.0).all()
    # Other blocks untouched (no sites, no halo connectivity in this test).
    assert (np.asarray(got[0])[1, :ep.V] == ep.SENTINEL).all()


def test_packed_sweeps_match_f32_path():
    """The packed-site ESDF must produce the same distances as the f32 path."""
    from isaac_ros_nvblox_tpu.core import world_grid as wg
    from isaac_ros_nvblox_tpu.mapper.device_mapper import DeviceMapper
    from isaac_ros_nvblox_tpu.models.camera import Camera
    from isaac_ros_nvblox_tpu.models.scene import Scene, Sphere, orbit_pose, render_depth

    CAM = Camera(fx=120.0, fy=120.0, cx=59.5, cy=44.5, width=120, height=90)
    scene = Scene(primitives=(Sphere(center=(0.0, 0.0, 1.2), radius=0.5),))
    kwargs = dict(voxel_size_m=0.05,
                  world=wg.WorldGridConfig(dims=(64, 64, 32), capacity=2048,
                                           origin_block=(-32, -32, -8)),
                  enable_color=False, enable_esdf=True)
    a = DeviceMapper(**kwargs)  # XLA f32 path
    b = DeviceMapper(**kwargs)  # packed pallas path (interpret on CPU)
    T = orbit_pose(0.0, radius=2.0, height=1.2, target=(0, 0, 1.2))
    depth = render_depth(scene, CAM, jnp.asarray(T))
    a.integrate_depth(depth, T, CAM)
    b.integrate_depth(depth, T, CAM)
    a.update_esdf(use_pallas=False)
    b.update_esdf(use_pallas=True, full=True)
    n = a.block_count()
    sq_a = np.asarray(a.channels["esdf_sq_dist"])[:n]
    sq_b = np.asarray(b.channels["esdf_sq_dist"])[:n]
    resolved = (sq_a < 1e11) | (sq_b < 1e11)
    assert resolved.sum() > 1000
    np.testing.assert_allclose(sq_a[resolved], sq_b[resolved], atol=1e-3)

    # Warm update converges to the same result when nothing changed.
    b.update_esdf(use_pallas=True, full=False)
    sq_b2 = np.asarray(b.channels["esdf_sq_dist"])[:n]
    np.testing.assert_allclose(sq_b2[resolved], sq_a[resolved], atol=1e-3)
