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
