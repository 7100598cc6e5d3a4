"""Dense separable ESDF (ops/esdf_dense.py): exact-match + semantics tests.

Invariant (CLAUDE.md): every Pallas kernel has an exact-match test against
an XLA/numpy reference, run in interpret mode on CPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaac_ros_nvblox_tpu.ops import esdf_dense as ed


def _random_site_map(rng, dims_b, n_blocks, cap=64, p_site=0.02):
    """Random allocated blocks with sparse sites."""
    Nx, Ny, Nz = dims_b
    all_cells = np.stack(np.meshgrid(np.arange(Nx), np.arange(Ny),
                                     np.arange(Nz), indexing="ij"),
                         -1).reshape(-1, 3)
    sel = rng.choice(len(all_cells), size=min(n_blocks, len(all_cells)),
                     replace=False)
    cells = np.zeros((cap, 3), np.int32)
    cells[:len(sel)] = all_cells[sel]
    is_site = np.zeros((cap, 512), bool)
    is_site[:len(sel)] = rng.random((len(sel), 512)) < p_site
    return cells, is_site, len(sel)


@pytest.mark.parametrize("band", [5, 12, 17])
@pytest.mark.parametrize("dims_b", [(4, 3, 2), (2, 2, 5)])
def test_dense_edt_matches_reference(band, dims_b):
    rng = np.random.default_rng(42 + band)
    cells, is_site, n = _random_site_map(rng, dims_b, n_blocks=14)
    origin = np.array([3, -2, 7], np.int32)  # arbitrary world offset
    bidx = cells + origin

    sq = ed.esdf_from_sites_dense(
        jnp.asarray(is_site), jnp.asarray(bidx), jnp.int32(n),
        jnp.asarray(origin), dims_b=dims_b, band=band, interpret=True)
    ref = ed.esdf_from_sites_reference(is_site, cells, n, dims_b, band)

    got = np.asarray(sq)
    # Slots outside alloc_count are INF in both.
    np.testing.assert_array_equal(got, ref)


def test_dense_edt_brute_force_euclidean():
    """Distances equal true nearest-site squared Euclidean distances."""
    rng = np.random.default_rng(7)
    dims_b = (3, 3, 2)
    band = 14
    cells, is_site, n = _random_site_map(rng, dims_b, n_blocks=18,
                                         p_site=0.01)
    origin = np.zeros(3, np.int32)
    sq = np.asarray(ed.esdf_from_sites_dense(
        jnp.asarray(is_site), jnp.asarray(cells), jnp.int32(n),
        jnp.asarray(origin), dims_b=dims_b, band=band, interpret=True))

    # Gather global site coordinates.
    sites = []
    lx, ly, lz = np.unravel_index(np.arange(512), (8, 8, 8))
    for s in range(n):
        m = is_site[s]
        if m.any():
            base = cells[s] * 8
            sites.append(base + np.stack([lx[m], ly[m], lz[m]], 1))
    sites = np.concatenate(sites)

    for s in range(0, n, 5):
        for v in range(0, 512, 97):
            p = cells[s] * 8 + np.array([lx[v], ly[v], lz[v]])
            d = np.min(np.sum((sites - p) ** 2, axis=1))
            if d <= band * band:
                assert sq[s, v] == pytest.approx(d), (s, v)
            else:
                assert sq[s, v] >= ed.INF * 0.5


def test_dense_edt_unallocated_gap_propagation():
    """Distances propagate across unallocated gaps (exact Euclidean),
    and out-of-region slots return INF."""
    cap = 8
    dims_b = (4, 1, 1)
    band = 20
    cells = np.zeros((cap, 3), np.int32)
    cells[0] = (0, 0, 0)
    cells[1] = (3, 0, 0)   # gap of 2 blocks between
    is_site = np.zeros((cap, 512), bool)
    is_site[0, 0] = True   # site at voxel (0,0,0)
    sq = np.asarray(ed.esdf_from_sites_dense(
        jnp.asarray(is_site), jnp.asarray(cells), jnp.int32(2),
        jnp.asarray(np.zeros(3, np.int32)), dims_b=dims_b, band=band,
        interpret=True))
    # Block 1 voxel (24 + 0, 0, 0) -> lane 0: distance 24^2? out of band(20).
    assert sq[1, 0] >= ed.INF * 0.5
    # Voxel x=24 is 24 away: > band. Try a site closer: lane for lx=7 in
    # block 0 is 7*64 = 448 -> global x=7; block1 lx=0 is x=24, d=17^2=289.
    is_site[0, 448] = True
    sq = np.asarray(ed.esdf_from_sites_dense(
        jnp.asarray(is_site), jnp.asarray(cells), jnp.int32(2),
        jnp.asarray(np.zeros(3, np.int32)), dims_b=dims_b, band=band,
        interpret=True))
    assert sq[1, 0] == pytest.approx(17.0 ** 2)
    # Slot 2 is unallocated -> INF.
    assert np.all(sq[2] >= ed.INF * 0.5)


def test_dense_edt_corridor_pruned_programs_exact():
    """Line-pruning skip: a long corridor whose AABB is mostly empty space
    produces many all-INF pass programs; the skip branch must write INF
    bit-exactly and leave occupied lines untouched (exact-match vs the
    dense numpy reference)."""
    band = 12
    dims_b = (12, 4, 2)  # long in x; blocks cluster at both x ends
    cap = 64
    rng = np.random.default_rng(11)
    corner_cells = []
    for cx in (0, 1, 10, 11):
        for cy in range(2):
            for cz in range(2):
                corner_cells.append((cx, cy, cz))
    cells = np.zeros((cap, 3), np.int32)
    cells[:len(corner_cells)] = np.asarray(corner_cells, np.int32)
    n = len(corner_cells)
    is_site = np.zeros((cap, 512), bool)
    is_site[:n] = rng.random((n, 512)) < 0.01
    origin = np.array([-5, 2, 0], np.int32)
    bidx = cells + origin

    sq = ed.esdf_from_sites_dense(
        jnp.asarray(is_site), jnp.asarray(bidx), jnp.int32(n),
        jnp.asarray(origin), dims_b=dims_b, band=band, interpret=True)
    ref = ed.esdf_from_sites_reference(is_site, cells, n, dims_b, band)
    np.testing.assert_array_equal(np.asarray(sq), ref)


def test_dense_edt_all_empty_region():
    """Every program skipped (no sites at all) -> all INF, no crash."""
    cap = 16
    cells = np.zeros((cap, 3), np.int32)
    cells[0] = (1, 1, 0)
    is_site = np.zeros((cap, 512), bool)  # allocated but zero sites
    sq = ed.esdf_from_sites_dense(
        jnp.asarray(is_site), jnp.asarray(cells), jnp.int32(1),
        jnp.asarray(np.zeros(3, np.int32)), dims_b=(3, 3, 1), band=8,
        interpret=True)
    assert np.all(np.asarray(sq) == ed.INF)
