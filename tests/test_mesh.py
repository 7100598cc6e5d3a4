"""Marching-cubes tests: table validity, watertightness, orientation.

Watertightness/orientation are checked via the divergence theorem: a closed,
outward-oriented triangulation of a sphere must have signed volume equal to
the sphere volume (catches missing triangles, flipped windings, and
cross-block cracks in one assertion).
"""

import jax.numpy as jnp
import numpy as np

from isaac_ros_nvblox_tpu.core.block_pool import BlockPool, BlockTable
from isaac_ros_nvblox_tpu.core.types import voxel_centers_for_blocks
from isaac_ros_nvblox_tpu.models.scene import Scene, Sphere
from isaac_ros_nvblox_tpu.ops.mesh import MeshLayer, mesh_dirty_blocks
from isaac_ros_nvblox_tpu.ops.mesh_tables import (MAX_TRIS_PER_CUBE,
                                                  build_tables)

VOXEL = 0.05


def test_tables_shape_and_complement_symmetry():
    tt, tc, ea, eb = build_tables()
    assert tt.shape == (256, MAX_TRIS_PER_CUBE * 3)
    assert tc[0] == 0 and tc[255] == 0
    # A configuration and its complement cut the same edges.
    for config in range(256):
        edges = set(e for e in tt[config] if e >= 0)
        edges_c = set(e for e in tt[255 - config] if e >= 0)
        assert edges == edges_c, config


def _mesh_analytic_sphere(radius=0.4, center=(0.33, 0.21, 0.17)):
    """Fill a TSDF pool from the analytic SDF and run marching cubes."""
    scene = Scene(primitives=(Sphere(center=center, radius=radius),))
    # Allocate blocks covering the sphere + margin.
    bs = 8 * VOXEL
    lo = np.floor((np.asarray(center) - radius - 4 * VOXEL) / bs).astype(int)
    hi = np.floor((np.asarray(center) + radius + 4 * VOXEL) / bs).astype(int)
    idx = np.array([(x, y, z)
                    for x in range(lo[0], hi[0] + 1)
                    for y in range(lo[1], hi[1] + 1)
                    for z in range(lo[2], hi[2] + 1)], np.int32)
    table = BlockTable(len(idx) + 8)
    pool = BlockPool(table, {
        "tsdf_distance": ((), jnp.float32),
        "tsdf_weight": ((), jnp.float32),
    })
    slots, _ = table.allocate(idx)
    centers = voxel_centers_for_blocks(jnp.asarray(idx), VOXEL)
    sdf = scene.sdf(centers)
    trunc = 4 * VOXEL
    d = jnp.clip(sdf, -trunc, trunc)
    pool["tsdf_distance"] = pool["tsdf_distance"].at[jnp.asarray(slots)].set(d)
    pool["tsdf_weight"] = pool["tsdf_weight"].at[jnp.asarray(slots)].set(1.0)

    layer = MeshLayer(VOXEL)
    mesh_dirty_blocks(layer, pool, table, slots)
    return scene, layer


def test_sphere_mesh_on_surface_and_watertight():
    radius = 0.4
    scene, layer = _mesh_analytic_sphere(radius=radius)
    verts, colors, tris = layer.as_arrays()
    assert tris.shape[0] > 100

    # All vertices lie on the analytic surface (within interpolation error).
    sdf_at_verts = np.asarray(scene.sdf(jnp.asarray(verts)))
    assert np.abs(sdf_at_verts).max() < 0.35 * VOXEL

    # Signed volume via divergence theorem. Requires global welding across
    # blocks -> weld by quantized position.
    q = np.round(verts / VOXEL * 1024.0).astype(np.int64)
    _, first, inv = np.unique(q, axis=0, return_index=True, return_inverse=True)
    tris_g = inv[tris]
    v = verts[first]
    p0, p1, p2 = v[tris_g[:, 0]], v[tris_g[:, 1]], v[tris_g[:, 2]]
    signed_vol = np.sum(np.einsum("ij,ij->i", p0, np.cross(p1, p2))) / 6.0
    expected = 4.0 / 3.0 * np.pi * radius ** 3
    # Positive (outward) and within 5% of the true volume.
    assert signed_vol > 0
    np.testing.assert_allclose(signed_vol, expected, rtol=0.05)

    # Watertight: every edge of the welded mesh is shared by exactly 2
    # triangles, once in each direction.
    from collections import Counter
    edge_count = Counter()
    for t in tris_g:
        for a, b in ((t[0], t[1]), (t[1], t[2]), (t[2], t[0])):
            edge_count[(a, b)] += 1
    for (a, b), cnt in edge_count.items():
        assert cnt == 1, "duplicate directed edge"
        assert edge_count.get((b, a), 0) == 1, "unmatched edge (crack)"


def test_mesh_updates_are_incremental():
    scene, layer = _mesh_analytic_sphere()
    n_blocks = len(layer.blocks)
    assert n_blocks > 4  # sphere spans multiple blocks
    total_tris = sum(b.triangles.shape[0] for b in layer.blocks.values())
    v, c, t = layer.as_arrays()
    assert t.shape[0] == total_tris
    # Removing a block removes its triangles.
    key = next(iter(layer.blocks))
    removed = layer.blocks[key].triangles.shape[0]
    layer.remove_blocks([key])
    v2, c2, t2 = layer.as_arrays()
    assert t2.shape[0] == total_tris - removed


def test_native_mesh_block_compaction():
    """compact_mesh_blocks (C + numpy fallback) must reproduce the
    per-block mask-indexing it replaced, in the same v-major slot order."""
    import isaac_ros_nvblox_tpu.native as native

    rng = np.random.RandomState(0)
    N, K, V = 7, 16, 512
    verts = rng.rand(N, 3, K, V).astype(np.float32)
    cols = rng.rand(N, 3, K, V).astype(np.float32)
    mask = rng.rand(N, K, V) < 0.05
    mask[:, 15, :] = False   # pad slot is never live

    off, v, c = native.compact_mesh_blocks(verts, cols, mask)
    pts = verts.transpose(0, 2, 3, 1)
    cc = cols.transpose(0, 2, 3, 1)
    for i in range(N):
        mk = mask[i].T.reshape(-1)
        ev = pts[i].transpose(1, 0, 2).reshape(-1, 3)[mk]
        ec = cc[i].transpose(1, 0, 2).reshape(-1, 3)[mk]
        a, b = int(off[i]), int(off[i + 1])
        assert b - a == ev.shape[0]
        np.testing.assert_array_equal(v[a:b], ev)
        np.testing.assert_array_equal(c[a:b], ec)

    # The numpy fallback agrees bit-for-bit with the native path.
    lib_save, tried_save = native._lib, native._tried
    try:
        native._lib, native._tried = None, True
        off2, v2, c2 = native.compact_mesh_blocks(verts, cols, mask)
    finally:
        native._lib, native._tried = lib_save, tried_save
    np.testing.assert_array_equal(off, off2)
    np.testing.assert_array_equal(v, v2)
    np.testing.assert_array_equal(c, c2)
