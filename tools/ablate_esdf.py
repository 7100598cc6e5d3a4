"""Ablate the in-scan ESDF update at bench shapes: sites vs solve vs splice.

The bench's esdf_ms (~1.7) is the marginal cost of esdf_every=1 inside the
replay scan: per frame it recomputes surface sites from the FULL pool,
runs the 3-pass banded EDT over the region AABB, and splices three
full-pool channels. This tool times each piece in isolation (64-step
scans, input varied per step, outputs fed to the carry — CLAUDE.md
methodology) at the real bench configuration (band from the default 2 m
esdf max distance, the bench room's AABB).
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))  # noqa: E401,E702

import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from isaac_ros_nvblox_tpu.core.world_grid import WorldGridConfig
    from isaac_ros_nvblox_tpu.mapper.device_mapper import DeviceMapper
    from isaac_ros_nvblox_tpu.mapper.params import MapperParams
    from isaac_ros_nvblox_tpu.models.camera import Camera
    from isaac_ros_nvblox_tpu.models.scene import (Box, RoomBox, Scene,
                                                   Sphere, orbit_pose,
                                                   render_depth)
    from isaac_ros_nvblox_tpu.ops import esdf as esdf_ops
    from isaac_ros_nvblox_tpu.ops.esdf_dense import esdf_from_sites_dense
    from isaac_ros_nvblox_tpu.ops.tsdf import TsdfIntegratorParams

    camera = Camera(fx=500.0, fy=500.0, cx=319.5, cy=239.5,
                    width=640, height=480)
    scene = Scene(primitives=(
        RoomBox(center=(0.0, 0.0, 1.5), half_extents=(3.0, 2.2, 1.5)),
        Sphere(center=(1.2, 0.8, 1.0), radius=0.5),
        Box(center=(-1.5, -1.0, 0.4), half_extents=(0.4, 0.4, 0.4)),
    ))
    n_frames, reps = 16, 4
    depths = jnp.stack([render_depth(scene, camera,
                                     jnp.asarray(orbit_pose(
                                         2 * np.pi * k / n_frames,
                                         radius=1.5)))
                        for k in range(n_frames)])
    poses = jnp.stack([jnp.asarray(orbit_pose(2 * np.pi * k / n_frames,
                                              radius=1.5))
                       for k in range(n_frames)])
    depths_r = jnp.concatenate([depths] * reps)
    poses_r = jnp.concatenate([poses] * reps)
    n_steps = int(depths_r.shape[0])

    params = MapperParams(
        projective=TsdfIntegratorParams(max_integration_distance_m=5.0))
    m = DeviceMapper(voxel_size_m=0.05, params=params,
                     world=WorldGridConfig(dims=(64, 64, 32), capacity=16384,
                                           origin_block=(-32, -32, -8)),
                     enable_color=False, enable_esdf=True,
                     max_blocks_per_frame=2048)
    m.replay_frames(depths_r, poses_r, camera)
    origin, dims = m.esdf_region(margin_blocks=0, mult=1)
    band = m.esdf_band_vox
    ep = m.params.esdf
    print(f"region dims_b={tuple(dims)} band={band} "
          f"blocks={m.block_count()}", flush=True)

    d_ch, w_ch = m.channels["tsdf_distance"], m.channels["tsdf_weight"]
    state = m.state
    origin_j = jnp.asarray(origin, jnp.int32)
    dims_t = tuple(int(x) for x in dims)

    # Per-step variation: roll the weight channel's rows by k (changes the
    # site set each step without host work).
    def wvar(k):
        return jnp.where((jnp.arange(d_ch.shape[0]) % 8)[:, None]
                         == (k % 8), 0.0, w_ch)

    def barrier(x):
        return float(jnp.sum(jnp.atleast_1d(x).astype(jnp.float32)
                             .ravel()[:1]))

    def timed(name, scan_fn):
        jfn = jax.jit(scan_fn)
        barrier(jfn(depths_r))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = jfn(depths_r)
            barrier(out)
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best * 1e3 / n_steps:.3f} ms/step", flush=True)

    def empty(depths):
        def step(c, d):
            return c + d[0, 0], ()
        return jax.lax.scan(step, jnp.float32(0), depths)[0]

    def sites_only(depths):
        def step(c, inp):
            d, k = inp
            is_site, is_inside, observed = esdf_ops.esdf_sites_from_tsdf(
                d_ch, wvar(k), voxel_size_m=jnp.float32(0.05),
                max_site_distance_vox=float(ep.max_site_distance_vox),
                min_weight=float(ep.min_weight))
            return c + jnp.sum(is_site.astype(jnp.int32)) + d[0, 0].astype(
                jnp.int32), ()
        ks = jnp.arange(n_steps, dtype=jnp.int32)
        return jax.lax.scan(step, jnp.int32(0), (depths, ks))[0]

    def solve_only(depths):
        is_site0, _, _ = esdf_ops.esdf_sites_from_tsdf(
            d_ch, w_ch, voxel_size_m=jnp.float32(0.05),
            max_site_distance_vox=float(ep.max_site_distance_vox),
            min_weight=float(ep.min_weight))

        def step(c, inp):
            d, k = inp
            # vary the sites: knock out one row-of-8 residue class
            site_k = is_site0 & ((jnp.arange(is_site0.shape[0]) % 8)
                                 [:, None] != (k % 8))
            sq = esdf_from_sites_dense(site_k, state.block_index_of_slot,
                                       state.alloc_count, origin_j,
                                       dims_b=dims_t, band=band)
            return jnp.minimum(c, sq), ()
        ks = jnp.arange(n_steps, dtype=jnp.int32)
        init = jnp.full_like(d_ch, 1e12)
        return jax.lax.scan(step, init, (depths, ks))[0]

    def full_branch(depths):
        def step(carry, inp):
            sq_c, ins_c, obs_c = carry
            d, k = inp
            is_site, is_inside, observed = esdf_ops.esdf_sites_from_tsdf(
                d_ch, wvar(k), voxel_size_m=jnp.float32(0.05),
                max_site_distance_vox=float(ep.max_site_distance_vox),
                min_weight=float(ep.min_weight))
            sq = esdf_from_sites_dense(is_site, state.block_index_of_slot,
                                       state.alloc_count, origin_j,
                                       dims_b=dims_t, band=band)
            return (jnp.minimum(sq_c, sq), is_inside, observed), ()
        ks = jnp.arange(n_steps, dtype=jnp.int32)
        init = (jnp.full_like(d_ch, 1e12),
                jnp.zeros(d_ch.shape, jnp.bool_),
                jnp.zeros(d_ch.shape, jnp.bool_))
        return jax.lax.scan(step, init, (depths, ks))[0][0]

    def solve_only_bucket(depths, sb=4096):
        is_site0, _, _ = esdf_ops.esdf_sites_from_tsdf(
            d_ch[:sb], w_ch[:sb], voxel_size_m=jnp.float32(0.05),
            max_site_distance_vox=float(ep.max_site_distance_vox),
            min_weight=float(ep.min_weight))
        alloc_c = jnp.minimum(state.alloc_count, sb)

        def step(c, inp):
            d, k = inp
            site_k = is_site0 & ((jnp.arange(sb) % 8)[:, None] != (k % 8))
            sq = esdf_from_sites_dense(site_k,
                                       state.block_index_of_slot[:sb],
                                       alloc_c, origin_j,
                                       dims_b=dims_t, band=band)
            return jnp.minimum(c, sq), ()
        ks = jnp.arange(n_steps, dtype=jnp.int32)
        init = jnp.full((sb, 512), np.float32(1e12))
        return jax.lax.scan(step, init, (depths, ks))[0]

    def passes_only(depths, sb=4096):
        """The 3 EDT passes alone: pre-seeded x-rows varied per step."""
        from isaac_ros_nvblox_tpu.ops.esdf_dense import (
            _line_dims, _repad, edt_pass_blockmajor, line_rows)
        is_site0, _, _ = esdf_ops.esdf_sites_from_tsdf(
            d_ch[:sb], w_ch[:sb], voxel_size_m=jnp.float32(0.05),
            max_site_distance_vox=float(ep.max_site_distance_vox),
            min_weight=float(ep.min_weight))
        n_lines_x, Sx = _line_dims(dims_t, 0)
        R = n_lines_x * line_rows(Sx, band)
        rows0 = jnp.full((R, 512), np.float32(1e12))
        rows0 = rows0.at[: min(sb, R)].set(
            jnp.where(is_site0[: min(sb, R)], 0.0, 1e12))

        def step(c, k):
            rows = jnp.where((jnp.arange(R) % 8)[:, None] == (k % 8),
                             1e12, rows0)
            out_x = edt_pass_blockmajor(rows, n_lines=n_lines_x, Sb=Sx,
                                        band=band, axis=0,
                                        binary_input=True)
            rows_y = _repad(out_x, dims_t, 0, 1, band)
            n_lines_y, Sy = _line_dims(dims_t, 1)
            out_y = edt_pass_blockmajor(rows_y, n_lines=n_lines_y, Sb=Sy,
                                        band=band, axis=1)
            rows_z = _repad(out_y, dims_t, 1, 2, band)
            n_lines_z, Sz = _line_dims(dims_t, 2)
            out_z = edt_pass_blockmajor(rows_z, n_lines=n_lines_z, Sb=Sz,
                                        band=band, axis=2)
            return jnp.minimum(c, out_z), ()
        n_lines_z, Sz = _line_dims(dims_t, 2)
        init = jnp.full((n_lines_z * Sz, 512), np.float32(1e12))
        ks = jnp.arange(n_steps, dtype=jnp.int32)
        return jax.lax.scan(step, init, ks)[0]

    timed("empty", empty)
    timed("sites only", sites_only)
    timed("solve only", solve_only)
    timed("solve only (bucket 4096)", solve_only_bucket)
    timed("passes only (bucket 4096)", passes_only)
    timed("sites+solve (esdf_branch)", full_branch)


if __name__ == "__main__":
    main()
