"""Break down the fused-mesh stage's FIXED cost (the part that does not
scale with surface blocks): dirty compaction, sign summaries/crossing
test, second compaction, and the MC kernel's sentinel path.

Stages timed inside 64-step scans (CLAUDE.md methodology), differenced
against an empty scan. Run on TPU.
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))  # noqa: E401,E702

import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from isaac_ros_nvblox_tpu.core import world_grid as wg
    from isaac_ros_nvblox_tpu.core.world_grid import WorldGridConfig
    from isaac_ros_nvblox_tpu.mapper.device_mapper import (DeviceMapper,
                                                           _compact_dirty_impl)
    from isaac_ros_nvblox_tpu.mapper.params import MapperParams
    from isaac_ros_nvblox_tpu.models.camera import Camera
    from isaac_ros_nvblox_tpu.models.scene import (Box, RoomBox, Scene,
                                                   Sphere, orbit_pose,
                                                   render_depth)
    from isaac_ros_nvblox_tpu.ops.mesh_pallas import (marching_cubes_fused,
                                                      surface_crossing)
    from isaac_ros_nvblox_tpu.ops.tsdf import TsdfIntegratorParams

    camera = Camera(fx=500.0, fy=500.0, cx=319.5, cy=239.5,
                    width=640, height=480)
    scene = Scene(primitives=(
        RoomBox(center=(0.0, 0.0, 1.5), half_extents=(3.0, 2.2, 1.5)),
        Sphere(center=(1.2, 0.8, 1.0), radius=0.5),
        Box(center=(-1.5, -1.0, 0.4), half_extents=(0.4, 0.4, 0.4)),
    ))
    params = MapperParams(
        projective=TsdfIntegratorParams(max_integration_distance_m=5.0))
    m = DeviceMapper(voxel_size_m=0.05, params=params,
                     world=WorldGridConfig(dims=(64, 64, 32), capacity=16384,
                                           origin_block=(-32, -32, -8)),
                     enable_color=True, enable_esdf=False,
                     max_blocks_per_frame=1024)
    n_frames = 16
    depths = jnp.stack([render_depth(scene, camera,
                                     jnp.asarray(orbit_pose(
                                         2 * np.pi * k / n_frames,
                                         radius=1.5)))
                        for k in range(n_frames)])
    poses = jnp.stack([jnp.asarray(orbit_pose(2 * np.pi * k / n_frames,
                                              radius=1.5))
                       for k in range(n_frames)])
    m.replay_frames(jnp.concatenate([depths] * 4),
                    jnp.concatenate([poses] * 4), camera)
    state = m.state
    d_ch = m.channels["tsdf_distance"]
    w_ch = m.channels["tsdf_weight"]
    color_rows = (m.channels["color_r"], m.channels["color_g"],
                  m.channels["color_b"])
    cap = m.capacity
    MB, MS = 1024, 512
    n_steps = 64

    def timed(name, scan_fn):
        jfn = jax.jit(scan_fn)
        ks = jnp.arange(n_steps, dtype=jnp.int32)
        out = jfn(ks)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)
                      .ravel()[:1]))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = jfn(ks)
            float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)
                          .ravel()[:1]))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best * 1e3 / n_steps:.3f} ms/step", flush=True)

    def vary_dirty(k):
        # ~900 dirty slots, varied per step (rotate the live prefix).
        idx = (jnp.arange(900, dtype=jnp.int32) * 2 + k) % 2200
        return jnp.zeros((cap,), jnp.bool_).at[idx].set(True)

    def empty(ks):
        def step(c, k):
            return c + k, ()
        return jax.lax.scan(step, jnp.int32(0), ks)[0]

    def compact_only(ks):
        def step(c, k):
            slots, bidx = _compact_dirty_impl(state, vary_dirty(k),
                                              max_blocks=MB)
            return c + slots[0] + bidx[0, 0], ()
        return jax.lax.scan(step, jnp.int32(0), ks)[0]

    def crossing_only(ks):
        def step(c, k):
            slots, bidx = _compact_dirty_impl(state, vary_dirty(k),
                                              max_blocks=MB)
            nbr8 = wg.neighbor_slots8_of(state, bidx)
            cr = surface_crossing(d_ch, w_ch, nbr8, min_weight=1e-4)
            return c + jnp.sum(cr.astype(jnp.int32)) + slots[0], ()
        return jax.lax.scan(step, jnp.int32(0), ks)[0]

    def kernel_sentinel(ks):
        # MC kernel on an all-invalid batch: pure sentinel writes.
        nbr8 = jnp.full((MS, 8), -1, jnp.int32)
        valid = jnp.zeros((MS,), jnp.int32)

        def step(c, k):
            v, col, tab = marching_cubes_fused(
                d_ch, w_ch, color_rows, nbr8, valid + 0 * k,
                min_weight=1e-4, with_color=True, interpret=False)
            return jnp.minimum(c, v[0, 0, 0, 0].astype(jnp.float32)), ()
        return jax.lax.scan(step, jnp.float32(1e9), ks)[0]

    def kernel_live(ks):
        slots, bidx, _ = wg.allocated_batch_range(state, start=0,
                                                  max_blocks=MS)
        nbr8 = wg.neighbor_slots8_of(state, bidx)
        valid = (slots < cap).astype(jnp.int32)

        def step(c, k):
            v, col, tab = marching_cubes_fused(
                d_ch + 0.0 * k.astype(jnp.float32), w_ch, color_rows, nbr8,
                valid, min_weight=1e-4, with_color=True, interpret=False)
            return jnp.minimum(c, v[0, 0, 0, 0].astype(jnp.float32)), ()
        return jax.lax.scan(step, jnp.float32(1e9), ks)[0]

    timed("empty", empty)
    timed("compact_dirty (mb=1024)", compact_only)
    timed("compact+nbr8+crossing", crossing_only)
    timed("mc kernel all-sentinel (ms=512)", kernel_sentinel)
    timed("mc kernel live 512 blocks", kernel_live)

    def kernel_live_ablate(ks, ablate="noselect"):
        slots, bidx, _ = wg.allocated_batch_range(state, start=0,
                                                  max_blocks=MS)
        nbr8 = wg.neighbor_slots8_of(state, bidx)
        valid = (slots < cap).astype(jnp.int32)

        def step(c, k):
            v, col, tab = marching_cubes_fused(
                d_ch + 0.0 * k.astype(jnp.float32), w_ch, color_rows, nbr8,
                valid, min_weight=1e-4, with_color=True, interpret=False,
                ablate=ablate)
            return jnp.minimum(c, v[0, 0, 0, 0].astype(jnp.float32)), ()
        return jax.lax.scan(step, jnp.float32(1e9), ks)[0]

    timed("mc kernel live noselect", kernel_live_ablate)


if __name__ == "__main__":
    main()
