import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
"""Fixed-vs-variable cost ladder for the per-frame TSDF path (VERDICT r4 #1).

The bench's tsdf_ms covers the WHOLE per-frame step: view grid -> allocate
-> decimation pyramid -> footprint prepass -> pool-row gather -> fusion
kernel -> row scatter (device_mapper._integrate_frame_fused). ROOFLINE.json
prices only the kernel (ideal 0.044 ms vs 0.507 measured) — this tool
measures where the other ~0.46 ms actually sits by timing a cumulative
stage ladder, each variant adding one stage, all inside ONE lax.scan with
per-step-varied inputs (CLAUDE.md: never time standalone jit calls; return
the mutated channel to defeat DCE), paired back-to-back against the empty
scan per rep.

Writes tools' findings to TSDF_FIXED.json.
"""
import json
import time
from pathlib import Path

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from isaac_ros_nvblox_tpu.core import world_grid as wg
    from isaac_ros_nvblox_tpu.core.world_grid import WorldGridConfig
    from isaac_ros_nvblox_tpu.mapper.device_mapper import DeviceMapper
    from isaac_ros_nvblox_tpu.mapper.params import MapperParams
    from isaac_ros_nvblox_tpu.models.camera import Camera
    from isaac_ros_nvblox_tpu.models.scene import (Box, RoomBox, Scene,
                                                   Sphere, orbit_pose,
                                                   render_depth)
    from isaac_ros_nvblox_tpu.ops import view as view_ops
    from isaac_ros_nvblox_tpu.ops import tsdf_pallas as tp
    from isaac_ros_nvblox_tpu.ops.tsdf import TsdfIntegratorParams

    camera = Camera(fx=500.0, fy=500.0, cx=319.5, cy=239.5,
                    width=640, height=480)
    scene = Scene(primitives=(
        RoomBox(center=(0.0, 0.0, 1.5), half_extents=(3.0, 2.2, 1.5)),
        Sphere(center=(1.2, 0.8, 1.0), radius=0.5),
        Box(center=(-1.5, -1.0, 0.4), half_extents=(0.4, 0.4, 0.4)),
    ))
    voxel_size = 0.05
    n_frames = 16
    params = MapperParams(
        projective=TsdfIntegratorParams(max_integration_distance_m=5.0))
    tparams = params.projective

    depths = jnp.stack([
        render_depth(scene, camera,
                     jnp.asarray(orbit_pose(2 * np.pi * k / n_frames,
                                            radius=1.5)))
        for k in range(n_frames)])
    poses = jnp.stack([
        jnp.asarray(orbit_pose(2 * np.pi * k / n_frames, radius=1.5))
        for k in range(n_frames)])
    depths_r = jnp.concatenate([depths] * 4)
    poses_r = jnp.concatenate([poses] * 4)
    n_steps = int(depths_r.shape[0])

    mapper = DeviceMapper(
        voxel_size_m=voxel_size, params=params,
        world=WorldGridConfig(dims=(64, 64, 32), capacity=16384,
                              origin_block=(-32, -32, -8)),
        enable_color=False, enable_esdf=False, max_blocks_per_frame=1024)

    def _barrier(a):
        return float(jnp.sum(jnp.atleast_1d(a)[..., :1].astype(jnp.float32)))

    _barrier(mapper.replay_frames(depths_r, poses_r, camera))  # warm map
    state = mapper.state
    dist0 = mapper.channels["tsdf_distance"]
    wght0 = mapper.channels["tsdf_weight"]
    max_blocks = mapper.max_blocks_per_frame
    maxd = float(tparams.max_integration_distance_m)
    trunc = float(tparams.truncation_m(voxel_size))
    H, W = camera.height, camera.width

    # ---- the stage ladder. Each builds a scan step fn(dist, wght, d, T)
    # -> (dist, wght, acc_contrib); every stage's outputs feed either the
    # carried channel or the accumulator (DCE defense).
    def stage_view(depth, T):
        grid, origin = view_ops.touched_block_grid(
            depth, T, camera=camera, voxel_size_m=voxel_size,
            max_distance_m=maxd, truncation_m=trunc, subsample=1)
        return grid, origin

    def stage_alloc(st, grid, origin):
        st, slots, bidx, _ = wg.allocate_and_batch(
            st, grid, origin, max_blocks=max_blocks)
        return st, slots, bidx

    def make_step(kind):
        def step(carry, xs):
            st, dist, wght, acc = carry
            depth, T = xs
            if kind == "empty":
                return (st, dist, wght, acc + depth[0, 0] + T[0, 0]), ()
            depth = jnp.where(jnp.isfinite(depth), depth, 0.0)
            grid, origin = stage_view(depth, T)
            acc = acc + jnp.sum(grid.astype(jnp.float32))
            if kind == "view":
                return (st, dist, wght, acc), ()
            st, slots, bidx = stage_alloc(st, grid, origin)
            acc = acc + jnp.sum(slots.astype(jnp.float32))
            if kind == "alloc":
                return (st, dist, wght, acc), ()
            slots, bidx = tp.pad_batch(slots, bidx, mapper.capacity)
            levels = tp.build_decimation_levels(depth)
            acc = acc + sum(jnp.sum(l[:1, :8]) for l in levels[1:])
            if kind == "pyramid":
                return (st, dist, wght, acc), ()
            (level, u0, v0, shift, valid, safe_slots, ut, vt,
             pcz) = tp.footprint_prepass(
                slots, bidx, T, camera=camera, voxel_size_m=voxel_size,
                cap=mapper.capacity, H=H, W=W)
            acc = (acc + jnp.sum(ut[:, :1].astype(jnp.float32))
                   + jnp.sum(pcz[:, :1]) + jnp.sum(shift.astype(jnp.float32)))
            if kind == "prepass":
                return (st, dist, wght, acc), ()
            if kind == "gather":
                d_b = dist[safe_slots]
                w_b = wght[safe_slots]
                dist = dist.at[slots].set(d_b + 1e-7, mode="drop")
                wght = wght.at[slots].set(w_b + 1e-7, mode="drop")
                return (st, dist, wght, acc), ()
            ablate = {"full": ""}.get(kind, kind)
            dist, wght = tp._run_fusion_kernel(
                dist, wght, slots, safe_slots, levels, level, u0, v0,
                shift, valid, ut, vt, pcz, voxel_size_m=voxel_size,
                params=tparams, interpret=False, ablate=ablate)
            return (st, dist, wght, acc), ()
        return step

    kinds = ["empty", "view", "alloc", "pyramid", "prepass", "gather",
             "nosample", "notile", "noonehot", "nodot", "full"]
    jitted = {}
    for kind in kinds:
        def run(ds, ps, _k=kind):
            (st, dist, wght, acc), _ = jax.lax.scan(
                make_step(_k), (state, dist0, wght0, jnp.float32(0)),
                (ds, ps))
            return dist, acc
        jitted[kind] = jax.jit(run)

    for kind in kinds:  # compile
        _barrier(jitted[kind](depths_r, poses_r)[0])
        print(f"compiled {kind}", flush=True)

    def t_of(kind):
        t0 = time.perf_counter()
        _barrier(jitted[kind](depths_r, poses_r)[0])
        return time.perf_counter() - t0

    # Paired per rep against empty; median of diffs (relay drift defense).
    reps = 5
    out = {}
    for kind in kinds[1:]:
        diffs = []
        for _ in range(reps):
            base = t_of("empty")
            diffs.append(t_of(kind) - base)
        diffs.sort()
        out[kind + "_ms"] = round(
            max(diffs[reps // 2] * 1e3 / n_steps, 0.0), 4)
    base_floor = min(t_of("empty") for _ in range(3)) * 1e3 / n_steps
    out["empty_floor_ms"] = round(base_floor, 4)
    # Derived stage marginals (cumulative ladder differences).
    ladder = ["view", "alloc", "pyramid", "prepass"]
    prev = 0.0
    for kind in ladder:
        out[f"marginal_{kind}_ms"] = round(out[kind + "_ms"] - prev, 4)
        prev = out[kind + "_ms"]
    out["marginal_gather_scatter_ms"] = round(
        out["gather_ms"] - out["prepass_ms"], 4)
    out["marginal_kernel_ms"] = round(
        out["full_ms"] - out["prepass_ms"], 4)
    out["kernel_sampling_ms"] = round(
        out["full_ms"] - out["nosample_ms"], 4)
    for k in ("notile", "noonehot", "nodot"):
        out[f"kernel_{k}_delta_ms"] = round(
            out["full_ms"] - out[k + "_ms"], 4)
    out["n_steps"] = n_steps
    out["max_blocks"] = max_blocks
    out["NB"] = tp.NB
    print(json.dumps(out, indent=1))
    Path("/root/repo/TSDF_FIXED.json").write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
