"""Benchmark: TSDF+ESDF integration throughput at 0.05 m voxels (1 chip).

Mirrors the reference's headline benchmark (BASELINE.md: per-frame GPU
component times during dataset replay at 0.05 m voxels; RTX 3090 reference:
TSDF 0.5 ms + ESDF 0.8 ms => ~769 fps equivalent). Here: replay a synthetic
Replica-like room sequence (VGA depth) through the full pipeline on the TPU
and report frames/s for TSDF-integrate + ESDF-update, steady state.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N, ...extras}
"""

import json
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from isaac_ros_nvblox_tpu.mapper.mapper import Mapper
    from isaac_ros_nvblox_tpu.models.camera import Camera
    from isaac_ros_nvblox_tpu.models.scene import (default_test_scene,
                                                   orbit_pose, render_depth)

    camera = Camera(fx=500.0, fy=500.0, cx=319.5, cy=239.5,
                    width=640, height=480)
    scene = default_test_scene()
    voxel_size = 0.05
    n_frames = 40
    warmup = 8

    # Pre-render the trajectory (not part of the timed pipeline).
    frames = []
    for k in range(n_frames):
        T = jnp.asarray(orbit_pose(2 * np.pi * k / n_frames))
        depth = render_depth(scene, camera, T)
        depth.block_until_ready()
        frames.append((depth, T))

    mapper = Mapper(voxel_size_m=voxel_size, capacity=32768,
                    enable_color=False, enable_esdf=True)

    # Warmup: populate the map + trigger all compilations.
    for depth, T in frames[:warmup]:
        mapper.integrate_depth(depth, T, camera)
    mapper.update_esdf()

    # Steady state timing.
    tsdf_ms = []
    esdf_ms = []
    for depth, T in frames[warmup:]:
        t0 = time.perf_counter()
        mapper.integrate_depth(depth, T, camera)
        jax.block_until_ready(mapper.pool["tsdf_distance"])
        t1 = time.perf_counter()
        mapper.update_esdf()
        jax.block_until_ready(mapper.pool["esdf_sq_dist"])
        t2 = time.perf_counter()
        tsdf_ms.append((t1 - t0) * 1e3)
        esdf_ms.append((t2 - t1) * 1e3)

    t_mesh0 = time.perf_counter()
    n_meshed = mapper.update_mesh(update_full_layer=True)
    mesh_ms = (time.perf_counter() - t_mesh0) * 1e3

    tsdf_mean = float(np.mean(tsdf_ms))
    esdf_mean = float(np.mean(esdf_ms))
    fps = 1000.0 / (tsdf_mean + esdf_mean)

    # Reference (BASELINE.md, Replica @ RTX 3090): TSDF 0.5 ms + ESDF 0.8 ms.
    baseline_fps = 1000.0 / (0.5 + 0.8)
    print(json.dumps({
        "metric": "frames/s/chip TSDF+ESDF integrate @0.05m voxels",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / baseline_fps, 4),
        "tsdf_ms": round(tsdf_mean, 3),
        "esdf_ms": round(esdf_mean, 3),
        "mesh_ms_full_layer": round(mesh_ms, 2),
        "meshed_blocks": n_meshed,
        "allocated_blocks": mapper.table.num_allocated,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
