#!/usr/bin/env python
import sys as _sys, pathlib as _pl
_sys.path.insert(0, str(_pl.Path(__file__).resolve().parents[1]))
"""Capture a jax.profiler trace of the mapping pipeline.

Reference: nvblox_ros/scripts/run_nsys.sh — Nsight Systems capture of the
node with NVTX ranges (light = nvtx only, full = nvtx+cuda). TPU analogue:
jax.profiler traces (viewable in XProf/TensorBoard) with `named_scope`
annotations around each pipeline stage; the in-process Timing registry
(utils/timing.py) plays the role of the NVTX span hierarchy.

Usage:
  python tools/profile_trace.py --out /tmp/nvblox_trace --frames 8
  tensorboard --logdir /tmp/nvblox_trace   # to inspect
"""

import argparse


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="/tmp/nvblox_tpu_trace")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--mode", choices=["light", "full"], default="light",
                    help="light: host spans only; full: device trace too")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from isaac_ros_nvblox_tpu.core.world_grid import WorldGridConfig
    from isaac_ros_nvblox_tpu.mapper.device_mapper import DeviceMapper
    from isaac_ros_nvblox_tpu.models.camera import Camera
    from isaac_ros_nvblox_tpu.models.scene import (default_test_scene,
                                                   orbit_pose, render_depth)
    from isaac_ros_nvblox_tpu.utils.timing import Timing, Timer

    camera = Camera(fx=500.0, fy=500.0, cx=319.5, cy=239.5,
                    width=640, height=480)
    scene = default_test_scene()
    mapper = DeviceMapper(voxel_size_m=0.05,
                          world=WorldGridConfig(dims=(64, 64, 32),
                                                capacity=16384,
                                                origin_block=(-32, -32, -8)),
                          enable_color=False, enable_esdf=True)
    frames = []
    for k in range(args.frames):
        T = jnp.asarray(orbit_pose(2 * np.pi * k / 24))
        d = render_depth(scene, camera, T)
        d.block_until_ready()
        frames.append((d, T))

    # Warmup (compilation outside the trace).
    mapper.integrate_depth(*frames[0], camera)
    mapper.update_esdf()
    jax.block_until_ready(mapper.channels["esdf_sq_dist"])

    with jax.profiler.trace(args.out):
        for d, T in frames:
            with jax.named_scope("nvblox/integrate_depth"), \
                    Timer("trace/integrate_depth"):
                mapper.integrate_depth(d, T, camera)
            with jax.named_scope("nvblox/esdf"), Timer("trace/esdf"):
                mapper.update_esdf()
            with jax.named_scope("nvblox/mesh"), Timer("trace/mesh"):
                mapper.update_mesh_dirty_device()
        jax.block_until_ready(mapper.channels["esdf_sq_dist"])

    print(Timing.to_string())
    print(f"trace written to {args.out}")


if __name__ == "__main__":
    main()
