import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
"""Ablate the per-frame TSDF integrate cost on TPU (scan-amortized).

Stages timed inside ONE lax.scan over STEPS pose-varied frames (per
CLAUDE.md: standalone jit calls sit on the ~4 ms relay dispatch floor and
XLA hoists loop-invariant work — a scan with per-step inputs is the honest
measurement). Every stage's output feeds the carry so XLA cannot DCE it.
"""
import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from isaac_ros_nvblox_tpu.core import world_grid as wg
from isaac_ros_nvblox_tpu.models.camera import Camera
from isaac_ros_nvblox_tpu.models.scene import (Box, RoomBox, Scene, Sphere,
                                               orbit_pose, render_depth)
from isaac_ros_nvblox_tpu.ops import view as view_ops
from isaac_ros_nvblox_tpu.ops.tsdf import TsdfIntegratorParams
from isaac_ros_nvblox_tpu.ops.tsdf_pallas import integrate_tsdf_pallas

CAM = Camera(fx=500.0, fy=500.0, cx=319.5, cy=239.5, width=640, height=480)
PARAMS = TsdfIntegratorParams(max_integration_distance_m=5.0)
VOX = 0.05
TRUNC = PARAMS.truncation_m(VOX)
STEPS = 64
MAXB = 2048

scene = Scene(primitives=(
    RoomBox(center=(0.0, 0.0, 1.5), half_extents=(3.0, 2.2, 1.5)),
    Sphere(center=(1.2, 0.8, 1.0), radius=0.5),
    Box(center=(-1.5, -1.0, 0.4), half_extents=(0.4, 0.4, 0.4)),
))
n_frames = 16
depths, poses = [], []
for k in range(n_frames):
    T = jnp.asarray(orbit_pose(2 * np.pi * k / n_frames, radius=1.5))
    depth = render_depth(scene, CAM, T)
    depths.append(depth)
    poses.append(T)
depths = jnp.stack(depths * (STEPS // n_frames))
poses = jnp.stack(poses * (STEPS // n_frames))

cfg = wg.WorldGridConfig(dims=(64, 64, 32), capacity=16384,
                         origin_block=(-32, -32, -8))


def timeit(name, fn, *args, reps=3):
    jfn = jax.jit(fn)
    print(f"[compile] {name}...", flush=True)
    out = jfn(*args)
    _ = float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32).ravel()[:1]))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jfn(*args)
        _ = float(jnp.sum(
            jax.tree.leaves(out)[0].astype(jnp.float32).ravel()[:1]))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best * 1e3 / STEPS:.3f} ms/step", flush=True)
    return best


def scan_empty(depths, poses):
    def step(c, xs):
        d, T = xs
        return c + d[0, 0] + T[0, 0], ()
    c, _ = jax.lax.scan(step, jnp.float32(0), (depths, poses))
    return c


def scan_view(depths, poses):
    def step(c, xs):
        d, T = xs
        grid, origin = view_ops.touched_block_grid(
            d, T, camera=CAM, voxel_size_m=VOX, max_distance_m=5.0,
            truncation_m=TRUNC, subsample=1)
        return c + jnp.sum(grid.astype(jnp.int32)) + origin[0], ()
    c, _ = jax.lax.scan(step, jnp.int32(0), (depths, poses))
    return c


def scan_view_alloc(depths, poses):
    state = wg.create_world_grid(cfg)
    def step(state, xs):
        d, T = xs
        grid, origin = view_ops.touched_block_grid(
            d, T, camera=CAM, voxel_size_m=VOX, max_distance_m=5.0,
            truncation_m=TRUNC, subsample=1)
        state, slots, bidx, _ = wg.allocate_and_batch(
            state, grid, origin, max_blocks=MAXB)
        return state, slots[0]
    state, s = jax.lax.scan(step, state, (depths, poses))
    return state.alloc_count + s[-1]


def scan_full(depths, poses):
    state = wg.create_world_grid(cfg)
    dist = jnp.zeros((cfg.capacity, 512), jnp.float32)
    wgt = jnp.zeros((cfg.capacity, 512), jnp.float32)
    def step(carry, xs):
        state, dist, wgt = carry
        d, T = xs
        grid, origin = view_ops.touched_block_grid(
            d, T, camera=CAM, voxel_size_m=VOX, max_distance_m=5.0,
            truncation_m=TRUNC, subsample=1)
        state, slots, bidx, _ = wg.allocate_and_batch(
            state, grid, origin, max_blocks=MAXB)
        dist, wgt = integrate_tsdf_pallas(
            dist, wgt, slots, bidx, d, T, camera=CAM, voxel_size_m=VOX,
            params=PARAMS)
        return (state, dist, wgt), ()
    (state, dist, wgt), _ = jax.lax.scan(step, (state, dist, wgt),
                                         (depths, poses))
    return dist


def scan_kernel_only(depths, poses, slots, bidx, ablate=""):
    dist = jnp.zeros((cfg.capacity, 512), jnp.float32)
    wgt = jnp.zeros((cfg.capacity, 512), jnp.float32)
    def step(carry, xs):
        dist, wgt = carry
        d, T = xs
        dist, wgt = integrate_tsdf_pallas(
            dist, wgt, slots, bidx, d, T, camera=CAM, voxel_size_m=VOX,
            params=PARAMS, ablate=ablate)
        return (dist, wgt), ()
    (dist, wgt), _ = jax.lax.scan(step, (dist, wgt), (depths, poses))
    return dist


def scan_color(depths, poses, slots, bidx):
    """Color fusion cost on a fixed view batch (XLA element-gather path)."""
    from isaac_ros_nvblox_tpu.ops.color import integrate_color_planar
    dist = jnp.zeros((cfg.capacity, 512), jnp.float32)
    wgt = jnp.full((cfg.capacity, 512), 1.0, jnp.float32)
    ch = [jnp.zeros((cfg.capacity, 512), jnp.float32) for _ in range(4)]
    color = jnp.full(depths.shape[1:] + (3,), 128.0, jnp.float32)

    def step(carry, xs):
        r, g, b, cw = carry
        d, T = xs
        r, g, b, cw = integrate_color_planar(
            r, g, b, cw, dist, wgt, slots, bidx, color + d[0, 0] * 0.0,
            d, T, camera=CAM, voxel_size_m=VOX, params=PARAMS)
        return (r, g, b, cw), ()
    (r, g, b, cw), _ = jax.lax.scan(step, tuple(ch), (depths, poses))
    return r


def main():
    stages = sys.argv[1:] or ["empty", "view", "view_alloc", "full",
                              "kernel", "color"]
    print("device:", jax.devices()[0], flush=True)
    if "empty" in stages:
        timeit("empty scan", scan_empty, depths, poses)
    if "view" in stages:
        timeit("view grid", scan_view, depths, poses)
    if "view_alloc" in stages:
        timeit("view+alloc", scan_view_alloc, depths, poses)
    if "full" in stages:
        timeit("full fused (pallas)", scan_full, depths, poses)
    if "kernel" in stages or "color" in stages:
        # Fixed realistic batch (blocks actually in view).
        grid, origin = view_ops.touched_block_grid(
            depths[0], poses[0], camera=CAM, voxel_size_m=VOX,
            max_distance_m=5.0, truncation_m=TRUNC, subsample=1)
        state = wg.create_world_grid(cfg)
        state, slots, bidx, nv = wg.allocate_and_batch(
            state, grid, origin, max_blocks=MAXB)
        print("in-view blocks:", int(nv), flush=True)
        if "kernel" in stages:
            timeit("kernel only (fixed batch)", scan_kernel_only,
                   depths, poses, slots, bidx)
            timeit("kernel nosample", lambda d, p, s, b: scan_kernel_only(
                d, p, s, b, ablate="nosample"), depths, poses, slots, bidx)
            timeit("kernel notile", lambda d, p, s, b: scan_kernel_only(
                d, p, s, b, ablate="notile"), depths, poses, slots, bidx)
        if "color" in stages:
            timeit("color fuse (fixed batch)", scan_color,
                   depths, poses, slots, bidx)


if __name__ == "__main__":
    main()
