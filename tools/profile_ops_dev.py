import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
"""Time each pipeline stage separately on the TPU.

WARNING: block_until_ready is not a reliable barrier on the axon relay;
prefer scalar-readback barriers (see bench.py _barrier) for real numbers.
"""
import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from isaac_ros_nvblox_tpu.core.world_grid import WorldGridConfig
from isaac_ros_nvblox_tpu.core import world_grid as wg
from isaac_ros_nvblox_tpu.mapper.device_mapper import DeviceMapper, _compact_dirty
from isaac_ros_nvblox_tpu.models.camera import Camera
from isaac_ros_nvblox_tpu.models.scene import default_test_scene, orbit_pose, render_depth
from isaac_ros_nvblox_tpu.ops import view as view_ops
from isaac_ros_nvblox_tpu.ops.tsdf import integrate_tsdf

camera = Camera(fx=500.0, fy=500.0, cx=319.5, cy=239.5, width=640, height=480)
scene = default_test_scene()
mapper = DeviceMapper(voxel_size_m=0.05,
                      world=WorldGridConfig(dims=(64, 64, 32), capacity=16384,
                                            origin_block=(-32, -32, -8)),
                      enable_color=False, enable_esdf=True)
frames = []
for k in range(8):
    T = jnp.asarray(orbit_pose(2 * np.pi * k / 24))
    d = render_depth(scene, camera, T); d.block_until_ready()
    frames.append((d, T))
for d, T in frames:
    mapper.integrate_depth(d, T, camera)
jax.block_until_ready(mapper.channels["tsdf_distance"])
mapper.refresh_count()
print("blocks:", mapper._count_cache)

p = mapper.params.projective
depth, T = frames[0]

def timeit(name, fn, n=20):
    fn()  # warm
    out = fn(); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.2f} ms")

timeit("view_grid", lambda: view_ops.touched_block_grid(
    depth, T, camera=camera, voxel_size_m=0.05, max_distance_m=7.0,
    truncation_m=0.2, subsample=4))
grid, origin = view_ops.touched_block_grid(
    depth, T, camera=camera, voxel_size_m=0.05, max_distance_m=7.0,
    truncation_m=0.2, subsample=4)
timeit("allocate", lambda: wg.allocate_from_mask(mapper.state, grid, origin))
timeit("view_batch", lambda: wg.view_batch(mapper.state, grid, origin, max_blocks=4096))
slots, bidx, _ = wg.view_batch(mapper.state, grid, origin, max_blocks=4096)

d0 = mapper.channels["tsdf_distance"]
w0 = mapper.channels["tsdf_weight"]
def run_integrate():
    d, w = integrate_tsdf(d0 + 0, w0 + 0, slots, bidx, depth, T,
                          camera=camera, voxel_size_m=0.05, params=p)
    return d
timeit("integrate_tsdf(4096 blocks)", run_integrate, n=10)

# ESDF pieces
from isaac_ros_nvblox_tpu.ops import esdf as esdf_ops
is_site, is_inside, observed = esdf_ops.esdf_sites_from_tsdf(
    mapper.channels["tsdf_distance"], mapper.channels["tsdf_weight"],
    voxel_size_m=jnp.float32(0.05), max_site_distance_vox=1.0, min_weight=1e-4)
bucket = ((mapper._count_cache + 1023)//1024)*1024
slots_e, bidx_e, _ = wg.allocated_batch(mapper.state, max_blocks=bucket)
nbrs = wg.neighbor_slots_of(mapper.state, bidx_e)
site0 = mapper.channels["esdf_site"]
def run_esdf(n_outer):
    s, sq = esdf_ops.run_esdf_sweeps_pallas(
        site0 + 0, is_site, nbrs, slots_e, bidx_e,
        mapper.state.block_index_of_slot, n_outer=n_outer, inner_iters=8,
        max_sq=1600.0, interpret=False)
    return sq
timeit(f"esdf pallas n_outer=1 bucket={bucket}", lambda: run_esdf(1), n=5)
timeit(f"esdf pallas n_outer=6 bucket={bucket}", lambda: run_esdf(6), n=5)

# Mesh pieces
sl_m, bi_m = _compact_dirty(mapper.state, jnp.ones_like(mapper.dirty), max_blocks=2048)
timeit("mesh chunk 2048", lambda: mapper._mesh_chunk(sl_m, bi_m)[0], n=3)
from isaac_ros_nvblox_tpu.ops.halo import gather_halo
tsdf_grid = mapper.channels["tsdf_distance"].reshape(16384,8,8,8)
timeit("halo gather tsdf 2048", lambda: gather_halo(tsdf_grid, wg.neighbor_slots_of(mapper.state, bi_m), lo=0, hi=1), n=5)

# Fused per-frame path.
def run_fused():
    mapper.integrate_depth(depth, T, camera)
    return mapper.channels["tsdf_weight"]
timeit("integrate_depth (fused one-dispatch)", run_fused, n=10)

sl2, bi2 = _compact_dirty(mapper.state, mapper.dirty | True, max_blocks=2048)
def run_mesh_dirty():
    v, c, va, bi = mapper.update_mesh_dirty_device()
    return v
timeit("update_mesh_dirty_device", run_mesh_dirty, n=3)
