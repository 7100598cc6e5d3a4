"""Mesh kernel ablation: where do the ~3 ms/frame go?

Times replay_frames(mesh_every=1) minus the TSDF-only replay at several
static mesh batch sizes (mesh_max_blocks) and with/without color. If the
marginal cost scales ~linearly with the batch size, the cost is the
static batch itself (channel row gathers + bf16 output writes for padded
/ skipped programs), not the MC math — and a surface-crossing second
compaction stage is the fix.
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))  # noqa: E401,E702

import time

import numpy as np


def _barrier(*arrays):
    import jax.numpy as jnp
    total = 0.0
    for a in arrays:
        total += float(jnp.sum(jnp.atleast_1d(a)[..., :1]
                               .astype(jnp.float32)))
    return total


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
                                                   render_color,
                                                   render_depth)
    from isaac_ros_nvblox_tpu.ops.tsdf import TsdfIntegratorParams

    camera = Camera(fx=500.0, fy=500.0, cx=319.5, cy=239.5,
                    width=640, height=480)
    scene = Scene(primitives=(
        RoomBox(center=(0.0, 0.0, 1.5), half_extents=(3.0, 2.2, 1.5)),
        Sphere(center=(1.2, 0.8, 1.0), radius=0.5),
        Box(center=(-1.5, -1.0, 0.4), half_extents=(0.4, 0.4, 0.4)),
    ))
    n_frames = 16
    depths, poses, colors = [], [], []
    for k in range(n_frames):
        T = jnp.asarray(orbit_pose(2 * np.pi * k / n_frames, radius=1.5))
        depths.append(render_depth(scene, camera, T))
        poses.append(T)
        colors.append(render_color(scene, camera, T).astype(jnp.uint8))
    depths = jnp.concatenate([jnp.stack(depths)] * 4)
    poses = jnp.concatenate([jnp.stack(poses)] * 4)
    colors = jnp.concatenate([jnp.stack(colors)] * 4)
    n_steps = int(depths.shape[0])

    params = MapperParams(
        projective=TsdfIntegratorParams(max_integration_distance_m=5.0))

    def make(enable_color):
        m = DeviceMapper(
            voxel_size_m=0.05, params=params,
            world=WorldGridConfig(dims=(64, 64, 32), capacity=16384,
                                  origin_block=(-32, -32, -8)),
            enable_color=enable_color, enable_esdf=False,
            max_blocks_per_frame=2048)
        _barrier(m.replay_frames(depths, poses, camera))
        return m

    def timed(m, reps=3, **kw):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            _barrier(m.replay_frames(depths, poses, camera, **kw))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3 / n_steps

    m_color = make(True)
    base = timed(m_color)
    print(f"tsdf only: {base:.3f} ms", flush=True)
    for mb, ms in ((1024, 128), (1024, 256), (1024, 512), (2048, 256),
                   (2048, 512), (2048, 1024)):
        _barrier(m_color.replay_frames(depths, poses, camera, mesh_every=1,
                                       mesh_max_blocks=mb,
                                       mesh_surface_blocks=ms))
        t = timed(m_color, mesh_every=1, mesh_max_blocks=mb,
                  mesh_surface_blocks=ms)
        pend = int(np.asarray(m_color.mesh_pending.sum()))
        print(f"mesh(color) mb={mb} ms={ms}: +{t - base:.3f} ms "
              f"(pending after replay: {pend})", flush=True)

    m_plain = make(False)
    base_p = timed(m_plain)
    for mb, ms in ((1024, 256), (2048, 512)):
        _barrier(m_plain.replay_frames(depths, poses, camera, mesh_every=1,
                                       mesh_max_blocks=mb,
                                       mesh_surface_blocks=ms))
        t = timed(m_plain, mesh_every=1, mesh_max_blocks=mb,
                  mesh_surface_blocks=ms)
        print(f"mesh(no color) mb={mb} ms={ms}: +{t - base_p:.3f} ms",
              flush=True)

    # How many blocks are actually dirty / surface-crossing per frame?
    m = m_color
    m.integrate_depth(depths[0], np.asarray(poses[0]), camera)
    from isaac_ros_nvblox_tpu.mapper.device_mapper import _compact_dirty_impl
    slots, _ = _compact_dirty_impl(m.state, m.dirty, max_blocks=4096)
    n_dirty = int(jnp.sum((slots < m.capacity).astype(jnp.int32)))
    print(f"dirty+nbrs after one frame: {n_dirty}")


if __name__ == "__main__":
    main()
