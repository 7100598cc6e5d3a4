"""Profile the online node tick + eager incremental ESDF on TPU.

bench r3 shows node_tick_ms ~55 (r02: 5.6) and esdf_incremental_ms ~6
(r02-era clean: ~1.4). This breaks the tick into phases with wall-clock
timestamps to find where the online path started syncing/stalling.
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))  # noqa: E401,E702

import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from isaac_ros_nvblox_tpu.mapper.params import make_params
    from isaac_ros_nvblox_tpu.models.camera import Camera
    from isaac_ros_nvblox_tpu.models.scene import (Box, RoomBox, Scene,
                                                   Sphere, orbit_pose,
                                                   render_depth)
    from isaac_ros_nvblox_tpu.runtime.node import NodeParams, NvbloxNode

    camera = Camera(fx=500.0, fy=500.0, cx=319.5, cy=239.5,
                    width=640, height=480)
    scene = Scene(primitives=(
        RoomBox(center=(0.0, 0.0, 1.5), half_extents=(3.0, 2.2, 1.5)),
        Sphere(center=(1.2, 0.8, 1.0), radius=0.5),
        Box(center=(-1.5, -1.0, 0.4), half_extents=(0.4, 0.4, 0.4)),
    ))
    n_frames = 16
    depths = [render_depth(scene, camera,
                           jnp.asarray(orbit_pose(2 * np.pi * k / n_frames,
                                                  radius=1.5)))
              for k in range(n_frames)]
    poses = [np.asarray(orbit_pose(2 * np.pi * k / n_frames, radius=1.5))
             for k in range(n_frames)]
    for d in depths:
        d.block_until_ready()

    clock_t = [0.0]
    node = NvbloxNode(
        NodeParams(), make_params(overlay={
            "block_capacity": 16384,
            "static_mapper": {"projective": {
                "max_integration_distance_m": 5.0}}}),
        clock=lambda: clock_t[0])

    import isaac_ros_nvblox_tpu.runtime.node as node_mod

    # Count device dispatches: wrap every module-level jitted callable in
    # the mapper stack (call sites resolve module globals at call time, so
    # setattr-wrapping counts them all). Each dispatch through the
    # tunneled relay costs ~2.5-4 ms wall on the HOST thread even though
    # execution is async — dispatch count IS the tick time structure.
    import isaac_ros_nvblox_tpu.mapper.device_mapper as dmod
    import isaac_ros_nvblox_tpu.mapper.multi_mapper as mmod
    import isaac_ros_nvblox_tpu.mapper.device_io as iomod
    import isaac_ros_nvblox_tpu.ops.ground_plane as gmod
    disp = {}

    def wrap_jits(mod):
        for name, obj in list(vars(mod).items()):
            if isinstance(obj, jax.stages.Wrapped):
                def mk(f, key):
                    def w(*a, **kw):
                        disp[key] = disp.get(key, 0) + 1
                        return f(*a, **kw)
                    return w
                setattr(mod, name, mk(obj, f"{mod.__name__.split('.')[-1]}."
                                      f"{name}"))
    for m in (dmod, mmod, iomod, gmod):
        wrap_jits(m)

    # Wrap the per-phase internals with wall timers.
    phases = {}

    def wrap(obj, name):
        fn = getattr(obj, name)

        def wrapped(*a, **kw):
            t0 = time.perf_counter()
            out = fn(*a, **kw)
            phases[name] = phases.get(name, 0.0) + time.perf_counter() - t0
            return out
        setattr(obj, name, wrapped)

    for name in dir(node):
        if name.startswith("_publish") or name in (
                "_process_depth_queue", "_process_color_queue",
                "_update_esdf", "_update_mesh", "_decay", "tick"):
            try:
                wrap(node, name)
            except Exception:
                pass
    mm = node.multi_mapper
    for name in ("integrate_depth", "integrate_color", "update_esdf"):
        if hasattr(mm, name):
            wrap(mm, name)
    sm = mm.static_mapper
    for name in ("update_esdf", "update_esdf_2d", "integrate_depth",
                 "_refresh_region_from_device", "refresh_count"):
        if hasattr(sm, name):
            wrap(sm, name)

    def run_pass(t_base):
        for k in range(n_frames):
            t = t_base + k * 0.025
            clock_t[0] = t
            node.add_pose("cam", t, poses[k])
            node.add_depth_image(depths[k], camera, "cam", t)
            node.tick()
        float(jnp.sum(sm.channels["tsdf_distance"][:1, :1]))

    run_pass(0.0)   # warmup/compile
    run_pass(1.0)   # steady-state shapes
    phases.clear()
    disp.clear()
    t0 = time.perf_counter()
    run_pass(2.0)
    total = time.perf_counter() - t0
    n_disp = sum(disp.values())
    print(f"total: {total * 1e3 / n_frames:.2f} ms/tick, "
          f"{n_disp / n_frames:.2f} dispatches/tick")
    for k, v in sorted(disp.items(), key=lambda kv: -kv[1]):
        print(f"  dispatches {k}: {v / n_frames:.2f}/tick")
    for k, v in sorted(phases.items(), key=lambda kv: -kv[1]):
        print(f"  {k}: {v * 1e3 / n_frames:.2f} ms/tick")
    # Host-blocking cost of ONE dispatch (tiny jit, no readback).
    tiny = jax.jit(lambda x: x + 1.0)
    z = jnp.float32(0)
    tiny(z)
    t0 = time.perf_counter()
    for _ in range(30):
        tiny(z)
    print(f"per-dispatch host cost: "
          f"{(time.perf_counter() - t0) / 30 * 1e3:.2f} ms")

    # Eager incremental ESDF loop (bench's esdf_incremental_ms).
    from isaac_ros_nvblox_tpu.core.world_grid import WorldGridConfig
    from isaac_ros_nvblox_tpu.mapper.device_mapper import DeviceMapper
    from isaac_ros_nvblox_tpu.mapper.params import MapperParams
    from isaac_ros_nvblox_tpu.ops.tsdf import TsdfIntegratorParams
    params = MapperParams(
        projective=TsdfIntegratorParams(max_integration_distance_m=5.0))
    m = DeviceMapper(voxel_size_m=0.05, params=params,
                     world=WorldGridConfig(dims=(64, 64, 32), capacity=16384,
                                           origin_block=(-32, -32, -8)),
                     enable_color=False, enable_esdf=True,
                     max_blocks_per_frame=2048)
    m.replay_frames(jnp.stack(depths), jnp.stack(poses), camera)

    def eager(with_esdf, k_frames=8):
        m.update_esdf(full=True)
        float(jnp.sum(m.channels["esdf_sq_dist"][:1, :1]))
        t0 = time.perf_counter()
        t_int = t_esdf = 0.0
        for k in range(k_frames):
            ta = time.perf_counter()
            m.integrate_depth(depths[k], poses[k], camera)
            t_int += time.perf_counter() - ta
            if with_esdf:
                ta = time.perf_counter()
                m.update_esdf()
                t_esdf += time.perf_counter() - ta
        float(jnp.sum(m.channels["tsdf_distance"][:1, :1])
              + jnp.sum(m.channels["esdf_sq_dist"][:1, :1]))
        tot = (time.perf_counter() - t0) * 1e3 / k_frames
        print(f"eager with_esdf={with_esdf}: {tot:.2f} ms/frame "
              f"(integrate dispatch {t_int * 1e3 / k_frames:.2f}, "
              f"esdf dispatch {t_esdf * 1e3 / k_frames:.2f})")
        return tot

    eager(True)
    base = eager(False)
    tot = eager(True)
    print(f"esdf_incremental marginal: {tot - base:.2f} ms")


if __name__ == "__main__":
    main()
