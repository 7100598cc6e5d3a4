"""N-device scaling measurement for the sharded mapper.

Runs the sharded integrate+ESDF+mesh step at n = 1, 2, 4, 8 shards on a
virtual CPU device mesh (subprocess per n, since the device count is fixed
at backend init) and writes SCALING.json: owned blocks processed per
update and wall time per step.

NOTE: virtual CPU devices share one host's cores, so these numbers
validate the *machinery* (shard counts, collectives, per-shard work
decomposition), not real interconnect scaling; per-chip throughput comes
from bench.py on hardware. On a real multi-chip slice the same code runs
unmodified over ICI/DCN (parallel/distributed.py).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import os, sys, time, json
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=%(n)d")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np
import jax.numpy as jnp
from isaac_ros_nvblox_tpu.mapper.params import MapperParams
from isaac_ros_nvblox_tpu.models.camera import Camera
from isaac_ros_nvblox_tpu.models.scene import Scene, Sphere, orbit_pose, render_depth
from isaac_ros_nvblox_tpu.ops.esdf import EsdfIntegratorParams
from isaac_ros_nvblox_tpu.parallel.sharded_mapper import (
    ShardedDeviceMapper, ShardedMapperConfig)
from isaac_ros_nvblox_tpu.parallel.spatial import make_spatial_mesh

n = %(n)d
mesh = make_spatial_mesh(n)
cam = Camera(fx=120.0, fy=120.0, cx=59.5, cy=44.5, width=120, height=90)
cfg = ShardedMapperConfig(
    n_shards=n, global_dims=(64, 32, 16), origin_block=(-32, -16, -4),
    capacity_per_shard=2048, voxel_size_m=0.05, max_blocks_per_frame=1024,
    mesh_max_blocks=256)
params = MapperParams(esdf=EsdfIntegratorParams(max_esdf_distance_m=1.0))
m = ShardedDeviceMapper(mesh, cam, cfg, params)
scene = Scene(primitives=(Sphere(center=(0.2, 0.0, 1.0), radius=0.55),))
frames = []
for k in range(4):
    T = orbit_pose(2 * np.pi * k / 8, radius=2.0, height=1.0, target=(0, 0, 1.0))
    frames.append((np.asarray(render_depth(scene, cam, jnp.asarray(T))), T))
# warmup / compile
for d, T in frames:
    m.integrate_depth(d, T)
m.update_esdf()
m.update_mesh_dirty()
jax.block_until_ready(m.channels["esdf_sq_dist"])
t0 = time.perf_counter()
reps = 3
for _ in range(reps):
    for d, T in frames:
        m.integrate_depth(d, T)
    m.update_esdf()
    m.update_mesh_dirty()
jax.block_until_ready(m.channels["esdf_sq_dist"])
dt = (time.perf_counter() - t0) / reps
print(json.dumps({"n": n, "owned_blocks": m.total_owned_blocks(),
                  "step_s": dt}))
"""


def main():
    results = []
    for n in (1, 2, 4, 8):
        env = dict(os.environ)
        env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
        out = subprocess.run([sys.executable, "-c", WORKER % {"n": n}],
                             capture_output=True, text=True, env=env,
                             timeout=1800)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            raise RuntimeError(f"n={n} failed:\n{out.stdout}\n{out.stderr}")
        results.append(json.loads(line[-1]))
        print(results[-1])
    path = REPO / "SCALING.json"
    path.write_text(json.dumps({
        "note": ("virtual CPU device mesh: validates shard machinery, not "
                 "interconnect scaling; see bench.py for per-chip numbers"),
        "points": results}, indent=2))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
