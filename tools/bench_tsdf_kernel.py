import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
"""Time the Pallas TSDF kernel vs the XLA integrator on TPU."""
import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from isaac_ros_nvblox_tpu.models.camera import Camera
from isaac_ros_nvblox_tpu.ops.tsdf import TsdfIntegratorParams, integrate_tsdf
from isaac_ros_nvblox_tpu.ops.tsdf_pallas import integrate_tsdf_pallas

CAM = Camera(fx=500.0, fy=500.0, cx=319.5, cy=239.5, width=640, height=480)
params = TsdfIntegratorParams()
cap, N = 16384, 4096
rng = np.random.RandomState(0)
bidx = np.stack([rng.randint(-16, 16, N), rng.randint(-12, 12, N),
                 rng.randint(1, 18, N)], 1).astype(np.int32)
slots = jnp.asarray(np.arange(N, dtype=np.int32))
bidx = jnp.asarray(bidx)
depth = jnp.asarray(2.0 + 0.5*np.sin(np.linspace(0, 20, 640))[None, :]
                    * np.ones((480, 1)), jnp.float32)
T = jnp.eye(4, dtype=jnp.float32)
d0 = jnp.zeros((cap, 512), jnp.float32)
w0 = jnp.zeros((cap, 512), jnp.float32)

def timeit(name, fn, n=20):
    out = fn(); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.2f} ms", flush=True)

timeit("xla integrate 4096 blocks",
       lambda: integrate_tsdf(d0+0, w0+0, slots, bidx, depth, T,
                              camera=CAM, voxel_size_m=0.05, params=params))
timeit("pallas integrate 4096 blocks",
       lambda: integrate_tsdf_pallas(d0+0, w0+0, slots, bidx, depth, T,
                                     camera=CAM, voxel_size_m=0.05,
                                     params=params))
# correctness spot check on TPU
dr, wr = integrate_tsdf(d0+0, w0+0, slots, bidx, depth, T, camera=CAM,
                        voxel_size_m=0.05, params=params)
dp, wp = integrate_tsdf_pallas(d0+0, w0+0, slots, bidx, depth, T, camera=CAM,
                               voxel_size_m=0.05, params=params)
mr = np.asarray(wr) > 0; mp = np.asarray(wp) > 0
print("observed agree:", (mr == mp).mean())
both = mr & mp
err = np.abs(np.asarray(dp)[both] - np.asarray(dr)[both])
print("median err: %.4f p99: %.4f" % (np.median(err), np.percentile(err, 99)))
