import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from isaac_ros_nvblox_tpu.ops.mesh_pallas import corner_stacks, marching_cubes_pallas

cap, N = 16384, 2048
rng = np.random.RandomState(0)
tsdf = jnp.asarray(rng.rand(cap, 8, 8, 8) - 0.5, jnp.float32)
wgt = jnp.asarray(np.ones((cap, 8, 8, 8)), jnp.float32)
nbrs = jnp.asarray(rng.randint(0, cap, (N, 27)), jnp.int32)
bidx = jnp.asarray(rng.randint(-16, 16, (N, 3)), jnp.int32)
valid = jnp.ones((N,), jnp.int32)

def barrier(x):
    return float(jnp.sum(x[..., :1].astype(jnp.float32)))

def timeit(name, fn, n=5):
    barrier(fn())
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    barrier(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.2f} ms", flush=True)

cs = jax.jit(lambda t, w, nb: corner_stacks(t, w, nb))
timeit("corner_stacks 2048", lambda: cs(tsdf, wgt, nbrs)[0])
cd, cw = cs(tsdf, wgt, nbrs)
mc = jax.jit(lambda cd, cw: marching_cubes_pallas(
    cd, cw, bidx, valid, voxel_size_m=0.05, min_weight=1e-4)[0])
timeit("mc_pallas 2048", lambda: mc(cd, cw))
