import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from isaac_ros_nvblox_tpu.ops.halo import gather_halo
from isaac_ros_nvblox_tpu.ops import esdf as esdf_ops

cap, N = 16384, 4096
rng = np.random.RandomState(0)
grid1 = jnp.asarray(rng.rand(cap, 8, 8, 8), jnp.float32)
grid3 = jnp.asarray(rng.rand(cap, 8, 8, 8, 3), jnp.float32)
nbrs = jnp.asarray(rng.randint(0, cap, size=(N, 27)), jnp.int32)
flat1 = grid1.reshape(cap, 512)

def timeit(name, fn, n=10):
    out = fn(); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n): out = fn()
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.2f} ms", flush=True)

g1 = jax.jit(lambda g, nb: gather_halo(g, nb, lo=1, hi=1))
timeit("slice-halo 1ch lo1hi1 N=4096", lambda: g1(grid1, nbrs))
g3 = jax.jit(lambda g, nb: gather_halo(g, nb, lo=1, hi=1))
timeit("slice-halo 3ch lo1hi1 N=4096", lambda: g3(grid3, nbrs))

rowg = jax.jit(lambda f, nb: f[jnp.clip(nb.reshape(-1), 0, cap-1)])
timeit("row-gather 27N rows (110k x 512)", lambda: rowg(flat1, nbrs))

rg1 = jax.jit(lambda f, nb: f[jnp.clip(nb[:, 13], 0, cap-1)])
timeit("row-gather N rows (4096 x 512)", lambda: rg1(flat1, nbrs))

# pallas relax alone on padded SoA
from isaac_ros_nvblox_tpu.ops.esdf_pallas import relax_blocks_pallas, V_PAD, SENTINEL
sx = jnp.full((N, V_PAD), SENTINEL, jnp.float32)
orig = jnp.zeros((N, 3), jnp.float32)
pr = jax.jit(lambda a,b,c,d: relax_blocks_pallas(a,b,c,d, inner_iters=8, max_sq=1600.0))
timeit("pallas relax 4096 blocks (8 inner)", lambda: pr(orig, sx+0, sx+0, sx+0), n=5)

# esdf scatter back
interior = jnp.zeros((N, 512, 3), jnp.float32)
slots = jnp.asarray(np.arange(N, dtype=np.int32))
pool = jnp.zeros((cap, 512, 3), jnp.float32)
sc = jax.jit(lambda p, s, x: p.at[s].set(x, mode="drop"))
timeit("row-scatter back 4096x512x3", lambda: sc(pool, slots, interior))
