import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
cap = 16384
rng = np.random.RandomState(0)
flat1 = jnp.asarray(rng.rand(cap, 512), jnp.float32)
nbrs = jnp.asarray(rng.randint(0, cap, size=(4096, 27)), jnp.int32)
rowg = jax.jit(lambda f, nb: f[nb.reshape(-1)])
out = rowg(flat1, nbrs); jax.block_until_ready(out)

# Fixed inputs.
t0 = time.perf_counter()
for _ in range(10):
    out = rowg(flat1, nbrs)
jax.block_until_ready(out)
print("row-gather 110k fixed-input: %.2f ms" % ((time.perf_counter()-t0)/10*1e3))

# Varying inputs (defeats any result caching).
t0 = time.perf_counter()
for i in range(10):
    out = rowg(flat1 + np.float32(i), nbrs)
jax.block_until_ready(out)
print("row-gather 110k varying-input: %.2f ms" % ((time.perf_counter()-t0)/10*1e3))

# Chained (output feeds next input -> must execute).
t0 = time.perf_counter()
acc = flat1
for i in range(10):
    part = rowg(acc, nbrs)
    acc = acc + part[:cap] * 1e-9
jax.block_until_ready(acc)
print("row-gather 110k chained: %.2f ms" % ((time.perf_counter()-t0)/10*1e3))

# Known-cost op: big matmul (bf16): 4096^3*2 = 137 GFLOP -> ~0.7ms at 197TF.
a = jnp.asarray(rng.rand(4096, 4096), jnp.bfloat16)
mm = jax.jit(lambda x: x @ x)
out = mm(a); jax.block_until_ready(out)
t0 = time.perf_counter()
o = a
for _ in range(10):
    o = mm(o)
jax.block_until_ready(o)
print("4k matmul chained: %.2f ms (expect ~0.7-1.5)" % ((time.perf_counter()-t0)/10*1e3))
