import time
import numpy as np
import jax, jax.numpy as jnp

batch, max_len = 128, 240000
rng = np.random.RandomState(0)
signals = jnp.asarray(rng.randn(batch, max_len).astype(np.float32))

def timeit(name, fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:40s} {best*1e3:9.2f} ms", flush=True)

timeit("noop slice-add", jax.jit(lambda s: s[:, :128] + 1.0), signals)
timeit("full elementwise x*2", jax.jit(lambda s: s * 2.0), signals)
timeit("reduce sum", jax.jit(lambda s: jnp.sum(s, axis=-1)), signals)
