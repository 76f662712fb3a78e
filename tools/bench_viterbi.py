"""On-chip timing: _choose_lags (Viterbi + refine) and full kaldi_pitch.

  PYTHONPATH=/root/repo:/root/.axon_site nohup python -u tools/bench_viterbi.py > /tmp/bench_vit.log 2>&1 &
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from speech_tpu.ops import pitch as _pitch

RATE = 16000
B, SECS, T = 32, 10, 995
N = RATE * SECS


def _sync(out):
    a = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(a[(0,) * a.ndim])


def timeit(fn, *args, n=10):
    _sync(fn(*args))
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.time() - t0) / n * 1e3


def main():
    print("devices:", jax.devices(), flush=True)
    tables = _pitch._lag_tables(4000.0, 50.0, 400.0, 0.1, 0.01)
    L = len(tables[2])
    rng = np.random.RandomState(0)
    ncp = jax.device_put(
        jnp.asarray((rng.rand(B, T, L) * 2 - 1).astype(np.float32))
    )
    ncv = jax.device_put(jnp.asarray(rng.rand(B, T, L).astype(np.float32)))
    f = jax.jit(
        lambda a, b: _pitch._choose_lags(a, b, 4000.0, tables, 0.01, 10.0)
    )
    t = timeit(f, ncp, ncv)
    print(f"choose_lags (vit+refine): {t:8.2f} ms", flush=True)

    x = rng.randn(B, N).astype(np.float32)
    xd = jax.device_put(jnp.asarray(x))
    lens = jnp.full((B,), N, jnp.int32)
    full = jax.jit(lambda s, l: _pitch.kaldi_pitch(s, RATE, lengths=l).f0)
    t = timeit(full, xd, lens)
    rt = B * SECS / (t / 1e3)
    print(f"full kaldi_pitch        : {t:8.2f} ms  ({rt:,.0f}x RT)", flush=True)


if __name__ == "__main__":
    main()
