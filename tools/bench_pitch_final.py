"""On-chip: full kaldi_pitch after fused-dot NCCF, group sweep.

  PYTHONPATH=/root/repo:/root/.axon_site nohup python -u tools/bench_pitch_final.py > /tmp/bench_pf.log 2>&1 &
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from speech_tpu.ops import pitch as _pitch

RATE = 16000
B, SECS = 32, 10
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
    rng = np.random.RandomState(0)
    x = rng.randn(B, N).astype(np.float32)
    xd = jax.device_put(jnp.asarray(x))
    lens = jnp.full((B,), N, jnp.int32)
    full = jax.jit(lambda s, l: _pitch.kaldi_pitch(s, RATE, lengths=l).f0)
    t = timeit(full, xd, lens)
    rt = B * SECS / (t / 1e3)
    print(f"full kaldi_pitch (g=16) : {t:8.2f} ms  ({rt:,.0f}x RT)", flush=True)

    # pitch_feats (the bench.py key)
    from speech_tpu.ops.pitch import pitch_feats

    pf = jax.jit(lambda s, l: pitch_feats(s, RATE, lengths=l))
    t = timeit(pf, xd, lens)
    rt = B * SECS / (t / 1e3)
    print(f"pitch_feats             : {t:8.2f} ms  ({rt:,.0f}x RT)", flush=True)


if __name__ == "__main__":
    main()
