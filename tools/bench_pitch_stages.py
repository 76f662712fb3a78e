"""On-chip stage timing for kaldi_pitch (32x10 s v5e batch): frontend
(resample+lowpass) / grouped NCCF sweep / full (adds Viterbi+refine).

  PYTHONPATH=/root/repo:/root/.axon_site nohup python -u tools/bench_pitch_stages.py > /tmp/bench_pitch.log 2>&1 &
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from speech_tpu.ops import pitch as _pitch
from speech_tpu.ops.resample import resample

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

    work_rate, up, down, window, shift, tables = _pitch._work_geometry(
        RATE, 50.0, 400.0, 25.0, 10.0, 4000.0, 0.1, 0.01
    )
    print(
        f"geometry: work_rate={work_rate} window={window} shift={shift} "
        f"n_int={tables[1]} n_fine={len(tables[2])}",
        flush=True,
    )

    def frontend(s):
        s = resample(s, up, down)
        return _pitch._lowpass(s, work_rate, 1000.0)

    def nccf_grouped(s, l, g):
        s = resample(s, up, down)
        l2 = -((-l * up) // down)
        s = s * (jnp.arange(s.shape[-1]) < l2[..., None]).astype(s.dtype)
        s = _pitch._lowpass(s, work_rate, 1000.0)
        S2 = s.shape[-1]

        def one(sig, length):
            return _pitch._nccf_1d(
                sig, length, window, shift, tables, 1.0, ballast_ms=None
            )

        von = jax.vmap(one)
        out = jax.lax.map(
            lambda args: von(*args),
            (s.reshape(-1, g, S2), l2.reshape(-1, g)),
        )
        return jax.tree_util.tree_map(
            lambda a: a.reshape((-1,) + a.shape[2:]), out
        )

    full = jax.jit(lambda s, l: _pitch.kaldi_pitch(s, RATE, lengths=l).f0)

    print("compiling stages...", flush=True)
    t1 = timeit(jax.jit(frontend), xd)
    print(f"frontend          : {t1:8.2f} ms", flush=True)
    for g in (4, 8, 16, 32):
        tg = timeit(jax.jit(lambda s, l, g=g: nccf_grouped(s, l, g)), xd, lens)
        print(f"frontend+NCCF g={g:<3}: {tg:8.2f} ms", flush=True)
    t3 = timeit(full, xd, lens)
    rt = B * SECS / (t3 / 1e3)
    print(f"full kaldi_pitch  : {t3:8.2f} ms  ({rt:,.0f}x RT)", flush=True)


if __name__ == "__main__":
    main()
