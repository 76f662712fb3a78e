"""Does XLA lower int8 x int8 -> int32 einsums to the v5e int8 MXU?

If yes, the SI digit tiers can switch from bf16-exact base-256 digits to
int8 base-128 margin digits (po2 weights, |d| <= 64) at ~2x the MXU
rate — the same rework that took the STFT digit kernel from 13 to 10 ms.
Probe: the SI conv's per-pair einsum shape ("kbv,kfvw->fbw", gammatone
class: k=5 shifted blocks, b=1252 signal blocks, v=w=128, f=40) as f32
(DEFAULT -> bf16) vs int8 operands, batch of 8 pair-passes.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


def _sync(a):
    np.asarray(a[(0,) * np.ndim(a)])


def timeit(fn, *args, inner=20, reps=3):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(3):
        start = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - start) / inner)
    return best * 1e3


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    k, b, v, f, passes = 5, 1252, 128, 40, 8
    x_f = jnp.asarray(
        np.round(rng.randn(passes, k, b, v) * 30).astype(np.float32)
    )
    a_f = jnp.asarray(
        np.round(rng.randn(passes, k, f, v, v) * 30).astype(np.float32)
    )
    x_i = x_f.astype(jnp.int8)
    a_i = a_f.astype(jnp.int8)

    @jax.jit
    def run_f32(xs, As):
        acc = None
        for p in range(passes):
            t = jnp.einsum("kbv,kfvw->fbw", xs[p], As[p])
            acc = t if acc is None else acc + t * np.float32(2.0 ** -p)
        return acc

    @jax.jit
    def run_i8(xs, As):
        acc = None
        for p in range(passes):
            t = jnp.einsum(
                "kbv,kfvw->fbw",
                xs[p],
                As[p],
                preferred_element_type=jnp.int32,
            )
            tf = t.astype(jnp.float32)
            acc = tf if acc is None else acc + tf * np.float32(2.0 ** -p)
        return acc

    ms_f = timeit(run_f32, x_f, a_f)
    print(f"f32 (bf16 DEFAULT) einsum x{passes}: {ms_f:8.2f} ms",
          flush=True)
    try:
        ms_i = timeit(run_i8, x_i, a_i)
        print(f"int8 -> int32 einsum x{passes}:   {ms_i:8.2f} ms "
              f"({ms_f / ms_i:.2f}x)", flush=True)
        # correctness: integer inputs -> both exact
        of = np.asarray(run_f32(x_f, a_f))
        oi = np.asarray(run_i8(x_i, a_i))
        print("agree:", np.allclose(of, oi), flush=True)
    except Exception as e:
        print(f"int8 einsum FAILED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:140]}", flush=True)


if __name__ == "__main__":
    main()
