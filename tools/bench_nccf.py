"""On-chip NCCF formulation shootout (the x2 stack is HBM-bound).

  PYTHONPATH=/root/repo:/root/.axon_site nohup python -u tools/bench_nccf.py > /tmp/bench_nccf.log 2>&1 &
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from speech_tpu.ops import pitch as _pitch
from speech_tpu.ops import framing as _framing

_HI = jax.lax.Precision.HIGHEST
B, T = 32, 995
WINDOW, SHIFT = 100, 40


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


def make_variants(tables):
    lo_int, n_int, _, interp, _ = tables

    def post(inner, e1, e2, frames, ballast):
        tiny = jnp.asarray(1e-30, frames.dtype)
        denom_p = jnp.sqrt((e1[:, None] + ballast) * (e2 + ballast)) + tiny
        denom_v = jnp.sqrt(e1[:, None] * e2) + tiny
        imat = jnp.asarray(interp, frames.dtype)
        a = jnp.matmul(inner / denom_p, imat, precision=_HI)
        b = jnp.matmul(inner / denom_v, imat, precision=_HI)
        return a, jnp.clip(b, -1.0, 1.0)

    def v_stack(frames, ballast):
        frames = frames - frames.mean(axis=1, keepdims=True)
        x1 = frames[:, :WINDOW]
        x2 = jnp.stack(
            [
                frames[:, k : k + WINDOW]
                for k in range(lo_int, lo_int + n_int)
            ],
            axis=1,
        )
        inner = jnp.einsum("tw,tlw->tl", x1, x2, precision=_HI)
        e1 = jnp.einsum("tw,tw->t", x1, x1, precision=_HI)
        e2 = jnp.einsum("tlw,tlw->tl", x2, x2, precision=_HI)
        return post(inner, e1, e2, frames, ballast)

    def v_fused_dots(frames, ballast):
        frames = frames - frames.mean(axis=1, keepdims=True)
        x1 = frames[:, :WINDOW]
        cols_i, cols_e = [], []
        for k in range(lo_int, lo_int + n_int):
            w = frames[:, k : k + WINDOW]
            cols_i.append(jnp.sum(x1 * w, axis=1))
            cols_e.append(jnp.sum(w * w, axis=1))
        inner = jnp.stack(cols_i, axis=1)
        e2 = jnp.stack(cols_e, axis=1)
        e1 = jnp.sum(x1 * x1, axis=1)
        return post(inner, e1, e2, frames, ballast)

    def v_prefix_e2(frames, ballast):
        # inner via the stack einsum, e1/e2 via per-frame prefix sums
        frames = frames - frames.mean(axis=1, keepdims=True)
        x1 = frames[:, :WINDOW]
        x2 = jnp.stack(
            [
                frames[:, k : k + WINDOW]
                for k in range(lo_int, lo_int + n_int)
            ],
            axis=1,
        )
        inner = jnp.einsum("tw,tlw->tl", x1, x2, precision=_HI)
        q = jnp.cumsum(
            jnp.pad(frames * frames, ((0, 0), (1, 0))), axis=1
        )
        e1 = q[:, WINDOW] - q[:, 0]
        e2 = (
            q[:, lo_int + WINDOW : lo_int + WINDOW + n_int]
            - q[:, lo_int : lo_int + n_int]
        )
        return post(inner, e1, e2, frames, ballast)

    return v_stack, v_fused_dots, v_prefix_e2


def main():
    print("devices:", jax.devices(), flush=True)
    tables = _pitch._lag_tables(4000.0, 50.0, 400.0, 0.1, 0.01)
    span = _pitch._nccf_span(WINDOW, tables)
    rng = np.random.RandomState(0)
    frames = jax.device_put(
        jnp.asarray(rng.randn(B, T, span).astype(np.float32))
    )
    bal = jnp.asarray(1.0, jnp.float32)
    names = ("stack-einsum", "fused-dots", "prefix-e2")
    for name, v in zip(names, make_variants(tables)):
        f = jax.jit(jax.vmap(lambda fr, v=v: v(fr, bal)))
        t = timeit(f, frames)
        a, b = f(frames)
        print(f"nccf {name:<14}: {t:8.2f} ms", flush=True)
    # cross-check values
    vs, vf, vp = make_variants(tables)
    r0 = jax.jit(jax.vmap(lambda fr: vs(fr, bal)))(frames)
    r1 = jax.jit(jax.vmap(lambda fr: vf(fr, bal)))(frames)
    r2 = jax.jit(jax.vmap(lambda fr: vp(fr, bal)))(frames)
    for nm, r in (("fused", r1), ("prefix", r2)):
        d = max(
            float(jnp.abs(r[0] - r0[0]).max()), float(jnp.abs(r[1] - r0[1]).max())
        )
        print(f"max |{nm} - stack| = {d:.3e}", flush=True)


if __name__ == "__main__":
    main()
