"""SI tail (modulus + windowed integration) rework measurement (r5).

Round-2/3 standing: on the 32 x 10 s gammatone-40 batch the SI tail
costs ~10 ms of the 34 ms HIGHEST path (stage-timed conv 9.4 /
+modulus 5.6 / +integration 4.9) vs a ~2.5 ms single-pass traffic
floor; strided-slice and fused-lo/hi XLA variants failed (81 ms /
neutral), and a Mosaic kernel was left unmeasured.

New idea measured here: the relayout is the cost — (F, ny) ->
(F, nf+1, 160) re-tiles a 160-minor array.  Regrouping to
(F, G, 640) (640 = lcm(160, 128): tile-aligned, so the reshape is
free) turns the integration into TWO banded matmuls:

  out[f, 4g + j] = mod[f, g] @ A[:, j] + mod[f, g + 1] @ B[:, j]

with A[t, j] = w[t - 160 j] (in-group taps) and B only nonzero at
j = 3 (the one frame whose window crosses the group boundary).

Variants:
- T0 current production form (reshape + two half-window einsums)
- T1 640-group banded matmuls
- T2 Pallas fused modulus+integration kernel (chunked lanes)
All include the modulus (yr^2 + yi^2) and are checked for equivalence.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jax._src.pallas.core import Element as _El

BATCH, F, SECONDS, RATE = 32, 40, 10, 16000
SHIFT = 160
NF = (SECONDS * RATE) // SHIFT  # 1000 frames
NY = (NF + 1) * SHIFT


def _sync(a):
    np.asarray(a[(0,) * np.ndim(a)])


def timeit(fn, *args, inner=20, reps=3):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        start = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - start) / inner)
    return best * 1e3


def current_form(yr, yi, window):
    def f(yr, yi):
        y_mod = yr * yr + yi * yi  # (B, F, NY)
        blocks = y_mod.reshape(BATCH, F, NF + 1, SHIFT)
        prec = jax.lax.Precision.HIGHEST
        lo = jnp.einsum("bfkt,t->bfk", blocks, window[:SHIFT],
                        precision=prec)
        hi = jnp.einsum("bfkt,t->bfk", blocks, window[SHIFT:],
                        precision=prec)
        return (lo[:, :, :-1] + hi[:, :, 1:]).transpose(0, 2, 1)

    return jax.jit(f)


def grouped_form(yr, yi, window):
    GW = 640  # lcm(shift, 128): tile-aligned minor regrouping
    per = GW // SHIFT  # frames fully starting per group
    Gn = -(-NY // GW)
    w = np.asarray(window, np.float64)
    A = np.zeros((GW, per), np.float64)
    B = np.zeros((GW, per), np.float64)
    for j in range(per):
        for t in range(2 * SHIFT):
            pos = j * SHIFT + t
            if pos < GW:
                A[pos, j] = w[t]
            else:
                B[pos - GW, j] = w[t]
    A = jnp.asarray(A, jnp.float32)
    B = jnp.asarray(B, jnp.float32)

    def f(yr, yi):
        y_mod = yr * yr + yi * yi
        pad = Gn * GW - NY
        if pad:
            y_mod = jnp.pad(y_mod, ((0, 0), (0, 0), (0, pad)))
        g = y_mod.reshape(BATCH, F, Gn, GW)
        prec = jax.lax.Precision.HIGHEST
        ya = jnp.einsum("bfgt,tj->bfgj", g, A, precision=prec)
        yb = jnp.einsum("bfgt,tj->bfgj", g[:, :, 1:], B, precision=prec)
        out = ya.at[:, :, :-1].add(yb) if False else (
            ya[:, :, :-1] + yb
        )
        # frames: k = 4g + j over groups 0..Gn-2 covers 4*(Gn-1) frames;
        # the final group's in-group frames (no boundary crossing
        # needed for k <= NF-1 when padded) come from ya's last row
        head = out.reshape(BATCH, F, -1)
        tail = ya[:, :, -1].reshape(BATCH, F, per)
        allk = jnp.concatenate([head, tail], axis=-1)[:, :, :NF]
        return allk.transpose(0, 2, 1)

    return jax.jit(f)


def flat_matmul_form(yr, yi, window):
    """T1b: the 640-group integration as ONE explicit 2-D matmul
    ``(B*F*(Gn+1), 640) @ (640, [A|B])`` — batched-einsum lowering
    dodged; the group shift for the boundary-crossing frame happens on
    the reshaped 4-D output (major-dim slices only)."""
    GW = 640
    per = GW // SHIFT
    Gn = -(-NY // GW)
    w = np.asarray(window, np.float64)
    A = np.zeros((GW, per), np.float64)
    Bm = np.zeros((GW, per), np.float64)
    for j in range(per):
        for t in range(2 * SHIFT):
            pos = j * SHIFT + t
            if pos < GW:
                A[pos, j] = w[t]
            else:
                Bm[pos - GW, j] = w[t]
    C = jnp.asarray(np.concatenate([A, Bm], axis=1), jnp.float32)

    def f(yr, yi):
        y_mod = yr * yr + yi * yi
        pad = (Gn + 1) * GW - NY
        y_mod = jnp.pad(y_mod, ((0, 0), (0, 0), (0, pad)))
        flat = y_mod.reshape(BATCH * F * (Gn + 1), GW)
        out2 = jnp.matmul(flat, C, precision=jax.lax.Precision.HIGHEST)
        g4 = out2.reshape(BATCH, F, Gn + 1, 2 * per)
        ya = g4[:, :, :-1, :per]
        yb = g4[:, :, 1:, per:]
        allk = (ya + yb).reshape(BATCH, F, -1)[:, :, :NF]
        return allk.transpose(0, 2, 1)

    return jax.jit(f)


def pallas_form(yr, yi, window):
    """Fused modulus + integration: grid over (batch, lane chunks).

    Each step covers TWO 16-group sub-chunks so the out block's last dim
    is 128 (Mosaic requires 128-divisible out lanes); the window dot is
    one (Fp, 10880) x (10880, 64) HIGHEST matmul per sub-chunk.
    """
    GW = 640
    CH_G = 16  # groups per sub-chunk
    per = GW // SHIFT
    SUB = CH_G * GW  # 10240 lanes
    Gn = -(-NY // GW)
    steps = -(-Gn // (2 * CH_G))
    w = np.asarray(window, np.float64)
    width = SUB + GW
    M = np.zeros((width, CH_G * per), np.float64)
    for k in range(CH_G * per):
        for t in range(2 * SHIFT):
            M[k * SHIFT + t, k] = w[t]
    M = jnp.asarray(M, jnp.float32)
    Fp = 40  # already a sublane multiple of 8

    def kern(yr_ref, yi_ref, yrh_ref, yih_ref, m_ref, o_ref):
        outs = []
        for h in range(2):
            lo = h * SUB
            if h == 0:
                a = jax.lax.slice(yr_ref[0], (0, lo), (Fp, lo + width))
                b = jax.lax.slice(yi_ref[0], (0, lo), (Fp, lo + width))
                mod = a * a + b * b
            else:
                a = jax.lax.slice(yr_ref[0], (0, lo), (Fp, 2 * SUB))
                b = jax.lax.slice(yi_ref[0], (0, lo), (Fp, 2 * SUB))
                ah, bh = yrh_ref[0], yih_ref[0]
                mod = jnp.concatenate(
                    [a * a + b * b, ah * ah + bh * bh], axis=-1
                )
            outs.append(
                jnp.dot(
                    mod, m_ref[...], preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            )
        o_ref[0] = jnp.concatenate(outs, axis=-1)

    @jax.jit
    def f(yr, yi):
        pad = steps * 2 * SUB + GW - NY
        yrp = jnp.pad(yr, ((0, 0), (0, 0), (0, pad)))
        yip = jnp.pad(yi, ((0, 0), (0, 0), (0, pad)))
        main = pl.BlockSpec(
            (1, Fp, 2 * SUB), lambda b, c: (b, 0, c),
            memory_space=pltpu.VMEM,
        )
        halo = pl.BlockSpec(
            (1, Fp, GW),
            lambda b, c: (b, 0, (c + 1) * (2 * SUB // GW)),
            memory_space=pltpu.VMEM,
        )
        out = pl.pallas_call(
            kern,
            grid=(BATCH, steps),
            in_specs=[main, main, halo, halo,
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(
                (1, Fp, 2 * CH_G * per),
                lambda b, c: (b, 0, c),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (BATCH, Fp, steps * 2 * CH_G * per), jnp.float32
            ),
        )(yrp, yip, yrp, yip, M)
        return out[:, :F, :NF].transpose(0, 2, 1)

    return f


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    yr = jnp.asarray(rng.randn(BATCH, F, NY).astype(np.float32))
    yi = jnp.asarray(rng.randn(BATCH, F, NY).astype(np.float32))
    window = jnp.asarray(rng.rand(2 * SHIFT).astype(np.float32))

    f0 = current_form(yr, yi, window)
    ref = np.asarray(f0(yr, yi))
    ms0 = timeit(f0, yr, yi)
    print(f"T0 current reshape+einsum      {ms0:8.2f} ms", flush=True)

    for name, mk in (
        ("T1 640-group banded matmuls", grouped_form),
        ("T1b flat 2-D matmul", flat_matmul_form),
        ("T2 pallas fused", pallas_form),
    ):
        try:
            f = mk(yr, yi, window)
            out = np.asarray(f(yr, yi))
            err = np.max(np.abs(out - ref)) / max(1e-30, np.abs(ref).max())
            ms = timeit(f, yr, yi)
            print(f"{name:30s} {ms:8.2f} ms  rel_err={err:.2e}",
                  flush=True)
        except Exception as e:
            print(
                f"{name:30s} FAILED {type(e).__name__}: "
                f"{str(e).splitlines()[0][:140]}",
                flush=True,
            )


if __name__ == "__main__":
    main()
