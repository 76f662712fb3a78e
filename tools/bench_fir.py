"""On-chip timing: conv_general_dilated vs fir_conv_matmul for the pitch
front-end's two FIRs (decimate 16k->4k, lowpass@1k on 4k), 32x10 s batch.

Run detached on the real TPU:
  PYTHONPATH=/root/repo:/root/.axon_site nohup python -u tools/bench_fir.py > /tmp/bench_fir.log 2>&1 &
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from speech_tpu.ops.resample import (
    fir_conv_matmul,
    resample,
    resample_matrices,
)
from speech_tpu.ops import pitch as _pitch

RATE = 16000
B, SECS = 32, 10
N = RATE * SECS


def _sync(out):
    # scalar readback: axon's block_until_ready returns after dispatch;
    # a one-element host transfer forces execution without shipping the
    # whole output through the tunnel
    a = jax.tree_util.tree_leaves(out)[0]
    return np.asarray(a[(0,) * a.ndim])


def timeit(fn, *args, n=20):
    _sync(fn(*args))  # warm + sync
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

    M, hw = 4, 10
    K2 = hw * M
    phi1, _ = resample_matrices(1, M, hw, 5.0)
    kern = phi1[0, 1:]
    n_out = -(-N // M)

    decim_conv = jax.jit(lambda s: resample(s, 1, M))
    decim_mm = jax.jit(
        lambda s: fir_conv_matmul(s, kern, stride=M, pad_left=K2, n_out=n_out)
    )
    print("compiling decim...", flush=True)
    t = timeit(decim_conv, xd)
    print(f"decim conv      : {t:8.2f} ms", flush=True)
    t = timeit(decim_mm, xd)
    print(f"decim toeplitz  : {t:8.2f} ms", flush=True)
    for g in (256, 512):
        f = jax.jit(
            lambda s, g=g: fir_conv_matmul(
                s, kern, stride=M, pad_left=K2, n_out=n_out, group=g
            )
        )
        t = timeit(f, xd)
        print(f"decim toeplitz G={g}: {t:8.2f} ms", flush=True)

    h = _pitch._lowpass_fir(4000.0, 1000.0)
    K = (len(h) - 1) // 2
    w = rng.randn(B, n_out).astype(np.float32)
    wd = jax.device_put(jnp.asarray(w))
    lp_conv = jax.jit(lambda s: _pitch._lowpass(s, 4000.0, 1000.0))
    lp_mm = jax.jit(
        lambda s: fir_conv_matmul(s, h, stride=1, pad_left=K, n_out=n_out)
    )
    print("compiling lowpass...", flush=True)
    t = timeit(lp_conv, wd)
    print(f"lowpass conv    : {t:8.2f} ms", flush=True)
    t = timeit(lp_mm, wd)
    print(f"lowpass toeplitz: {t:8.2f} ms", flush=True)
    for g in (256, 512):
        f = jax.jit(
            lambda s, g=g: fir_conv_matmul(
                s, h, stride=1, pad_left=K, n_out=n_out, group=g
            )
        )
        t = timeit(f, wd)
        print(f"lowpass toeplitz G={g}: {t:8.2f} ms", flush=True)

    # upsampling: Toeplitz polyphase vs the framing+matmul path
    B2, N2 = 128, RATE * 15
    x2 = rng.randn(B2, N2).astype(np.float32)
    x2d = jax.device_put(jnp.asarray(x2))
    for L, M in ((3, 2), (2, 1), (441, 160)):
        phi, k_min = resample_matrices(L, M)
        n_o = -(-N2 * L // M)
        up_frame = jax.jit(lambda s, L=L, M=M: resample(s, L, M))
        up_mm = jax.jit(
            lambda s, phi=phi, M=M, k=-k_min, n=n_o: fir_conv_matmul(
                s, phi, stride=M, pad_left=k, n_out=n
            )
        )
        print(f"compiling upsample {L}/{M}...", flush=True)
        t = timeit(up_frame, x2d, n=10)
        print(f"up {L}/{M} framing : {t:8.2f} ms", flush=True)
        t = timeit(up_mm, x2d, n=10)
        print(f"up {L}/{M} toeplitz: {t:8.2f} ms", flush=True)

    # full pitch, current code (frontend timing context)
    lens = jnp.full((B,), N, jnp.int32)
    kp = jax.jit(lambda s, l: _pitch.kaldi_pitch(s, RATE, lengths=l).f0)
    print("compiling kaldi_pitch...", flush=True)
    t = timeit(kp, xd, lens, n=10)
    rt = B * SECS / (t / 1e3)
    print(f"kaldi_pitch     : {t:8.2f} ms  ({rt:,.0f}x RT)", flush=True)


if __name__ == "__main__":
    main()
