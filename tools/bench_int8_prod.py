"""On-chip validation of the production int8 digit kernels (round 5).

Times the PRODUCTION paths (STFTFrameComputer.compute_batch on the
headline 128 x 15 s batch) for precision='double'/'accurate' under the
int8 kernel, checks them against the XLA grouped digit path on-chip, and
sweeps block_frames (512 vs 768 — the int8 scratch is 4x smaller than
the bf16 kernel's plane arrays, so bigger blocks now fit VMEM and halve
the 1.5 ms grid floor).
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from speech_tpu.compute import STFTFrameComputer

BATCH, SECONDS, RATE = 128, 15, 16000


def _sync(a):
    np.asarray(a[(0,) * np.ndim(a)])


def timeit(fn, *args, inner=20, reps=3):
    out = fn(*args)
    _sync(out[0] if isinstance(out, tuple) else out)
    best = float("inf")
    for _ in range(reps):
        start = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        _sync(out[0] if isinstance(out, tuple) else out)
        best = min(best, (time.perf_counter() - start) / inner)
    return best * 1e3


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    signals = jnp.asarray(
        rng.randn(BATCH, SECONDS * RATE).astype(np.float32)
    )
    lengths = np.full((BATCH,), SECONDS * RATE, dtype=np.int32)

    cfg = dict(
        frame_length_ms=25,
        frame_shift_ms=10,
        include_energy=True,
        dtype="float32",
    )
    bank = {"name": "fbank", "num_filts": 40, "sampling_rate": 16000}

    # XLA digit oracle on-chip
    oracle = STFTFrameComputer(
        dict(bank), precision="double", fft_mode="matmul", **cfg
    )
    feats_o, _ = oracle.compute_batch(signals, lengths)
    ref = np.asarray(feats_o)
    ms = timeit(lambda: oracle.compute_batch(signals, lengths))
    print(f"XLA digit double (prod): {ms:8.2f} ms", flush=True)

    import speech_tpu.ops.pallas_stft as pk

    for bf in (512, 768, 1024):
        for prec in ("double", "accurate"):
            try:
                import functools

                orig = pk.stft_feats_pallas_int8
                pk.stft_feats_pallas_int8 = functools.partial(
                    orig, block_frames=bf
                )
                c = STFTFrameComputer(
                    dict(bank), precision=prec, fft_mode="pallas", **cfg
                )
                feats, _ = c.compute_batch(signals, lengths)
                err = float(np.max(np.abs(np.asarray(feats) - ref)))
                ms = timeit(lambda: c.compute_batch(signals, lengths))
                rt = BATCH * SECONDS / (ms / 1e3)
                print(
                    f"int8 {prec:9s} bf={bf}: {ms:8.2f} ms  "
                    f"{rt:9.0f}x RT  err={err:.3e}",
                    flush=True,
                )
            except Exception as e:
                print(
                    f"int8 {prec:9s} bf={bf}: FAILED "
                    f"{type(e).__name__}: {str(e).splitlines()[0][:130]}",
                    flush=True,
                )
            finally:
                pk.stft_feats_pallas_int8 = orig

    # the plain fbank headline for context
    hi = STFTFrameComputer(dict(bank), **cfg)
    hi.compute_batch(signals, lengths)
    ms = timeit(lambda: hi.compute_batch(signals, lengths))
    print(f"fbank highest (prod):    {ms:8.2f} ms  "
          f"{BATCH * SECONDS / (ms / 1e3):9.0f}x RT", flush=True)


if __name__ == "__main__":
    main()
