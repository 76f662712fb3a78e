"""On-chip timing for the learnable frontends (forward and grad).

Run on the real TPU (no platform override), detached, one at a time:
    nohup python -u tools/bench_frontends.py > /tmp/bench_frontends.log 2>&1 &

Timing discipline (CLAUDE.md): device_put inputs before the loop, force
a host readback of ONE scalar per iteration (block_until_ready on this
runtime returns at dispatch), amortize the tunnel RTT over ~20 calls.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from speech_tpu.filters import GaborFilterBank
from speech_tpu.nn import GaborFrontend, SincFrontend, STFTFrontend
from speech_tpu.utils import enable_persistent_compilation_cache

B, SECS, RATE = 32, 10, 16000
AUDIO_S = B * SECS


def _time(fn, *args, n=20):
    out = fn(*args)  # compile
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n


def _sync(tree):
    leaf = jax.tree_util.tree_leaves(tree)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def main():
    enable_persistent_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    sig_np = rng.standard_normal((B, SECS * RATE)).astype(np.float32) * 0.1
    sig = jax.device_put(jnp.asarray(sig_np))

    frontends = {
        "gabor40": GaborFrontend(
            GaborFilterBank("mel", num_filts=40, sampling_rate=RATE),
            frame_shift_ms=10,
            filter_size=401,
        ),
        "sinc40": SincFrontend(num_filts=40, sampling_rate=RATE),
        "stft40": STFTFrontend(
            {
                "name": "stft",
                "bank": {
                    "name": "fbank",
                    "num_filts": 40,
                    "sampling_rate": RATE,
                },
            }
        ),
    }
    for name, fe in frontends.items():
        params, consts = fe.init()
        params = jax.device_put(params)
        consts = jax.device_put(consts)

        fwd = jax.jit(lambda p, s, fe=fe, c=consts: fe.apply(p, c, s))
        dt = _time(fwd, params, sig)
        print(
            f"{name} fwd:  {dt*1e3:7.2f} ms  {AUDIO_S/dt:10.0f}x RT",
            flush=True,
        )

        def loss(p, s, fe=fe, c=consts):
            return jnp.sum(fe.apply(p, c, s) ** 2)

        gfn = jax.jit(jax.grad(loss))
        dt = _time(gfn, params, sig)
        print(
            f"{name} grad: {dt*1e3:7.2f} ms  {AUDIO_S/dt:10.0f}x RT",
            flush=True,
        )


if __name__ == "__main__":
    main()
