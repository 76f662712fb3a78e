"""On-chip: vmapped StreamingPitch wide-tick program, stage split.

  PYTHONPATH=/root/repo:/root/.axon_site nohup python -u tools/bench_pitch_tick.py > /tmp/bench_pt.log 2>&1 &
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from speech_tpu.streaming import StreamingPitch

RATE = 16000
SLOTS = 16
CHUNK = 1600
K = 16


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
    sp = StreamingPitch(RATE, chunk_size=CHUNK, lookahead_frames=30)
    print(
        f"geometry: ring_len={sp.ring_len} F={sp.max_frames_chunk} "
        f"n_lags={sp.n_lags} raw_ctx={sp.raw_ctx}",
        flush=True,
    )
    rng = np.random.RandomState(0)
    init = sp.init_state()
    states = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (SLOTS,) + x.shape), init
    )
    W = K * CHUNK
    buf = jax.device_put(
        jnp.asarray(rng.randn(SLOTS, W).astype(np.float32))
    )
    vals = jnp.full((SLOTS,), W, jnp.int32)

    tick = jax.jit(jax.vmap(sp._process_impl))
    t = timeit(tick, states, buf, vals)
    print(f"wide tick k={K} full      : {t:8.2f} ms", flush=True)

    # absorb-only (no emission): scan of _absorb_impl over chunks
    def absorb_only(st, samples, v):
        chunks = samples.reshape(K, CHUNK)

        def pstep(s, c):
            return sp._absorb_impl(
                s, c, jnp.asarray(CHUNK, jnp.int32), advance=True
            ), None

        st, _ = jax.lax.scan(pstep, st, chunks)
        return st

    f = jax.jit(jax.vmap(absorb_only))
    t = timeit(f, states, buf, vals)
    print(f"absorb only               : {t:8.2f} ms", flush=True)

    # single absorb step (x16 would be the scan-free floor)
    one = jax.jit(
        jax.vmap(
            lambda s, c: sp._absorb_impl(
                s, c, jnp.asarray(CHUNK, jnp.int32), advance=True
            )
        )
    )
    t = timeit(one, states, buf[:, :CHUNK])
    print(f"single absorb             : {t:8.2f} ms (x{K} = {t*K:.1f})", flush=True)

    # absorb variants: no viterbi ring (frontend+nccf only)
    def front_nccf(st, c):
        import speech_tpu.ops.pitch as _pitch

        N = CHUNK
        v = jnp.asarray(N, jnp.int32)
        chunk = jnp.asarray(c, sp._dtype)
        buf2 = jnp.concatenate([st.raw_carry, chunk])
        work = sp._front(buf2)
        stream = jnp.concatenate([st.wcarry, work[sp.off : sp.off + sp.work_per_chunk]])
        from speech_tpu.ops import framing as _fr

        F = sp.max_frames_chunk
        win_len = (F - 1) * sp.shift + sp.span
        frames = _fr.frame_padded(
            jnp.concatenate([stream, jnp.zeros((win_len,), stream.dtype)])[:win_len],
            F, sp.span, sp.shift,
        )
        ncp, ncv = _pitch._nccf_from_frames(
            frames, sp.nccf_window, sp.tables, jnp.asarray(1.0, sp._dtype)
        )
        return ncp.sum() + ncv.sum() + work.sum()

    f = jax.jit(jax.vmap(front_nccf))
    t = timeit(f, states, buf[:, :CHUNK])
    print(f"single front+nccf         : {t:8.2f} ms (x{K} = {t*K:.1f})", flush=True)


if __name__ == "__main__":
    main()
