"""On-chip: phase split of one warm StreamPool-style pitch tick.

  PYTHONPATH=/root/repo:/root/.axon_site nohup python -u tools/bench_tick_phases.py > /tmp/bench_tph.log 2>&1 &
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


def main():
    print("devices:", jax.devices(), flush=True)
    sp = StreamingPitch(RATE, chunk_size=CHUNK, lookahead_frames=30)
    init = sp.init_state()
    states = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (SLOTS,) + x.shape), init
    )
    rng = np.random.RandomState(0)
    W = K * CHUNK
    vstep = jax.jit(jax.vmap(sp._process_impl))
    chunks_np = rng.randn(SLOTS, W).astype(np.float32)
    valids_np = np.full((SLOTS,), W, np.int32)

    # warm
    states2, feats, nfs = vstep(
        states, jnp.asarray(chunks_np), jnp.asarray(valids_np)
    )
    jax.device_get((feats, nfs))

    n = 10
    t_up = t_disp = t_get = 0.0
    for _ in range(n):
        t0 = time.time()
        cd = jnp.asarray(chunks_np)
        vd = jnp.asarray(valids_np)
        # force the upload to complete: read a scalar back from it
        np.asarray(cd[0, 0])
        t1 = time.time()
        states2, feats, nfs = vstep(states2, cd, vd)
        np.asarray(nfs[0])  # scalar sync: dispatch + execution
        t2 = time.time()
        f, ns = jax.device_get((feats, nfs))
        t3 = time.time()
        t_up += t1 - t0
        t_disp += t2 - t1
        t_get += t3 - t2
    print(
        f"upload {t_up/n*1e3:7.2f} ms | dispatch+exec {t_disp/n*1e3:7.2f} ms "
        f"| device_get {t_get/n*1e3:7.2f} ms | total {(t_up+t_disp+t_get)/n*1e3:7.2f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
