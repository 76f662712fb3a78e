"""On-chip StreamPool-of-pitch-sessions tick timing (16 slots, f32).

  PYTHONPATH=/root/repo:/root/.axon_site nohup python -u tools/bench_pitch_pool.py > /tmp/bench_pp.log 2>&1 &
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from speech_tpu.streaming import StreamingPitch
from speech_tpu.serve import StreamPool

RATE = 16000
SLOTS = 16
CHUNK = 1600


def main():
    print("devices:", jax.devices(), flush=True)
    sp = StreamingPitch(RATE, chunk_size=CHUNK, lookahead_frames=30)
    pool = StreamPool(sp, slots=SLOTS)
    rng = np.random.RandomState(0)
    secs = 20
    sigs = [
        np.sin(
            2 * np.pi * np.cumsum(
                150 + 50 * np.sin(2 * np.pi * 0.7 * np.arange(secs * RATE) / RATE)
            ) / RATE
        ).astype(np.float32)
        + 0.1 * rng.randn(secs * RATE).astype(np.float32)
        for _ in range(SLOTS)
    ]
    handles = [pool.open() for _ in sigs]
    for h, x in zip(handles, sigs):
        pool.feed(h, x)
    # warm the k=16 wide tick, then time ONLY full-depth warm ticks
    # (the tail tick hits a new pow2 depth tier and would average a
    # fresh compile into the drain)
    list(pool.step(max_chunks=16))
    chunks_left = secs * RATE // CHUNK - 16
    n_full = int(chunks_left // 16) - 1
    t0 = time.time()
    audio = 0.0
    for _ in range(n_full):
        out = pool.step(max_chunks=16)
        audio += sum(f.shape[0] for _, f in out) * 0.01
    dt = time.time() - t0
    print(
        f"pitch pool drain: {n_full} warm ticks in {dt*1e3:.1f} ms "
        f"({dt*1e3/n_full:.1f} ms/tick), {audio:.1f} audio-s emitted -> "
        f"{audio/dt:,.0f}x RT end-to-end",
        flush=True,
    )
    while pool.step(max_chunks=16):
        pass
    for h, f in pool.close_many(handles):
        pass
    print("closed", flush=True)


if __name__ == "__main__":
    main()
