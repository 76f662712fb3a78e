"""On-chip pooled-KWS tick timing: N StreamingKWS sessions in a StreamPool.

Measures the warm wide-tick cost (per-tick wall time over a long drain of
pre-fed backlogs) at a few (slots, max_chunks) points, plus the solo
streaming-KWS chunk cost, on the real device.

  PYTHONPATH=/root/repo:/root/.axon_site nohup python -u tools/bench_kws_pool.py > /tmp/bench_kws_pool.log 2>&1 &
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from speech_tpu.compute import STFTFrameComputer
from speech_tpu.models.kws import KWSModel, StreamingKWS
from speech_tpu.nn import STFTFrontend
from speech_tpu.serve import StreamPool

RATE = 16000
CHUNK = 1600  # 100 ms


def _build():
    computer = STFTFrameComputer(
        {"name": "fbank", "num_filts": 40, "sampling_rate": RATE},
        frame_length_ms=25,
        frame_shift_ms=10,
        dtype="float32",
    )
    model = KWSModel(
        STFTFrontend(computer, dtype=jnp.float32),
        num_classes=12,
        channels=(64, 64),
    )
    params, consts = model.init(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    params["classifier"]["head"]["w"] = jnp.asarray(
        0.1 * rng.randn(*np.asarray(params["classifier"]["head"]["w"]).shape),
        jnp.float32,
    )
    return model, params


def drain(slots: int, k: int, secs: int = 40):
    model, params = _build()
    skws = StreamingKWS(model, params, window_frames=100, chunk_size=CHUNK)
    pool = StreamPool(skws, slots=slots)
    rng = np.random.RandomState(2)
    handles = [pool.open() for _ in range(slots)]
    for h in handles:
        pool.feed(h, rng.randn(secs * RATE).astype(np.float32))
    list(pool.step(max_chunks=k))  # warm the full-depth tier
    n_full = (secs * RATE // CHUNK - k) // k - 1
    t0 = time.time()
    audio = 0.0
    for _ in range(n_full):
        out = pool.step(max_chunks=k)
        audio += len(out) * k * CHUNK / RATE
    dt = time.time() - t0
    print(
        f"kws pool {slots} slots x k={k}: {n_full} warm ticks, "
        f"{dt*1e3/n_full:.2f} ms/tick, {audio:.0f} audio-s scored -> "
        f"{audio/dt:,.0f}x RT",
        flush=True,
    )
    while pool.step(max_chunks=k):
        pass
    pool.close_many(handles)


def solo(secs: int = 30):
    model, params = _build()
    skws = StreamingKWS(model, params, window_frames=100, chunk_size=CHUNK)
    rng = np.random.RandomState(3)
    sig = rng.randn(secs * RATE).astype(np.float32)
    state = skws.init_state()
    chunks = [
        jax.device_put(jnp.asarray(sig[i : i + CHUNK]))
        for i in range(0, secs * RATE, CHUNK)
    ]
    state, logits = skws.process(state, chunks[0])  # warm
    np.asarray(logits[0])
    t0 = time.time()
    for c in chunks[1:]:
        state, logits = skws.process(state, c)
    np.asarray(logits[0])  # one scalar readback syncs the in-order queue
    dt = time.time() - t0
    n = len(chunks) - 1
    print(
        f"kws solo stream: {n} chunks, {dt*1e3/n:.2f} ms/chunk amortized "
        f"({n * CHUNK / RATE / dt:,.0f}x RT)",
        flush=True,
    )


def main():
    print("devices:", jax.devices(), flush=True)
    solo()
    drain(16, 16)
    drain(64, 16)


if __name__ == "__main__":
    main()
