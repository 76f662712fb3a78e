import time
from speech_tpu.utils import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import numpy as np
import jax, jax.numpy as jnp
from speech_tpu.compute import STFTFrameComputer

rng = np.random.RandomState(0)
batch, max_len = 128, 240000
sigs = jnp.asarray(rng.randn(batch, max_len).astype(np.float32))
lens = jnp.full((batch,), max_len, dtype=jnp.int32)
audio = batch * 15.0
c = STFTFrameComputer({"name": "fbank", "num_filts": 40, "sampling_rate": 16000},
                      frame_length_ms=25, frame_shift_ms=10, include_energy=True,
                      dtype="float32", fft_mode="matmul")
t0 = time.perf_counter()
f, n = c.compute_batch(sigs, lens); f.block_until_ready()
print(f"nyq-split compile {time.perf_counter()-t0:.0f}s", flush=True)
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(10):
        f, n = c.compute_batch(sigs, lens)
    f.block_until_ready()
    dt = (time.perf_counter()-t0)/10
    print(f"nyq-split: {dt*1e3:.2f} ms  rt={audio/dt:,.0f}x", flush=True)
