import time
from speech_tpu.utils import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import numpy as np
import jax, jax.numpy as jnp
from speech_tpu.compute import SIFrameComputer

rng = np.random.RandomState(0)
batch, max_len = 32, 160000  # 32 x 10s
audio = batch * 10.0
sigs = rng.randn(batch, max_len).astype(np.float32)
lens = np.full((batch,), max_len, dtype=np.int64)

for bank in ({"name": "fbank", "num_filts": 40, "sampling_rate": 16000},
             {"name": "gammatone", "scaling_function": "mel", "num_filts": 40, "sampling_rate": 16000}):
    c = SIFrameComputer(dict(bank), dtype="float32")
    t0 = time.perf_counter()
    f, n = c.compute_batch(sigs, lens)
    f.block_until_ready()
    print(f"{bank['name']}: compile {time.perf_counter()-t0:.0f}s T={c.max_support}", flush=True)
    t0 = time.perf_counter()
    for _ in range(5):
        f, n = c.compute_batch(sigs, lens)
    f.block_until_ready()
    dt = (time.perf_counter()-t0)/5
    print(f"{bank['name']}: {dt*1e3:.1f} ms  rt={audio/dt:,.0f}x", flush=True)
    # sanity vs float64 host
