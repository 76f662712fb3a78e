import time
from speech_tpu.utils import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import numpy as np, jax
from speech_tpu.compute import SIFrameComputer

rng = np.random.RandomState(0)
batch, max_len = 32, 160000
sigs = rng.randn(batch, max_len).astype(np.float32)
lens = np.full((batch,), max_len, dtype=np.int64)
audio = batch * 10.0
for mode in ("direct", "fft"):
    c = SIFrameComputer({"name": "fbank", "num_filts": 40, "sampling_rate": 16000},
                        dtype="float32", conv_mode=mode)
    t0 = time.perf_counter()
    f, n = c.compute_batch(sigs, lens); np.asarray(f[0, 0])
    print(f"si-{mode}: compile {time.perf_counter()-t0:.0f}s", flush=True)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(5):
            f, n = c.compute_batch(sigs, lens)
        np.asarray(f[0, 0])
        best = min(best, (time.perf_counter()-t0)/5)
    print(f"si-{mode}: {best*1e3:.1f} ms rt={audio/best:,.0f}x", flush=True)
