import time
from speech_tpu.utils import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import numpy as np
from speech_tpu.compute import SIFrameComputer

rng = np.random.RandomState(0)
batch, max_len = 8, 32000
sigs = rng.randn(batch, max_len).astype(np.float32)
lens = np.full((batch,), max_len, dtype=np.int64)
c = SIFrameComputer({"name": "gammatone", "scaling_function": "mel", "num_filts": 40, "sampling_rate": 16000}, dtype="float32")
t0 = time.perf_counter()
f, n = c.compute_batch(sigs, lens)
f.block_until_ready()
print(f"gammatone SI on TPU ok: {tuple(f.shape)} compile+run {time.perf_counter()-t0:.0f}s", flush=True)
got = np.asarray(f)[0, :int(np.asarray(n)[0])]
ref = SIFrameComputer({"name": "gammatone", "scaling_function": "mel", "num_filts": 40, "sampling_rate": 16000}, dtype="float32")
import jax
want = ref.compute_full(sigs[0].astype(np.float64))
print("max abs diff vs host f32-on-TPU path:", np.abs(got - want).max(), flush=True)
