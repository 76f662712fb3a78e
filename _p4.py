import time
import numpy as np
import jax, jax.numpy as jnp
from speech_tpu.ops import framing as F, stft as S
from speech_tpu.compute import STFTFrameComputer

c = STFTFrameComputer({"name": "fbank", "num_filts": 40, "sampling_rate": 16000},
                      frame_length_ms=25, frame_shift_ms=10, include_energy=True, dtype="float32")
params = c.params; spec = c._static_spec
FL, FS, PL = c._frame_length, c._frame_shift, c._pad_left
batch, max_len = 128, 240000
MF = F.frame_count_np(max_len, FL, FS)
rng = np.random.RandomState(0)
signals = jnp.asarray(rng.randn(batch, max_len).astype(np.float32))
lengths = jnp.full((batch,), max_len, dtype=jnp.int32)

def timeit(name, fn, *args, n=10):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:46s} {dt*1e3:9.2f} ms", flush=True)
    return out

# A: end-to-end fused (current compute_batch path)
def one(signal, length):
    frames = F.frame_signal(signal, length, MF, FL, FS, PL)
    return S.stft_feats_from_frames(frames, params, **spec)
fused = jax.jit(lambda s, l: jax.vmap(one)(s, l))
timeit("A fused gather+pipeline", fused, signals, lengths, n=3)

# B: staged: frames materialized, then pipeline
frames_fn = jax.jit(lambda s, l: jax.vmap(lambda a, b: F.frame_signal(a, b, MF, FL, FS, PL))(s, l))
pipe_fn = jax.jit(lambda f: S.stft_feats_from_frames(f, params, **spec))
fr = timeit("B1 framing only", frames_fn, signals, lengths)
timeit("B2 pipeline only", pipe_fn, fr)
def staged(s, l):
    return pipe_fn(frames_fn(s, l))
timeit("B staged total", staged, signals, lengths, n=5)
