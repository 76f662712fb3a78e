import time
import numpy as np
import jax, jax.numpy as jnp
from speech_tpu.ops import framing as F
from speech_tpu.compute import STFTFrameComputer

c = STFTFrameComputer({"name": "fbank", "num_filts": 40, "sampling_rate": 16000},
                      frame_length_ms=25, frame_shift_ms=10, include_energy=True, dtype="float32")
params = c.params
FL, FS, PL = c._frame_length, c._frame_shift, c._pad_left
batch, max_len = 128, 240000
MF = F.frame_count_np(max_len, FL, FS)
rng = np.random.RandomState(0)
signals = jnp.asarray(rng.randn(batch, max_len).astype(np.float32))
lengths = jnp.full((batch,), max_len, dtype=jnp.int32)
print("frames per signal:", MF, "frame_len:", FL, flush=True)

def timeit(name, fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} {best*1e3:9.2f} ms", flush=True)
    return out

@jax.jit
def frames_reflect(signals, lengths):
    return jax.vmap(lambda s, l: F.frame_signal(s, l, MF, FL, FS, PL))(signals, lengths)
fr = timeit("framing reflect-gather", frames_reflect, signals, lengths)

@jax.jit
def frames_static(signals):
    idx = jnp.minimum(jnp.arange(MF)[:, None] * FS + jnp.arange(FL)[None, :], max_len - 1)
    return signals[:, idx]
timeit("framing static-idx gather", frames_static, signals)

@jax.jit
def frames_dynslice(signals):
    # frame via reshape trick: stack FL/FS shifted strided views
    cols = []
    for off in range(0, FL, FS):
        n = (max_len - off) // FS
        cols.append(signals[:, off:off + n * FS].reshape(batch, n, FS))
    m = min(c.shape[1] for c in cols)
    return jnp.concatenate([c[:, :m] for c in cols], axis=-1)
timeit("framing reshape-concat", frames_dynslice, signals)
