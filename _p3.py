import time
import numpy as np
import jax, jax.numpy as jnp
from speech_tpu.ops import framing as F, stft as S
from speech_tpu.compute import STFTFrameComputer

c = STFTFrameComputer({"name": "fbank", "num_filts": 40, "sampling_rate": 16000},
                      frame_length_ms=25, frame_shift_ms=10, include_energy=True, dtype="float32")
params = c.params; spec = c._static_spec
batch, MF, FL = 128, 1500, 400
rng = np.random.RandomState(0)
fr = jnp.asarray(rng.randn(batch, MF, FL).astype(np.float32))

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

timeit("pipeline hi-prec matmul", jax.jit(lambda f: S.stft_feats_from_frames(f, params, **spec)), fr)

@jax.jit
def pipe_default(frames):
    w = frames * params["window"]
    re = jnp.matmul(w, params["dft_cos"])
    im = jnp.matmul(w, params["dft_sin"])
    p = re * re + im * im
    f = jnp.matmul(jnp.sqrt(p), params["weights"])
    return jnp.log(jnp.maximum(f, 1e-5))
timeit("pipeline default-prec matmul", pipe_default, fr)

spec_fft = dict(spec); spec_fft["fft_mode"] = "fft"
timeit("pipeline rfft", jax.jit(lambda f: S.stft_feats_from_frames(f, params, **spec_fft)), fr)

@jax.jit
def just_matmuls(frames):
    w = frames * params["window"]
    re = jnp.matmul(w, params["dft_cos"], precision=jax.lax.Precision.HIGHEST)
    return re
timeit("one hi-prec matmul (400x257)", just_matmuls, fr)
timeit("one default-prec matmul", jax.jit(lambda f: jnp.matmul(f * params["window"], params["dft_cos"])), fr)
