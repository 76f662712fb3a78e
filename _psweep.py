import time
from speech_tpu.utils import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import numpy as np
import jax, jax.numpy as jnp
from speech_tpu.compute import STFTFrameComputer
from speech_tpu.ops import framing as F
from speech_tpu.ops.pallas_stft import stft_feats_pallas_from_frames

c = STFTFrameComputer({"name": "fbank", "num_filts": 40, "sampling_rate": 16000},
                      frame_length_ms=25, frame_shift_ms=10, include_energy=True, dtype="float32")
params = c.params
rng = np.random.RandomState(0)
batch, MF, FL = 128, 1504, 400
frames = jnp.asarray(rng.randn(batch, MF, FL).astype(np.float32))
audio = batch * 15.0

for bf in (128, 256, 512, 752):
    fn = jax.jit(lambda fr: stft_feats_pallas_from_frames(
        fr, params, use_log=True, use_power=False, include_energy=True,
        log_floor=1e-5, block_frames=bf))
    try:
        out = fn(frames); out.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn(frames)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / 5
        print(f"pallas bf={bf}: {dt*1e3:.2f} ms rt={audio/dt:,.0f}x", flush=True)
    except Exception as e:
        print(f"pallas bf={bf}: FAIL {str(e)[:120]}", flush=True)
