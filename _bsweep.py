import time
from speech_tpu.utils import enable_persistent_compilation_cache
enable_persistent_compilation_cache()
import numpy as np, jax, jax.numpy as jnp
from speech_tpu.compute import STFTFrameComputer
from speech_tpu.ops import framing as F
from speech_tpu.ops.pallas_stft import stft_feats_pallas

c = STFTFrameComputer({"name": "fbank", "num_filts": 40, "sampling_rate": 16000},
                      frame_length_ms=25, frame_shift_ms=10, include_energy=True, dtype="float32")
p = c.params
FL, FS, PL = c._frame_length, c._frame_shift, c._pad_left
B, L = 128, 240000
MF = F.frame_count_np(L, FL, FS)
rng = np.random.RandomState(0)
sigs = jnp.asarray(rng.randn(B, L).astype(np.float32))
lens = jnp.full((B,), L, dtype=jnp.int32)
audio = B * 15.0
for bf in (256, 512, 752, 1504):
    def run(signals, lengths, bf=bf):
        padded = jax.vmap(lambda s, l: F.pad_signal(s, l, FL, FS, PL))(signals, lengths)
        return stft_feats_pallas(padded, p, num_frames=MF, frame_length=FL, frame_shift=FS,
                                 use_log=True, use_power=False, include_energy=True,
                                 log_floor=1e-5, block_frames=bf, precision="default")
    fn = jax.jit(run)
    try:
        out = fn(sigs, lens); np.asarray(out[0, 0])
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(10): out = fn(sigs, lens)
            np.asarray(out[0, 0])
            best = min(best, (time.perf_counter()-t0)/10)
        print(f"rows-kernel bf={bf}: {best*1e3:.2f} ms rt={audio/best:,.0f}x", flush=True)
    except Exception as e:
        print(f"bf={bf}: FAIL {str(e)[:100]}", flush=True)
