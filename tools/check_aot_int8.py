"""On-chip check: AOT store round-trips programs embedding the int8
Mosaic kernel (serialize in one process, zero-compile load in another).

Usage: python tools/check_aot_int8.py warm <dir>   (process A)
       python tools/check_aot_int8.py cold <dir>   (process B, bans compiles)
"""

import sys

import numpy as np

import jax


def main():
    mode, store = sys.argv[1], sys.argv[2]
    from speech_tpu.compute import STFTFrameComputer

    c = STFTFrameComputer(
        {"name": "fbank", "num_filts": 40, "sampling_rate": 16000},
        frame_length_ms=25,
        frame_shift_ms=10,
        include_energy=True,
        dtype="float32",
        precision="double",
    )
    c.enable_aot(store)
    rng = np.random.RandomState(0)
    sigs = rng.randn(8, 32000).astype(np.float32)
    lengths = np.full((8,), 32000, np.int32)
    if mode == "cold":
        from jax._src import stages

        def boom(self, *a, **k):
            raise AssertionError("compile attempted on warmed AOT store")

        stages.Lowered.compile = boom
    feats, counts = c.compute_batch(sigs, lengths)
    out = np.asarray(feats)
    print(
        f"{mode}: stats={c._aot.stats} out[0,0,0]={out[0, 0, 0]:.6f} "
        f"finite={np.isfinite(out).all()}",
        flush=True,
    )
    if mode == "cold":
        assert c._aot.stats["misses"] == 0, c._aot.stats
        assert c._aot.stats["hits"] > 0, c._aot.stats
        print("cold start served the int8-kernel program with ZERO compiles")


if __name__ == "__main__":
    main()
