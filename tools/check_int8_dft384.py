"""On-chip: the int8 kernel at a non-128-aligned cos|sin lane split
(dft 384 -> nb 192) — interpret mode can't prove Mosaic accepts the
unaligned acc slice; round 3 validated this for the bf16 kernel only.
"""

import numpy as np

import jax

from speech_tpu.compute import STFTFrameComputer


def main():
    print("backend:", jax.devices(), flush=True)
    bank = {"name": "fbank", "num_filts": 20, "sampling_rate": 16000}
    kw = dict(
        frame_length_ms=24,  # 384 samples
        frame_shift_ms=10,
        pad_to_nearest_power_of_two=False,
        include_energy=True,
        dtype="float32",
    )
    xla = STFTFrameComputer(dict(bank), precision="double",
                            fft_mode="matmul", **kw)
    pal = STFTFrameComputer(dict(bank), precision="double",
                            fft_mode="pallas", **kw)
    assert xla.dft_size == 384
    rng = np.random.RandomState(2)
    sigs = rng.randn(4, 32000).astype(np.float32)
    lengths = np.full((4,), 32000, np.int32)
    fw, _ = xla.compute_batch(sigs, lengths)
    fp, _ = pal.compute_batch(sigs, lengths)
    err = float(np.max(np.abs(np.asarray(fw) - np.asarray(fp))))
    print(f"dft=384 int8 kernel vs XLA digit: max err {err:.3e}",
          flush=True)
    assert err < 2e-6, err
    print("OK", flush=True)


if __name__ == "__main__":
    main()
