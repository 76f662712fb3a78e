"""J3 redo: adversary accuracy with the PRODUCTION floor (1e-5 on power).

decomp6's J3 compared kernels flooring power at ln(1e-5) (harness
mistake — effectively no floor) against an f64 oracle flooring at
exp(ln 1e-5); the 3.19 "error" was the floor mismatch at cancelled
bins.  Here everything floors power at 1e-5 before the log, matching
config.LOG_FLOOR_VALUE semantics, and the XLA digit tiers run on the
same signals for calibration.
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp

from speech_tpu.compute import STFTFrameComputer
from speech_tpu.ops import stft as _stft

sys.path.insert(0, "/root/repo/tools")
import bench_pallas_decomp3 as d3  # noqa: E402
import bench_pallas_decomp6 as d6  # noqa: E402

FRAME_LENGTH, FRAME_SHIFT = 400, 160

# production floor: power floored at 1e-5 BEFORE the log
d3.LOG_FLOOR = 1e-5
d6.LOG_FLOOR = 1e-5


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    computer = STFTFrameComputer(
        {"name": "fbank", "num_filts": 40, "sampling_rate": 16000},
        frame_length_ms=25,
        frame_shift_ms=10,
        include_energy=True,
        dtype="float32",
        precision="double",
    )
    adv = d6.adversary_batch()
    n = adv.shape[1]
    num_frames = (n + FRAME_SHIFT // 2) // FRAME_SHIFT
    pad_to = (num_frames + 4) * FRAME_SHIFT + FRAME_LENGTH
    advp = np.zeros((adv.shape[0], pad_to), np.float32)
    advp[:, :n] = adv

    C, S, W = computer._dft_cos, computer._dft_sin, computer._weights
    feats64 = []
    for b in range(adv.shape[0]):
        frames = np.stack(
            [
                np.pad(adv[b], (0, FRAME_LENGTH))[
                    k * FRAME_SHIFT : k * FRAME_SHIFT + FRAME_LENGTH
                ]
                for k in range(num_frames)
            ]
        )
        re = frames @ C
        im = frames @ S
        power = re * re + im * im
        f = power @ W
        e = (frames ** 2).sum(-1) / FRAME_LENGTH
        out = np.concatenate(
            [
                np.log(np.maximum(e, 1e-5))[:, None],
                np.log(np.maximum(f, 1e-5)),
            ],
            axis=1,
        )
        feats64.append(out)
    feats64 = np.stack(feats64)

    d6.NUM_FRAMES = num_frames
    for cutoff in (4, 3):
        fn = d6.run_254_adv(computer, cutoff, advp)
        out = np.asarray(fn(jnp.asarray(advp)))
        err = np.max(np.abs(out - feats64))
        print(f"b254 c={cutoff}: adversary max err vs f64 = {err:.3e}",
              flush=True)

    # calibration: the XLA digit tier on the same frames at f32
    from speech_tpu.ops import framing as _framing

    def xla_digit(p):
        frames = jax.vmap(
            lambda q: _framing.frame_padded(
                q, num_frames, FRAME_LENGTH, FRAME_SHIFT
            )
        )(p)
        return _stft.stft_feats_from_frames(
            frames,
            computer.params,
            dft_size=512,
            use_log=True,
            use_power=True,
            include_energy=True,
            log_floor=1e-5,
            fft_mode="matmul",
            precision="double",
        )

    out = np.asarray(jax.jit(xla_digit)(jnp.asarray(advp)))
    print(
        "XLA digit double: adversary max err vs f64 = "
        f"{np.max(np.abs(out - feats64)):.3e}",
        flush=True,
    )

    # and the 128x15s noise-batch correctness re-check at the new floor
    padded = d3.build_inputs()
    ref = np.asarray(d6.reference_feats(computer, padded))
    d6.NUM_FRAMES = d3.NUM_FRAMES
    for cutoff in (4, 3):
        fn = d6.run_254(computer, cutoff)
        out = np.asarray(fn(padded))
        print(
            f"b254 c={cutoff}: noise batch max err vs XLA digit = "
            f"{np.max(np.abs(out - ref)):.3e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
