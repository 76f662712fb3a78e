"""On-chip e2e: signals-to-torch-feat-dir with precision='double'.

The int8 digit kernel through the FULL production CLI path (threaded
reads, int16 compact ingress, pow2 buckets, double-buffered dispatch,
manifest) on the real chip; outputs compared against a float64 host
oracle computed in a CPU subprocess.  Usage:

  python tools/check_cli_digit_e2e.py run /tmp/cli_digit    (on TPU)
  python tools/check_cli_digit_e2e.py oracle /tmp/cli_digit (CPU check)
"""

import json
import os
import sys

import numpy as np

RATE = 16000
N_UTT = 48

CFG = {
    "name": "stft",
    "bank": {"name": "fbank", "num_filts": 40, "sampling_rate": RATE},
    "frame_length_ms": 25,
    "frame_shift_ms": 10,
    "include_energy": True,
    "precision": "double",
}


def build_corpus(root):
    import wave

    from speech_tpu.io import read_signal
    from speech_tpu.ops.resample import resample_np

    sig = read_signal(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tests",
            "audio",
            "test.wav",
        ),
        dtype=np.float64,
    )
    sig = resample_np(sig, 160, 441)
    sig = sig / np.abs(sig).max()
    sig = np.concatenate([sig, sig[::-1], sig])  # ~10 s of material
    rng = np.random.RandomState(12)
    wavs = os.path.join(root, "wavs")
    os.makedirs(wavs, exist_ok=True)
    map_path = os.path.join(root, "map.txt")
    with open(map_path, "w") as mf:
        for i in range(N_UTT):
            n = rng.randint(2 * RATE, min(6 * RATE, sig.size - 1))
            off = rng.randint(0, max(1, sig.size - n))
            crop = sig[off : off + n] + 0.003 * rng.randn(n)
            pcm = np.clip(np.round(crop * 18000), -32767, 32767).astype(
                np.int16
            )
            path = os.path.join(wavs, f"utt{i:03d}.wav")
            with wave.open(path, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(RATE)
                w.writeframes(pcm.tobytes())
            mf.write(f"utt{i:03d} {path}\n")
    return map_path


def main():
    mode, root = sys.argv[1], sys.argv[2]
    os.makedirs(root, exist_ok=True)
    if mode == "run":
        import time

        from speech_tpu.command_line import signals_to_torch_feat_dir

        map_path = build_corpus(root)
        cfg_path = os.path.join(root, "cfg.json")
        with open(cfg_path, "w") as f:
            json.dump(CFG, f)
        out_dir = os.path.join(root, "feats")
        start = time.time()
        rc = signals_to_torch_feat_dir(
            [map_path, cfg_path, out_dir, "--batch-size", "16"]
        )
        wall = time.time() - start
        assert rc == 0, rc
        n = len(os.listdir(out_dir))
        print(f"CLI wrote {n} feature files in {wall:.1f}s", flush=True)
        assert n == N_UTT
    else:
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        import torch

        from speech_tpu.alias import alias_factory_subclass_from_arg
        from speech_tpu.compute import FrameComputer
        from speech_tpu.io import read_signal

        cfg = dict(CFG)
        cfg.pop("precision")
        f64 = alias_factory_subclass_from_arg(
            FrameComputer, {**cfg, "dtype": "float64"}
        )
        worst = 0.0
        with open(os.path.join(root, "map.txt")) as mf:
            for line in mf:
                utt, path = line.split()
                sig = read_signal(path, dtype=np.float64)
                want = f64.compute_full(sig)
                got = (
                    torch.load(os.path.join(root, "feats", utt + ".pt"))
                    .numpy()
                    .astype(np.float64)
                )
                assert got.shape == want.shape, (utt, got.shape, want.shape)
                worst = max(worst, float(np.abs(got - want).max()))
        print(f"on-chip digit-tier CLI vs f64 host oracle: {worst:.3e}",
              flush=True)
        assert worst <= 1e-5, worst
        print("OK")


if __name__ == "__main__":
    main()
