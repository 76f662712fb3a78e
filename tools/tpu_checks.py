"""On-chip validation battery for real-TPU runs.

The pytest suite runs on a virtual CPU mesh (tests/conftest.py forces the
CPU backend for float64 oracles); this tool is its real-hardware
complement — a repeatable battery of the checks that were run ad hoc
while tuning on v5e.  Run it detached on a machine with the TPU attached:

    nohup python -u tools/tpu_checks.py > /tmp/tpu_checks.log 2>&1 &

It computes a float64 oracle in a CPU subprocess, then validates every
accuracy tier of both computers on the device against it, plus the
device-internal contracts (compact int16 ingress bitwise equality,
streaming == batch, Pallas kernel == XLA digit path).  Tolerances are the
documented numeric contracts (CLAUDE.md / ARCHITECTURE.md) with ~2x
headroom.  Exit code 0 iff every check passes.

Expect several minutes to tens of minutes: TPU compiles through a
tunneled runtime take 1-10 min per program (the persistent compilation
cache is enabled but does not always hit across processes).
"""

import argparse
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RATE = 16000
STFT_SECONDS = 2
SI_SECONDS = 1
BANK_STFT = {"name": "fbank", "num_filts": 40, "sampling_rate": RATE}
BANK_SI = {
    "name": "gammatone",
    "scaling_function": "mel",
    "num_filts": 8,
    "sampling_rate": RATE,
}


def make_signals():
    """Four 2-second int16 test vectors (exactly representable in f32).

    s0 white noise; s1 a near-degenerate tone pair over a -57 dB noise
    floor (the high-cancellation accuracy adversary; the floor keeps the
    quietest DFT bins within ~1e-4 of the frame's summand scale — the
    digit tiers truncate kept pairs at ~2^-36 of that scale, and a
    mathematically pure tone's far-sidelobe leakage probes cancellation
    depths below any physical noise floor, reading the documented
    truncation floor rather than a defect); s2 a loud transient with a
    quiet tail (the SI digit-capture stressor); s3 amplitude-modulated
    noise (speech-like envelope).
    """
    n = STFT_SECONDS * RATE
    t = np.arange(n) / RATE
    rng = np.random.RandomState(20260818)
    s0 = rng.randn(n) * 4096
    s1 = (
        12000 * np.sin(2 * np.pi * 1000.0 * t)
        - 10800 * np.sin(2 * np.pi * 1001.0 * t)
        + rng.randn(n) * 32
    )
    s2 = rng.randn(n) * 8
    s2[n // 4 : n // 4 + 400] += rng.randn(400) * 24000
    s3 = rng.randn(n) * 6000 * (0.5 - 0.49 * np.cos(2 * np.pi * 4 * t))
    sigs = np.stack([s0, s1, s2, s3])
    return np.clip(np.round(sigs), -32767, 32767).astype(np.int16)


def _stft_kwargs(**extra):
    kw = dict(frame_length_ms=25, frame_shift_ms=10)
    kw.update(extra)
    return kw


def make_wavaug_inputs():
    """Deterministic (rir, noise) for the waveform-augmentation check."""
    rng = np.random.RandomState(4242)
    W = 4000
    rir = rng.randn(W) * np.exp(-np.arange(W) / (W / 6.0)) * 0.05
    rir[137] = 1.0
    noise = (rng.randn(STFT_SECONDS * RATE) * 512).astype(np.float64)
    return rir, noise


def _wavaug_outputs(sigs):
    """reverberate / mix_noise / speed_perturb on ``sigs`` (keyless paths
    are backend- and dtype-grid identical up to precision)."""
    from speech_tpu.ops.augment import mix_noise, reverberate, speed_perturb

    rir, noise = make_wavaug_inputs()
    dt = sigs.dtype
    return {
        "wavaug_rev": np.asarray(reverberate(sigs, rir.astype(dt))),
        "wavaug_mix": np.asarray(mix_noise(None, sigs, noise.astype(dt), 10.0)),
        "wavaug_spd": np.asarray(speed_perturb(sigs, 1.1)),
    }


def oracle_main(out_path: str) -> None:
    """CPU float64 oracle: one feature matrix per signal per computer."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from speech_tpu.compute import SIFrameComputer, STFTFrameComputer

    sigs = make_signals().astype(np.float64)
    stft = STFTFrameComputer(dict(BANK_STFT), dtype="float64", **_stft_kwargs())
    si = SIFrameComputer(dict(BANK_SI), frame_shift_ms=10, dtype="float64")
    out = {}
    for i, sig in enumerate(sigs):
        out[f"stft_{i}"] = np.asarray(stft.compute_full(sig))
    for i, sig in enumerate(sigs[:2, : SI_SECONDS * RATE]):
        out[f"si_{i}"] = np.asarray(si.compute_full(sig))
    out.update(_wavaug_outputs(sigs))
    np.savez(out_path, **out)


def _gabor_oracle(frontend, params, signal):
    """float64 numpy re-statement of GaborFrontend.apply for one signal."""
    W, P = frontend.filter_size, frontend.pool_size
    shift = frontend.frame_shift
    t = np.arange(-(W // 2), W // 2 + 1, dtype=np.float64)[:, None]
    sigma = np.exp(np.asarray(params["log_sigma"], np.float64))[None, :]
    env = np.exp(-0.5 * (t / sigma) ** 2)
    env /= env.sum(0, keepdims=True)
    phase = np.asarray(params["eta"], np.float64)[None, :] * t
    cos_f, sin_f = env * np.cos(phase), env * np.sin(phase)
    T = len(signal)
    num_frames = (T + shift // 2) // shift
    energies = np.zeros((frontend.num_filts, T))
    for k in range(frontend.num_filts):
        re = np.correlate(signal, cos_f[:, k], mode="same")
        im = np.correlate(signal, sin_f[:, k], mode="same")
        energies[k] = re * re + im * im
    pt = np.arange(-(P // 2), P // 2 + 1, dtype=np.float64)[:, None]
    psig = np.exp(np.asarray(params["log_pool_sigma"], np.float64))[None, :]
    pwin = np.exp(-0.5 * (pt / psig) ** 2)
    pwin /= pwin.sum(0, keepdims=True)
    feats = np.zeros((num_frames, frontend.num_filts))
    padded = np.pad(energies, ((0, 0), (P // 2, P // 2 + P + shift)))
    for k in range(num_frames):
        feats[k] = (padded[:, k * shift : k * shift + P] * pwin.T).sum(-1)
    if frontend.use_log:
        feats = np.log(np.maximum(feats, 1e-5))
    return feats


def _sinc_oracle(frontend, params, signal):
    """float64 numpy re-statement of SincFrontend.apply for one signal."""
    sr = frontend.sampling_rate
    f1 = frontend.min_low_hz + np.abs(np.asarray(params["low_hz"], np.float64))
    f2 = np.minimum(
        f1
        + frontend.min_band_hz
        + np.abs(np.asarray(params["band_hz"], np.float64)),
        sr / 2,
    )
    half = frontend.filter_size // 2
    n = np.arange(-half, half + 1, dtype=np.float64)[:, None]
    g1, g2 = 2 * f1[None, :] / sr, 2 * f2[None, :] / sr
    taps = (g2 * np.sinc(g2 * n) - g1 * np.sinc(g1 * n)) * (
        0.54 + 0.46 * np.cos(np.pi * n / half)
    )
    shift, P = frontend.frame_shift, frontend.pool_size
    T = len(signal)
    num_frames = (T + shift // 2) // shift
    energy = np.zeros((frontend.num_filts, T))
    for k in range(frontend.num_filts):
        r = np.correlate(signal, taps[:, k], mode="same")
        energy[k] = r * r
    padded = np.pad(energy, ((0, 0), (P // 2, P // 2 + P + shift)))
    feats = np.zeros((num_frames, frontend.num_filts))
    for k in range(num_frames):
        seg = padded[:, k * shift : k * shift + P]
        feats[k] = seg.max(-1) if frontend.pooling == "max" else seg.mean(-1)
    if frontend.use_log:
        feats = np.log(np.maximum(feats, 1e-5))
    return feats


class Battery:
    def __init__(self):
        self.failures = []
        self.total = 0

    def check(self, name, err, tol, secs):
        ok = bool(err <= tol)
        self.total += 1
        print(
            f"[{'PASS' if ok else 'FAIL'}] {name:34s} "
            f"max_err={err:.3e} tol={tol:.0e} ({secs:.1f}s)",
            flush=True,
        )
        if not ok:
            self.failures.append(name)


def _batch_valid(computer, signals):
    """compute_batch over an all-full batch -> list of valid-row arrays."""
    lengths = np.full((signals.shape[0],), signals.shape[1], np.int64)
    feats, counts = computer.compute_batch(signals, lengths)
    feats, counts = np.asarray(feats), np.asarray(counts)
    return [feats[i, : counts[i]] for i in range(len(counts))]


def _vs_oracle(rows, oracle, prefix):
    return max(
        float(np.abs(r - oracle[f"{prefix}_{i}"]).max())
        for i, r in enumerate(rows)
    )


def tpu_main(smoke: bool = False, full: bool = False) -> int:
    # Launch the CPU-backend float64 oracle first; it overlaps with this
    # process's jax import and device/backend initialization.
    oracle_path = os.path.join(tempfile.mkdtemp(), "oracle.npz")
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--oracle", oracle_path]
    )

    import jax
    import jax.numpy as jnp

    if smoke:
        # force the CPU backend before any device/backend init (the
        # JAX_PLATFORMS env var is ignored once a TPU plugin registers)
        jax.config.update("jax_platforms", "cpu")

    from speech_tpu.compute import SIFrameComputer, STFTFrameComputer
    from speech_tpu.streaming import StreamingSTFT
    from speech_tpu.utils import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    print(f"devices: {jax.devices()}", flush=True)

    sigs16 = make_signals()
    sigs32 = sigs16.astype(np.float32)
    si16 = sigs16[:2, : SI_SECONDS * RATE]

    battery = Battery()
    # "highest" tolerances are TPU contracts (HIGHEST-precision MXU
    # matmuls); CPU f32 matmuls have no HIGHEST tier and accumulate
    # plain f32, so --smoke (logic-validation runs off-device) relaxes
    # only those two checks.  The digit tiers are exact on any backend.
    hi_tol = 5e-3 if smoke else 2e-4
    tiers = {
        # tier -> (constructor kwargs, tolerance vs the float64 oracle);
        # contracts: highest ~3e-5 on high-cancellation content,
        # accurate <=1e-5 clause (1.3e-5 measured on the tonal
        # adversary), double ~8e-7 any-signal
        "stft highest": (dict(precision="highest"), hi_tol),
        "stft accurate": (dict(precision="accurate"), 3e-5),
        "stft double (fft_mode auto)": (dict(precision="double"), 2e-6),
        "stft double (XLA digit path)": (
            dict(precision="double", fft_mode="matmul"),
            2e-6,
        ),
    }
    results = {}
    oracle_box = {}

    def oracle():
        # Lazy wait: the oracle's CPU float64 compute overlaps this
        # process's first (multi-minute, on tunneled runtimes) device
        # compile, since every check reads its device rows back first.
        if "o" not in oracle_box:
            proc.wait()
            if proc.returncode:
                raise RuntimeError("float64 oracle subprocess failed")
            oracle_box["o"] = np.load(oracle_path)
        return oracle_box["o"]

    for name, (kw, tol) in tiers.items():
        t0 = time.time()
        computer = STFTFrameComputer(dict(BANK_STFT), **_stft_kwargs(**kw))
        rows = _batch_valid(computer, sigs32)
        results[name] = rows
        battery.check(name, _vs_oracle(rows, oracle(), "stft"), tol, time.time() - t0)

    # Pallas fused kernel vs the XLA digit path: same exact tier, two
    # independent realizations (measured 9.5e-7 apart on real v5e)
    t0 = time.time()
    err = max(
        float(np.abs(a - b).max())
        for a, b in zip(
            results["stft double (fft_mode auto)"],
            results["stft double (XLA digit path)"],
        )
    )
    battery.check("pallas kernel == XLA digit", err, 2e-6, time.time() - t0)

    # Compact int16 ingress: half-width transfer, bitwise-identical
    t0 = time.time()
    computer = STFTFrameComputer(dict(BANK_STFT), **_stft_kwargs())
    rows16 = _batch_valid(computer, sigs16)
    rows32 = _batch_valid(computer, sigs32)
    err = max(float(np.abs(a - b).max()) for a, b in zip(rows16, rows32))
    battery.check("int16 ingress bitwise", err, 0.0, time.time() - t0)

    # Streaming == batch on-device (f32 contract ~2e-5)
    t0 = time.time()
    stream = StreamingSTFT(computer, chunk_size=1600)
    got = stream.transform(sigs32[0])
    want = np.asarray(computer.compute_full(sigs32[0]))
    battery.check(
        "streaming == compute_full",
        float(np.abs(got - want).max()),
        5e-5,
        time.time() - t0,
    )

    for name, (kw, tol) in {
        "si highest": (dict(precision="highest"), hi_tol),
        "si double": (dict(precision="double"), 2e-6),
    }.items():
        t0 = time.time()
        si = SIFrameComputer(dict(BANK_SI), frame_shift_ms=10, **kw)
        rows = _batch_valid(si, si16.astype(np.float32))
        battery.check(name, _vs_oracle(rows, oracle(), "si"), tol, time.time() - t0)

    if full:
        from speech_tpu.serve import FeatureServer, StreamPool

        # Serving-path results are separately compiled f32 programs (the
        # bucket padding changes the frame count, hence reduction
        # orders), so they carry the same error budget vs the float64
        # oracle as the batch "highest" check — not bitwise equality
        # with compute_full.
        t0 = time.time()
        computer = STFTFrameComputer(dict(BANK_STFT), **_stft_kwargs())
        with FeatureServer(computer, max_batch=4) as srv:
            served = srv.extract_many(list(sigs16))
        battery.check(
            "FeatureServer vs f64 oracle",
            _vs_oracle(served, oracle(), "stft"),
            hi_tol,
            time.time() - t0,
        )

        # FeatureServer over the int8 'accurate' digit tier: serving +
        # micro-batching + compact ingress through the Mosaic kernel
        t0 = time.time()
        acc = STFTFrameComputer(
            dict(BANK_STFT), precision="accurate", **_stft_kwargs()
        )
        with FeatureServer(acc, max_batch=4) as srv:
            served_acc = srv.extract_many(list(sigs16))
        battery.check(
            "FeatureServer int8 accurate tier",
            _vs_oracle(served_acc, oracle(), "stft"),
            2e-5,
            time.time() - t0,
        )

        # StreamPool: concurrent vmapped sessions drain to batch parity
        t0 = time.time()
        pool = StreamPool(computer, slots=4, chunk_size=1600)
        handles = [pool.open() for _ in range(4)]
        for h, sig in zip(handles, sigs32):
            pool.feed(h, sig)
        outs = {h: [] for h in handles}
        for _ in range(STFT_SECONDS * RATE // 1600 + 2):
            for h, feats in pool.step(max_chunks=4):
                outs[h].append(feats)
        for h, feats in pool.close_many(handles):
            outs[h].append(feats)
        drained = [np.concatenate(outs[h]) for h in handles]
        battery.check(
            "StreamPool vs f64 oracle",
            _vs_oracle(drained, oracle(), "stft"),
            hi_tol,
            time.time() - t0,
        )

        # DCT/MFCC post-op: one HIGHEST matmul on device vs float64 host
        t0 = time.time()
        from speech_tpu.ops.postops import dct, dct_matrix

        row = results["stft highest"][0].astype(np.float32)
        dev = np.asarray(
            jax.jit(lambda x: dct(x, num_ceps=13, lifter=22.0))(row)
        )
        want = row.astype(np.float64) @ dct_matrix(row.shape[1], 13, 22.0)
        battery.check(
            "dct vs f64 host",
            float(np.abs(dev - want).max()),
            1e-4,
            time.time() - t0,
        )

        # PLP post-op: device f32 (xlog powers, unrolled Levinson) vs the
        # float64 host twin, on real band powers (un-logged features)
        t0 = time.time()
        from speech_tpu.ops.plp import plp as plp_op
        from speech_tpu.ops.plp import plp_np

        powers = np.exp(results["stft highest"][0].astype(np.float64))
        centers = tuple(np.linspace(100.0, RATE / 2 - 200.0, powers.shape[1]))
        dev = np.asarray(
            jax.jit(lambda v: plp_op(v, centers))(powers.astype(np.float32))
        )
        battery.check(
            "plp vs f64 host",
            float(np.abs(dev - plp_np(powers, centers)).max()),
            5e-3,
            time.time() - t0,
        )

        # Pitch tracker: physical oracle (known tones within 1%, and a
        # clean voiced/unvoiced POV split vs noise)
        t0 = time.time()
        from speech_tpu.ops.pitch import kaldi_pitch, nccf_to_pov

        tt = np.arange(STFT_SECONDS * RATE) / RATE
        want_f0 = np.array([120.0, 220.0, 330.0])
        rng = np.random.RandomState(7)
        tones = np.stack(
            [np.sin(2 * np.pi * f * tt) + 0.05 * rng.randn(tt.size) for f in want_f0]
            + [0.3 * rng.randn(tt.size)]
        ).astype(np.float32)
        track = kaldi_pitch(tones, RATE)
        med = np.median(np.asarray(track.f0), axis=1)
        pov = np.median(np.asarray(nccf_to_pov(track.nccf)), axis=1)
        err = float(np.abs(med[:3] / want_f0 - 1.0).max())
        # fold the POV split into the same check: voiced tones must read
        # >0.9 and noise <0.3, else report err 1 (fails the 1e-2 tol)
        if not (pov[:3].min() > 0.9 and pov[3] < 0.3):
            err = 1.0
        battery.check("pitch tones + pov split", err, 1e-2, time.time() - t0)

        # Streaming pitch == offline tracker on-device: frozen ballast +
        # lookahead >= T makes the streamed track the exact offline
        # Viterbi; report the fraction of frames off by >1% (f32
        # reduction-order roundoff can flip near-tie lags, hence a
        # fraction rather than a max-abs)
        t0 = time.time()
        from speech_tpu.streaming import StreamingPitch

        vib = np.sin(
            2 * np.pi * np.cumsum(180 + 40 * np.sin(2 * np.pi * 1.3 * tt)) / RATE
        ) + 0.05 * rng.randn(tt.size)
        vib = vib.astype(np.float32)
        spitch = StreamingPitch(
            RATE, chunk_size=3200, lookahead_frames=250, ballast_ms=0.25
        )
        f0_s, _ = spitch.transform(vib)
        f0_b = np.asarray(kaldi_pitch(vib, RATE, ballast_ms=0.25).f0)
        err = (
            1.0
            if f0_s.shape != f0_b.shape
            else float(np.mean(np.abs(f0_s - f0_b) > 0.01 * f0_b))
        )
        battery.check("streaming pitch == offline", err, 2e-2, time.time() - t0)

        # Waveform augmentations on-device (f32) vs the f64 oracle:
        # reverberate (one banded-Toeplitz MXU matmul over a 4000-tap
        # RIR), mix_noise (exact-SNR scaling), speed_perturb (polyphase
        # resample at 10/11) — normalized by each output's scale
        t0 = time.time()
        dev = _wavaug_outputs(sigs32)
        err = max(
            float(np.abs(dev[k] - oracle()[k]).max() / np.abs(oracle()[k]).max())
            for k in ("wavaug_rev", "wavaug_mix", "wavaug_spd")
        )
        # (--smoke: CPU f32 convs accumulate plain f32 over 4000 taps —
        # ~sqrt(W)*eps relative — where the device path is HIGHEST)
        battery.check(
            "wavaug vs f64 oracle", err, 1e-4 if smoke else 1e-5, time.time() - t0
        )

        # Feature inversion: Griffin-Lim a short fbank matrix back to a
        # waveform on-device, re-analyze on-device, compare the feature
        # round-trip error to the documented ~0.02-0.07 envelope floor
        t0 = time.time()
        from speech_tpu.ops.invert import feats_to_signal

        short = sigs32[3][: RATE // 2]
        computer = STFTFrameComputer(dict(BANK_STFT), **_stft_kwargs())
        feats = np.asarray(computer.compute_full(short))
        y = np.asarray(
            feats_to_signal(feats, computer, n_iters=20, length=len(short))
        )
        feats2 = np.asarray(computer.compute_full(y.astype(np.float32)))
        err = float(np.mean((feats2 - feats) ** 2) / np.var(feats))
        battery.check("invert roundtrip rel-MSE", err, 0.15, time.time() - t0)

        # Streaming post-processing, same-input leg: the streaming
        # deltas + sliding-CMVN chain over a FIXED feature matrix (fed
        # in chunks) equals the device batch chain on that matrix —
        # isolates the chain's alignment/flush/carry structure from
        # frontend stream-vs-batch noise.  Both sides are f32 on
        # identical inputs; only window reduction orders differ
        # (~3e-5 on white noise, measured), amplified ~1/std by the
        # variance normalization on correlated real features (~2e-3
        # observed) — structural breakage reads O(1).
        t0 = time.time()
        from speech_tpu import post as _hpost
        from speech_tpu.ops.postops import device_post_chain
        from speech_tpu.streaming_post import (
            StreamingPipeline,
            StreamingPostChain,
            streaming_post_op,
        )

        computer = STFTFrameComputer(dict(BANK_STFT), **_stft_kwargs())
        posts = [
            _hpost.Deltas(2, target_axis=-1),
            _hpost.SlidingCMVN(window=300, center=True, norm_var=True),
        ]
        feats32 = np.asarray(computer.compute_full(sigs32[0]))
        chain = device_post_chain(posts)
        want32, n_want = jax.jit(chain)(
            feats32[None], jnp.array([feats32.shape[0]])
        )
        want32 = np.asarray(want32)[0, : int(n_want[0])]
        sop = StreamingPostChain([streaming_post_op(p) for p in posts])
        rows = []
        step = jax.jit(sop._step_impl)
        state = sop.init_state(feats32.shape[1], dtype=jnp.float32)
        for i in range(0, feats32.shape[0], 100):
            blk = feats32[i : i + 100]
            pad = np.zeros((100, feats32.shape[1]), np.float32)
            pad[: len(blk)] = blk
            state, out, n_out = step(state, pad, len(blk))
            rows.append(np.asarray(out)[: int(n_out)])
        out, n_out = jax.jit(sop._finalize_impl)(state)
        rows.append(np.asarray(out)[: int(n_out)])
        got32 = np.concatenate(rows, axis=0)
        err = (
            1.0
            if got32.shape != want32.shape
            else float(np.abs(got32 - want32).max())
        )
        battery.check(
            "streaming post == batch (same input)",
            err,
            5e-3,
            time.time() - t0,
        )

        # End-to-end leg: the chain fused onto the streamer vs the host
        # float64 batch chain over compute_full rows.  The known f32
        # stream-vs-batch frontend differences (~2e-5 on log features)
        # amplify through the variance normalization (1/std of the
        # delta rows), hence the loose tolerance — alignment/flush
        # breakage reads O(1).
        t0 = time.time()
        pipe = StreamingPipeline(computer, posts, chunk_size=1600)
        got = pipe.transform(sigs32[0])
        want = np.asarray(computer.compute_full(sigs32[0])).astype(np.float64)
        want = posts[0].apply(want, axis=0)
        want = posts[1].apply(want, axis=-1)
        err = (
            1.0
            if got.shape != want.shape
            else float(np.abs(got - want).max())
        )
        battery.check("streaming pipeline == batch chain", err, 5e-3, time.time() - t0)

        # Fused extractor post chain: ShardedExtractor(postprocessors=)
        # applies the lengths-aware device twins inside its program; the
        # ragged batch must match per-utterance host application.  f32
        # device chain vs f64 host chain, amplified through norm_var as
        # above — structural (edge/lengths) breakage reads O(1).
        t0 = time.time()
        from speech_tpu.parallel import ShardedExtractor

        ragged = [
            sigs32[0],
            sigs32[1][: RATE + 321],
            sigs32[2][: RATE // 2],
            sigs32[3],
        ]
        ex = ShardedExtractor(computer, postprocessors=posts)
        outs = ex.extract(ragged)
        err = 0.0
        for out, sig in zip(outs, ragged):
            want = np.asarray(computer.compute_full(sig)).astype(np.float64)
            want = posts[0].apply(want, axis=0)
            want = posts[1].apply(want, axis=-1)
            if out.shape != want.shape:
                err = 1.0
                break
            err = max(err, float(np.abs(out - want).max()))
        battery.check("fused extractor post chain", err, 5e-3, time.time() - t0)

    # LEAF learnable Gabor frontend: device f32 forward (stride-1
    # correlation conv + pooled energies) vs an in-process float64 numpy
    # oracle at the init parameters — validates conv_general_dilated and
    # the slice-framed pooling on this backend (8.1e-6 measured on v5e)
    t0 = time.time()
    from speech_tpu.filters import GaborFilterBank
    from speech_tpu.nn import GaborFrontend

    gabor = GaborFrontend(
        GaborFilterBank("mel", num_filts=40, sampling_rate=RATE),
        frame_shift_ms=10,
        filter_size=401,
        dtype=jnp.float32,
    )
    g_params, g_consts = gabor.init()
    g_sig = sigs32[3][:RATE] / np.float32(32768.0)
    got = np.asarray(
        jax.jit(lambda p: gabor.apply(p, g_consts, g_sig[None]))(g_params)
    )[0]
    want = _gabor_oracle(gabor, g_params, np.asarray(g_sig, np.float64))
    err = 1.0 if got.shape != want.shape else float(np.abs(got - want).max())
    battery.check("gabor frontend vs f64 oracle", err, 5e-5, time.time() - t0)

    # SincNet learnable band-edge frontend: device f32 forward vs an
    # in-process float64 numpy oracle at the init parameters
    t0 = time.time()
    from speech_tpu.nn import SincFrontend

    sinc = SincFrontend(
        num_filts=40, sampling_rate=RATE, frame_shift_ms=10, dtype=jnp.float32
    )
    s_params, s_consts = sinc.init()
    s_sig = sigs32[2][:RATE] / np.float32(32768.0)
    got = np.asarray(
        jax.jit(lambda p: sinc.apply(p, s_consts, s_sig[None]))(s_params)
    )[0]
    want = _sinc_oracle(sinc, s_params, np.asarray(s_sig, np.float64))
    err = 1.0 if got.shape != want.shape else float(np.abs(got - want).max())
    battery.check("sinc frontend vs f64 oracle", err, 5e-5, time.time() - t0)

    # Streaming VAD (fixed threshold): chunked on-device voiced-frame
    # selection over real f32 features == the batch energy_vad selection,
    # row-bitwise (same rows of the same array must come out)
    t0 = time.time()
    from speech_tpu.ops.vad import energy_vad_np
    from speech_tpu.streaming_post import StreamingVAD

    e_computer = STFTFrameComputer(
        dict(BANK_STFT), dtype="float32", include_energy=True, **_stft_kwargs()
    )
    v_feats = np.asarray(
        _batch_valid(e_computer, sigs32[:1] / np.float32(32768.0))[0],
        np.float32,
    )
    vad = StreamingVAD(
        energy_threshold=float(np.median(v_feats[:, 0])),
        energy_mean_scale=0.0,
        frames_context=2,
    )
    v_state = vad.init_state(v_feats.shape[1], np.float32)
    v_step = jax.jit(vad._step_impl)
    v_rows = []
    for s in range(0, len(v_feats), 64):
        blk = np.zeros((64, v_feats.shape[1]), np.float32)
        n = min(64, len(v_feats) - s)
        blk[:n] = v_feats[s : s + n]
        v_state, v_out, v_n = v_step(v_state, jnp.asarray(blk), n)
        v_rows.append(np.asarray(v_out)[: int(v_n)])
    v_out, v_n = jax.jit(vad._finalize_impl)(v_state)
    v_rows.append(np.asarray(v_out)[: int(v_n)])
    v_got = np.concatenate(v_rows)
    v_mask = energy_vad_np(
        np.asarray(v_feats[:, 0], np.float64),
        energy_threshold=float(np.median(v_feats[:, 0])),
        energy_mean_scale=0.0,
        frames_context=2,
    )
    v_want = v_feats[v_mask]
    err = (
        1.0
        if v_got.shape != v_want.shape
        else float(np.abs(v_got - v_want).max())
    )
    battery.check("streaming vad == batch select", err, 0.0, time.time() - t0)

    # KWS model family: one on-device adam step must produce a finite
    # loss AND a nonzero window gradient (the magnitude-mode sqrt used
    # to NaN the frontend grads on all-zero padded frames)
    t0 = time.time()
    import optax

    from speech_tpu.models.kws import KWSModel, make_train_step
    from speech_tpu.nn import STFTFrontend

    k_computer = STFTFrameComputer(
        dict(BANK_STFT), dtype="float32", **_stft_kwargs()
    )
    k_frontend = STFTFrontend(k_computer, dtype=jnp.float32)
    kws = KWSModel(k_frontend, num_classes=4, channels=(16,))
    k_params, k_consts = kws.init(jax.random.PRNGKey(0))
    k_rng = np.random.RandomState(11)
    k_sigs = jnp.asarray(
        np.concatenate(
            [sigs32[:4, : RATE // 2] / np.float32(32768.0),
             np.zeros((4, RATE // 4), np.float32)],
            axis=1,
        )
    )
    k_lens = jnp.asarray([RATE // 2 + RATE // 8, RATE // 2, RATE // 3, RATE // 4], jnp.int32)
    k_labels = jnp.asarray(k_rng.randint(0, 4, size=4), jnp.int32)
    k_tx = optax.adam(1e-3)
    k_step = make_train_step(kws, k_consts, k_tx)
    k_params2, _, k_metrics = k_step(
        k_params, k_tx.init(k_params), k_sigs, k_lens, k_labels
    )
    k_grad = jax.grad(
        lambda p: kws.loss(p, k_consts, k_sigs, k_lens, k_labels)[0]
    )(k_params2)
    k_leaves = jax.tree_util.tree_leaves(jax.tree_util.tree_map(np.asarray, k_grad))
    finite = np.isfinite(float(k_metrics["loss"])) and all(
        np.isfinite(x).all() for x in k_leaves
    )
    wg = float(np.abs(np.asarray(k_grad["frontend"]["window"])).max())
    err = 0.0 if (finite and wg > 0) else 1.0
    battery.check("kws train step finite grads", err, 0.0, time.time() - t0)

    # Train->serve export: the exported host computer's batch path must
    # match the trained frontend's apply (two independently compiled f32
    # programs; ~2e-5 reduction-order contract)
    t0 = time.time()
    e_rng = np.random.RandomState(12)
    trained = {
        "window": k_params2["frontend"]["window"],
        "weights": k_params2["frontend"]["weights"]
        * jnp.asarray(
            np.abs(
                1 + 0.05 * e_rng.randn(*k_params2["frontend"]["weights"].shape)
            ).astype(np.float32)
        ),
    }
    served = k_frontend.export_computer(trained)
    x_sigs = np.asarray(k_sigs)
    x_lens = np.asarray(k_lens)
    x_feats, x_counts = served.compute_batch(x_sigs, x_lens)
    x_feats, x_counts = np.asarray(x_feats), np.asarray(x_counts)
    w_feats = np.asarray(
        jax.jit(lambda p: k_frontend.apply(p, k_consts, k_sigs, k_lens))(trained)
    )
    err = max(
        float(np.abs(x_feats[i, : x_counts[i]] - w_feats[i, : x_counts[i]]).max())
        for i in range(len(x_counts))
    )
    # same smoke relaxation as the "highest" tiers: CPU f32 matmuls have
    # no HIGHEST accumulation, so the two programs drift further off-TPU.
    # On-device tolerance: two independently compiled f32 programs with
    # 5%-perturbed (non-smooth) weights sit above the same-weights ~2e-5
    # cross-program contract — measured 7.3e-5 on v5e 2026-08-20
    battery.check(
        "export == trained frontend", err, hi_tol if smoke else 2e-4,
        time.time() - t0,
    )

    # Speaker-embedding family: on-device embeddings must be invariant to
    # how far the batch is padded (masked TDNN + masked stats pooling; the
    # two paddings compile to different programs, so this is a real
    # reduction-order contract, not a bitwise one)
    t0 = time.time()
    from speech_tpu.models.speaker import SpeakerModel
    from speech_tpu.models.speaker import make_train_step as _mk_spk_step

    spk = SpeakerModel(
        STFTFrontend(
            STFTFrameComputer(
                dict(BANK_STFT), dtype="float32", **_stft_kwargs()
            ),
            dtype=jnp.float32,
        ),
        num_speakers=4,
        embed_dim=16,
        channels=(16, 16),
        kernel_widths=(3, 1),
    )
    sp_params, sp_consts = spk.init(jax.random.PRNGKey(4))
    sp_sigs = jnp.asarray(sigs32[:4, : RATE // 2] / np.float32(32768.0))
    sp_lens = jnp.asarray(
        [RATE // 2, RATE // 3, RATE // 4, RATE // 8], jnp.int32
    )
    sp_base = np.asarray(
        jax.jit(lambda s, l: spk.embed(sp_params, sp_consts, s, l))(
            sp_sigs, sp_lens
        )
    )
    sp_wide = np.asarray(
        jax.jit(lambda s, l: spk.embed(sp_params, sp_consts, s, l))(
            jnp.concatenate(
                [sp_sigs, jnp.full((4, RATE // 8), 0.5, jnp.float32)], axis=1
            ),
            sp_lens,
        )
    )
    sp_scale = max(float(np.abs(sp_base).max()), 1e-6)
    finite = np.isfinite(sp_base).all() and np.isfinite(sp_wide).all()
    err = float(np.abs(sp_wide - sp_base).max()) / sp_scale if finite else 1.0
    battery.check(
        "speaker embed padding-invariant", err, 1e-4, time.time() - t0
    )

    # Speaker train step: one on-device AAM-softmax adam step, finite loss
    # and finite grads everywhere (the normalized-cosine sqrt chain is the
    # NaN risk here)
    t0 = time.time()
    sp_tx = optax.adam(1e-3)
    sp_step = _mk_spk_step(spk, sp_consts, sp_tx)
    sp_labels = jnp.asarray([0, 1, 2, 3], jnp.int32)
    sp_params2, _, sp_metrics = sp_step(
        sp_params, sp_tx.init(sp_params), sp_sigs, sp_lens, sp_labels
    )
    sp_grad = jax.grad(
        lambda p: spk.loss(p, sp_consts, sp_sigs, sp_lens, sp_labels)[0]
    )(sp_params2)
    sp_leaves = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, sp_grad)
    )
    ok = np.isfinite(float(sp_metrics["loss"])) and all(
        np.isfinite(x).all() for x in sp_leaves
    )
    ok = ok and float(np.abs(np.asarray(sp_grad["head"]["w"])).max()) > 0
    battery.check(
        "speaker train step finite grads", 0.0 if ok else 1.0, 0.0,
        time.time() - t0,
    )

    # CTC acoustic model: one on-device adam step (optax.ctc_loss through
    # the masked transformer), finite loss/grads, and the valid-frame
    # log-probs padding-invariant like the speaker leg
    t0 = time.time()
    from speech_tpu.models.ctc import CTCModel, greedy_decode
    from speech_tpu.models.ctc import make_train_step as _mk_ctc_step

    ctc = CTCModel(
        STFTFrontend(
            STFTFrameComputer(
                dict(BANK_STFT), dtype="float32", **_stft_kwargs()
            ),
            dtype=jnp.float32,
        ),
        vocab_size=4,
        model_dim=16,
        num_layers=1,
        num_heads=2,
        ffn_dim=32,
        subsample_strides=(2,),
    )
    ct_params, ct_consts = ctc.init(jax.random.PRNGKey(5))
    ct_rng = np.random.RandomState(13)
    ct_params["head"]["w"] = jnp.asarray(
        0.1 * ct_rng.randn(*ct_params["head"]["w"].shape), jnp.float32
    )
    ct_labels = jnp.asarray(ct_rng.randint(1, 5, size=(4, 3)), jnp.int32)
    ct_lab_lens = jnp.asarray([3, 2, 1, 3], jnp.int32)
    ct_apply = jax.jit(
        lambda p, s, l: ctc.apply(p, ct_consts, s, l)
    )
    ct_base, ct_counts = ct_apply(ct_params, sp_sigs, sp_lens)
    ct_wide, _ = ct_apply(
        ct_params,
        jnp.concatenate(
            [sp_sigs, jnp.full((4, RATE // 8), 0.5, jnp.float32)], axis=1
        ),
        sp_lens,
    )
    ct_base, ct_wide = np.asarray(ct_base), np.asarray(ct_wide)
    ct_counts = np.asarray(ct_counts)
    err = max(
        float(
            np.abs(
                ct_wide[i, : ct_counts[i]] - ct_base[i, : ct_counts[i]]
            ).max()
        )
        for i in range(len(ct_counts))
    )
    greedy_decode(ct_base, ct_counts)
    ct_tx = optax.adam(1e-3)
    ct_step = _mk_ctc_step(ctc, ct_consts, ct_tx)
    _, _, ct_metrics = ct_step(
        ct_params, ct_tx.init(ct_params), sp_sigs, sp_lens,
        ct_labels, ct_lab_lens,
    )
    if not np.isfinite(float(ct_metrics["loss"])):
        err = 1.0
    battery.check(
        "ctc step + padding-invariant log-probs", err, 1e-4,
        time.time() - t0,
    )

    # Pooled KWS serving: StreamingKWS through StreamPool (the
    # occupancy-tiered vmapped tick) — each session's close-row logits
    # must match the batch model on its full signal.  Unlike the feature
    # pipeline (which pins HIGHEST), the model stack's matmuls run at
    # DEFAULT precision = bf16 on TPU, so two independently compiled
    # programs with different reduction shapes drift at bf16 scale:
    # measured 6.6e-7 on CPU (f32 DEFAULT), 3.4e-3 relative on v5e
    # (2026-08-20).  The contract is 'same decision surface', bounded at
    # 1e-2 relative — NOT a tight numeric equality
    t0 = time.time()
    from speech_tpu.models.kws import StreamingKWS
    from speech_tpu.serve import StreamPool

    pk_rng = np.random.RandomState(14)
    k_params2 = dict(k_params2)
    k_params2["classifier"] = dict(k_params2["classifier"])
    k_params2["classifier"]["head"] = {
        "w": jnp.asarray(
            0.1
            * pk_rng.randn(
                *np.asarray(k_params2["classifier"]["head"]["w"]).shape
            ),
            jnp.float32,
        ),
        "b": k_params2["classifier"]["head"]["b"],
    }
    skws = StreamingKWS(
        kws, k_params2, window_frames=64, chunk_size=RATE // 10
    )
    kp_pool = StreamPool(skws, slots=4)
    kp_sigs = [
        np.asarray(sigs32[i][: RATE // 2] / np.float32(32768.0), np.float32)
        for i in range(3)
    ]
    kp_handles = [kp_pool.open() for _ in kp_sigs]
    for h, s in zip(kp_handles, kp_sigs):
        kp_pool.feed(h, s[: len(s) // 2])
    kp_mid = dict(kp_pool.step(max_chunks=4))
    for h, s in zip(kp_handles, kp_sigs):
        kp_pool.feed(h, s[len(s) // 2 :])
    kp_closed = dict(kp_pool.close_many(kp_handles))
    err = 0.0
    for h, s in zip(kp_handles, kp_sigs):
        want = np.asarray(
            kws.apply(
                k_params2,
                k_consts,
                jnp.asarray(s)[None],
                jnp.asarray([len(s)], jnp.int32),
            )
        )[0]
        rows = [
            r for r in (kp_mid.get(h), kp_closed.get(h)) if r is not None
        ]
        got = np.concatenate(rows, axis=0)[-1]
        scale = max(float(np.abs(want).max()), 1e-6)
        err = max(err, float(np.abs(got - want).max()) / scale)
    battery.check(
        "pooled kws == batch model", err, 1e-2, time.time() - t0
    )

    # Real-speech recipe leg (mirrors tests/test_recipe_kws.py on-chip):
    # augmented crops of the in-repo utterance through 10 KWS train
    # steps — the loss must be finite every step and lower at the end
    # than after step 1 (augment -> frontend -> train on REAL audio)
    t0 = time.time()
    from speech_tpu.io import read_signal
    from speech_tpu.ops.augment import mix_noise, random_gain
    from speech_tpu.ops.resample import resample_np

    rs_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "audio", "test.wav",
    )
    rs = resample_np(read_signal(rs_path, dtype=np.float64), 160, 441)
    rs = (rs / np.abs(rs).max()).astype(np.float32)
    segs = [rs[i * RATE : (i + 1) * RATE] for i in range(3)]
    rs_model = KWSModel(k_frontend, num_classes=3, channels=(16,))
    rs_params, rs_consts = rs_model.init(jax.random.PRNGKey(6))
    rs_tx = optax.adam(1e-2)
    rs_opt = rs_tx.init(rs_params)
    rs_step = make_train_step(rs_model, rs_consts, rs_tx)
    rs_rng = np.random.RandomState(15)
    crop = RATE // 2
    losses = []
    for it in range(30):
        labels = rs_rng.randint(0, 3, size=16)
        sig_np = np.zeros((16, crop), np.float32)
        for i in range(16):
            off = rs_rng.randint(0, RATE - crop + 1)
            sig_np[i] = segs[labels[i]][off : off + crop]
        sigs_j = jnp.asarray(sig_np)
        key = jax.random.PRNGKey(100 + it)
        k_n, k_g = jax.random.split(key)
        sigs_j = mix_noise(
            k_n, sigs_j, jnp.asarray(rs_rng.randn(crop).astype(np.float32)),
            15.0,
        )
        sigs_j = random_gain(k_g, sigs_j)
        lens_j = jnp.full((16,), crop, jnp.int32)
        rs_params, rs_opt, rs_metrics = rs_step(
            rs_params, rs_opt, sigs_j, lens_j,
            jnp.asarray(labels, jnp.int32),
        )
        losses.append(float(rs_metrics["loss"]))
    # CPU-measured trajectory: ln(3)=1.10 start, ~0.68 after 30 steps
    ok = all(np.isfinite(losses)) and float(np.mean(losses[-3:])) < 0.85
    battery.check(
        "real-speech kws recipe trains", 0.0 if ok else 1.0, 0.0,
        time.time() - t0,
    )

    n_fail = len(battery.failures)
    print(
        f"tpu_checks: {'OK' if not n_fail else 'FAILED'} "
        f"({battery.total - n_fail}/{battery.total} passed)"
        + (f" failures: {battery.failures}" if n_fail else ""),
        flush=True,
    )
    return 1 if n_fail else 0


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--oracle", metavar="OUT_NPZ", default=None)
    parser.add_argument(
        "--smoke",
        action="store_true",
        help="logic-validation run off-device: relax the 'highest' "
        "tolerances (CPU f32 matmuls have no HIGHEST accumulation tier)",
    )
    parser.add_argument(
        "--full",
        action="store_true",
        help="also validate the serving tier (FeatureServer, StreamPool) "
        "against compute_full on the device",
    )
    args = parser.parse_args()
    if args.oracle:
        oracle_main(args.oracle)
        return 0
    return tpu_main(smoke=args.smoke, full=args.full)


if __name__ == "__main__":
    sys.exit(main())
