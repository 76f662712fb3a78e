"""Headline benchmark: 40-dim log-mel fbank extraction throughput.

Prints ONE JSON line: real-time factor (seconds of audio processed per
wall-clock second per chip) for the flagship fused STFT pipeline, against
the driver's north-star target of 5000x real time (BASELINE.json), plus
the SI gammatone pipeline's rt-factor as a secondary key
(BASELINE.json's configs list names both).
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from speech_tpu.utils import enable_persistent_compilation_cache


def _wait_for_backend(attempts: int = 5, delay_s: float = 60.0):
    """Ride out transient device-claim failures.

    The tunneled TPU runtime's claim leg can fail UNAVAILABLE while the
    pool is busy; jax caches a failed backend init for the process
    lifetime, so retry by re-exec'ing (bounded via an env counter) —
    a whole benchmark run shouldn't die on a hiccup that clears in a
    minute.
    """
    try:
        jax.devices()
        return
    except RuntimeError as e:
        if "UNAVAILABLE" not in str(e).upper():
            raise
        import os
        import sys

        n = int(os.environ.get("SPEECH_TPU_BENCH_RETRIES", "0"))
        if n >= attempts:
            raise
        os.environ["SPEECH_TPU_BENCH_RETRIES"] = str(n + 1)
        print(
            f"backend unavailable; re-exec attempt {n + 1}/{attempts} "
            f"in {delay_s:.0f}s",
            flush=True,
        )
        time.sleep(delay_s)
        os.execv(sys.executable, [sys.executable] + sys.argv)


# NOTE: called from __main__ only — importing bench must not init the
# backend, sleep, or re-exec the importing process.


def _throughput(computer, batch: int, seconds: int, rate: int = 16000):
    """Steady-state audio-sec/sec: back-to-back batches amortize dispatch
    latency, as in production extraction.  A host readback of one row
    forces execution of the whole in-order queue (block_until_ready does
    not reliably wait on tunneled runtimes); best of 3 timed runs."""
    max_len = seconds * rate
    rng = np.random.RandomState(0)
    signals = jnp.asarray(rng.randn(batch, max_len).astype(np.float32))
    # host lengths: lets compute_batch use its static full-length padding
    lengths = np.full((batch,), max_len, dtype=np.int32)
    feats, counts = computer.compute_batch(signals, lengths)  # compile
    np.asarray(feats[0, 0])
    inner, best = 20, float("inf")
    for _ in range(3):
        start = time.perf_counter()
        for _ in range(inner):
            feats, counts = computer.compute_batch(signals, lengths)
        np.asarray(feats[0, 0])
        best = min(best, (time.perf_counter() - start) / inner)
    return batch * seconds / best


# Peak rates for the roofline/MFU keys, by device kind.  MFU here =
# ALGORITHMIC matmul FLOPs (2MKN of the math as specified, not of the
# passes the precision lowers to) over wall time, divided by the peak of
# the arithmetic the program actually issues (bf16 MXU for float paths,
# int8 for the digit kernels) — so a 6-pass HIGHEST program's MFU
# ceiling is ~1/6 by construction, and the number honestly answers "how
# much faster could THIS math possibly go on this chip".
_PEAKS = {
    # device_kind prefix: (bf16 TFLOP/s, int8 TOP/s, HBM GB/s)
    "TPU v5": (197.0, 394.0, 819.0),
    "TPU v4": (275.0, 275.0, 1228.0),
}


def _peaks():
    kind = jax.devices()[0].device_kind
    for prefix, peaks in _PEAKS.items():
        if kind.startswith(prefix):
            return peaks
    return _PEAKS["TPU v5"]  # fallback: the chip this repo targets


def _roofline(flops, bytes_moved, seconds, peak_tflops):
    """(achieved TFLOP/s, MFU, HBM-bandwidth fraction) for a program."""
    _, _, hbm = _peaks()
    tflops = flops / seconds / 1e12
    return (
        round(tflops, 1),
        round(tflops / peak_tflops, 3),
        round(bytes_moved / seconds / 1e9 / hbm, 3),
    )


def main():
    from speech_tpu.compute import (
        ShortIntegrationFrameComputer,
        STFTFrameComputer,
    )

    stft = STFTFrameComputer(
        {"name": "fbank", "num_filts": 40, "sampling_rate": 16000},
        frame_length_ms=25,
        frame_shift_ms=10,
        include_energy=True,
        dtype="float32",
    )
    fbank_rt = _throughput(stft, batch=128, seconds=15)

    si = ShortIntegrationFrameComputer(
        {
            "name": "gammatone",
            "scaling_function": "mel",
            "num_filts": 40,
            "sampling_rate": 16000,
        },
        frame_shift_ms=10,
        include_energy=True,
        dtype="float32",
    )
    si_rt = _throughput(si, batch=32, seconds=10)

    si_gabor = ShortIntegrationFrameComputer(
        {
            "name": "gabor",
            "scaling_function": "mel",
            "num_filts": 40,
            "sampling_rate": 16000,
        },
        frame_shift_ms=10,
        include_energy=True,
        dtype="float32",
    )
    si_gabor_rt = _throughput(si_gabor, batch=32, seconds=10)

    chain_rt = _full_chain_throughput(stft, batch=128, seconds=15)

    served_rt, served_device_rt = _served_throughput(
        stft, n=256, batch=64, seconds=15
    )

    rtt_ms, in_mbps, out_mbps = _tunnel_probe()

    lat_ms, chunk_ms, pool_rt, pool_device_rt = _streaming_bench(stft)

    # the exact tier (<=1e-5 vs float64 on any signal; ~7e-7 measured)
    exact = STFTFrameComputer(
        {"name": "fbank", "num_filts": 40, "sampling_rate": 16000},
        frame_length_ms=25,
        frame_shift_ms=10,
        include_energy=True,
        dtype="float32",
        precision="double",
    )
    exact_rt = _throughput(exact, batch=128, seconds=15)

    # the reduced-pair <=1e-5 tier (10 digit dots instead of 13):
    # fastest config meeting the north-star accuracy clause
    accurate = STFTFrameComputer(
        {"name": "fbank", "num_filts": 40, "sampling_rate": 16000},
        frame_length_ms=25,
        frame_shift_ms=10,
        include_energy=True,
        dtype="float32",
        precision="accurate",
    )
    accurate_rt = _throughput(accurate, batch=128, seconds=15)

    pitch_rt, pitch_flops, pitch_bytes = _pitch_throughput(
        batch=32, seconds=10
    )

    # --- roofline / MFU accounting (VERDICT r4 item 2) -----------------
    bf16_peak, int8_peak, _ = _peaks()
    nf = (15 * 16000 + stft.frame_shift // 2) // stft.frame_shift
    half = stft.dft_size // 2 + 1
    fl = stft.frame_length
    # fbank HIGHEST: cos + sin DFT matmuls + the filter matmul
    fbank_flops = 128 * nf * (2 * fl * half * 2 + 2 * half * 40)
    fbank_bytes = 128 * (15 * 16000 * 4 + nf * 41 * 4)
    fbank_roof = _roofline(
        fbank_flops, fbank_bytes, 128 * 15 / fbank_rt, bf16_peak
    )
    # int8 digit tiers: pairs x the combined [cos|sin] dot (N = dft)
    def _i8_flops(computer):
        pairs = sum(
            len(xs) for _, xs, _, _ in computer.params["i8k_offsets"]
        )
        return 128 * nf * 2 * fl * computer.dft_size * pairs

    exact_roof = _roofline(
        _i8_flops(exact), fbank_bytes, 128 * 15 / exact_rt, int8_peak
    )
    accurate_roof = _roofline(
        _i8_flops(accurate), fbank_bytes, 128 * 15 / accurate_rt, int8_peak
    )
    # SI gammatone: banded-Toeplitz conv einsums (2 complex parts)
    blocks_shape = si._conv_block_params["conv_re_blocks"].shape
    Kb, F_si, V = blocks_shape[0], blocks_shape[1], blocks_shape[2]
    si_nf = (10 * 16000) // si.frame_shift
    si_ny = (si_nf + 1) * si.frame_shift
    si_nb = -(-(si._shift_eff + si_ny) // V)
    parts = 1 if "conv_im_blocks" not in si._conv_block_params else 2
    si_flops = 32 * parts * 2 * Kb * si_nb * V * V * F_si
    si_bytes = 32 * (10 * 16000 * 4 + si_nf * 41 * 4)
    si_roof = _roofline(si_flops, si_bytes, 32 * 10 / si_rt, bf16_peak)
    pitch_roof = _roofline(
        pitch_flops, pitch_bytes, 32 * 10 / pitch_rt, bf16_peak
    )

    print(
        json.dumps(
            {
                "metric": "fbank_rt_factor",
                "value": round(fbank_rt, 1),
                "unit": "audio_sec/sec/chip",
                "vs_baseline": round(fbank_rt / 5000.0, 3),
                "si_gammatone_rt_factor": round(si_rt, 1),
                "si_gabor_rt_factor": round(si_gabor_rt, 1),
                "full_chain_rt_factor": round(chain_rt, 1),
                # FeatureServer sustained throughput: a 256-request burst
                # of int16 PCM through the micro-batching, double-buffered
                # dispatcher (host padding of batch i+1 overlaps device
                # compute of batch i); results are host arrays, so every
                # readback is included
                "served_rt_factor": round(served_rt, 1),
                # device-side twin of the served micro-batch program
                # (queued dispatches + one readback): regressions in the
                # serving code move THIS; tunnel weather moves only the
                # end-to-end key above
                "served_device_rt_factor": round(served_device_rt, 1),
                # measured tunnel characteristics this run — the
                # end-to-end serving keys are bound by these and they
                # drift run to run (30-60 ms RTT observed); compare
                # RTT-bound keys only after normalizing by the probe
                "tunnel_rtt_ms": round(rtt_ms, 1),
                "tunnel_in_mbps": round(in_mbps, 0),
                "tunnel_out_mbps": round(out_mbps, 0),
                # single-stream request-response latency per 100 ms chunk
                # (readback-timed: includes the tunnel round trip) and the
                # dispatch-amortized per-chunk cost (in-order queue, one
                # readback over many chunks)
                "streaming_latency_ms": round(lat_ms, 2),
                "streaming_chunk_ms": round(chunk_ms, 2),
                # 16 concurrent sessions, 16-chunk lax.scan per tick:
                # end-to-end host drain (RTT-bound on tunneled runtimes)
                # and the device-side program throughput
                "stream_pool_rt_factor": round(pool_rt, 1),
                "stream_pool_device_rt_factor": round(pool_device_rt, 1),
                "exact_tier_rt_factor": round(exact_rt, 1),
                # tiers meeting BOTH north-star clauses at once
                # (<=1e-5 vs float64 AND >=5000x RT): 'double' is exact
                # on any signal; 'accurate' is the faster <=1e-5 point
                "exact_tier_vs_baseline": round(exact_rt / 5000.0, 3),
                "accurate_tier_rt_factor": round(accurate_rt, 1),
                "accurate_tier_vs_baseline": round(accurate_rt / 5000.0, 3),
                # beyond-parity Kaldi companion: compute-kaldi-pitch-style
                # NCCF + Viterbi tracker (device-side, like the other keys)
                "pitch_rt_factor": round(pitch_rt, 1),
                # roofline accounting: algorithmic TFLOP/s, MFU (vs the
                # peak of the arithmetic each program issues: bf16 for
                # float paths — so a 6-pass HIGHEST program's ceiling is
                # ~1/6 — int8 for the digit tiers), and the fraction of
                # HBM bandwidth the program's MINIMUM traffic (inputs +
                # outputs once) implies.  membw_frac near 0 + mfu well
                # above it = compute-bound; the decomposition notes in
                # ops/stft.py and ARCHITECTURE.md say which stages own
                # the rest of the time.
                "fbank_tflops": fbank_roof[0],
                "fbank_mfu": fbank_roof[1],
                "fbank_membw_frac": fbank_roof[2],
                "exact_tier_tflops": exact_roof[0],
                "exact_tier_mfu": exact_roof[1],
                "exact_tier_membw_frac": exact_roof[2],
                "accurate_tier_tflops": accurate_roof[0],
                "accurate_tier_mfu": accurate_roof[1],
                "si_gammatone_tflops": si_roof[0],
                "si_gammatone_mfu": si_roof[1],
                "si_gammatone_membw_frac": si_roof[2],
                "pitch_tflops": pitch_roof[0],
                "pitch_mfu": pitch_roof[1],
                "pitch_membw_frac": pitch_roof[2],
            }
        )
    )


def _pitch_throughput(batch: int, seconds: int, rate: int = 16000):
    """Kaldi-style pitch features, device-side throughput (inputs
    device-resident like the other keys — through the tunnel the
    20 MB/call host transfer would otherwise dominate)."""
    from speech_tpu.ops.pitch import pitch_feats

    rng = np.random.RandomState(0)
    t = np.arange(seconds * rate) / rate
    sigs = jnp.asarray(
        np.stack(
            [
                np.sin(2 * np.pi * (100.0 + 9.0 * b) * t)
                + 0.05 * rng.randn(t.size)
                for b in range(batch)
            ]
        ).astype(np.float32)
    )
    lengths = jnp.full((batch,), seconds * rate, jnp.int32)
    fn = jax.jit(lambda x, l: pitch_feats(x, rate, lengths=l))
    # XLA's own FLOP count for the whole pitch program (frontend convs +
    # NCCF + Viterbi): the one benched pipeline whose matmul inventory
    # is too heterogeneous to hand-count
    flops = 0.0
    try:
        ca = fn.lower(sigs, lengths).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
    except Exception:
        pass
    out = fn(sigs, lengths)
    np.asarray(out[0, 0, 0])
    byts = sigs.size * 4 + np.prod(out.shape) * 4
    inner, best = 10, float("inf")
    for _ in range(3):
        start = time.perf_counter()
        for _ in range(inner):
            out = fn(sigs, lengths)
        np.asarray(out[0, 0, 0])
        best = min(best, (time.perf_counter() - start) / inner)
    return batch * seconds / best, flops, float(byts)


def _tunnel_probe():
    """Measured tunnel characteristics: round-trip latency of one tiny
    dispatch+readback, and host->device / device->host bandwidth.

    The end-to-end serving keys (served_rt_factor, stream_pool_rt_factor,
    streaming_latency_ms) are bound by these, and the RTT drifts 30-60 ms
    run to run on this runtime — publishing the probe alongside makes
    round-over-round comparisons meaningful: a serving regression moves
    the *device* twins; tunnel weather moves only the end-to-end keys in
    proportion to the probe."""
    tiny = jnp.zeros((8, 128), jnp.float32)
    bump = jax.jit(lambda a: a + 1)
    out = bump(tiny)
    np.asarray(out[0, 0])
    n = 20
    start = time.perf_counter()
    for _ in range(n):
        out = bump(out)
        np.asarray(out[0, 0])
    rtt_ms = (time.perf_counter() - start) / n * 1e3

    big = np.zeros((32, 1 << 18), dtype=np.float32)  # 32 MB
    ship = jax.jit(lambda a: a + 1)  # arg-pass: the production ingress path
    dev = ship(big)
    np.asarray(dev[0, 0])
    start = time.perf_counter()
    for _ in range(3):
        d = ship(big)
        np.asarray(d[0, 0])
    in_s = (time.perf_counter() - start) / 3
    in_mbps = big.nbytes / 1e6 / max(in_s - rtt_ms / 1e3, 1e-9)

    # device->host: jax caches a device array's numpy value after the
    # first np.asarray, so each iteration must read a FRESH array or the
    # probe measures one transfer divided by three
    out_s = 0.0
    for _ in range(3):
        d = ship(big)
        np.asarray(d[0, 0])  # ensure computed + resident
        start = time.perf_counter()
        np.asarray(d)
        out_s += time.perf_counter() - start
    out_s /= 3
    out_mbps = big.nbytes / 1e6 / max(out_s - rtt_ms / 1e3, 1e-9)
    return rtt_ms, in_mbps, out_mbps


def _served_throughput(
    computer, n: int, batch: int, seconds: int, rate: int = 16000
):
    """Sustained FeatureServer throughput (audio-sec/sec) on a burst of
    ``n`` int16-PCM requests: micro-batching + the double-buffered
    dispatcher + compact integer ingress, timed submit-to-last-result so
    host padding, transfers, and result readbacks are all included.

    Also returns the device-side twin: the same micro-batch program on
    device-resident inputs, queued dispatches + one readback — isolating
    the serving *compute* from the tunnel transfer/RTT that dominates
    the end-to-end number on this runtime."""
    from speech_tpu.serve import FeatureServer

    rng = np.random.RandomState(3)
    length = seconds * rate
    signals = [
        (rng.randn(length) * 4096).astype(np.int16) for _ in range(n)
    ]
    with FeatureServer(computer, max_batch=batch, max_wait_ms=5.0) as srv:
        srv.warmup([length], dtype=np.int16)
        srv.extract_many(signals)  # warm pass (drop first-batch jitter)
        start = time.perf_counter()
        srv.extract_many(signals)
        elapsed = time.perf_counter() - start
        ex = srv._extractor
    total_rt = n * seconds / elapsed

    # device twin of the dispatched micro-batch program
    sig_dev = jnp.asarray(np.stack(signals[:batch]))
    len_dev = jnp.full((batch,), length, jnp.int32)
    feats, counts = ex.extract_batch(sig_dev, len_dev)
    np.asarray(feats[0, 0])
    inner, best = 10, float("inf")
    for _ in range(3):
        start = time.perf_counter()
        for _ in range(inner):
            feats, counts = ex.extract_batch(sig_dev, len_dev)
        np.asarray(feats[0, 0])
        best = min(best, (time.perf_counter() - start) / inner)
    device_rt = batch * seconds / best
    return total_rt, device_rt


def _streaming_bench(computer, rate: int = 16000):
    """Streaming/serving tier: single-stream latency and pool throughput.

    Three numbers: (1) request-response latency for one 100 ms chunk —
    process + host readback each tick, so the tunnel round trip is
    included (the honest serving latency on this runtime); (2) the
    dispatch-amortized per-chunk cost — many process calls, one readback
    (the in-order queue covers them), isolating dispatch+compute from the
    readback RTT; (3) StreamPool throughput — 16 concurrent sessions
    draining 8 chunks per tick through the vmapped ``lax.scan`` program.
    """
    from speech_tpu.serve import StreamPool
    from speech_tpu.streaming import StreamingSTFT

    chunk_size = rate // 10  # 100 ms
    stream = StreamingSTFT(computer, chunk_size)
    rng = np.random.RandomState(2)
    chunk = jnp.asarray(rng.randn(chunk_size).astype(np.float32))
    state = stream.init_state()
    state, feats, _ = stream.process(state, chunk)  # compile
    np.asarray(feats[0, 0])

    n = 50
    start = time.perf_counter()
    for _ in range(n):
        state, feats, _ = stream.process(state, chunk)
        np.asarray(feats[0, 0])  # per-tick readback: full round trip
    lat_ms = (time.perf_counter() - start) / n * 1e3

    start = time.perf_counter()
    for _ in range(n):
        state, feats, _ = stream.process(state, chunk)
    np.asarray(feats[0, 0])  # one readback drains the in-order queue
    chunk_ms = (time.perf_counter() - start) / n * 1e3

    slots, depth = 16, 64
    pool = StreamPool(computer, slots=slots, chunk_size=chunk_size)
    per_session = chunk_size * depth
    audio_sec = slots * per_session / rate

    def drain():
        # each session's 6.4 s backlog drains in ONE wide tick; the
        # end-to-end number is transfer/RTT-bound on tunneled runtimes
        handles = [pool.open() for _ in range(slots)]
        for h in handles:
            pool.feed(h, rng.randn(per_session).astype(np.float32))
        while any(len(s.pending) for s in pool._sessions.values()):
            pool.step(max_chunks=depth)
        pool.close_many(handles)

    drain()  # compile (scan program + finalize)
    start = time.perf_counter()
    drain()
    pool_rt = audio_sec / (time.perf_counter() - start)

    # device-side pool throughput: queued tick dispatches, one readback
    # (isolates the vmapped wide-chunk program from the tunnel RTT that
    # dominates the end-to-end drain above)
    states = pool._states
    chunks = jnp.asarray(
        rng.randn(slots, depth * chunk_size).astype(np.float32)
    )
    valids = jnp.full((slots,), depth * chunk_size, jnp.int32)
    _, feats, _ = pool._vstep(states, chunks, valids)
    np.asarray(feats[0, 0, 0])
    n, tick = 10, float("inf")
    for _ in range(3):
        start = time.perf_counter()
        for _ in range(n):
            _, feats, _ = pool._vstep(states, chunks, valids)
        np.asarray(feats[0, 0, 0])
        tick = min(tick, (time.perf_counter() - start) / n)
    pool_device_rt = slots * depth * (chunk_size / rate) / tick
    return lat_ms, chunk_ms, pool_rt, pool_device_rt


def _full_chain_throughput(computer, batch: int, seconds: int, rate=16000):
    """BASELINE.json configs #2/#4: dither + preemphasis pre-ops, fbank,
    then deltas(order 2) + local CMVN + frame stacking, all in ONE jitted
    device program."""
    from speech_tpu.ops import postops as _postops
    from speech_tpu.pre import dither, preemphasize

    max_len = seconds * rate
    rng = np.random.RandomState(1)
    signals = jnp.asarray(rng.randn(batch, max_len).astype(np.float32))
    filts = _postops.delta_filters(2)
    fn = computer._batch_full_fn(
        max_len,
        (max_len + computer.frame_shift // 2) // computer.frame_shift,
    )

    @jax.jit
    def chain(key, signals):
        keys = jax.random.split(key, signals.shape[0])
        sigs = jax.vmap(lambda k, s: preemphasize(dither(k, s, 0.1)))(
            keys, signals
        )
        feats = fn(sigs)
        feats = _postops.deltas(feats, filts)
        feats = _postops.standardize(feats)
        return _postops.stack(feats, 3, pad=True)

    key = jax.random.PRNGKey(0)
    out = chain(key, signals)
    np.asarray(out[0, 0, 0])
    inner, best = 20, float("inf")
    for _ in range(3):
        start = time.perf_counter()
        for _ in range(inner):
            out = chain(key, signals)
        np.asarray(out[0, 0, 0])
        best = min(best, (time.perf_counter() - start) / inner)
    return batch * seconds / best


if __name__ == "__main__":
    _wait_for_backend()
    enable_persistent_compilation_cache()
    main()
