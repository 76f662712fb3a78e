"""Streaming pitch tracker vs the offline (whole-utterance) tracker.

The contracts:

- frozen ballast + lookahead >= total frames => the streamed track IS the
  offline Viterbi optimum (machine-precision equality);
- realistic lookahead => emitted frames equal the offline optimum wherever
  Viterbi paths coalesce within the lookahead (all frames on these
  signals), and the finalize tail is exactly optimal by construction;
- chunk-size invariance; incremental process() == scan(); vmap sessions.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_tpu.ops.pitch import kaldi_pitch, pitch_feats, pitch_feats_from_track
from speech_tpu.ops.pitch import PitchTrack
from speech_tpu.streaming import StreamingPitch

RATE = 16000


def _speechy(seconds, seed=0, f0_base=140.0, f0_swing=60.0, gap=None):
    """A vibrato tone + noise; optionally a near-silent gap [lo, hi)."""
    rng = np.random.RandomState(seed)
    t = np.arange(int(seconds * RATE)) / RATE
    f0t = f0_base + f0_swing * np.sin(2 * np.pi * 0.7 * t)
    x = np.sin(2 * np.pi * np.cumsum(f0t) / RATE) + 0.1 * rng.randn(len(t))
    if gap is not None:
        lo, hi = gap
        x[lo:hi] = 0.01 * rng.randn(hi - lo)
    return x.astype(np.float64)


def test_stream_equals_offline_with_full_lookahead():
    """Frozen ballast + lookahead >= T: stream == offline at roundoff."""
    x = _speechy(0.8, seed=0)
    sp = StreamingPitch(
        RATE, chunk_size=1600, lookahead_frames=200,
        dtype=jnp.float64, ballast_ms=0.25,
    )
    f0_s, nccf_s = sp.transform(x)
    track = kaldi_pitch(x, RATE, ballast_ms=0.25)
    f0_b, nccf_b = np.asarray(track.f0), np.asarray(track.nccf)
    assert f0_s.shape == f0_b.shape
    assert np.allclose(f0_s, f0_b, rtol=1e-12)
    assert np.allclose(nccf_s, nccf_b, atol=1e-12)


def test_stream_matches_offline_at_realistic_lookahead():
    """Lookahead 30 frames (0.3 s): every emitted frame equals the
    offline optimum on a varied signal with a silence gap (paths
    coalesce well inside the lookahead)."""
    x = _speechy(3.0, seed=1, gap=(RATE, RATE + 4000))
    sp = StreamingPitch(
        RATE, chunk_size=1600, lookahead_frames=30,
        dtype=jnp.float64, ballast_ms=0.3,
    )
    f0_s, nccf_s = sp.transform(x)
    track = kaldi_pitch(x, RATE, ballast_ms=0.3)
    f0_b = np.asarray(track.f0)
    assert f0_s.shape == f0_b.shape
    mismatch = np.mean(np.abs(f0_s - f0_b) > 1e-6 * f0_b)
    assert mismatch <= 0.01
    assert np.allclose(nccf_s, np.asarray(track.nccf), atol=1e-10)


def test_chunk_size_invariance():
    x = _speechy(1.2, seed=2)
    tracks = {}
    for cs in (800, 1600):
        sp = StreamingPitch(
            RATE, chunk_size=cs, lookahead_frames=40,
            dtype=jnp.float64, ballast_ms=0.2,
        )
        tracks[cs] = sp.transform(x)
    np.testing.assert_allclose(tracks[800][0], tracks[1600][0], rtol=1e-9)
    np.testing.assert_allclose(tracks[800][1], tracks[1600][1], atol=1e-9)


def test_incremental_process_matches_scan():
    """The per-chunk process()/finalize() loop equals the scan driver."""
    x = _speechy(1.0, seed=3)
    sp = StreamingPitch(
        RATE, chunk_size=1600, lookahead_frames=20,
        dtype=jnp.float64, ballast_ms=0.2,
    )
    N = sp.chunk_size
    n_steps = -(-len(x) // N)
    xp = np.pad(x, (0, n_steps * N - len(x)))
    state = sp.init_state()
    f0s, nccfs = [], []
    for i in range(n_steps):
        v = min(len(x) - i * N, N)
        state, tr = sp.process(state, jnp.asarray(xp[i * N:(i + 1) * N]), v)
        n = int(np.asarray(tr.valid).sum())
        f0s.append(np.asarray(tr.f0)[:n])
        nccfs.append(np.asarray(tr.nccf)[:n])
    fin = sp.finalize(state)
    n = int(np.asarray(fin.valid).sum())
    f0s.append(np.asarray(fin.f0)[:n])
    nccfs.append(np.asarray(fin.nccf)[:n])
    f0_i, nccf_i = np.concatenate(f0s), np.concatenate(nccfs)
    f0_t, nccf_t = sp.transform(x)
    np.testing.assert_allclose(f0_i, f0_t, rtol=1e-12)
    np.testing.assert_allclose(nccf_i, nccf_t, atol=1e-12)


def test_feats_from_streamed_track_match_batch():
    """pitch_feats_from_track on the compacted stream == pitch_feats."""
    x = _speechy(1.0, seed=4)
    sp = StreamingPitch(
        RATE, chunk_size=1600, lookahead_frames=150,
        dtype=jnp.float64, ballast_ms=0.25,
    )
    f0_s, nccf_s = sp.transform(x)
    track = PitchTrack(
        jnp.asarray(f0_s), jnp.asarray(nccf_s),
        jnp.ones(f0_s.shape, bool),
    )
    got = np.asarray(pitch_feats_from_track(track))
    want = np.asarray(pitch_feats(x, RATE, ballast_ms=0.25))
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_no_resample_and_no_lowpass_configs():
    """rate == work rate (no resample) and cutoff off both stream."""
    rng = np.random.RandomState(5)
    t = np.arange(4000) / 4000.0
    x = (np.sin(2 * np.pi * 200 * t) + 0.05 * rng.randn(len(t))).astype(
        np.float64
    )
    for kw in (
        dict(resample_rate=4000.0, lowpass_cutoff=1000.0),
        dict(resample_rate=4000.0, lowpass_cutoff=None),
    ):
        sp = StreamingPitch(
            4000.0, chunk_size=400, lookahead_frames=100,
            dtype=jnp.float64, ballast_ms=0.2, **kw,
        )
        f0_s, nccf_s = sp.transform(x)
        track = kaldi_pitch(x, 4000.0, ballast_ms=0.2, **kw)
        np.testing.assert_allclose(f0_s, np.asarray(track.f0), rtol=1e-10)
        np.testing.assert_allclose(
            nccf_s, np.asarray(track.nccf), atol=1e-10
        )


def test_vmap_concurrent_sessions():
    """Two vmapped sessions track their own signals independently."""
    xa = _speechy(0.8, seed=6, f0_base=120.0, f0_swing=20.0)
    xb = _speechy(0.8, seed=7, f0_base=250.0, f0_swing=30.0)
    sp = StreamingPitch(
        RATE, chunk_size=1600, lookahead_frames=10,
        dtype=jnp.float64, ballast_ms=0.25,
    )
    states = jax.vmap(lambda _: sp.init_state())(jnp.arange(2))
    proc = jax.jit(jax.vmap(sp._process_impl, in_axes=(0, 0, 0)))
    fin = jax.jit(jax.vmap(sp._finalize_impl))
    N = sp.chunk_size
    n_steps = len(xa) // N
    outs = [[], []]
    for i in range(n_steps):
        chunks = jnp.stack(
            [jnp.asarray(xa[i * N:(i + 1) * N]), jnp.asarray(xb[i * N:(i + 1) * N])]
        )
        states, feats, nes = proc(states, chunks, jnp.full((2,), N, jnp.int32))
        for s in range(2):
            outs[s].append(np.asarray(feats)[s, : int(nes[s]), 0])
    ffeats, fns = fin(states)
    for s in range(2):
        outs[s].append(np.asarray(ffeats)[s, : int(fns[s]), 0])
    for s, x in enumerate((xa, xb)):
        f0_b = np.asarray(kaldi_pitch(x, RATE, ballast_ms=0.25).f0)
        f0_s = np.concatenate(outs[s])
        assert f0_s.shape == f0_b.shape
        # short lookahead: allow rare pre-coalescence flips mid-stream
        assert np.mean(np.abs(f0_s - f0_b) > 1e-6 * f0_b) <= 0.05


def test_arbitrary_chunking_stages_to_identity():
    """Irregular valid_len feeds (staging) give the same track as one
    full-chunk stream — valid prefixes compact across chunk boundaries."""
    x = _speechy(1.0, seed=10)
    sp = StreamingPitch(
        RATE, chunk_size=1600, lookahead_frames=25,
        dtype=jnp.float64, ballast_ms=0.25,
    )
    N = sp.chunk_size
    state = sp.init_state()
    f0s, nccfs = [], []
    taken = 0
    rng = np.random.RandomState(11)
    while taken < len(x):
        v = int(min(rng.randint(1, 2 * N), len(x) - taken))
        buf = np.zeros(-(-v // N) * N)
        buf[:v] = x[taken:taken + v]
        taken += v
        state, tr = sp.process(state, jnp.asarray(buf), v)
        n = int(np.asarray(tr.valid).sum())
        f0s.append(np.asarray(tr.f0)[:n])
        nccfs.append(np.asarray(tr.nccf)[:n])
    fin = sp.finalize(state)
    n = int(np.asarray(fin.valid).sum())
    f0s.append(np.asarray(fin.f0)[:n])
    nccfs.append(np.asarray(fin.nccf)[:n])
    f0_i, nccf_i = np.concatenate(f0s), np.concatenate(nccfs)
    f0_t, nccf_t = sp.transform(x)
    np.testing.assert_allclose(f0_i, f0_t, rtol=1e-12)
    np.testing.assert_allclose(nccf_i, nccf_t, atol=1e-12)


def test_valid0_step_is_bitwise_noop():
    """An idle (valid 0) process call leaves the state bitwise unchanged
    — the StreamPool occupancy-tier contract."""
    x = _speechy(0.5, seed=12)
    sp = StreamingPitch(
        RATE, chunk_size=1600, lookahead_frames=10, dtype=jnp.float64,
    )
    state = sp.init_state()
    state, _, _ = sp._process(state, jnp.asarray(x[:1600]), 1600)
    state, _, _ = sp._process(state, jnp.asarray(x[1600:3200]), 900)
    idle, feats, ne = sp._process(
        state, jnp.zeros((1600,), jnp.float64), 0
    )
    assert int(ne) == 0
    for a, b in zip(
        jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(idle)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stream_pool_pitch_sessions():
    """StreamPool multiplexes pitch sessions via the generic streamer
    contract; drained tracks match per-signal transform()."""
    from speech_tpu.serve import StreamPool

    sigs = [
        _speechy(0.8, seed=13, f0_base=110.0),
        _speechy(0.9, seed=14, f0_base=220.0),
        _speechy(0.7, seed=15, f0_base=300.0, f0_swing=40.0),
    ]
    sp = StreamingPitch(
        RATE, chunk_size=1600, lookahead_frames=20,
        dtype=jnp.float64, ballast_ms=0.25,
    )
    pool = StreamPool(sp, slots=4)
    handles = [pool.open() for _ in sigs]
    outs = {h: [] for h in handles}
    for h, x in zip(handles, sigs):
        pool.feed(h, x)
    for _ in range(10):
        for h, feats in pool.step(max_chunks=2):
            outs[h].append(feats)
    for h, feats in pool.close_many(handles):
        outs[h].append(feats)
    for h, x in zip(handles, sigs):
        got = np.concatenate(outs[h])
        f0_t, nccf_t = sp.transform(x)
        assert got.shape == (len(f0_t), 2)
        np.testing.assert_allclose(got[:, 0], f0_t, rtol=1e-12)
        np.testing.assert_allclose(got[:, 1], nccf_t, atol=1e-12)


def test_stream_server_pitch_sessions():
    """StreamServer drives pitch sessions through the generic streamer
    contract: threaded feeds with irregular sizes drain to the same
    track as per-signal transform()."""
    import threading

    from speech_tpu.serve import StreamServer

    sigs = [
        _speechy(0.8, seed=16, f0_base=120.0),
        _speechy(1.1, seed=17, f0_base=250.0),
    ]
    sp = StreamingPitch(
        RATE, chunk_size=1600, lookahead_frames=20,
        dtype=jnp.float64, ballast_ms=0.25,
    )
    results = {}
    with StreamServer(sp, slots=2, max_wait_ms=2.0) as server:
        handles = [server.open_session() for _ in sigs]

        def feeder(h, sig):
            i = 0
            r = np.random.RandomState(h + 1)
            while i < len(sig):
                n = int(r.randint(300, 2500))
                server.feed(h, sig[i : i + n])
                i += n
            server.close_session(h)

        threads = [
            threading.Thread(target=feeder, args=(h, s))
            for h, s in zip(handles, sigs)
        ]
        for t in threads:
            t.start()
        for h in handles:
            results[h] = list(server.iter_results(h))
        for t in threads:
            t.join()
    for h, sig in zip(handles, sigs):
        got = np.concatenate(results[h])
        f0_t, nccf_t = sp.transform(sig)
        assert got.shape == (len(f0_t), 2)
        np.testing.assert_allclose(got[:, 0], f0_t, rtol=1e-12)
        np.testing.assert_allclose(got[:, 1], nccf_t, atol=1e-12)


def test_running_ballast_tracks_voicing():
    """Default (running) ballast: the tone reads voiced at its f0 and
    the silent gap reads unvoiced-grade NCCF."""
    x = _speechy(2.0, seed=8, gap=(RATE, RATE + 6000))
    sp = StreamingPitch(RATE, chunk_size=1600, lookahead_frames=30,
                        dtype=jnp.float64)
    f0_s, nccf_s = sp.transform(x)
    shift = int(round(10.0 * 4000.0 / 1000.0))
    gap_frames = (np.arange(len(f0_s)) * shift > RATE / 4 + 500) & (
        np.arange(len(f0_s)) * shift < (RATE + 6000) / 4 - 500
    )
    voiced = ~gap_frames
    voiced[: 10] = False  # ballast warm-up
    assert np.median(nccf_s[voiced]) > 0.9
    assert np.median(nccf_s[gap_frames]) < 0.5


def test_validation_errors():
    with pytest.raises(ValueError, match="multiple"):
        StreamingPitch(RATE, chunk_size=1601)
    with pytest.raises(ValueError, match="positive"):
        StreamingPitch(RATE, chunk_size=0)
    with pytest.raises(ValueError, match="lookahead"):
        StreamingPitch(RATE, chunk_size=1600, lookahead_frames=-1)


def test_float32_smoke():
    """The default f32 path streams and stays near the f64 track."""
    x = _speechy(0.8, seed=9).astype(np.float32)
    sp = StreamingPitch(RATE, chunk_size=1600, lookahead_frames=40,
                        ballast_ms=0.25)
    f0_s, nccf_s = sp.transform(x)
    f0_b = np.asarray(kaldi_pitch(x.astype(np.float64), RATE,
                                  ballast_ms=0.25).f0)
    assert f0_s.shape == f0_b.shape
    assert np.isfinite(f0_s).all()
    assert np.mean(np.abs(f0_s - f0_b) / f0_b > 0.02) <= 0.05
