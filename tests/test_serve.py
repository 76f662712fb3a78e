"""Serving runtime: micro-batched FeatureServer + StreamPool sessions."""

import threading

import numpy as np
import pytest

from speech_tpu.compute import STFTFrameComputer
from speech_tpu.serve import FeatureServer, StreamPool

BANK = {"name": "fbank", "num_filts": 10, "sampling_rate": 16000}


def _computer(**kw):
    kwargs = dict(frame_length_ms=25, frame_shift_ms=10, dtype="float64")
    kwargs.update(kw)
    return STFTFrameComputer(dict(BANK), **kwargs)


def test_feature_server_concurrent_submissions_match_compute_full():
    computer = _computer()
    rng = np.random.RandomState(11)
    signals = [rng.randn(int(rng.randint(3000, 9000))) for _ in range(24)]
    want = [computer.compute_full(s) for s in signals]
    results = [None] * len(signals)

    with FeatureServer(computer, max_batch=8, max_wait_ms=20.0) as server:

        def client(i):
            results[i] = server.extract(signals[i])

        threads = [
            threading.Thread(target=client, args=(i,))
            for i in range(len(signals))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

    for got, ref in zip(results, want):
        assert got.shape == ref.shape
        assert np.allclose(got, ref, atol=1e-8), np.abs(got - ref).max()


def test_feature_server_burst_larger_than_batch():
    computer = _computer()
    rng = np.random.RandomState(3)
    signals = [rng.randn(4000) * (i + 1) for i in range(10)]
    with FeatureServer(computer, max_batch=4, max_wait_ms=1.0) as server:
        outs = server.extract_many(signals)
    for s, got in zip(signals, outs):
        want = computer.compute_full(s)
        assert np.allclose(got, want, atol=1e-8)


def test_feature_server_bad_request_does_not_kill_server():
    computer = _computer()
    rng = np.random.RandomState(5)
    with FeatureServer(computer, max_wait_ms=1.0) as server:
        # malformed requests raise at submit(), to the caller — they must
        # never enqueue and poison a coalesced micro-batch
        with pytest.raises(ValueError):
            server.submit(rng.randn(10, 10))  # 2-D: invalid
        with pytest.raises(TypeError):
            server.submit(np.array(["a", "b"]))  # non-numeric
        sig = rng.randn(5000)
        good = server.extract(sig)
        assert np.allclose(good, computer.compute_full(sig), atol=1e-8)
    with pytest.raises(RuntimeError):
        server.submit(sig)


def test_stream_pool_interleaved_sessions_match_compute_full():
    computer = _computer()
    rng = np.random.RandomState(29)
    pool = StreamPool(computer, slots=3, chunk_size=800)
    signals = {
        h: rng.randn(int(rng.randint(2500, 7001)))
        for h in [pool.open(), pool.open(), pool.open()]
    }
    assert pool.capacity == 0
    got = {h: [] for h in signals}
    cursors = {h: 0 for h in signals}
    # interleave ragged feeds across sessions
    while any(cursors[h] < len(s) for h, s in signals.items()):
        for h, s in signals.items():
            if cursors[h] >= len(s):
                continue
            n = int(rng.randint(1, 1200))
            pool.feed(h, s[cursors[h] : cursors[h] + n])
            cursors[h] += n
        for h2, feats in pool.step():
            got[h2].append(feats)
    handles = list(signals)
    for h in handles:
        for h2, feats in pool.close(h):
            assert h2 == h
            got[h].append(feats)
    assert pool.capacity == 3
    for h, s in signals.items():
        out = np.concatenate(got[h]) if got[h] else np.zeros((0, 10))
        want = computer.compute_full(s)
        assert out.shape == want.shape, (out.shape, want.shape)
        assert np.allclose(out, want, atol=1e-8), np.abs(out - want).max()


def test_stream_pool_slot_reuse_and_isolation():
    computer = _computer()
    rng = np.random.RandomState(41)
    pool = StreamPool(computer, slots=2, chunk_size=800)
    a, b = pool.open(), pool.open()
    with pytest.raises(RuntimeError):
        pool.open()
    sig_a = rng.randn(4000)
    sig_b = rng.randn(5200)
    pool.feed(a, sig_a)
    pool.feed(b, sig_b[:2000])
    # closing a must not consume b's pending samples
    out_a = np.concatenate([f for _, f in pool.close(a)])
    assert np.allclose(out_a, computer.compute_full(sig_a), atol=1e-8)
    pool.feed(b, sig_b[2000:])
    out_b = [f for _, f in pool.step()]
    out_b += [f for _, f in pool.close(b)]
    out_b = np.concatenate(out_b)
    assert np.allclose(out_b, computer.compute_full(sig_b), atol=1e-8)
    # slot freed by a is reusable with a fresh state
    c = pool.open()
    sig_c = rng.randn(3000)
    pool.feed(c, sig_c)
    out_c = np.concatenate([f for _, f in pool.close(c)])
    assert np.allclose(out_c, computer.compute_full(sig_c), atol=1e-8)


def test_stream_pool_multi_chunk_drain_matches_compute_full():
    """max_chunks > 1 drains a backlog through the inner lax.scan in one
    dispatch; output identical to one-chunk-per-tick stepping."""
    computer = _computer()
    rng = np.random.RandomState(57)
    pool = StreamPool(computer, slots=2, chunk_size=800)
    a, b = pool.open(), pool.open()
    sig_a = rng.randn(800 * 9 + 123)  # deep backlog, ragged tail
    sig_b = rng.randn(800 * 3)
    pool.feed(a, sig_a)
    pool.feed(b, sig_b)
    got = {a: [], b: []}
    for h, f in pool.step(max_chunks=16):
        got[h].append(f)
    assert not any(len(s.pending) for s in pool._sessions.values())
    for h in (a, b):
        for h2, f in pool.close(h):
            got[h2].append(f)
    for h, sig in ((a, sig_a), (b, sig_b)):
        out = np.concatenate(got[h])
        want = computer.compute_full(sig)
        assert out.shape == want.shape
        assert np.allclose(out, want, atol=1e-8), np.abs(out - want).max()


def test_stream_pool_close_many_matches_individual_closes():
    """Batch close: one finalize dispatch for many sessions, identical
    output to per-session closes, and no cross-session leakage with a
    session that stays open."""
    computer = _computer()
    rng = np.random.RandomState(59)
    sigs = [rng.randn(int(rng.randint(2000, 6000))) for _ in range(3)]

    def run(close_batched):
        pool = StreamPool(computer, slots=4, chunk_size=800)
        handles = [pool.open() for _ in sigs]
        keep = pool.open()  # stays open; must be untouched
        pool.feed(keep, rng.randn(1000))
        for h, s in zip(handles, sigs):
            pool.feed(h, s)
        got = {h: [] for h in handles}
        if close_batched:
            for h, f in pool.close_many(handles):
                got[h].append(f)
        else:
            for h in handles:
                for h2, f in pool.close(h):
                    got[h2].append(f)
        assert len(pool._sessions[keep].pending) == 1000
        return {h: np.concatenate(fs) for h, fs in got.items()}

    a = run(True)
    b = run(False)  # fresh pools: handle ids coincide across runs
    assert sorted(a) == sorted(b)
    for h, sig in zip(sorted(a), sigs):
        want = computer.compute_full(sig)
        assert a[h].shape == want.shape
        assert np.allclose(a[h], want, atol=1e-8)
        # the two paths drain at different wide-chunk tiers (batched
        # closes share the largest backlog's width), so equality is to
        # reduction-order noise, not bit-exact
        assert np.allclose(a[h], b[h], atol=1e-10)


def test_feature_server_sustained_load_overlap():
    """Bursts large enough to form several micro-batches flow through the
    double-buffered dispatcher with per-request correctness intact."""
    computer = _computer()
    rng = np.random.RandomState(58)
    signals = [rng.randn(int(rng.randint(2000, 5000))) for _ in range(24)]
    with FeatureServer(computer, max_batch=4, max_wait_ms=5.0) as server:
        futs = [server.submit(s) for s in signals]
        outs = [f.result(timeout=120) for f in futs]
    for s, got in zip(signals, outs):
        want = computer.compute_full(s)
        assert got.shape == want.shape
        assert np.allclose(got, want, atol=1e-8)


def test_feature_server_warmup_and_single_program_per_bucket():
    """warmup() pre-builds bucket programs; with pad_batches (default)
    every micro-batch shares one compiled program per length bucket —
    varying coalesced batch sizes must not grow the program cache."""
    computer = _computer()
    rng = np.random.RandomState(61)
    with FeatureServer(computer, max_batch=8, max_wait_ms=5.0) as server:
        server.warmup([3000, 3500, 6000])  # two distinct pow2 buckets
        n_programs = len(server._extractor._fns) or len(
            getattr(computer, "_full_fns", {})
        )
        # requests at several load levels, same buckets
        outs = server.extract_many([rng.randn(3200)])
        outs += server.extract_many([rng.randn(2100) for _ in range(5)])
        outs += server.extract_many([rng.randn(5000) for _ in range(3)])
        after = len(server._extractor._fns) or len(
            getattr(computer, "_full_fns", {})
        )
        assert after == n_programs, (n_programs, after)
    for got, n in zip(outs, [3200] + [2100] * 5 + [5000] * 3):
        assert got.shape[1] == computer.num_coeffs


def test_feature_server_admission_control_and_stats():
    computer = _computer()
    rng = np.random.RandomState(63)
    # max_pending 0: every submit rejects, server stays healthy
    with FeatureServer(computer, max_wait_ms=1.0, max_pending=0) as server:
        with pytest.raises(RuntimeError, match="overloaded"):
            server.submit(rng.randn(3000))
        assert server.stats["rejected"] == 1
    # normal operation: counters add up
    sigs = [rng.randn(int(rng.randint(2000, 4000))) for _ in range(6)]
    with FeatureServer(computer, max_batch=4, max_wait_ms=5.0) as server:
        outs = server.extract_many(sigs)
    assert len(outs) == 6
    assert server.stats["submitted"] == 6
    assert server.stats["completed"] == 6
    assert server.stats["failed"] == 0
    assert 1 <= server.stats["batches"] <= 6
    assert server._pending == 0


def test_stream_pool_warmup_is_noop_on_sessions():
    computer = _computer()
    pool = StreamPool(computer, slots=2, chunk_size=800)
    pool.warmup(depths=(1, 8))
    rng = np.random.RandomState(62)
    sig = rng.randn(2400)
    h = pool.open()
    pool.feed(h, sig)
    out = [f for _, f in pool.step(max_chunks=8)]
    out += [f for _, f in pool.close(h)]
    got = np.concatenate(out)
    want = computer.compute_full(sig)
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=1e-8)


def test_stream_pool_on_mesh_matches_single_device():
    """Sessions shard over the mesh's data axis; results identical to the
    single-device pool (sessions are independent — no collectives)."""
    from speech_tpu import parallel as par

    computer = _computer()
    mesh = par.make_mesh(("data",))
    n = mesh.shape["data"]
    rng = np.random.RandomState(64)
    slots = 2 * n
    sigs = [rng.randn(int(rng.randint(2000, 6000))) for _ in range(slots)]

    def run(mesh_arg):
        pool = StreamPool(
            computer, slots=slots, chunk_size=800, mesh=mesh_arg
        )
        handles = [pool.open() for _ in sigs]
        for h, s in zip(handles, sigs):
            pool.feed(h, s)
        got = {h: [] for h in handles}
        for h, f in pool.step(max_chunks=8):
            got[h].append(f)
        for h, f in pool.close_many(handles):
            got[h].append(f)
        return {h: np.concatenate(fs) for h, fs in got.items()}

    sharded = run(mesh)
    for h, sig in zip(sorted(sharded), sigs):
        want = computer.compute_full(sig)
        assert sharded[h].shape == want.shape
        assert np.allclose(sharded[h], want, atol=1e-8), np.abs(
            sharded[h] - want
        ).max()
    with pytest.raises(ValueError):
        StreamPool(computer, slots=n + 1, chunk_size=800, mesh=mesh)


def test_stream_pool_randomized_session_lifecycles():
    """Stateful fuzz: random opens/feeds/ticks/wide-drains/closes across
    overlapping sessions; every completed session must equal
    compute_full of exactly the samples it was fed."""
    computer = _computer()
    rng = np.random.RandomState(65)
    pool = StreamPool(computer, slots=3, chunk_size=800)
    live = {}  # handle -> {"sig": [...], "out": [...]}
    completed = 0
    for step_i in range(120):
        op = rng.rand()
        if op < 0.25 and pool.capacity:
            h = pool.open()
            live[h] = {"sig": [], "out": []}
        elif op < 0.6 and live:
            h = list(live)[rng.randint(len(live))]
            n = int(rng.randint(1, 2000))
            seg = rng.randn(n)
            live[h]["sig"].append(seg)
            pool.feed(h, seg)
        elif op < 0.85:
            k = int(rng.choice([1, 4, 16]))
            for h, f in pool.step(max_chunks=k):
                live[h]["out"].append(f)
        elif live:
            h = list(live)[rng.randint(len(live))]
            for h2, f in pool.close(h):
                live[h2]["out"].append(f)
            sig = (
                np.concatenate(live[h]["sig"])
                if live[h]["sig"]
                else np.zeros(0)
            )
            want = computer.compute_full(sig)
            got = (
                np.concatenate(live[h]["out"])
                if live[h]["out"]
                else np.zeros((0, computer.num_coeffs))
            )
            assert got.shape == want.shape, (step_i, got.shape, want.shape)
            assert np.allclose(got, want, atol=1e-8), (
                step_i,
                np.abs(got - want).max(),
            )
            del live[h]
            completed += 1
    assert completed >= 10, completed  # the fuzz actually closed sessions


def test_feature_server_on_mesh():
    """The server's micro-batches shard over the data axis of a mesh."""
    from speech_tpu import parallel as par

    computer = _computer()
    mesh = par.make_mesh(("data",))
    rng = np.random.RandomState(17)
    signals = [rng.randn(int(rng.randint(3000, 6000))) for _ in range(9)]
    with FeatureServer(
        computer, mesh=mesh, max_batch=16, max_wait_ms=30.0
    ) as server:
        outs = server.extract_many(signals)
    for s, got in zip(signals, outs):
        want = computer.compute_full(s)
        assert got.shape == want.shape
        assert np.allclose(got, want, atol=1e-8)


def test_stream_pool_si_computer():
    """The pool drives SI computers through the same session contract."""
    from speech_tpu.compute import ShortIntegrationFrameComputer

    computer = ShortIntegrationFrameComputer(
        {"name": "gammatone", "scaling_function": "mel", "num_filts": 6,
         "sampling_rate": 8000},
        frame_shift_ms=10, dtype="float64",
    )
    rng = np.random.RandomState(53)
    pool = StreamPool(computer, slots=2, chunk_size=640)
    a, b = pool.open(), pool.open()
    sigs = {a: rng.randn(3000), b: rng.randn(4100)}
    got = {a: [], b: []}
    for h, s in sigs.items():
        pool.feed(h, s)
    for _ in range(10):
        for h2, f in pool.step():
            got[h2].append(f)
    for h in (a, b):
        got[h].extend(f for _, f in pool.close(h))
        out = np.concatenate(got[h])
        want = computer.compute_full(sigs[h])
        assert out.shape == want.shape
        assert np.allclose(out, want, atol=1e-8), np.abs(out - want).max()


def test_feature_server_close_resolves_stragglers():
    """A submit that slips behind the close sentinel must get an error,
    not a future that never resolves."""
    computer = _computer()
    server = FeatureServer(computer, max_wait_ms=1.0)
    # simulate the race: enqueue directly behind the stop sentinel
    from concurrent.futures import Future

    server._closed = True
    server._queue.put(None)
    straggler = Future()
    server._queue.put((np.zeros(4000), straggler))
    server._closed = False
    server.close()
    with pytest.raises(RuntimeError):
        straggler.result(timeout=30)


def test_stream_server_threaded_sessions_match_compute_full():
    """StreamServer: concurrent feeder threads; per-session results equal
    compute_full of the fed samples."""
    import threading

    from speech_tpu.serve import StreamServer

    computer = _computer()
    rng = np.random.RandomState(66)
    sigs = [rng.randn(int(rng.randint(3000, 9000))) for _ in range(4)]
    results = {}
    with StreamServer(
        computer, slots=4, chunk_size=800, max_wait_ms=2.0
    ) as server:
        handles = [server.open_session() for _ in sigs]

        def feeder(h, sig):
            i = 0
            r = np.random.RandomState(h)
            while i < len(sig):
                n = int(r.randint(200, 1500))
                server.feed(h, sig[i : i + n])
                i += n
            server.close_session(h)

        threads = [
            threading.Thread(target=feeder, args=(h, s))
            for h, s in zip(handles, sigs)
        ]
        for t in threads:
            t.start()
        # consume results concurrently with feeding
        for h in handles:
            results[h] = list(server.iter_results(h))
        for t in threads:
            t.join()
    for h, sig in zip(handles, sigs):
        got = np.concatenate(results[h])
        want = computer.compute_full(sig)
        assert got.shape == want.shape, (got.shape, want.shape)
        assert np.allclose(got, want, atol=1e-8), np.abs(got - want).max()


def test_stream_server_lifecycle_errors():
    from speech_tpu.serve import StreamServer

    computer = _computer()
    with StreamServer(computer, slots=1, chunk_size=800) as server:
        h = server.open_session()
        with pytest.raises(RuntimeError):  # pool full
            server.open_session()
        server.feed(h, np.random.RandomState(0).randn(1000))
        server.close_session(h)
        assert len(list(server.iter_results(h))) >= 1
        h2 = server.open_session()  # slot reusable after close
        server.close_session(h2)
        with pytest.raises(ValueError):
            server.feed(h2, np.zeros((2, 2)))
    with pytest.raises(RuntimeError):
        server.open_session()


def test_stream_pool_occupancy_tiered_ticks():
    """Partial-occupancy ticks (the slot-tiered gather/scatter path) must
    match compute_full, leave idle open sessions' states bitwise
    untouched, and compile one program per (slot-tier, depth) pair."""
    import jax

    computer = _computer()
    rng = np.random.RandomState(57)
    pool = StreamPool(computer, slots=16, chunk_size=800)
    assert pool._tiered_step is not None

    # an idle open session whose state must never drift while others tick
    idle = pool.open()
    idle_sig = rng.randn(1500)
    idle_frames = 0
    pool.feed(idle, idle_sig)
    while len(pool._sessions[idle].pending):
        for _, feats in pool.step():
            idle_frames += feats.shape[0]
    idle_state = jax.tree_util.tree_map(
        lambda a: np.asarray(a[pool._sessions[idle].slot]), pool._states
    )

    signals = {}
    got = {}
    for m in (1, 2, 3, 5):  # tiers 1, 2, 4, 8 — all below slots=16
        handles = [pool.open() for _ in range(m)]
        for h in handles:
            signals[h] = rng.randn(int(rng.randint(2000, 5000)))
            got[h] = []
        cursors = {h: 0 for h in handles}
        while any(cursors[h] < len(signals[h]) for h in handles):
            for h in handles:
                n = int(rng.randint(1, 1100))
                pool.feed(h, signals[h][cursors[h] : cursors[h] + n])
                cursors[h] += n
            for h2, feats in pool.step():
                assert h2 != idle
                got[h2].append(feats)
        for h2, feats in pool.close_many(handles):
            got[h2].append(feats)

    for h, s in signals.items():
        out = np.concatenate(got[h]) if got[h] else np.zeros((0, 10))
        want = computer.compute_full(s)
        assert out.shape == want.shape, (out.shape, want.shape)
        assert np.allclose(out, want, atol=1e-8), np.abs(out - want).max()

    # the idle session's state is bitwise what it was before the ticks
    after = jax.tree_util.tree_map(
        lambda a: np.asarray(a[pool._sessions[idle].slot]), pool._states
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(idle_state), jax.tree_util.tree_leaves(after)
    ):
        assert np.array_equal(a, b)
    # and it still finishes correctly afterwards (drained + flushed
    # frames total the full-signal frame count)
    idle_frames += sum(f.shape[0] for _, f in pool.close(idle))
    assert idle_frames == computer.compute_full(idle_sig).shape[0]

    # program count: tiers {1, 2, 4, 8} x depths seen, not per active-set
    steps = pool._tiered_step._cache_size()
    assert steps <= 12, steps


def test_feature_server_pow2_batch_tiers():
    """pad_batches='pow2' pads micro-batches to the next power of two:
    device time follows load, warmup([..]) pre-builds every tier, and
    varied load levels afterwards compile nothing new."""
    computer = _computer()
    rng = np.random.RandomState(67)
    with FeatureServer(
        computer, max_batch=8, max_wait_ms=5.0, pad_batches="pow2"
    ) as server:
        server.warmup([3000])  # one bucket, tiers 1/2/4/8
        n_programs = len(server._extractor._fns)
        outs = server.extract_many([rng.randn(3200)])
        outs += server.extract_many([rng.randn(2100) for _ in range(3)])
        outs += server.extract_many([rng.randn(2500) for _ in range(8)])
        assert len(server._extractor._fns) == n_programs
    for got, n in zip(outs, [3200] + [2100] * 3 + [2500] * 8):
        assert got.shape[1] == computer.num_coeffs
    # numeric parity at one load level
    sig = rng.randn(3000)
    with FeatureServer(
        computer, max_batch=8, pad_batches="pow2"
    ) as server:
        out = server.extract(sig)
    assert np.allclose(out, computer.compute_full(sig), atol=1e-8)
    with pytest.raises(ValueError):
        FeatureServer(computer, pad_batches="nope")


def test_stream_server_step_error_fails_sessions_terminally():
    """A failing device tick must deliver ONE exception per involved
    session, drop those backlogs (no retry flood), keep the loop alive
    for other work, and leave close_session functional."""
    import time

    from speech_tpu.serve import StreamServer

    computer = _computer()
    with StreamServer(
        computer, slots=2, chunk_size=800, max_wait_ms=1.0
    ) as server:
        h = server.open_session()
        boom = RuntimeError("device exploded")
        orig_step = server._pool.step
        server._pool.step = lambda **kw: (_ for _ in ()).throw(boom)
        server.feed(h, np.random.RandomState(0).randn(4000))
        with pytest.raises(RuntimeError, match="device exploded"):
            for _ in server.iter_results(h):
                pass
        # retry raises KeyError (the stream ended), never blocks
        with pytest.raises(KeyError):
            next(iter(server.iter_results(h)))
        # the backlog was dropped: no repeated ticks fail once restored
        time.sleep(0.05)
        server._pool.step = orig_step
        assert len(server._pool._sessions[h].pending) == 0
        server.close_session(h)  # finalizes from the last good state
        # loop thread still alive: a fresh session works end to end
        sig = np.random.RandomState(1).randn(3000)
        h2 = server.open_session()
        server.feed(h2, sig)
        server.close_session(h2)
        out = np.concatenate(list(server.iter_results(h2)))
        assert np.allclose(out, computer.compute_full(sig), atol=1e-8)


def test_stream_server_feed_validates_at_caller():
    from speech_tpu.serve import StreamServer

    computer = _computer()
    with StreamServer(computer, slots=1, chunk_size=800) as server:
        h = server.open_session()
        with pytest.raises(TypeError):
            server.feed(h, np.array(["a", "b"]))
        with pytest.raises(TypeError):
            server.feed(h, np.zeros(4, np.complex64))
        sig = np.random.RandomState(2).randn(2000)
        server.feed(h, sig)
        server.close_session(h)
        out = np.concatenate(list(server.iter_results(h)))
        assert np.allclose(out, computer.compute_full(sig), atol=1e-8)


def test_stream_server_warmup():
    """warmup() pre-builds tick programs through the loop thread and a
    warmed server still streams correctly."""
    from speech_tpu.serve import StreamServer

    computer = _computer()
    with StreamServer(
        computer, slots=4, chunk_size=800, tick_chunks=4
    ) as server:
        server.warmup(occupancies=(1, 2))  # depths default to 1/2/4
        sig = np.random.RandomState(7).randn(3000)
        h = server.open_session()
        server.feed(h, sig)
        server.close_session(h)
        out = np.concatenate(list(server.iter_results(h)))
        assert np.allclose(out, computer.compute_full(sig), atol=1e-8)


def test_feature_server_int16_submissions_match_float():
    """int16 PCM submissions ship compactly through the micro-batcher and
    match float submissions bitwise (warmup can pre-build the int16-input
    programs)."""
    computer = _computer()
    rng = np.random.RandomState(13)
    sigs_i = [
        (rng.randn(int(rng.randint(3000, 9000))) * 1000).astype(np.int16)
        for _ in range(6)
    ]
    with FeatureServer(computer, max_batch=4, max_wait_ms=5.0) as server:
        server.warmup([4096, 8192], dtype=np.int16)
        got_i = server.extract_many(sigs_i)
        got_f = server.extract_many([s.astype(np.float64) for s in sigs_i])
    for a, b in zip(got_i, got_f):
        assert a.dtype == b.dtype
        assert np.array_equal(a, b)
