"""AOT executable store (speech_tpu.aot) — cold-start elimination.

The contract: any program one process compiled, a *fresh* process (or a
fresh extractor/server) loads from disk and runs with ZERO XLA compiles.
The zero-compile claims are enforced hard — `jax.stages.Lowered.compile`
is monkeypatched to raise, so a silent fallback to compilation fails the
test rather than hiding a broken cache key.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_tpu.aot import AOTCache, precompile_extractor
from speech_tpu.compute import STFTFrameComputer
from speech_tpu.parallel import ShardedExtractor, make_mesh
from speech_tpu.serve import FeatureServer

CFG = {"name": "fbank", "num_filts": 12, "sampling_rate": 8000}


def _entries(directory):
    """Stored executable paths (entries live under per-fingerprint
    subdirectories so prune() can sweep orphans)."""
    found = []
    for root, _, files in os.walk(directory):
        found.extend(
            os.path.join(root, f) for f in files if f.endswith(".jaxexe")
        )
    return sorted(found)


def _computer():
    return STFTFrameComputer(
        CFG, frame_length_ms=25, frame_shift_ms=10, dtype="float64"
    )


def _forbid_compile(monkeypatch):
    from jax._src import stages

    def boom(self, *a, **k):
        raise AssertionError("XLA compile attempted on a warmed AOT store")

    monkeypatch.setattr(stages.Lowered, "compile", boom)


def test_cache_roundtrip_and_stats(tmp_path):
    cache = AOTCache(str(tmp_path))
    jitted = jax.jit(lambda x: jnp.sin(x) * 3)
    x = np.ones((4, 8))
    fn = cache.wrap(jitted)
    out1 = np.asarray(fn(x))
    assert cache.stats == {"hits": 0, "misses": 1, "errors": 0, "fallbacks": 0, "evicted": 0, "orphans_removed": 0}
    # a fresh cache+wrapper over the same dir: pure hit
    cache2 = AOTCache(str(tmp_path))
    fn2 = cache2.wrap(jax.jit(lambda x: jnp.sin(x) * 3))
    out2 = np.asarray(fn2(x))
    assert cache2.stats["hits"] == 1 and cache2.stats["misses"] == 0
    assert np.array_equal(out1, out2)
    assert len(_entries(tmp_path)) == 1


def test_key_changes_with_constants(tmp_path):
    """The StableHLO key embeds closed-over weights: different constants
    can never collide (no stale-weights hazard)."""
    cache = AOTCache(str(tmp_path))
    x = np.ones((4,))
    for scale in (2.0, 3.0):
        fn = cache.wrap(jax.jit(lambda x, s=scale: x * s))
        assert np.allclose(np.asarray(fn(x)), scale)
    assert cache.stats["misses"] == 2
    assert len(_entries(tmp_path)) == 2


def test_corrupt_entry_falls_back(tmp_path):
    cache = AOTCache(str(tmp_path))
    jitted = jax.jit(lambda x: x + 1)
    fn = cache.wrap(jitted)
    x = np.zeros((3,))
    fn(x)
    (path,) = map(__import__("pathlib").Path, _entries(tmp_path))
    path.write_bytes(b"not a pickle")
    cache2 = AOTCache(str(tmp_path))
    out = np.asarray(cache2.wrap(jax.jit(lambda x: x + 1))(x))
    assert np.allclose(out, 1.0)
    assert cache2.stats["errors"] == 1 and cache2.stats["misses"] == 1
    # and the entry was repaired in place
    cache3 = AOTCache(str(tmp_path))
    cache3.wrap(jax.jit(lambda x: x + 1))(x)
    assert cache3.stats["hits"] == 1


def test_extractor_warm_store_zero_compiles(tmp_path, monkeypatch):
    computer = _computer()
    ex = ShardedExtractor(computer, aot_dir=str(tmp_path))
    lengths = [1000, 1700, 3000]
    precompile_extractor(ex, lengths, batches=[4], dtypes=[np.float64])
    assert ex.aot.stats["misses"] > 0

    # fresh extractor over the warmed store: every program deserializes
    rng = np.random.RandomState(3)
    signals = [rng.randn(n) for n in (900, 1500, 2800, 2048)]
    wants = [_computer().compute_full(s) for s in signals]  # pre-ban oracle
    ex2 = ShardedExtractor(_computer(), aot_dir=str(tmp_path))
    _forbid_compile(monkeypatch)
    feats = ex2.extract(signals, min_batch=4)
    assert ex2.aot.stats["misses"] == 0 and ex2.aot.stats["hits"] > 0
    assert ex2.aot.stats["fallbacks"] == 0
    for want, f in zip(wants, feats):
        assert np.allclose(f, want, atol=1e-10), np.abs(f - want).max()


def test_extractor_mesh_warm_store_zero_compiles(tmp_path, monkeypatch):
    mesh = make_mesh(("data",))
    computer = _computer()
    ex = ShardedExtractor(computer, mesh=mesh, aot_dir=str(tmp_path))
    precompile_extractor(ex, [2000], batches=[8], dtypes=[np.float64])

    rng = np.random.RandomState(4)
    signals = [rng.randn(n) for n in (1200, 2000, 1024, 1999) * 2]
    wants = [_computer().compute_full(s) for s in signals]  # pre-ban oracle
    ex2 = ShardedExtractor(_computer(), mesh=mesh, aot_dir=str(tmp_path))
    _forbid_compile(monkeypatch)
    feats = ex2.extract(signals, min_batch=8)
    assert ex2.aot.stats["misses"] == 0 and ex2.aot.stats["fallbacks"] == 0
    for want, f in zip(wants, feats):
        assert np.allclose(f, want, atol=1e-10)


def test_enable_aot_invalidates_prewired_programs(tmp_path):
    """Programs jitted BEFORE enable_aot must re-enter through the store,
    or a bucket exercised pre-wiring would never be serialized and a
    'warmed' store would still cold-compile it elsewhere."""
    computer = _computer()
    rng = np.random.RandomState(12)
    signals = np.stack([rng.randn(1600) for _ in range(2)])
    lengths = np.full((2,), 1600, np.int32)
    computer.compute_batch(signals, lengths)  # bare jit, cached
    computer.enable_aot(str(tmp_path))
    computer.compute_batch(signals, lengths)  # must go through the store
    assert computer._aot.stats["misses"] > 0
    assert len(_entries(tmp_path)) > 0


def test_aot_dir_accepts_shared_cache_instance(tmp_path):
    """Every aot_dir parameter accepts an existing AOTCache, so serving
    objects can share one store and one stats block."""
    from speech_tpu.serve import StreamPool

    cache = AOTCache(str(tmp_path))
    ex = ShardedExtractor(_computer(), aot_dir=cache)
    assert ex.aot is cache
    pool = StreamPool(_computer(), slots=2, chunk_size=800, aot_dir=cache)
    assert pool.aot is cache
    c = _computer()
    c.enable_aot(cache)
    assert c._aot is cache


def test_si_computer_warm_store_zero_compiles(tmp_path, monkeypatch):
    """The SI computer's compute_batch path (which ShardedExtractor
    defers to unsharded) is AOT-backed via enable_aot — a fresh computer
    over the warmed store serves with zero compiles."""
    from speech_tpu.compute import ShortIntegrationFrameComputer

    def si():
        return ShortIntegrationFrameComputer(
            {
                "name": "gammatone",
                "scaling_function": "mel",
                "num_filts": 6,
                "sampling_rate": 8000,
            },
            frame_shift_ms=10,
            dtype="float64",
        )

    c1 = si()
    ex = ShardedExtractor(c1, aot_dir=str(tmp_path))
    rng = np.random.RandomState(8)
    signals = [rng.randn(n) for n in (1500, 2000)]
    want = ex.extract(signals)
    assert ex.aot.stats["misses"] > 0

    c2 = si()
    ex2 = ShardedExtractor(c2, aot_dir=str(tmp_path))
    _forbid_compile(monkeypatch)
    got = ex2.extract(signals)
    assert ex2.aot.stats["misses"] == 0 and ex2.aot.stats["fallbacks"] == 0
    assert ex2.aot.stats["hits"] > 0
    for a, b in zip(want, got):
        assert np.array_equal(a, b)


def test_si_with_postprocessors_warm_store_zero_compiles(
    tmp_path, monkeypatch
):
    """The deferred SI path WITH a fused post chain: the post-chain
    program (a separate jit on this branch) must ride the store too —
    it was the one compile the zero-compile contract missed."""
    from speech_tpu.compute import ShortIntegrationFrameComputer
    from speech_tpu.post import Deltas

    def make():
        c = ShortIntegrationFrameComputer(
            {
                "name": "gammatone",
                "scaling_function": "mel",
                "num_filts": 6,
                "sampling_rate": 8000,
            },
            frame_shift_ms=10,
            dtype="float64",
        )
        return ShardedExtractor(
            c, postprocessors=[Deltas(1)], aot_dir=str(tmp_path)
        )

    rng = np.random.RandomState(13)
    signals = [rng.randn(1800)]
    want = make().extract(signals)

    ex2 = make()
    _forbid_compile(monkeypatch)
    got = ex2.extract(signals)
    assert ex2.aot.stats["misses"] == 0 and ex2.aot.stats["fallbacks"] == 0
    assert np.array_equal(want[0], got[0])


def test_feature_server_warm_store_zero_compiles(tmp_path, monkeypatch):
    computer = _computer()
    with FeatureServer(
        computer, max_batch=4, aot_dir=str(tmp_path)
    ) as server:
        server.warmup([1500], dtype=np.float64)
        assert server._extractor.aot.stats["misses"] > 0

    rng = np.random.RandomState(5)
    sig = rng.randn(1400)
    want = _computer().compute_full(sig)  # pre-ban oracle
    with FeatureServer(
        _computer(), max_batch=4, aot_dir=str(tmp_path)
    ) as server:
        _forbid_compile(monkeypatch)
        server.warmup([1500], dtype=np.float64)
        got = server.extract(sig)
        aot = server._extractor.aot
        assert aot.stats["misses"] == 0 and aot.stats["fallbacks"] == 0
    assert np.allclose(got, want, atol=1e-10)


def test_pitch_appender_warm_store_zero_compiles(tmp_path, monkeypatch):
    """The --pitch appender's bucket programs ride the shared AOT store
    (covered by --precompile when --pitch is set)."""
    from speech_tpu.command_line import _PitchAppender

    computer = _computer()

    def appender():
        p = _PitchAppender(
            computer, {"min_f0": 80.0, "max_f0": 300.0}
        )
        p.aot = AOTCache(str(tmp_path))
        return p

    rng = np.random.RandomState(10)
    sigs = [np.sin(2 * np.pi * 150 * np.arange(6000) / 8000.0)
            + 0.05 * rng.randn(6000) for _ in range(2)]
    p1 = appender()
    want = p1.batch(sigs)
    assert p1.aot.stats["misses"] > 0

    p2 = appender()
    _forbid_compile(monkeypatch)
    got = p2.batch(sigs)
    assert p2.aot.stats["misses"] == 0 and p2.aot.stats["fallbacks"] == 0
    for a, b in zip(want, got):
        assert np.array_equal(a, b)

    # a trailing PARTIAL batch reuses the full batches' program when
    # min_batch is set (the CLI sets it to --batch-size): still zero
    # compiles, and the solo result matches its full-batch row
    p2.min_batch = 2
    solo = p2.batch(sigs[:1])
    assert p2.aot.stats["misses"] == 0 and p2.aot.stats["fallbacks"] == 0
    assert np.array_equal(solo[0], got[0])


def test_stream_pool_warm_store_zero_compiles(tmp_path, monkeypatch):
    """StreamPool(aot_dir=...): the vmapped tick/finalize (and the
    occupancy-tiered) programs deserialize from a warmed store — a fresh
    pool's warmup performs zero compiles, and streamed features match
    the first pool's bit-for-bit."""
    from speech_tpu.serve import StreamPool

    rng = np.random.RandomState(9)
    sig = rng.randn(4000)

    def drain(pool):
        h = pool.open()
        pool.feed(h, sig)
        blocks = []
        while True:
            out = dict(pool.step(max_chunks=4))
            if h in out and len(out[h]):
                blocks.append(np.asarray(out[h]))
            if not len(pool._sessions[h].pending):
                break
        blocks += [np.asarray(f) for hh, f in pool.close(h) if hh == h]
        return np.concatenate([b for b in blocks if b.size], axis=0)

    pool1 = StreamPool(_computer(), slots=4, chunk_size=800,
                       aot_dir=str(tmp_path))
    pool1.warmup(depths=(1, 4), occupancies=(1,))
    want = drain(pool1)
    assert pool1.aot.stats["misses"] > 0

    pool2 = StreamPool(_computer(), slots=4, chunk_size=800,
                       aot_dir=str(tmp_path))
    _forbid_compile(monkeypatch)
    pool2.warmup(depths=(1, 4), occupancies=(1,))
    got = drain(pool2)
    assert pool2.aot.stats["misses"] == 0
    assert pool2.aot.stats["fallbacks"] == 0
    assert pool2.aot.stats["hits"] > 0
    assert np.array_equal(want, got)


def test_cli_precompile_then_zero_compile_run(tmp_path):
    """--precompile populates the store; the real run in a FRESH process
    performs zero compiles (asserted via the subprocess's own cache
    stats surfaced through AOT hit counting)."""
    import json

    import torch

    import wave

    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    rng = np.random.RandomState(6)
    map_path = tmp_path / "map.txt"
    with open(map_path, "w") as mf:
        for i in range(5):
            sig = (rng.randn(rng.randint(800, 2400)) * 3000).astype(np.int16)
            path = str(wav_dir / f"utt{i}.wav")
            with wave.open(path, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(8000)
                w.writeframes(sig.tobytes())
            mf.write(f"utt{i} {path}\n")
    cfg = tmp_path / "computer.json"
    cfg.write_text(
        json.dumps(
            {
                "name": "stft",
                "bank": CFG,
                "frame_length_ms": 25,
                "frame_shift_ms": 10,
            }
        )
    )
    out_dir = tmp_path / "feats"
    aot_dir = tmp_path / "aot"

    from speech_tpu.command_line import signals_to_torch_feat_dir

    base = [
        str(map_path),
        str(cfg),
        str(out_dir),
        "--batch-size",
        "4",
        "--aot-dir",
        str(aot_dir),
    ]
    assert signals_to_torch_feat_dir(base + ["--precompile"]) == 0
    assert len(_entries(aot_dir)) > 0
    assert not os.path.isdir(out_dir) or not os.listdir(out_dir)

    # real run in a fresh process; forbid compiles via sitecustomize-style
    # patch injected through a -c driver
    n_dev = len(jax.devices())
    code = (
        "import jax\n"
        # match the pytest process's backend exactly (the AOT fingerprint
        # covers platform/device-count — a mismatch would be a miss)
        "jax.config.update('jax_platforms', 'cpu')\n"
        f"jax.config.update('jax_num_cpu_devices', {n_dev})\n"
        "jax.config.update('jax_enable_x64', True)\n"
        "from jax._src import stages\n"
        "def boom(self, *a, **k):\n"
        "    raise AssertionError('compile on warmed store')\n"
        "stages.Lowered.compile = boom\n"
        "from speech_tpu.command_line import signals_to_torch_feat_dir\n"
        f"import sys; sys.exit(signals_to_torch_feat_dir({base!r}))\n"
    )
    env = dict(os.environ)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr
    assert len(os.listdir(out_dir)) == 5
    # outputs match the oracle
    computer = _computer()
    import speech_tpu.io as stio

    for i in range(5):
        sig = stio.read_signal(str(wav_dir / f"utt{i}.wav"), dtype=np.float64)
        got = torch.load(str(out_dir / f"utt{i}.pt")).numpy()
        want = computer.compute_full(sig)
        assert np.allclose(got, want, atol=1e-4), np.abs(got - want).max()


def test_prune_evicts_lru_past_cap(tmp_path):
    """Fill past a byte cap: oldest-used entries evicted, recently used
    survive; stats updated (VERDICT r4 item 6)."""
    import time as _time

    cache = AOTCache(str(tmp_path))
    x = np.ones((4,))
    for scale in (2.0, 3.0, 4.0, 5.0):
        cache.wrap(jax.jit(lambda x, s=scale: x * s))(x)
    entries = _entries(tmp_path)
    assert len(entries) == 4
    sizes = {p: os.path.getsize(p) for p in entries}
    per = max(sizes.values())
    # age entries by mtime/atime so LRU order is deterministic, oldest
    # first in creation order
    now = _time.time()
    for age, p in enumerate(sorted(entries, key=os.path.getmtime)):
        os.utime(p, (now - 400 + age * 100, now - 400 + age * 100))
    ordered = sorted(entries, key=os.path.getmtime)
    res = cache.prune(max_bytes=2 * per + 1)
    assert res["evicted"] == 2 and cache.stats["evicted"] == 2
    left = set(_entries(tmp_path))
    assert left == set(ordered[2:])  # newest two survive
    # a hit refreshes the LRU clock: touch the older survivor, cap to one
    old, new = sorted(left, key=os.path.getmtime)
    os.utime(old, None)
    _time.sleep(0.01)
    res = cache.prune(max_bytes=per + 1)
    assert res["evicted"] == 1
    assert set(_entries(tmp_path)) == {old}


def test_prune_sweeps_stale_fingerprint_orphans(tmp_path):
    """Entries under a different fingerprint's subdirectory can never be
    served again in this environment; prune removes them entirely."""
    cache = AOTCache(str(tmp_path))
    cache.wrap(jax.jit(lambda x: x + 1))(np.zeros((3,)))
    stale = tmp_path / "fp-0123456789abcdef"
    stale.mkdir()
    (stale / "deadbeef.jaxexe").write_bytes(b"x" * 100)
    (stale / "junk.tmp").write_bytes(b"y")
    res = cache.prune()
    assert res["orphans_removed"] == 2
    assert not stale.exists()
    # the live entry survived and still serves
    cache2 = AOTCache(str(tmp_path))
    cache2.wrap(jax.jit(lambda x: x + 1))(np.zeros((3,)))
    assert cache2.stats["hits"] == 1


def test_max_bytes_autoprunes_on_write(tmp_path):
    cache = AOTCache(str(tmp_path), max_bytes=1)  # everything over cap
    x = np.ones((4,))
    for scale in (2.0, 3.0, 4.0):
        cache.wrap(jax.jit(lambda x, s=scale: x * s))(x)
    # each write prunes to the cap: at most one entry ever remains
    assert len(_entries(tmp_path)) <= 1
    assert cache.stats["evicted"] >= 2


def test_world_writable_store_rejected_or_tightened(tmp_path):
    """Entries are pickles: a group/other-writable store directory is a
    code-execution hazard.  Owned dirs are chmod-tightened (warned);
    (un-owned ones are rejected — not constructible in a test)."""
    d = tmp_path / "store"
    d.mkdir()
    os.chmod(d, 0o777)
    AOTCache(str(d))
    assert (os.stat(d).st_mode & 0o077) == 0


def test_fingerprint_covers_xla_flags(tmp_path, monkeypatch):
    """Two processes with different XLA_FLAGS must not share codegen."""
    cache = AOTCache(str(tmp_path))
    fp1 = cache._fingerprint()
    monkeypatch.setenv("XLA_FLAGS", "--xla_some_flag=true")
    fp2 = cache._fingerprint()
    assert fp1 != fp2


def test_cli_aot_prune(tmp_path, capsys):
    """--aot-prune sweeps/evicts and exits 0 without feature work."""
    from speech_tpu.command_line import signals_to_torch_feat_dir

    cache = AOTCache(str(tmp_path / "store"))
    cache.wrap(jax.jit(lambda x: x * 2))(np.ones((4,)))
    stale = tmp_path / "store" / "fp-feedfacefeedface"
    stale.mkdir()
    (stale / "old.jaxexe").write_bytes(b"x")
    map_file = tmp_path / "map.txt"
    map_file.write_text("")
    rc = signals_to_torch_feat_dir(
        [
            str(map_file),
            '{"name": "stft", "bank": {"name": "fbank", "num_filts": 4, '
            '"sampling_rate": 8000}}',
            str(tmp_path / "out"),
            "--aot-dir",
            str(tmp_path / "store"),
            "--aot-prune",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "1 orphan(s) swept" in out
    assert not stale.exists()
    assert len(_entries(tmp_path / "store")) == 1


def test_cli_precompile_sizes_from_headers(tmp_path, monkeypatch):
    """The --precompile scan must size its grid from container headers
    for wav/sphere/npy corpora — decoding audio only to learn lengths is
    the slow path (ADVICE r4).  Enforced by making read_signal raise."""
    import json
    import wave

    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    rng = np.random.RandomState(9)
    map_path = tmp_path / "map.txt"
    with open(map_path, "w") as mf:
        for i in range(3):
            sig = (rng.randn(1000 + 700 * i) * 3000).astype(np.int16)
            path = str(wav_dir / f"utt{i}.wav")
            with wave.open(path, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(8000)
                w.writeframes(sig.tobytes())
            mf.write(f"utt{i} {path}\n")
    cfg = tmp_path / "computer.json"
    cfg.write_text(
        json.dumps(
            {
                "name": "stft",
                "bank": CFG,
                "frame_length_ms": 25,
                "frame_shift_ms": 10,
            }
        )
    )
    import speech_tpu.command_line as cl

    def boom(*a, **k):
        raise AssertionError(
            "read_signal called during --precompile header scan"
        )

    monkeypatch.setattr(cl, "read_signal", boom)
    rc = cl.signals_to_torch_feat_dir(
        [
            str(map_path),
            str(cfg),
            str(tmp_path / "out"),
            "--batch-size",
            "2",
            "--aot-dir",
            str(tmp_path / "aot"),
            "--precompile",
        ]
    )
    assert rc == 0
    assert len(_entries(tmp_path / "aot")) > 0
