"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import os
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_tpu.compute import STFTFrameComputer
from speech_tpu import parallel as par
from speech_tpu.ops import framing as framing_ops
from speech_tpu import nn as stpu_nn


@pytest.fixture(scope="module")
def computer():
    return STFTFrameComputer(
        {"name": "fbank", "num_filts": 40, "sampling_rate": 16000},
        frame_length_ms=25,
        frame_shift_ms=10,
        dtype="float64",
    )


def test_mesh_shapes():
    mesh = par.make_mesh(("data",))
    assert mesh.shape["data"] == len(jax.devices())
    mesh = par.make_mesh(("data", "filt"), shape=(-1, 2))
    assert mesh.shape["data"] * mesh.shape["filt"] == len(jax.devices())
    with pytest.raises(ValueError):
        par.make_mesh(("data",), shape=(3,))


@pytest.mark.parametrize("frame_style", ["causal", "centered"])
def test_halo_framing_matches_single_device(computer, frame_style):
    mesh = par.make_mesh(("t",))
    n = mesh.shape["t"]
    frame_length, frame_shift = computer.frame_length, computer.frame_shift
    pad_left = framing_ops.left_pad_width(
        frame_style, frame_length, frame_shift, False
    )
    rng = np.random.RandomState(5)
    sig_len = n * frame_shift * 8
    signal = rng.randn(sig_len)
    got = par.halo_frame_signal(
        jnp.asarray(signal), mesh, "t", frame_length, frame_shift, pad_left
    )
    want = framing_ops.frame_signal(
        jnp.asarray(signal),
        sig_len,
        sig_len // frame_shift,
        frame_length,
        frame_shift,
        pad_left,
    )
    assert np.allclose(np.asarray(got), np.asarray(want))


def test_sharded_stft_feats_match_compute_full(computer):
    mesh = par.make_mesh(("t",))
    n = mesh.shape["t"]
    rng = np.random.RandomState(6)
    sig_len = n * computer.frame_shift * 16
    signal = rng.randn(sig_len)
    got = np.asarray(par.sharded_stft_feats(computer, jnp.asarray(signal), mesh, "t"))
    want = computer.compute_full(signal)
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=1e-8)


def test_sharded_extractor_matches_compute_full(computer):
    mesh = par.make_mesh(("data",))
    ex = par.ShardedExtractor(computer, mesh)
    rng = np.random.RandomState(7)
    signals = [rng.randn(rng.randint(800, 4000)) for _ in range(11)]
    got = ex.extract(signals)
    for sig, feats in zip(signals, got):
        want = computer.compute_full(sig)
        assert feats.shape == want.shape
        assert np.allclose(feats, want, atol=1e-8), np.abs(feats - want).max()


def test_sharded_extractor_static_fast_path(computer):
    """Host-known all-full buckets take the static-padding program on the
    mesh too (round-2 gap: only the single-chip compute_batch had it) and
    match the traced-length path exactly."""
    mesh = par.make_mesh(("data",))
    ex = par.ShardedExtractor(computer, mesh)
    rng = np.random.RandomState(9)
    batch = ex.batch_multiple * 2
    max_len = 4096
    signals = rng.randn(batch, max_len)
    lengths = np.full(batch, max_len, np.int64)
    feats_full, counts_full = ex.extract_batch(signals, lengths)
    assert any(k[2] for k in ex._fns), "static fast path not compiled"
    # traced-lengths program must agree
    feats_traced, counts_traced = ex.extract_batch(
        signals, jnp.asarray(lengths)
    )
    assert np.array_equal(np.asarray(counts_full), np.asarray(counts_traced))
    assert np.allclose(
        np.asarray(feats_full), np.asarray(feats_traced), atol=1e-10
    )
    # per-signal oracle
    for i in (0, batch - 1):
        want = computer.compute_full(signals[i])
        got = np.asarray(feats_full[i, : int(counts_full[i])])
        assert got.shape == want.shape
        assert np.allclose(got, want, atol=1e-8)


def test_accumulate_stats_matches_reference(computer, reference_speech):
    from pydrobert.speech.post import Standardize as RefStandardize

    rng = np.random.RandomState(8)
    feats = rng.randn(8, 20, 13)
    counts = rng.randint(1, 21, size=8)
    ref = RefStandardize()
    for f, c in zip(feats, counts):
        ref.accumulate(f[:c])
    got = np.asarray(par.accumulate_stats(feats, counts))
    assert np.allclose(got, ref._stats)
    mesh = par.make_mesh(("data",))
    got_sharded = np.asarray(
        par.accumulate_stats_sharded(feats, counts, mesh)
    )
    assert np.allclose(got_sharded, ref._stats)
    # accumulation onto existing stats
    got2 = np.asarray(par.accumulate_stats(feats, counts, stats=got))
    assert np.allclose(got2, 2 * ref._stats)


def test_frontend_matches_computer(computer):
    frontend = stpu_nn.STFTFrontend(computer, dtype=jnp.float64)
    params, consts = frontend.init()
    rng = np.random.RandomState(9)
    signals = np.stack([rng.randn(3200) for _ in range(4)])
    lengths = np.array([3200, 3000, 2500, 3200], dtype=np.int32)
    feats = np.asarray(frontend.apply(params, consts, signals, lengths))
    counts = np.asarray(frontend.frame_counts(lengths))
    for i in range(4):
        want = computer.compute_full(signals[i, : lengths[i]])
        assert counts[i] == want.shape[0]
        assert np.allclose(feats[i, : counts[i]], want, atol=1e-8)


def test_frontend_gradients_finite(computer):
    frontend = stpu_nn.STFTFrontend(computer, dtype=jnp.float64)
    params, consts = frontend.init()
    rng = np.random.RandomState(10)
    signals = jnp.asarray(rng.randn(2, 1600))

    def loss(p):
        feats = frontend.apply(p, consts, signals)
        return jnp.mean(feats ** 2)

    grads = jax.grad(loss)(params)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))
        assert np.abs(np.asarray(leaf)).max() > 0


def test_frontend_f32_gradients_flow(computer):
    """float32 frontend gradients must be nonzero AND track the float64
    ones: the production f32 log (ops/xmath.log32) splits bits with
    bitcast ops that block autodiff, so without its custom JVP every
    gradient through the feature log was silently zero (regression)."""
    rng = np.random.RandomState(12)
    signals = rng.randn(2, 1600)
    grads = {}
    for dtype in (jnp.float32, jnp.float64):
        frontend = stpu_nn.STFTFrontend(computer, dtype=dtype)
        params, consts = frontend.init()

        def loss(p):
            return jnp.mean(
                frontend.apply(p, consts, jnp.asarray(signals, dtype)) ** 2
            )

        grads[dtype] = jax.grad(loss)(params)
    for key in grads[jnp.float64]:
        g32 = np.asarray(grads[jnp.float32][key], np.float64)
        g64 = np.asarray(grads[jnp.float64][key])
        scale = max(np.abs(g64).max(), 1e-30)
        assert np.abs(g32 - g64).max() < 1e-3 * scale, key


def test_frontend_sharded_train_step(computer):
    """A dp x filt sharded gradient step compiles and runs on the mesh."""
    mesh = par.make_mesh(("data", "filt"), shape=(-1, 2))
    frontend = stpu_nn.STFTFrontend(computer, dtype=jnp.float64)
    params, consts = frontend.init()
    dp = par.named_sharding(mesh, "data")
    wspec = par.named_sharding(mesh, None, "filt")
    params = {
        "window": jax.device_put(params["window"], par.named_sharding(mesh)),
        "weights": jax.device_put(params["weights"], wspec),
    }
    rng = np.random.RandomState(11)
    signals = jax.device_put(
        jnp.asarray(rng.randn(8, 1600)), par.named_sharding(mesh, "data", None)
    )

    @jax.jit
    def step(params, signals):
        def loss(p):
            feats = frontend.apply(p, consts, signals)
            return jnp.mean(feats ** 2)

        l, g = jax.value_and_grad(loss)(params)
        new = jax.tree_util.tree_map(lambda p, g: p - 1e-3 * g, params, g)
        return l, new

    l, new_params = step(params, signals)
    del dp
    assert np.isfinite(float(l))
    assert new_params["weights"].shape == params["weights"].shape


def test_extract_iter_double_buffered(computer):
    ex = par.ShardedExtractor(computer)
    rng = np.random.RandomState(12)
    batches = [[rng.randn(rng.randint(800, 2000)) for _ in range(3)] for _ in range(3)]
    outs = list(ex.extract_iter(iter(batches)))
    assert len(outs) == 3
    for sigs, feats in zip(batches, outs):
        for s, f in zip(sigs, feats):
            want = computer.compute_full(s)
            assert np.allclose(f, want, atol=1e-8)


def test_frontend_param_checkpoint(computer, tmp_path):
    frontend = stpu_nn.STFTFrontend(computer, dtype=jnp.float64)
    params, consts = frontend.init()
    path = str(tmp_path / "ckpt.npz")
    frontend.save_params(path, params)
    loaded = frontend.load_params(path)
    assert set(loaded) == set(params)
    for k in params:
        assert np.allclose(np.asarray(loaded[k]), np.asarray(params[k]))


def test_multihost_single_process(computer):
    from speech_tpu.parallel import multihost

    multihost.initialize()  # no-op single process
    sl = multihost.process_slice(10)
    assert sl == slice(0, 10)
    mesh = par.make_mesh(("data",))
    rng = np.random.RandomState(13)
    local = rng.randn(8, 1600).astype(np.float32)
    arr = multihost.global_batch_from_host_local(local, mesh)
    assert arr.shape == (8, 1600)
    assert np.allclose(np.asarray(arr), local)


def test_multihost_two_process_matches_single(tmp_path):
    """The real multi-host contract (SURVEY §2.10 comm row): two
    coordinated jax processes (4 local CPU devices each -> one 8-device
    global mesh over Gloo) split a corpus with ``process_slice``, each
    feed only their own rows through ``global_batch_from_host_local``,
    run one ShardedExtractor batch plus a psum-sharded CMVN accumulation,
    and the results equal the single-process computation."""
    import subprocess
    import socket
    import sys

    # free port for the coordinator
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"[worker {pid}] OK" in out

    got = np.load(str(tmp_path / "result.npz"))
    assert (got["sl0_start"], got["sl0_stop"]) == (0, 4)

    # single-process oracle (same deterministic corpus as the workers)
    rng = np.random.RandomState(1234)
    n_utts, max_len = 8, 2048
    corpus = rng.randn(n_utts, max_len)
    lengths = rng.randint(max_len // 2, max_len + 1, size=n_utts).astype(
        np.int32
    )
    for i in range(n_utts):
        corpus[i, lengths[i]:] = 0.0
    oracle = STFTFrameComputer(
        {"name": "fbank", "num_filts": 10, "sampling_rate": 8000},
        frame_length_ms=25,
        frame_shift_ms=10,
        dtype="float64",
    )
    from speech_tpu.parallel.stats import accumulate_stats

    stats = None
    for i in range(n_utts):
        want = oracle.compute_full(corpus[i, : lengths[i]])
        n = int(got["counts"][i])
        assert n == want.shape[0]
        assert np.allclose(got["feats"][i, :n], want, atol=1e-10)
        stats = accumulate_stats(want[None], stats=stats)
    assert np.allclose(got["stats"], np.asarray(stats), rtol=1e-12)


def test_frontend_training_converges(computer):
    """A few SGD steps on the learnable frontend reduce a feature-matching
    loss (the 'trainable frontend' story end to end)."""
    import optax

    frontend = stpu_nn.STFTFrontend(computer, dtype=jnp.float64)
    params, consts = frontend.init()
    rng = np.random.RandomState(14)
    signals = jnp.asarray(rng.randn(4, 1600))
    # target: features of a perturbed frontend (recoverable by training)
    target_params = {
        "window": params["window"] * 1.05,
        "weights": params["weights"] * 0.9,
    }
    targets = frontend.apply(target_params, consts, signals)
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            return jnp.mean((frontend.apply(p, consts, signals) - targets) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(50):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])


@pytest.mark.parametrize("style", ["causal", "centered"])
@pytest.mark.parametrize("energy", [False, True], ids=["", "energy"])
def test_sharded_si_feats_match_compute_full(style, energy):
    """8-device time-sharded SI equals single-device compute_full
    (halo = max_support - 1 + 2*shift; zero semantics at global edges)."""
    from speech_tpu.compute import SIFrameComputer

    c = SIFrameComputer(
        {"name": "gammatone", "scaling_function": "mel", "num_filts": 6,
         "sampling_rate": 8000},
        frame_style=style,
        include_energy=energy,
        dtype="float64",
    )
    mesh = par.make_mesh(("t",))
    n = mesh.shape["t"]
    shift = c.frame_shift
    # span must cover the halo
    halo = c.max_support - 1 + 2 * shift
    per = (-(-halo // shift) + 2) * shift
    sig_len = n * per
    rng = np.random.RandomState(8)
    signal = rng.randn(sig_len)
    got = np.asarray(par.sharded_si_feats(c, jnp.asarray(signal), mesh, "t"))
    want = c.compute_full(signal)
    assert got.shape[0] >= want.shape[0]  # undershoot quirk tail
    assert got.shape[0] == sig_len // shift
    assert np.allclose(got[: want.shape[0]], want, atol=1e-9), np.abs(
        got[: want.shape[0]] - want
    ).max()


def test_sharded_si_feats_validates_span():
    from speech_tpu.compute import SIFrameComputer

    c = SIFrameComputer(
        {"name": "fbank", "num_filts": 4, "sampling_rate": 8000},
        dtype="float64",
    )
    mesh = par.make_mesh(("t",))
    with pytest.raises(ValueError):
        par.sharded_si_feats(c, jnp.zeros(mesh.shape["t"] * 8), mesh, "t")


def test_sharded_extractor_int16_ingress(computer):
    """Exact-int16 PCM lists ship compactly (int16 device buffers) and
    produce bitwise the same features as the float path."""
    mesh = par.make_mesh(("data",))
    ex = par.ShardedExtractor(computer, mesh)
    rng = np.random.RandomState(11)
    sigs_i = [
        (rng.randn(n) * 1000).astype(np.int16) for n in (900, 2048, 3001)
    ]
    sigs_f = [s.astype(np.float64) for s in sigs_i]
    got_i = ex.extract(sigs_i)
    got_f = ex.extract(sigs_f)
    for a, b in zip(got_i, got_f):
        assert a.dtype == b.dtype
        assert np.array_equal(a, b)
    # mixed-dtype batches fall back to the float transfer path
    disp = ex._dispatch([sigs_i[0], sigs_f[1]])
    assert len(ex._collect(*disp)) == 2


def test_fine_bucket_lengths(computer):
    """'fine' buckets hit {2^k, 3*2^(k-1)} and never shrink a signal."""
    ex = par.ShardedExtractor(computer, bucket="fine")
    exp = par.ShardedExtractor(computer)  # pow2
    fl = computer.frame_length
    assert ex.bucket_len(1) >= fl
    for n in (fl, 1000, 1024, 1025, 1536, 1537, 2047, 2048, 100000):
        b, p = ex.bucket_len(n), exp.bucket_len(n)
        assert b >= max(n, fl) and p >= max(n, fl)
        assert b <= p
        assert b == p or b * 4 == p * 3  # 3*2^(k-1) grid
    assert ex.bucket_len(1025) == 1536 and exp.bucket_len(1025) == 2048
    with pytest.raises(ValueError):
        par.ShardedExtractor(computer, bucket="powers-of-ten")


def test_fine_buckets_match_pow2_results(computer):
    exf = par.ShardedExtractor(computer, bucket="fine")
    rng = np.random.RandomState(12)
    signals = [rng.randn(n) for n in (1100, 2500, 3100)]
    got = exf.extract(signals)
    for sig, feats in zip(signals, got):
        want = computer.compute_full(sig)
        assert feats.shape == want.shape
        assert np.allclose(feats, want, atol=1e-8)


def test_sharded_pitch_matches_single_device():
    from speech_tpu.ops.pitch import pitch_feats

    mesh = par.make_mesh(("data",))
    n = mesh.shape["data"]
    rng = np.random.RandomState(31)
    rate, sec = 16000, 1
    t = np.arange(sec * rate) / rate
    sigs = np.stack(
        [
            np.sin(2 * np.pi * (110.0 + 25.0 * b) * t)
            + 0.05 * rng.randn(t.size)
            for b in range(2 * n)
        ]
    ).astype(np.float32)
    lengths = np.full((2 * n,), sec * rate, np.int32)
    lengths[-1] = sec * rate // 2  # one padded row exercises masking
    sigs[-1, lengths[-1]:] = 0.0
    want, want_valid = pitch_feats(sigs, rate, lengths=lengths, return_valid=True)
    got, got_valid = par.sharded_pitch_feats(sigs, rate, lengths, mesh)
    assert np.array_equal(np.asarray(want_valid), np.asarray(got_valid))
    # same math per shard; only GEMM grouping over the batch dim differs
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-4)
    with pytest.raises(ValueError, match="divide"):
        par.sharded_pitch_feats(sigs[: n + 1], rate, lengths[: n + 1], mesh)
