"""Streaming post-ops vs the batch post-processors.

Contract under test (streaming_post.py): concatenating every step's
valid rows plus the finalize flush equals the batch post-processor
applied to the full feature matrix — exactly for frame-local/integral
ops (splice, stack, DCT, standardize), to reduction roundoff for the
windowed/recursive ones (deltas, sliding CMVN, PCEN).  The reference
library has no streaming post-processing (reference: post.py applies
to whole tensors); the batch twins here serve as the oracle.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_tpu import post as hpost
from speech_tpu.ops import postops
from speech_tpu.streaming_post import (
    StreamingDeltas,
    StreamingPCEN,
    StreamingPipeline,
    StreamingPostChain,
    StreamingSlidingCMVN,
    StreamingSplice,
    StreamingStack,
    streaming_post_op,
)

CHUNKINGS = [
    [13, 1, 40, 7, 29, 60, 10],
    [1] * 140,
    [200],
    [137, 5],
]


def _stream_all(op, feats, chunks, dtype=np.float64):
    """Drive ``op`` chunk by chunk (masked final chunks) and return the
    concatenated valid rows."""
    T = feats.shape[0]
    st = op.init_state(feats.shape[1], dtype)
    step = jax.jit(op._step_impl)
    outs = []
    i = 0
    for c in chunks:
        block = np.zeros((c, feats.shape[1]), dtype)
        n = min(c, max(0, T - i))
        block[:n] = feats[i : i + n]
        i += n
        st, out, nout = step(st, jnp.asarray(block), n)
        outs.append(np.asarray(out)[: int(nout)])
    out, nout = jax.jit(op._finalize_impl)(st)
    outs.append(np.asarray(out)[: int(nout)])
    return np.concatenate(outs)


@pytest.fixture
def feats():
    rng = np.random.default_rng(2024)
    return rng.standard_normal((137, 7))


@pytest.mark.parametrize("chunks", CHUNKINGS, ids=["ragged", "one", "wide", "split"])
@pytest.mark.parametrize("num_deltas,window", [(1, 2), (2, 3)])
def test_deltas_matches_batch(feats, chunks, num_deltas, window):
    # streaming semantics = deltas along TIME, concatenated along the
    # feature axis (the device twin's convention; the host class's
    # `axis` argument is the correlation axis, so axis=0 here)
    host = hpost.Deltas(num_deltas, context_window=window, target_axis=-1)
    ref = host.apply(feats.copy(), axis=0)
    got = _stream_all(StreamingDeltas(num_deltas, window), feats, chunks)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-12)
    dev = np.asarray(
        postops.deltas(feats, postops.delta_filters(num_deltas, window))
    )
    np.testing.assert_allclose(got, dev, atol=1e-12)


@pytest.mark.parametrize("chunks", CHUNKINGS, ids=["ragged", "one", "wide", "split"])
@pytest.mark.parametrize("left,right", [(3, 5), (4, 4), (2, 0), (0, 3)])
def test_splice_matches_batch_exactly(feats, chunks, left, right):
    ref = hpost.Splice(left, right).apply(feats.copy(), axis=-1)
    got = _stream_all(StreamingSplice(left, right), feats, chunks)
    assert got.shape == ref.shape
    assert (got == ref).all()  # pure shifts: bitwise


@pytest.mark.parametrize("chunks", CHUNKINGS, ids=["ragged", "one", "wide", "split"])
@pytest.mark.parametrize("m", [1, 3, 4])
@pytest.mark.parametrize("pad", [False, True])
def test_stack_matches_batch_exactly(feats, chunks, m, pad):
    host = hpost.Stack(m, pad_mode="edge" if pad else None)
    ref = host.apply(feats.copy(), axis=-1)
    got = _stream_all(StreamingStack(m, pad=pad), feats, chunks)
    assert got.shape == ref.shape
    assert (got == ref).all()


@pytest.mark.parametrize("chunks", CHUNKINGS, ids=["ragged", "one", "wide", "split"])
def test_pcen_matches_batch(feats, chunks):
    lin = np.abs(feats) + 0.1
    host = hpost.PCEN(0.05, 0.9, 2.0, 0.5)
    ref = host.apply(lin.copy(), axis=-1)
    got = _stream_all(StreamingPCEN(0.05, 0.9, 2.0, 0.5), lin, chunks)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-12)


@pytest.mark.parametrize("chunks", CHUNKINGS, ids=["ragged", "one", "wide", "split"])
@pytest.mark.parametrize("center", [True, False])
@pytest.mark.parametrize("norm_var", [False, True])
def test_sliding_cmvn_matches_batch(feats, chunks, center, norm_var):
    host = hpost.SlidingCMVN(
        window=50, center=center, norm_var=norm_var, min_window=20
    )
    ref = host.apply(feats.copy(), axis=-1)
    got = _stream_all(
        StreamingSlidingCMVN(50, center, norm_var, 20), feats, chunks
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-12)


@pytest.mark.parametrize("T", [0, 1, 3, 19, 20, 21, 49, 50, 51])
def test_sliding_cmvn_short_streams(T):
    """Every window-clipping regime near the boundaries (T around
    min_window and window)."""
    rng = np.random.default_rng(T)
    feats = rng.standard_normal((T, 3))
    for center in (True, False):
        host = hpost.SlidingCMVN(
            window=50, center=center, norm_var=True, min_window=20
        )
        op = StreamingSlidingCMVN(50, center, True, 20)
        got = _stream_all(op, feats, [7, 7, 7, 50])
        if T == 0:
            assert got.shape[0] == 0
            continue
        ref = host.apply(feats.copy(), axis=-1)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-12)


@pytest.mark.parametrize("T", [1, 2, 4, 5, 9])
def test_fir_short_streams(T):
    """Streams shorter than the FIR context exercise double-sided edge
    replication out of the same buffer."""
    rng = np.random.default_rng(T)
    feats = rng.standard_normal((T, 3))
    ref = hpost.Deltas(2, context_window=2, target_axis=-1).apply(
        feats.copy(), axis=0
    )
    got = _stream_all(StreamingDeltas(2, 2), feats, [3, 3, 3, 3])
    np.testing.assert_allclose(got, ref, atol=1e-12)
    ref = hpost.Splice(4, 4).apply(feats.copy(), axis=-1)
    got = _stream_all(StreamingSplice(4, 4), feats, [3, 3, 3, 3])
    assert (got == ref).all()


def test_chain_matches_sequential_batch(feats):
    ops = [
        StreamingDeltas(2, 2),
        StreamingSlidingCMVN(50, False, True, 20),
        StreamingSplice(2, 2),
    ]
    chain = StreamingPostChain(ops)
    assert chain.out_width(7) == 7 * 3 * 5
    ref = hpost.Deltas(2, target_axis=-1).apply(feats.copy(), axis=0)
    ref = hpost.SlidingCMVN(50, False, True, 20).apply(ref, axis=-1)
    ref = hpost.Splice(2, 2).apply(ref, axis=-1)
    got = _stream_all(chain, feats, [13, 1, 40, 7, 29, 60, 10])
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-12)


def test_valid_zero_step_is_bitwise_noop(feats):
    ops = [
        StreamingDeltas(1, 2),
        StreamingSlidingCMVN(30, True, True, 10),
        StreamingPCEN(),
        StreamingStack(3, pad=True),
        StreamingSplice(2, 3),
    ]
    for op in ops:
        st = op.init_state(7, np.float64)
        # advance into a nontrivial state first
        st, _, _ = op._step_impl(st, jnp.asarray(feats[:16]), 16)
        garbage = jnp.asarray(np.full((16, 7), np.inf))
        st2, _, n = op._step_impl(st, garbage, 0)
        assert int(n) == 0
        for a, b in zip(
            jax.tree_util.tree_leaves(st), jax.tree_util.tree_leaves(st2)
        ):
            assert np.array_equal(np.asarray(a), np.asarray(b)), type(op)


def test_factory_maps_host_instances():
    ops = [
        hpost.Deltas(2, target_axis=-1),
        hpost.Splice(1, 2),
        hpost.Stack(3, pad_mode="edge"),
        hpost.PCEN(),
        hpost.SlidingCMVN(window=40, min_window=10),
        hpost.DCT(num_ceps=5, lifter=22.0),
    ]
    widths = [21, 28, 21, 7, 7, 5]
    for post, expect in zip(ops, widths):
        op = streaming_post_op(post)
        assert op.out_width(7) == expect, type(post)


def test_factory_rejects_unstreamable():
    with pytest.raises(ValueError, match="statistics"):
        streaming_post_op(hpost.Standardize())
    with pytest.raises(ValueError, match="concatenating"):
        streaming_post_op(hpost.Deltas(1, concatenate=False))
    with pytest.raises(ValueError, match="pad_mode"):
        streaming_post_op(hpost.Stack(2, pad_mode="constant"))


def test_factory_standardize_with_stats(feats):
    host = hpost.Standardize()
    host.accumulate(feats, axis=-1)
    op = streaming_post_op(host)
    got = _stream_all(op, feats, [40, 40, 40, 40])
    ref = host.apply(feats.copy(), axis=-1)
    np.testing.assert_allclose(got, ref, atol=1e-12)


def test_factory_dct_matches_host(feats):
    host = hpost.DCT(num_ceps=5, lifter=22.0)
    op = streaming_post_op(host)
    got = _stream_all(op, feats, [40, 40, 40, 40])
    ref = host.apply(feats.copy(), axis=-1)
    np.testing.assert_allclose(got, ref, atol=1e-12)


# ---------------------------------------------------------------------------
# pipeline: signal streamer + chain


BANK = {"name": "fbank", "num_filts": 10, "sampling_rate": 8000}


def _stft(**kw):
    from speech_tpu.compute import STFTFrameComputer

    kw.setdefault("dtype", "float64")
    return STFTFrameComputer(dict(BANK), **kw)


def test_pipeline_stft_matches_batch_chain():
    rng = np.random.default_rng(7)
    sig = rng.standard_normal(8000 + 123)
    comp = _stft()
    posts = [
        hpost.Deltas(2, target_axis=-1),
        hpost.SlidingCMVN(window=60, center=True, norm_var=True,
                          min_window=20),
    ]
    pipe = StreamingPipeline(comp, posts, chunk_size=800)
    got = pipe.transform(sig)
    ref = comp.compute_full(sig)
    ref = posts[0].apply(ref, axis=0)
    ref = posts[1].apply(ref, axis=-1)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-10)


def test_pipeline_si_matches_batch_chain():
    from speech_tpu.compute import SIFrameComputer

    rng = np.random.default_rng(8)
    sig = rng.standard_normal(4000 + 77)
    comp = SIFrameComputer(
        {
            "name": "gammatone",
            "scaling_function": "mel",
            "num_filts": 6,
            "sampling_rate": 8000,
        },
        dtype="float64",
    )
    posts = [hpost.Deltas(1, target_axis=-1)]
    pipe = StreamingPipeline(comp, posts, chunk_size=800)
    got = pipe.transform(sig)
    ref = posts[0].apply(comp.compute_full(sig), axis=0)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-10)


def test_pipeline_in_stream_pool():
    """Two concurrent post-processed sessions through StreamPool: wide
    ticks, uneven feeds, batch parity per session."""
    from speech_tpu.serve import StreamPool

    rng = np.random.default_rng(9)
    sig1 = rng.standard_normal(8000 + 123)
    sig2 = rng.standard_normal(4000 + 61)
    comp = _stft()
    posts = [
        hpost.Deltas(1, target_axis=-1),
        hpost.SlidingCMVN(window=40, center=False, norm_var=False,
                          min_window=10),
    ]
    pipe = StreamingPipeline(comp, posts, chunk_size=400)
    pool = StreamPool(pipe, slots=4)
    h1, h2 = pool.open(), pool.open()
    res = {h1: [], h2: []}
    pool.feed(h1, sig1[:3000])
    pool.feed(h2, sig2[:700])
    for h, f in pool.step(max_chunks=4):
        res[h].append(f)
    pool.feed(h1, sig1[3000:])
    pool.feed(h2, sig2[700:])
    while True:
        outs = pool.step(max_chunks=8)
        if not outs:
            break
        for h, f in outs:
            res[h].append(f)
    for h, f in pool.close_many([h1, h2]):
        res[h].append(f)
    for h, sig in ((h1, sig1), (h2, sig2)):
        got = np.concatenate(res[h])
        ref = comp.compute_full(sig)
        for p in posts:
            ref = p.apply(ref, axis=0 if isinstance(p, hpost.Deltas) else -1)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-10)


def test_pipeline_rejects_unknown_width():
    class Opaque:
        def init_state(self):
            return ()

        def _process_impl(self, state, chunk, valid):
            return state, jnp.zeros((0, 3)), 0

        chunk_size = 100
        _dtype = np.float64

    with pytest.raises(ValueError, match="in_width"):
        StreamingPipeline(Opaque(), [])
    # explicit width works
    pipe = StreamingPipeline(Opaque(), [], in_width=3)
    assert pipe.num_coeffs == 3


def test_factory_transform_matches_host(feats):
    rng = np.random.RandomState(9)
    mat = rng.randn(4, feats.shape[1] + 1)  # affine
    host = hpost.Transform(matrix=mat)
    op = streaming_post_op(host)
    assert op.out_width(feats.shape[1]) == 4
    got = _stream_all(op, feats, [7, 50, 3, 90])
    ref = host.apply(feats.copy(), axis=-1)
    np.testing.assert_allclose(got, ref, atol=1e-12)
