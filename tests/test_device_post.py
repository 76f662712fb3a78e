"""Lengths-aware device post-ops and the fused extractor chain.

Contract: with per-row valid frame counts, each device twin's valid
output rows equal the unbatched op applied to that row's prefix —
edge replication, window clipping, and tail handling all at the ROW's
extent, not the padded buffer's.  ``device_post_chain`` fuses host
post-processor configurations into one jittable ``(feats, counts) ->
(feats, counts)``, which ``ShardedExtractor``/``FeatureServer`` fold
into their device programs.
"""

import numpy as np
import pytest

import jax

from speech_tpu import post as hpost
from speech_tpu.ops import postops

B, T, F = 5, 97, 6
COUNTS = np.array([97, 1, 40, 17, 96], np.int32)


@pytest.fixture
def batch():
    rng = np.random.default_rng(5)
    return rng.standard_normal((B, T, F))


def _per_row(batch, hostfn):
    return [hostfn(batch[i, : COUNTS[i]]) for i in range(B)]

def _check(dev_out, refs, out_counts=None, tol=1e-11):
    dev_out = np.asarray(dev_out)
    for i, r in enumerate(refs):
        n = r.shape[0]
        if out_counts is not None:
            assert int(out_counts[i]) == n, (i, int(out_counts[i]), n)
        if n:
            np.testing.assert_allclose(dev_out[i, :n], r, atol=tol)


def test_deltas_lengths(batch):
    h = hpost.Deltas(2, context_window=2, target_axis=-1)
    refs = _per_row(batch, lambda x: h.apply(x.copy(), axis=0))
    out = postops.deltas(
        batch, postops.delta_filters(2, 2), lengths=COUNTS
    )
    _check(out, refs)


def test_splice_lengths(batch):
    h = hpost.Splice(3, 4)
    refs = _per_row(batch, lambda x: h.apply(x.copy(), axis=-1))
    out = postops.splice(batch, 3, 4, lengths=COUNTS)
    _check(out, refs, tol=0)  # pure selection: bitwise


@pytest.mark.parametrize("pad", [False, True])
def test_stack_lengths(batch, pad):
    h = hpost.Stack(4, pad_mode="edge" if pad else None)
    refs = _per_row(batch, lambda x: h.apply(x.copy(), axis=-1))
    out = postops.stack(batch, 4, pad=pad, lengths=COUNTS)
    oc = (COUNTS + 3) // 4 if pad else COUNTS // 4
    _check(out, refs, oc, tol=0)


def test_pcen_lengths(batch):
    lin = np.abs(batch) + 0.1
    h = hpost.PCEN(0.05, 0.9, 2.0, 0.5)
    refs = [h.apply(lin[i, : COUNTS[i]].copy(), axis=-1) for i in range(B)]
    out = postops.pcen(lin, 0.05, 0.9, 2.0, 0.5, lengths=COUNTS)
    _check(out, refs)


@pytest.mark.parametrize("center", [True, False])
@pytest.mark.parametrize("norm_var", [False, True])
def test_sliding_cmvn_lengths(batch, center, norm_var):
    h = hpost.SlidingCMVN(
        window=50, center=center, norm_var=norm_var, min_window=20
    )
    refs = _per_row(batch, lambda x: h.apply(x.copy(), axis=-1))
    out = postops.sliding_cmvn(
        batch, 50, center, norm_var, 20, lengths=COUNTS
    )
    _check(out, refs)


def test_chain_jit(batch):
    posts = [
        hpost.Deltas(2, target_axis=-1),
        hpost.SlidingCMVN(window=50, center=False, norm_var=True,
                          min_window=20),
        hpost.Splice(1, 1),
    ]
    chain = postops.device_post_chain(posts)
    out, oc = jax.jit(chain)(batch, COUNTS)

    def ref(x):
        x = posts[0].apply(x.copy(), axis=0)
        x = posts[1].apply(x, axis=-1)
        return posts[2].apply(x, axis=-1)

    _check(out, _per_row(batch, ref), oc)


def test_chain_rejects_unstreamable():
    with pytest.raises(ValueError, match="statistics"):
        postops.device_post_chain([hpost.Standardize()])
    with pytest.raises(ValueError, match="concatenating"):
        postops.device_post_chain([hpost.Deltas(1, concatenate=False)])
    with pytest.raises(ValueError, match="no device twin"):
        postops.device_post_chain([object()])


def test_chain_standardize_stats_and_dct(batch):
    stand = hpost.Standardize(norm_var=True)
    stand.accumulate(batch.reshape(-1, F), axis=-1)
    posts = [stand, hpost.DCT(num_ceps=4, lifter=22.0)]
    chain = postops.device_post_chain(posts)
    out, oc = jax.jit(chain)(batch, COUNTS)

    def ref(x):
        x = stand.apply(x.copy(), axis=-1)
        return posts[1].apply(x, axis=-1)

    _check(out, _per_row(batch, ref), oc, tol=1e-9)


# ---------------------------------------------------------------------------
# fused extraction


def _stft(**kw):
    from speech_tpu.compute import STFTFrameComputer

    kw.setdefault("dtype", "float64")
    return STFTFrameComputer(
        {"name": "fbank", "num_filts": 8, "sampling_rate": 8000}, **kw
    )


POSTS = [
    hpost.Deltas(1, target_axis=-1),
    hpost.SlidingCMVN(window=40, center=False, min_window=10),
    hpost.Stack(3, pad_mode="edge"),
]


def _ref_chain(comp, sig):
    x = comp.compute_full(sig)
    x = POSTS[0].apply(x, axis=0)
    x = POSTS[1].apply(x, axis=-1)
    return POSTS[2].apply(x, axis=-1)


def test_extractor_fused_post():
    # signal lengths within one pow2 bucket: every bucket program is a
    # multi-second XLA compile on the 1-core CPU test box
    from speech_tpu.parallel import ShardedExtractor

    rng = np.random.default_rng(11)
    comp = _stft()
    sigs = [rng.standard_normal(rng.integers(1100, 2000)) for _ in range(5)]
    ex = ShardedExtractor(comp, postprocessors=POSTS)
    outs = ex.extract(sigs)
    for out, sig in zip(outs, sigs):
        ref = _ref_chain(comp, sig)
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=1e-10)


def test_extractor_fused_post_mesh():
    from speech_tpu import parallel as par
    from speech_tpu.parallel import ShardedExtractor

    rng = np.random.default_rng(12)
    comp = _stft()
    mesh = par.make_mesh(("data",))
    sigs = [rng.standard_normal(rng.integers(1100, 2000)) for _ in range(8)]
    ex = ShardedExtractor(comp, mesh, postprocessors=POSTS)
    outs = ex.extract(sigs)
    for out, sig in zip(outs, sigs):
        ref = _ref_chain(comp, sig)
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=1e-10)


def test_extractor_fused_post_si():
    from speech_tpu.compute import SIFrameComputer
    from speech_tpu.parallel import ShardedExtractor

    rng = np.random.default_rng(13)
    comp = SIFrameComputer(
        {
            "name": "gammatone",
            "scaling_function": "mel",
            "num_filts": 5,
            "sampling_rate": 8000,
        },
        dtype="float64",
    )
    sigs = [rng.standard_normal(rng.integers(1100, 2000)) for _ in range(3)]
    ex = ShardedExtractor(comp, postprocessors=[POSTS[0]])
    outs = ex.extract(sigs)
    for out, sig in zip(outs, sigs):
        ref = POSTS[0].apply(comp.compute_full(sig), axis=0)
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=1e-10)


def test_feature_server_fused_post():
    from speech_tpu.serve import FeatureServer

    rng = np.random.default_rng(14)
    comp = _stft()
    sigs = [rng.standard_normal(rng.integers(1100, 2000)) for _ in range(6)]
    with FeatureServer(comp, max_batch=4, postprocessors=POSTS) as server:
        outs = server.extract_many(sigs)
    for out, sig in zip(outs, sigs):
        ref = _ref_chain(comp, sig)
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=1e-10)
