"""Jittable post-ops vs the (reference-verified) host post classes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_tpu import post as host_post
from speech_tpu.ops import postops


@pytest.fixture
def feats():
    return np.random.RandomState(20).randn(3, 30, 13)


def test_deltas_matches_host(feats):
    host = host_post.Deltas(2, context_window=2)
    filts = postops.delta_filters(2, 2)
    for f in feats:
        want = host.apply(f, axis=0)
        got = np.asarray(
            jax.jit(lambda x: postops.deltas(x, filts, time_axis=0))(f)
        )
        assert got.shape == want.shape
        assert np.allclose(got, want, atol=1e-10)


def test_deltas_stacked_matches_host(feats):
    host = host_post.Deltas(1, concatenate=False, target_axis=1)
    filts = postops.delta_filters(1, 2)
    f = feats[0]
    want = host.apply(f, axis=0)
    got = np.asarray(
        postops.deltas(f, filts, concatenate=False, time_axis=0, target_axis=1)
    )
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=1e-10)


def test_deltas_batched(feats):
    host = host_post.Deltas(2)
    filts = postops.delta_filters(2)
    got = np.asarray(postops.deltas(feats, filts, time_axis=-2))
    for i, f in enumerate(feats):
        want = host.apply(f, axis=0)
        assert np.allclose(got[i], want, atol=1e-10)


@pytest.mark.parametrize("pad", [False, True])
def test_stack_matches_host(feats, pad):
    host = host_post.Stack(4, pad_mode="edge" if pad else None)
    f = feats[0]
    want = host.apply(f, axis=-1)
    got = np.asarray(postops.stack(f, 4, time_axis=0, pad=pad))
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=1e-10)


def test_standardize_local_matches_host(feats):
    host = host_post.Standardize()
    f = feats[0]
    want = host.apply(f, axis=-1)
    got = np.asarray(postops.standardize(f))
    assert np.allclose(got, want, atol=1e-10)


def test_standardize_global_matches_host(feats):
    host = host_post.Standardize()
    for f in feats:
        host.accumulate(f)
    want = host.apply(feats[0], axis=-1)
    got = np.asarray(postops.standardize_with_stats(feats[0], host.stats))
    assert np.allclose(got, want, atol=1e-10)
    # no variance normalization
    host2 = host_post.Standardize(norm_var=False)
    for f in feats:
        host2.accumulate(f)
    want = host2.apply(feats[0], axis=-1)
    got = np.asarray(
        postops.standardize_with_stats(feats[0], host2.stats, norm_var=False)
    )
    assert np.allclose(got, want, atol=1e-10)


def test_postops_jit_and_vmap(feats):
    filts = postops.delta_filters(2)

    @jax.jit
    def pipeline(x):
        x = postops.deltas(x, filts)
        x = postops.standardize(x, feat_axis=-1)
        return postops.stack(x, 3)

    out = pipeline(jnp.asarray(feats))
    assert out.shape == (3, 10, 13 * 9)
    assert np.all(np.isfinite(np.asarray(out)))


def _sliding_cmvn_oracle(x, window, center, norm_var, min_window):
    """Per-frame reimplementation of Kaldi's window clipping."""
    T = x.shape[0]
    out = np.empty_like(x, dtype=np.float64)
    for t in range(T):
        if center:
            lo = t - window // 2
            hi = lo + window
            if lo < 0:
                hi -= lo
                lo = 0
            if hi > T:
                lo -= hi - T
                hi = T
                lo = max(lo, 0)
        else:
            hi = min(max(t + 1, min_window), T)
            lo = max(hi - window, 0)
        win = x[lo:hi]
        mean = win.mean(axis=0)
        out[t] = x[t] - mean
        if norm_var:
            var = np.maximum((win**2).mean(axis=0) - mean**2, 1e-10)
            out[t] /= np.sqrt(var)
    return out


@pytest.mark.parametrize(
    "window,center,norm_var",
    [(600, True, False), (50, True, True), (30, False, False), (9, False, True)],
)
def test_sliding_cmvn_matches_oracle(window, center, norm_var):
    from speech_tpu.ops.postops import sliding_cmvn

    rng = np.random.RandomState(12)
    x = rng.randn(200, 13) * 3 + 5
    want = _sliding_cmvn_oracle(x, window, center, norm_var, min_window=20)
    got = np.asarray(
        sliding_cmvn(
            x, window=window, center=center, norm_var=norm_var,
            min_window=20, time_axis=0,
        )
    )
    assert np.allclose(got, want, atol=1e-9), np.abs(got - want).max()


def test_sliding_cmvn_batched_and_host_twin():
    from speech_tpu.ops.postops import sliding_cmvn
    from speech_tpu.post import PostProcessor
    from speech_tpu.alias import alias_factory_subclass_from_arg

    rng = np.random.RandomState(13)
    x = rng.randn(3, 120, 8)
    got = np.asarray(sliding_cmvn(x, window=40))
    for i in range(3):
        want = _sliding_cmvn_oracle(x[i], 40, True, False, 100)
        assert np.allclose(got[i], want, atol=1e-9)
    host = alias_factory_subclass_from_arg(
        PostProcessor, {"name": "sliding_cmvn", "window": 40}
    )
    assert np.allclose(host.apply(x[0], axis=-1), got[0], atol=1e-12)
    with pytest.raises(ValueError, match="window"):
        sliding_cmvn(x, window=0)


def test_splice_matches_oracle():
    from speech_tpu.ops.postops import splice

    rng = np.random.RandomState(14)
    x = rng.randn(50, 6)
    got = np.asarray(splice(x, left=2, right=3, time_axis=0))
    assert got.shape == (50, 6 * 6)
    padded = np.pad(x, ((2, 3), (0, 0)), mode="edge")
    for t in (0, 1, 25, 48, 49):
        want = np.concatenate([padded[t + k] for k in range(6)])
        assert np.array_equal(got[t], want), t
    # batched + host twin + chain composability
    from speech_tpu.alias import alias_factory_subclass_from_arg
    from speech_tpu.post import PostProcessor

    xb = rng.randn(3, 50, 6)
    gb = np.asarray(splice(xb, left=1, right=1))
    host = alias_factory_subclass_from_arg(
        PostProcessor, {"name": "splice", "left": 1, "right": 1}
    )
    for i in range(3):
        assert np.allclose(host.apply(xb[i], axis=-1), gb[i])
    with pytest.raises(ValueError, match="left/right"):
        splice(x, left=-1)


@pytest.mark.parametrize("num_ceps,lifter", [(None, 0.0), (13, 0.0), (13, 22.0)])
def test_dct_matches_scipy(num_ceps, lifter):
    import scipy.fft

    from speech_tpu.ops.postops import dct

    rng = np.random.RandomState(7)
    x = rng.randn(40, 24)
    want = scipy.fft.dct(x, type=2, norm="ortho", axis=-1)
    k = x.shape[-1] if num_ceps is None else num_ceps
    want = want[:, :k]
    if lifter:
        want = want * (1.0 + 0.5 * lifter * np.sin(np.pi * np.arange(k) / lifter))
    got = np.asarray(dct(x, num_ceps=num_ceps, lifter=lifter))
    assert got.shape == (40, k)
    assert np.allclose(got, want, atol=1e-10)


def test_dct_host_twin_axis_and_alias():
    from speech_tpu.alias import alias_factory_subclass_from_arg
    from speech_tpu.ops.postops import dct
    from speech_tpu.post import PostProcessor

    rng = np.random.RandomState(8)
    xb = rng.randn(3, 25, 20)
    got = np.asarray(dct(xb, num_ceps=13, lifter=22.0))
    host = alias_factory_subclass_from_arg(
        PostProcessor, {"name": "mfcc", "num_ceps": 13, "lifter": 22.0}
    )
    for i in range(3):
        assert np.allclose(host.apply(xb[i], axis=-1), got[i], atol=1e-10)
    # non-default axis round-trips through the moveaxis plumbing
    moved = np.moveaxis(xb, -1, 0)
    got_ax = np.asarray(dct(moved, num_ceps=13, lifter=22.0, feat_axis=0))
    assert np.allclose(np.moveaxis(got_ax, 0, -1), got, atol=1e-12)
    assert np.allclose(host.apply(moved[:, 0], axis=0).T, got[0], atol=1e-10)


def test_dct_orthonormal_and_errors():
    from speech_tpu.ops.postops import dct_matrix

    mat = dct_matrix(16)
    assert np.allclose(mat.T @ mat, np.eye(16), atol=1e-12)
    with pytest.raises(ValueError, match="num_ceps"):
        dct_matrix(16, 17)
    with pytest.raises(ValueError, match="num_ceps"):
        dct_matrix(16, 0)
    with pytest.raises(ValueError, match="lifter"):
        dct_matrix(16, 8, lifter=-1.0)
    from speech_tpu.post import DCT

    with pytest.raises(ValueError, match="num_ceps"):
        DCT(num_ceps=0)
    with pytest.raises(RuntimeError, match="exceeds"):
        DCT(num_ceps=40).apply(np.zeros((5, 10)), axis=-1)


@pytest.mark.parametrize("affine", [False, True])
def test_transform_matches_host(feats, affine):
    rng = np.random.RandomState(3)
    mat = rng.randn(7, 13 + int(affine))
    host = host_post.Transform(matrix=mat)
    got = np.asarray(jax.jit(lambda x: postops.transform(x, mat))(feats))
    assert got.shape == (3, 30, 7)
    for i, f in enumerate(feats):
        assert np.allclose(got[i], host.apply(f), atol=1e-10)
    with pytest.raises(ValueError):
        postops.transform(feats, rng.randn(7, 11))
    with pytest.raises(ValueError):
        postops.transform(feats, rng.randn(7))


def test_transform_in_device_chain(feats):
    rng = np.random.RandomState(4)
    mat = rng.randn(5, 40)  # affine over Deltas(2)'s 39 outputs
    posts = [
        host_post.Deltas(2, target_axis=-1),
        host_post.Transform(matrix=mat),
    ]
    chain = postops.device_post_chain(posts)
    counts = np.array([30, 17, 9])
    out, n_out = jax.jit(chain)(jnp.asarray(feats), counts)
    out = np.asarray(out)
    assert out.shape == (3, 30, 5)
    assert np.all(np.asarray(n_out) == counts)
    for i, f in enumerate(feats):
        want = posts[0].apply(f[: counts[i]], axis=0)  # deltas: time axis
        want = posts[1].apply(want, axis=-1)
        assert np.allclose(out[i, : counts[i]], want, atol=1e-8)
