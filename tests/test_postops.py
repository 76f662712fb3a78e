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
