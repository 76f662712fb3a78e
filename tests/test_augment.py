"""SpecAugment: static-shape iota-comparison masking (no reference
counterpart; Park et al. 2019 semantics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_tpu.ops.augment import spec_augment

KEY = jax.random.PRNGKey(20260818)


@pytest.fixture
def feats():
    rng = np.random.RandomState(3)
    return rng.randn(4, 200, 80)


def test_spec_augment_basic_contract(feats):
    out = np.asarray(spec_augment(KEY, feats))
    assert out.shape == feats.shape
    changed = out != feats
    assert changed.any()
    # unmasked cells pass through bit-exactly; masked cells become 0.0
    assert np.array_equal(out[~changed], feats[~changed])
    assert (out[changed] == 0.0).all()
    # masks are axis-aligned bands: the changed set is a union of
    # full-row/full-column rectangles, so every changed cell shares its
    # row-or-column pattern with others — check row/col structure
    per = changed[0]
    time_rows = per.all(axis=1)
    freq_cols = per.all(axis=0)
    recon = time_rows[:, None] | freq_cols[None, :]
    assert np.array_equal(per, recon | (per & recon))


def test_spec_augment_deterministic_and_key_dependent(feats):
    a = np.asarray(spec_augment(KEY, feats))
    b = np.asarray(spec_augment(KEY, feats))
    c = np.asarray(spec_augment(jax.random.PRNGKey(7), feats))
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_spec_augment_per_example_masks(feats):
    """Each batch element draws its own masks."""
    out = np.asarray(spec_augment(KEY, feats))
    patterns = [(out[i] == 0.0) for i in range(feats.shape[0])]
    assert any(
        not np.array_equal(patterns[0], p) for p in patterns[1:]
    )


def test_spec_augment_respects_lengths(feats):
    lengths = np.array([200, 120, 40, 7])
    out = np.asarray(spec_augment(KEY, feats, lengths=lengths))
    for i, n in enumerate(lengths):
        # padding (incl. under frequency masks) is bit-identical input
        assert np.array_equal(out[i, n:], feats[i, n:])
        assert (out[i, :n] == 0.0).any()


def test_spec_augment_mean_fill(feats):
    lengths = np.array([200, 120, 40, 7])
    out = np.asarray(
        spec_augment(KEY, feats, lengths=lengths, mask_value="mean")
    )
    changed = out != feats
    for i, n in enumerate(lengths):
        want = feats[i, :n].mean()
        got = out[i][changed[i]]
        assert got.size and np.allclose(got, want)
    with pytest.raises(ValueError, match="mask_value"):
        spec_augment(KEY, feats, mask_value="median")


def test_spec_augment_disabled_is_identity(feats):
    out = np.asarray(
        spec_augment(KEY, feats, num_freq_masks=0, num_time_masks=0)
    )
    assert np.array_equal(out, feats)


def test_spec_augment_jit_vmap_axes(feats):
    direct = np.asarray(spec_augment(KEY, feats))
    assert np.array_equal(np.asarray(jax.jit(spec_augment)(KEY, feats)), direct)
    swapped = np.asarray(
        spec_augment(
            KEY, np.swapaxes(feats, 1, 2), time_axis=-1, feat_axis=-2
        )
    )
    assert np.array_equal(np.swapaxes(swapped, 1, 2), direct)
    with pytest.raises(ValueError, match="axes"):
        spec_augment(KEY, feats, time_axis=1, feat_axis=1)


def test_spec_augment_width_bounds(feats):
    """Every contiguous masked band stays within its width parameter."""
    out = np.asarray(
        spec_augment(
            KEY,
            feats,
            num_freq_masks=1,
            freq_mask_param=5,
            num_time_masks=1,
            time_mask_param=9,
        )
    )
    changed = out == 0.0
    for i in range(feats.shape[0]):
        time_rows = changed[i].all(axis=1)
        freq_cols = changed[i].all(axis=0)
        assert time_rows.sum() <= 9
        assert freq_cols.sum() <= 5


def test_spec_augment_gradients(feats):
    """Differentiable: gradients are identity off-mask, zero on-mask."""
    f32 = feats[0].astype(np.float32)

    def loss(x):
        return jnp.sum(spec_augment(KEY, x))

    g = np.asarray(jax.grad(loss)(f32))
    out = np.asarray(spec_augment(KEY, f32))
    masked = out != f32
    assert (g[masked] == 0).all()
    assert (g[~masked] == 1).all()


def test_spec_augment_on_mesh(feats):
    """Shards over the batch axis on the 8-device mesh (pure per-example
    elementwise work, no collectives)."""
    from speech_tpu import parallel as par

    mesh = par.make_mesh(("data",))
    n = mesh.shape["data"]
    x = np.tile(feats, (-(-n // feats.shape[0]), 1, 1))[:n]
    sharded = jax.device_put(x, par.named_sharding(mesh, "data"))
    got = np.asarray(jax.jit(spec_augment, static_argnames=())(KEY, sharded))
    want = np.asarray(spec_augment(KEY, x))
    assert np.array_equal(got, want)
