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


# ---------------------------------------------------------------------------
# waveform augmentations
# ---------------------------------------------------------------------------

from speech_tpu.ops.augment import (  # noqa: E402
    mix_noise,
    random_gain,
    reverberate,
    speed_perturb,
)


def _rir(rng, W=2000, delay=170):
    """Synthetic exponentially-decaying RIR with a dominant direct path."""
    rir = rng.randn(W) * np.exp(-np.arange(W) / (W / 6.0)) * 0.05
    rir[delay] = 1.0
    return rir


def _reverb_oracle(x, rir, align=True, power_norm=True):
    d = int(np.argmax(np.abs(rir))) if align else 0
    y = np.convolve(x, rir)[d : d + len(x)]
    if power_norm:
        e_out = (y**2).sum()
        if e_out > 0:
            y = y * np.sqrt((x**2).sum() / e_out)
    return y


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("power_norm", [True, False])
def test_reverberate_matches_numpy_oracle(align, power_norm):
    rng = np.random.RandomState(7)
    x = rng.randn(3, 4000)
    rir = _rir(rng)
    got = np.asarray(reverberate(x, rir, align=align, power_norm=power_norm))
    want = np.stack([_reverb_oracle(xi, rir, align, power_norm) for xi in x])
    assert got.shape == x.shape
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_reverberate_long_rir_and_padded_batch_parity():
    """8000-tap RIR (the multi-block Toeplitz window path); padded batch
    rows equal the solo op on each valid extent, padding stays zero."""
    rng = np.random.RandomState(8)
    rir = _rir(rng, W=8000, delay=300)
    lengths = np.array([4000, 2500, 1])
    N = 4096
    x = rng.randn(3, N)
    x *= np.arange(N) < lengths[:, None]
    got = np.asarray(reverberate(x, rir, lengths=lengths))
    for i, L in enumerate(lengths):
        solo = _reverb_oracle(x[i, :L], rir)
        np.testing.assert_allclose(got[i, :L], solo, rtol=1e-9, atol=1e-12)
        assert (got[i, L:] == 0).all()


def test_reverberate_jits():
    rng = np.random.RandomState(9)
    x = rng.randn(2, 3000).astype(np.float32)
    rir = _rir(rng, W=500, delay=40)
    eager = np.asarray(reverberate(x, rir))
    jitted = np.asarray(jax.jit(lambda s: reverberate(s, rir))(x))
    np.testing.assert_array_equal(eager, jitted)


def test_mix_noise_hits_target_snr():
    rng = np.random.RandomState(10)
    x = rng.randn(4, 8000)
    noise = rng.randn(8000)
    for snr in [0.0, 10.0, 20.0]:
        noisy = np.asarray(mix_noise(None, x, noise, snr))
        added = noisy - x
        meas = 10 * np.log10((x**2).sum(-1) / (added**2).sum(-1))
        np.testing.assert_allclose(meas, snr, atol=1e-8)


def test_mix_noise_per_example_snr_and_lengths():
    rng = np.random.RandomState(11)
    lengths = np.array([8000, 5000, 1000])
    x = rng.randn(3, 8000)
    x *= np.arange(8000) < lengths[:, None]
    snrs = np.array([5.0, 15.0, 25.0])
    noise = rng.randn(3, 8000)
    noisy = np.asarray(mix_noise(None, x, noise, snrs, lengths=lengths))
    for i, (L, s) in enumerate(zip(lengths, snrs)):
        added = noisy[i, :L] - x[i, :L]
        meas = 10 * np.log10((x[i, :L] ** 2).sum() / (added**2).sum())
        np.testing.assert_allclose(meas, s, atol=1e-8)
        assert (noisy[i, L:] == 0).all()
        # solo parity (key=None: same window, energies over the same extent)
        solo = np.asarray(
            mix_noise(None, x[i, :L], noise[i, :L], s)
        )
        np.testing.assert_allclose(noisy[i, :L], solo, rtol=1e-12, atol=0)


def test_mix_noise_random_offsets_decorrelate_and_are_deterministic():
    rng = np.random.RandomState(12)
    x = np.zeros((4, 2000))
    noise = rng.randn(16000)
    key = jax.random.PRNGKey(0)
    # zero signal => scale 0; use snr so scale stays finite: with zero
    # signal energy the noise contribution is zeroed — so instead use a
    # tiny but nonzero signal to expose the windows
    x = rng.randn(4, 2000) * 1e-3
    a = np.asarray(mix_noise(key, x, noise, 0.0))
    b = np.asarray(mix_noise(key, x, noise, 0.0))
    np.testing.assert_array_equal(a, b)
    w = a - x
    # windows drawn at independent offsets from one buffer: rows differ
    assert not np.allclose(w[0], w[1])
    # short buffers tile
    short = np.asarray(mix_noise(key, x, noise[:700], 0.0))
    assert short.shape == x.shape and np.isfinite(short).all()


def test_mix_noise_zero_noise_is_identity():
    rng = np.random.RandomState(13)
    x = rng.randn(2, 1000)
    out = np.asarray(mix_noise(None, x, np.zeros(1000), 10.0))
    np.testing.assert_array_equal(out, x)


def test_speed_perturb_matches_resample_and_lengths():
    from speech_tpu.ops.resample import resample

    rng = np.random.RandomState(14)
    N = 6400
    x = rng.randn(2, N)
    for factor, up, down in [(1.1, 10, 11), (0.9, 10, 9), (1.0, 1, 1)]:
        out = np.asarray(speed_perturb(x, factor))
        want = np.asarray(resample(x, up, down))
        np.testing.assert_array_equal(out, want)
        assert out.shape[-1] == -(-N * up // down)
    lengths = np.array([6400, 3001])
    x2 = x * (np.arange(N) < lengths[:, None])
    out, new_lengths = speed_perturb(x2, 1.1, lengths=lengths)
    out, new_lengths = np.asarray(out), np.asarray(new_lengths)
    np.testing.assert_array_equal(new_lengths, [-(-6400 * 10 // 11), -(-3001 * 10 // 11)])
    for i, (L, NL) in enumerate(zip(lengths, new_lengths)):
        solo = np.asarray(speed_perturb(x2[i, :L], 1.1))
        np.testing.assert_allclose(out[i, :NL], solo[:NL], rtol=1e-12, atol=1e-15)
        assert (out[i, NL:] == 0).all()


def test_random_gain_range_and_independence():
    rng = np.random.RandomState(15)
    x = rng.randn(64, 100)
    out = np.asarray(random_gain(jax.random.PRNGKey(3), x, -6.0, 6.0))
    g = out[:, 0] / x[:, 0]
    db = 20 * np.log10(np.abs(g))
    assert (db >= -6.0 - 1e-6).all() and (db <= 6.0 + 1e-6).all()
    assert len(np.unique(np.round(db, 6))) > 32
    # the whole row shares one gain
    np.testing.assert_allclose(
        out / x, np.broadcast_to(g[:, None], x.shape), rtol=1e-12
    )
