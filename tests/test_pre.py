import numpy as np

import jax

from speech_tpu.pre import Dither, Preemphasize, dither, preemphasize


def test_dither_statistics():
    signal = np.zeros(10000)
    dithered = Dither(coeff=0.5).apply(signal)
    assert np.abs(np.mean(dithered)) < 0.05
    assert np.abs(np.std(dithered) - 0.5) < 0.05


def test_dither_jax_statistics():
    signal = np.zeros(10000, dtype=np.float64)
    out = np.asarray(dither(jax.random.PRNGKey(0), signal, 0.5))
    assert np.abs(np.mean(out)) < 0.05
    assert np.abs(np.std(out) - 0.5) < 0.05


def test_dither_deterministic_per_key():
    signal = np.zeros(64)
    key = jax.random.PRNGKey(3)
    a = np.asarray(dither(key, signal, 1.0))
    b = np.asarray(dither(key, signal, 1.0))
    assert np.array_equal(a, b)


def test_preemphasize_boosts_highs():
    # preemphasis increases relative high-frequency mass
    rng = np.random.RandomState(5)
    signal = np.cumsum(rng.randn(8192))  # brownish: low-heavy
    pre = Preemphasize(0.97).apply(signal)
    spec_orig = np.abs(np.fft.rfft(signal))
    spec_pre = np.abs(np.fft.rfft(pre))
    half = len(spec_orig) // 2
    ratio_orig = spec_orig[half:].sum() / spec_orig.sum()
    ratio_pre = spec_pre[half:].sum() / spec_pre.sum()
    assert ratio_pre > ratio_orig


def test_preemphasize_formula():
    signal = np.arange(10, dtype=np.float64)
    out = Preemphasize(0.5).apply(signal)
    expected = signal.copy()
    expected[1:] -= 0.5 * signal[:-1]
    assert np.allclose(out, expected)
    assert np.allclose(np.asarray(preemphasize(signal, 0.5)), expected)


def test_preemphasize_preserves_dtype():
    signal = (np.random.random(100) * 100).astype(np.int16)
    out = Preemphasize().apply(signal)
    assert out.dtype == np.int16
