"""Utility math helpers + package metadata."""

import numpy as np
import pytest

import speech_tpu
from speech_tpu import utils


def test_version_set():
    assert speech_tpu.__version__
    assert speech_tpu.__version__ != "inplace"


def test_hertz_angular_roundtrip():
    rate = 16000
    for hz in (20.0, 440.0, 7999.0):
        ang = utils.hertz_to_angular(hz, rate)
        assert np.isclose(utils.angular_to_hertz(ang, rate), hz)
    assert np.isclose(utils.hertz_to_angular(rate / 2, rate), np.pi)


def test_gauss_quant_matches_scipy_or_is_close(reference_speech):
    from pydrobert.speech.util import gauss_quant as ref_gq

    for p in (0.01, 0.25, 0.5, 0.75, 0.99):
        assert np.isclose(
            utils.gauss_quant(p), ref_gq(p), atol=1e-5
        ), p
    # mean/std scaling
    assert np.isclose(
        utils.gauss_quant(0.75, mu=3, std=2), 3 + 2 * utils.gauss_quant(0.75)
    )


def test_gauss_quant_inverts_cdf():
    try:
        from math import erf
    except ImportError:  # pragma: no cover
        pytest.skip("no erf")
    for p in (0.1, 0.3, 0.5, 0.9):
        x = utils.gauss_quant(p)
        cdf = 0.5 * (1 + erf(x / np.sqrt(2)))
        assert np.isclose(cdf, p, atol=1e-5)


def test_circshift_fourier_matches_roll(reference_speech):
    rng = np.random.RandomState(90)
    x = rng.randn(64)
    X = np.fft.fft(x)
    for shift in (0, 1, 5, -3, 63):
        shifted = utils.circshift_fourier(X.copy(), shift)
        want = np.fft.fft(np.roll(x, shift))
        assert np.allclose(shifted, want, atol=1e-10), shift


def test_circshift_fourier_half_spectrum():
    rng = np.random.RandomState(91)
    x = rng.randn(64)
    half = np.fft.rfft(x)
    shifted = utils.circshift_fourier(half.copy(), 7, dft_size=64, start_idx=0)
    want = np.fft.rfft(np.roll(x, 7))
    assert np.allclose(shifted, want, atol=1e-10)


def test_stage_timer():
    import time

    from speech_tpu.profiling import StageTimer

    t = StageTimer()
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    assert t.totals["a"] >= 0.01
    s = t.summary()
    assert "a: " in s and "b: " in s and "/2x" in s


def test_trace_propagates_body_exception(tmp_path):
    """An exception raised inside the traced region must come out as-is,
    not be swallowed into a contextlib RuntimeError."""
    from speech_tpu.profiling import trace

    with pytest.raises(ValueError, match="body boom"):
        with trace(str(tmp_path)):
            raise ValueError("body boom")
    with pytest.raises(ValueError, match="body boom"):
        with trace(None):
            raise ValueError("body boom")


def test_log32_accuracy():
    """Accurate f32 log (TPU's hardware approximation is ~1e-4; this
    software log must stay at the f32 ulp floor)."""
    from speech_tpu.ops.xmath import log32, xlog

    rng = np.random.RandomState(3)
    v = np.exp(rng.uniform(np.log(1e-8), np.log(1e8), size=(1 << 16,)))
    v32 = v.astype(np.float32)
    got = np.asarray(log32(v32), np.float64)
    want = np.log(v32.astype(np.float64))
    assert np.max(np.abs(got - want)) < 2e-6
    # the cancellation zone around 1 must stay accurate too
    v32 = (1 + rng.uniform(-0.5, 0.5, size=(1 << 14,))).astype(np.float32)
    got = np.asarray(log32(v32), np.float64)
    want = np.log(v32.astype(np.float64))
    assert np.max(np.abs(got - want)) < 1e-7
    # xlog dispatches by dtype: float64 goes through jnp.log untouched
    v64 = np.asarray([0.5, 1.0, 3e10])
    assert np.allclose(np.asarray(xlog(v64)), np.log(v64), atol=1e-14)


def test_utils_compat_reexports():
    """The reference exposes the alias helper + signal readers from util
    (reference: util.py:28-34, 362, 513); ours forward to their canonical
    homes."""
    from speech_tpu import utils
    from speech_tpu.filters import LinearFilterBank

    bank = utils.alias_factory_subclass_from_arg(LinearFilterBank, "fbank")
    assert bank.num_filts == 40
    assert utils.read_signal is not None and utils.wds_read_signal is not None


def test_util_module_name_alias():
    """`speech_tpu.util` keeps the reference's module name importable
    (reference: src/pydrobert/speech/util.py) — every public name of the
    reference module resolves on it."""
    from speech_tpu import util

    for name in (
        "alias_factory_subclass_from_arg",
        "angular_to_hertz",
        "circshift_fourier",
        "gauss_quant",
        "hertz_to_angular",
        "read_signal",
        "wds_read_signal",
    ):
        assert callable(getattr(util, name)), name
    from speech_tpu import io as _io
    from speech_tpu import utils as _utils

    assert util.gauss_quant is _utils.gauss_quant
    assert util.read_signal is _io.read_signal


def test_log32_gradient_exact():
    """log32's bit-split blocks autodiff, so it carries a custom JVP with
    the exact derivative 1/x — both AD directions must produce it
    (regression: gradients through every f32 feature log were silently
    zero without it)."""
    import jax
    import jax.numpy as jnp

    from speech_tpu.ops.xmath import log32, xlog

    x = np.asarray([1e-4, 0.3, 1.0, 42.0, 3e5], np.float32)
    grad = np.asarray(jax.vmap(jax.grad(log32))(x))
    assert np.allclose(grad, 1.0 / x, rtol=1e-6)
    _, jvp = jax.jvp(log32, (x,), (np.ones_like(x),))
    assert np.allclose(np.asarray(jvp), 1.0 / x, rtol=1e-6)
    # the f32 xlog dispatch path is the one production code hits
    gx = np.asarray(jax.grad(lambda v: jnp.sum(xlog(v)))(x))
    assert np.allclose(gx, 1.0 / x, rtol=1e-6)
