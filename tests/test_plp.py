"""PLP cepstra: Levinson/cepstrum math validated from first principles
(exact Yule-Walker autocorrelations, dense-FFT cepstrum oracle), plus
host/device twin parity and the post-processor surface."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_tpu.ops import plp as plp_ops
from speech_tpu.post import PLP, PostProcessor


def _yule_walker_autocorr(a, p_extra=0):
    """Exact autocorrelations of the AR process ``x_t = sum a_i x_{t-i}
    + e_t`` (unit-variance noise): solve the Yule-Walker system."""
    p = len(a)
    n = p + 1 + p_extra
    # unknowns r_0..r_{n-1}; equations: r_0 - sum a_i r_i = 1;
    # r_k - sum a_i r_{|k-i|} = 0 for k >= 1
    A = np.zeros((n, n))
    b = np.zeros(n)
    b[0] = 1.0
    for k in range(n):
        A[k, k] += 1.0
        for i, ai in enumerate(a, start=1):
            A[k, abs(k - i)] -= ai
    return np.linalg.solve(A, b)


@pytest.mark.parametrize(
    "a", [[0.5], [0.9, -0.4], [1.2, -0.6, 0.08], [0.3, 0.1, -0.2, 0.05]]
)
def test_levinson_recovers_ar_exactly(a):
    r = _yule_walker_autocorr(a)
    got_a, err = plp_ops._levinson(
        r[None], len(a), np, np.finfo(np.float64).tiny
    )
    assert np.allclose(np.array(got_a).ravel(), a, atol=1e-10)
    assert np.allclose(err, 1.0, atol=1e-10)  # unit noise variance


def test_lpc_cepstrum_matches_fft_oracle():
    """c_n from the recursion == real cepstrum of log(err/|A|^2)."""
    a = [0.9, -0.5, 0.1]
    r = _yule_walker_autocorr(a)
    coef, err = plp_ops._levinson(r[None], len(a), np, 0.0)
    c = plp_ops._lpc_cepstrum(coef, 9)
    # dense spectrum of the model
    N = 1 << 14
    w = 2 * np.pi * np.arange(N) / N
    A = 1.0 - sum(
        ai * np.exp(-1j * (i + 1) * w) for i, ai in enumerate(a)
    )
    logP = np.log(err[0] / np.abs(A) ** 2)
    ceps = np.fft.ifft(logP).real
    for n in range(1, 9):
        # log(err/|A|^2) = c_0 + 2 sum c_n cos(n w): the two-sided real
        # cepstrum at lag n is exactly the one-sided LPC c_n
        assert abs(c[n - 1][0] - ceps[n]) < 1e-8, n


def test_plp_device_matches_host_twin():
    rng = np.random.RandomState(0)
    centers = np.linspace(100, 7500, 23)
    x = rng.gamma(2.0, 1e4, size=(3, 17, 23))
    want = plp_ops.plp_np(x, centers)
    got = np.asarray(jax.jit(
        lambda v: plp_ops.plp(v, tuple(centers))
    )(jnp.asarray(x)))
    assert got.shape == want.shape == (3, 17, 13)
    assert np.abs(got - want).max() < 1e-10


def test_plp_f32_close_to_f64():
    rng = np.random.RandomState(1)
    centers = np.linspace(100, 7500, 23)
    x = rng.gamma(2.0, 1e4, size=(40, 23))
    want = plp_ops.plp_np(x, centers)
    got = np.asarray(plp_ops.plp(jnp.asarray(x, jnp.float32), tuple(centers)))
    assert np.abs(got - want).max() < 2e-3
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-4


def test_plp_padded_zero_frames_finite():
    centers = np.linspace(100, 3800, 15)
    x = np.zeros((4, 15))
    out = plp_ops.plp_np(x, centers)
    assert np.isfinite(out).all()
    out_dev = np.asarray(plp_ops.plp(jnp.zeros((4, 15), jnp.float32), centers))
    assert np.isfinite(out_dev).all()


def test_plp_validation():
    centers = np.linspace(100, 3800, 15)
    with pytest.raises(ValueError, match="center_hz"):
        plp_ops.plp_np(np.ones((2, 10)), centers)
    with pytest.raises(ValueError, match="num_ceps"):
        plp_ops.plp_np(np.ones((2, 15)), centers, order=4, num_ceps=6)
    with pytest.raises(ValueError, match="order"):
        plp_ops.plp_np(np.ones((2, 15)), centers, order=17)
    with pytest.raises(ValueError, match="compress"):
        plp_ops.plp_np(np.ones((2, 15)), centers, compress=0.0)


def test_equal_loudness_shape():
    E = plp_ops.equal_loudness([100.0, 1000.0, 4000.0])
    assert E.shape == (3,)
    # rising toward the 3-4 kHz sensitivity peak
    assert E[0] < E[1] < E[2] and 0.3 < E[2] < 1.5


def test_post_plp_end_to_end():
    """Linear-power computer -> PLP post-op, via the alias factory."""
    from speech_tpu.alias import alias_factory_subclass_from_arg
    from speech_tpu.compute import FrameComputer

    bank_cfg = {"name": "fbank", "num_filts": 23, "sampling_rate": 16000}
    computer = alias_factory_subclass_from_arg(
        FrameComputer,
        {
            "name": "stft",
            "bank": dict(bank_cfg),
            "frame_length_ms": 25,
            "frame_shift_ms": 10,
            "use_log": False,
            "use_power": True,
            "dtype": "float64",
        },
    )
    post = alias_factory_subclass_from_arg(
        PostProcessor, {"name": "plp", "bank": bank_cfg}
    )
    rng = np.random.RandomState(2)
    t = np.arange(16000) / 16000.0
    sig = 8000 * np.sin(2 * np.pi * 220 * t) + 100 * rng.randn(16000)
    feats = np.asarray(computer.compute_full(sig))
    out = post.apply(feats, axis=-1)
    assert out.shape == (feats.shape[0], 13)
    assert np.isfinite(out).all()
    # matches calling the op directly with the bank's centers
    from speech_tpu.filters import Fbank

    want = plp_ops.plp_np(feats, Fbank(**{k: v for k, v in bank_cfg.items() if k != "name"}).centers_hz)
    assert np.abs(out - want).max() < 1e-12


def test_post_plp_validation():
    with pytest.raises(ValueError, match="exactly one"):
        PLP()
    with pytest.raises(ValueError, match="exactly one"):
        PLP(bank="fbank", center_hz=[100.0] * 23)
    p = PLP(center_hz=list(np.linspace(100, 7000, 23)))
    with pytest.raises(RuntimeError, match="bands"):
        p.apply(np.ones((5, 9)))
