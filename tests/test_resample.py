"""Polyphase resampler: scipy resample_poly parity and DSP invariants."""

import numpy as np
import pytest

import jax

from speech_tpu.ops.resample import resample, resample_matrices

scipy_signal = pytest.importorskip("scipy.signal")


@pytest.fixture
def signal():
    return np.random.RandomState(5).randn(4800)


@pytest.mark.parametrize(
    "up,down",
    [(2, 1), (1, 2), (3, 2), (2, 3), (160, 441), (441, 160), (16, 7), (4, 4)],
)
def test_resample_matches_scipy(signal, up, down):
    """Same Kaiser-sinc design as scipy's resample_poly default -> the
    float64 outputs agree to roundoff (the polyphase decomposition and
    edge handling are exactly equivalent)."""
    want = scipy_signal.resample_poly(signal, up, down)
    got = np.asarray(resample(signal, up, down))
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=1e-12), np.abs(got - want).max()


def test_resample_batched_jit(signal):
    batch = np.stack([signal, signal[::-1], 0 * signal]).reshape(3, 1, -1)
    got = np.asarray(jax.jit(lambda x: resample(x, 3, 2))(batch))
    for i in range(3):
        want = np.asarray(resample(batch[i, 0], 3, 2))
        assert np.allclose(got[i, 0], want, atol=1e-12)


def test_resample_float32_close_to_float64(signal):
    f64 = np.asarray(resample(signal, 2, 3))
    f32 = np.asarray(resample(signal.astype(np.float32), 2, 3))
    assert f32.dtype == np.float32
    assert np.abs(f32 - f64).max() < 1e-5


def test_resample_int16_upcasts(signal):
    pcm = (signal * 1000).astype(np.int16)
    out = np.asarray(resample(pcm, 2, 1))
    assert out.dtype == np.float32
    want = np.asarray(resample(pcm.astype(np.float32), 2, 1))
    assert np.array_equal(out, want)


def test_resample_tone_survives_roundtrip():
    """A 1 kHz tone at 16 kHz downsampled to 8 kHz keeps its frequency
    and amplitude (interior samples; the FIR is ~80 dB stopband)."""
    rate, f0 = 16000, 1000.0
    t = np.arange(8000) / rate
    x = np.sin(2 * np.pi * f0 * t)
    y = np.asarray(resample(x, 1, 2))
    t2 = np.arange(y.shape[0]) * 2 / rate
    want = np.sin(2 * np.pi * f0 * t2)
    interior = slice(200, -200)
    assert np.abs(y[interior] - want[interior]).max() < 1e-3


def test_resample_dc_gain():
    """Interior DC gain is 1 up to the FIR's interpolation ripple
    (~6e-4 for this Kaiser design — bit-identical to scipy's)."""
    x = np.ones(4000)
    for up, down in ((3, 1), (2, 5), (441, 160)):
        y = np.asarray(resample(x, up, down))
        assert np.abs(y[100:-100] - 1.0).max() < 1e-3, (up, down)
        want = scipy_signal.resample_poly(x, up, down)
        assert np.allclose(y, want, atol=1e-12)


def test_resample_identity():
    x = np.random.RandomState(6).randn(100).astype(np.float32)
    assert np.array_equal(np.asarray(resample(x, 7, 7)), x)


def test_resample_matrices_shape():
    phi, k_min = resample_matrices(3, 2)
    assert phi.shape[0] == 3 and k_min < 0
    # per-phase DC gain is ~1 up to the design's interpolation ripple
    assert np.allclose(phi.sum(axis=1), 1.0, atol=1e-3)


def test_resample_on_mesh(signal):
    from speech_tpu import parallel as par

    mesh = par.make_mesh(("data",))
    n = mesh.shape["data"]
    x = np.stack([np.roll(signal, i) for i in range(n)])
    sharded = jax.device_put(x, par.named_sharding(mesh, "data"))
    got = np.asarray(jax.jit(lambda v: resample(v, 3, 2))(sharded))
    want = np.asarray(resample(x, 3, 2))
    assert np.allclose(got, want, atol=1e-12)


def test_resample_rejects_nonpositive_ratio():
    from speech_tpu.ops.resample import resample_np

    x = np.ones(100, np.float32)
    for up, down in ((0, 2), (2, 0), (-1, 2)):
        with pytest.raises(ValueError, match="positive"):
            resample(x, up, down)
        with pytest.raises(ValueError, match="positive"):
            resample_np(x, up, down)


@pytest.mark.parametrize("stride,width", [(1, 65), (4, 81), (4, 7), (3, 1)])
def test_fir_conv_matmul_matches_direct(stride, width):
    """The banded-Toeplitz block matmul equals the direct strided
    correlation (zero-padded edges) to roundoff, any stride/width."""
    from speech_tpu.ops.resample import fir_conv_matmul

    rng = np.random.RandomState(width * 7 + stride)
    x = rng.randn(2, 1234)
    h = rng.randn(width)
    K = (width - 1) // 2
    n_out = -(-x.shape[-1] // stride)
    got = np.asarray(
        fir_conv_matmul(x, h, stride=stride, pad_left=K, n_out=n_out)
    )
    padded = np.pad(x, [(0, 0), (K, stride * n_out + width)])
    want = np.stack(
        [
            [padded[b, i * stride : i * stride + width] @ h for i in range(n_out)]
            for b in range(x.shape[0])
        ]
    )
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=1e-12), np.abs(got - want).max()


@pytest.mark.parametrize("up,down", [(3, 2), (2, 1), (441, 160)])
def test_fir_conv_matmul_polyphase_matches_resample(signal, up, down):
    """A (P, W) phase matrix interleaves phases — the polyphase
    upsampler's layout: equals resample() to roundoff."""
    from speech_tpu.ops.resample import fir_conv_matmul

    want = np.asarray(resample(signal, up, down))
    phi, k_min = resample_matrices(up, down)
    got = np.asarray(
        fir_conv_matmul(
            signal, phi, stride=down, pad_left=-k_min, n_out=want.shape[-1]
        )
    )
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=1e-12), np.abs(got - want).max()
