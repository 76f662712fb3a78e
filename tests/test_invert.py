"""Feature inversion: overlap-add, LS-ISTFT, Griffin-Lim, feats->signal."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_tpu.compute import ShortTimeFourierTransformFrameComputer
from speech_tpu.filters import Fbank, HannWindow
from speech_tpu.ops import framing as framing_ops
from speech_tpu.ops import invert as invert_ops
from speech_tpu.ops import stft as stft_ops


def _naive_ola(frames, shift):
    *batch, T, L = frames.shape
    out = np.zeros((*batch, (T - 1) * shift + L), frames.dtype)
    for t in range(T):
        out[..., t * shift : t * shift + L] += frames[..., t, :]
    return out


@pytest.mark.parametrize(
    "T,L,S", [(7, 8, 4), (5, 10, 3), (4, 6, 6), (3, 5, 7), (1, 9, 2)]
)
def test_overlap_add_matches_naive(T, L, S):
    rng = np.random.RandomState(hash((T, L, S)) % 2**31)
    frames = rng.randn(2, T, L)
    got = np.asarray(invert_ops.overlap_add(jnp.asarray(frames), S))
    assert np.allclose(got, _naive_ola(frames, S), atol=1e-12)
    # trimming and padding via length=
    for length in (3, (T - 1) * S + L + 5):
        got = np.asarray(
            invert_ops.overlap_add(jnp.asarray(frames), S, length=length)
        )
        want = _naive_ola(frames, S)
        want = (
            want[..., :length]
            if length <= want.shape[-1]
            else np.pad(
                want,
                [(0, 0)] * (want.ndim - 1) + [(0, length - want.shape[-1])],
            )
        )
        assert np.allclose(got, want, atol=1e-12)


@pytest.mark.parametrize("L,S,dft", [(32, 16, 32), (25, 10, 32), (40, 17, 64)])
def test_istft_reconstructs_stft(L, S, dft):
    """LS-ISTFT inverts the windowed matmul STFT exactly wherever the
    window-power OLA is nonzero — any window/shift, no COLA needed."""
    rng = np.random.RandomState(1234)
    T = 20
    n = (T - 1) * S + L
    x = rng.randn(n)
    window = HannWindow().get_impulse_response(L)
    C, Smat = stft_ops.windowed_dft_matrices(window, dft)
    frames = np.asarray(
        framing_ops.frame_padded(jnp.asarray(x), T, L, S)
    )
    re = frames @ C
    im = frames @ Smat
    y = np.asarray(
        invert_ops.istft(jnp.asarray(re), jnp.asarray(im), window, S, dft_size=dft)
    )
    den = _naive_ola(np.broadcast_to(window**2, (T, L)).copy(), S)
    ok = den > 1e-8
    assert ok.mean() > 0.9
    assert np.allclose(y[ok], x[ok], atol=1e-9)


def test_istft_batched_jit():
    rng = np.random.RandomState(5)
    T, L, S, dft = 12, 24, 12, 32
    window = HannWindow().get_impulse_response(L)
    x = rng.randn(3, (T - 1) * S + L)
    C, Smat = stft_ops.windowed_dft_matrices(window, dft)
    frames = np.stack(
        [
            np.asarray(framing_ops.frame_padded(jnp.asarray(r), T, L, S))
            for r in x
        ]
    )
    re, im = frames @ C, frames @ Smat
    fn = jax.jit(
        lambda a, b: invert_ops.istft(a, b, window, S, dft_size=dft)
    )
    y = np.asarray(fn(jnp.asarray(re), jnp.asarray(im)))
    assert y.shape == x.shape
    den = _naive_ola(np.broadcast_to(window**2, (T, L)).copy(), S)
    ok = den > 1e-8
    assert np.allclose(y[:, ok], x[:, ok], atol=1e-9)


def _spectral_convergence(mag_target, mag_got):
    return np.linalg.norm(mag_got - mag_target) / np.linalg.norm(mag_target)


def test_griffin_lim_recovers_magnitude():
    """From magnitude alone, FGLA drives the re-analysis magnitude close
    to the target (and monotonically better than 1 iteration)."""
    rate = 8000
    t = np.arange(rate) / rate
    x = (
        np.sin(2 * np.pi * 220 * t)
        + 0.5 * np.sin(2 * np.pi * 440 * t + 0.7)
        + 0.01 * np.random.RandomState(0).randn(rate)
    )
    L, S, dft = 200, 80, 256
    T = (len(x) - L) // S + 1
    window = HannWindow().get_impulse_response(L)
    C, Smat = stft_ops.windowed_dft_matrices(window, dft)
    frames = np.asarray(framing_ops.frame_padded(jnp.asarray(x), T, L, S))
    mag = np.hypot(frames @ C, frames @ Smat)

    def sc_after(iters):
        y = np.asarray(
            invert_ops.griffin_lim(
                jnp.asarray(mag), window, S, dft_size=dft, n_iters=iters
            )
        )
        yf = np.asarray(
            framing_ops.frame_padded(jnp.asarray(y[: len(x)]), T, L, S)
        )
        return _spectral_convergence(mag, np.hypot(yf @ C, yf @ Smat))

    sc10, sc80 = sc_after(10), sc_after(80)
    assert sc80 < 0.06
    assert sc80 < sc10 * 0.5


def test_feats_to_signal_roundtrip():
    """Inverting fbank features yields a signal whose features match the
    originals — the envelope contract a lossy bank can actually honor."""
    rate = 8000
    bank = Fbank(num_filts=40, sampling_rate=rate)
    computer = ShortTimeFourierTransformFrameComputer(
        bank, frame_length_ms=25, frame_shift_ms=10
    )
    t = np.arange(rate) / rate
    x = np.sin(2 * np.pi * 300 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
    x += 0.02 * np.random.RandomState(1).randn(rate)
    feats = computer.compute_full(x)
    y = np.asarray(
        invert_ops.feats_to_signal(
            jnp.asarray(feats), computer, n_iters=40, length=len(x)
        )
    )
    assert y.shape == x.shape
    feats2 = computer.compute_full(y)
    assert feats2.shape == feats.shape
    # log-feature MSE small relative to feature variance; plateaus ~0.07
    # (the 40-band pseudo-inverse envelope error, not Griffin-Lim)
    err = np.mean((feats2 - feats) ** 2) / np.var(feats)
    assert err < 0.12


def test_feats_to_signal_energy_column_and_batch():
    rate = 8000
    bank = Fbank(num_filts=20, sampling_rate=rate)
    computer = ShortTimeFourierTransformFrameComputer(
        bank, frame_length_ms=25, frame_shift_ms=10, include_energy=True
    )
    rng = np.random.RandomState(3)
    xs = rng.randn(2, rate // 2)
    feats = np.stack([computer.compute_full(x) for x in xs])
    y = np.asarray(
        invert_ops.feats_to_signal(
            jnp.asarray(feats), computer, n_iters=8, length=xs.shape[-1]
        )
    )
    assert y.shape == xs.shape
    assert np.isfinite(y).all()


def test_bank_pseudo_inverse_envelope():
    """Smooth spectra survive the bank -> pinv round trip closely."""
    rate = 16000
    bank = Fbank(num_filts=80, sampling_rate=rate)
    W = stft_ops.fold_bank_to_weights(bank, 512, use_power=True)
    P = invert_ops.bank_pseudo_inverse(W)
    assert P.shape == (W.shape[1], W.shape[0])
    f = np.linspace(0, 1, W.shape[0])
    spec = np.exp(-3 * f) * (1 + 0.3 * np.sin(8 * f))  # smooth envelope
    back = np.maximum((spec @ W) @ P, 0)
    # compare away from the bank's uncovered band edges
    covered = W.sum(axis=1) > 0.1 * W.sum(axis=1).max()
    rel = np.abs(back - spec)[covered] / spec[covered].max()
    assert rel.max() < 0.25
    assert np.median(rel) < 0.05


def test_feats_to_signal_ragged_lengths_match_solo():
    """Padded rows masked via ``lengths`` invert exactly as they would
    solo (mag AND window-power normalizer masked), and padding is zero."""
    rate = 8000
    bank = Fbank(num_filts=20, sampling_rate=rate)
    computer = ShortTimeFourierTransformFrameComputer(
        bank, frame_length_ms=25, frame_shift_ms=10
    )
    rng = np.random.RandomState(5)
    ns = [rate // 2, rate // 3]
    xs = [rng.randn(n) for n in ns]
    rows = [np.asarray(computer.compute_full(x)) for x in xs]
    counts = np.array([r.shape[0] for r in rows])
    Tmax = counts.max()
    batch = np.stack(
        [np.pad(r, ((0, Tmax - r.shape[0]), (0, 0))) for r in rows]
    )
    length = int(Tmax * computer.frame_shift)
    got = np.asarray(
        invert_ops.feats_to_signal(
            jnp.asarray(batch), computer, n_iters=6, length=length,
            lengths=jnp.asarray(counts),
        )
    )
    for i, r in enumerate(rows):
        solo = np.asarray(
            invert_ops.feats_to_signal(
                jnp.asarray(r), computer, n_iters=6,
                length=int(counts[i]) * computer.frame_shift,
            )
        )
        n_valid = solo.shape[-1]
        assert np.allclose(got[i, :n_valid], solo, atol=1e-10), i
        tail = got[
            i, (counts[i] - 1) * computer.frame_shift + len(computer._window) :
        ]
        assert tail.size == 0 or np.abs(tail).max() == 0.0


def test_griffin_lim_lengths_jit_vmap():
    """The lengths-masked path is jittable with traced counts."""
    window = np.asarray(HannWindow().get_impulse_response(64), np.float64)
    rng = np.random.RandomState(8)
    mag = np.abs(rng.randn(3, 10, 33))
    counts = np.array([10, 7, 4])

    fn = jax.jit(
        lambda m, c: invert_ops.griffin_lim(
            m, window, 16, n_iters=3, lengths=c, length=9 * 16 + 64
        )
    )
    y = np.asarray(fn(jnp.asarray(mag), jnp.asarray(counts)))
    assert y.shape == (3, 9 * 16 + 64)
    assert np.isfinite(y).all()
    # row 2's frames past 4 contribute nothing
    assert np.abs(y[2, 3 * 16 + 64 :]).max() == 0.0
