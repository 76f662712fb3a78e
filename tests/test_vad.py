"""Energy VAD: Kaldi compute-vad-energy semantics, numpy-oracle checked."""

import numpy as np
import pytest

import jax

from speech_tpu.ops.vad import energy_vad


def _oracle(e, et=5.0, ems=0.5, ctx=0, prop=0.6, length=None):
    """Per-frame reimplementation of Kaldi's compute-vad-energy."""
    n = len(e) if length is None else length
    thresh = et + (ems * np.mean(e[:n]) if ems else 0.0)
    out = np.zeros(len(e), bool)
    for i in range(n):
        lo, hi = max(0, i - ctx), min(n, i + ctx + 1)
        num = np.sum(e[lo:hi] > thresh)
        out[i] = num >= prop * (hi - lo)
    return out


@pytest.fixture
def log_energy():
    rng = np.random.RandomState(9)
    e = rng.randn(200) * 2 + 8
    e[60:120] -= 12  # a silence stretch
    return e


@pytest.mark.parametrize("ctx,prop", [(0, 0.6), (2, 0.6), (5, 0.3), (30, 0.9)])
def test_energy_vad_matches_oracle(log_energy, ctx, prop):
    want = _oracle(log_energy, ctx=ctx, prop=prop)
    got = np.asarray(
        energy_vad(
            log_energy, frames_context=ctx, proportion_threshold=prop
        )
    )
    assert np.array_equal(got, want)


def test_energy_vad_fixed_threshold(log_energy):
    want = _oracle(log_energy, et=7.5, ems=0.0, ctx=3)
    got = np.asarray(
        energy_vad(
            log_energy, energy_threshold=7.5, energy_mean_scale=0.0,
            frames_context=3,
        )
    )
    assert np.array_equal(got, want)


def test_energy_vad_batched_lengths(log_energy):
    """Each row's adaptive mean and context use only its valid frames;
    padded frames are unvoiced."""
    e = np.stack([log_energy, np.roll(log_energy, 50)])
    e[1, 150:] = 99.0  # garbage padding that must not leak
    lengths = np.array([200, 150])
    got = np.asarray(energy_vad(e, frames_context=4, lengths=lengths))
    for i, n in enumerate(lengths):
        want = _oracle(e[i], ctx=4, length=n)
        assert np.array_equal(got[i], want), i
        assert not got[i, n:].any()


def test_energy_vad_jit_and_validation(log_energy):
    f = jax.jit(lambda e: energy_vad(e, frames_context=2))
    assert np.array_equal(
        np.asarray(f(log_energy)),
        np.asarray(energy_vad(log_energy, frames_context=2)),
    )
    with pytest.raises(ValueError, match="frames_context"):
        energy_vad(log_energy, frames_context=-1)
    with pytest.raises(ValueError, match="proportion"):
        energy_vad(log_energy, proportion_threshold=1.0)


def test_energy_vad_with_computer_energy():
    """End-to-end: the STFT computer's include_energy column drives VAD."""
    from speech_tpu.compute import STFTFrameComputer

    computer = STFTFrameComputer(
        {"name": "fbank", "num_filts": 8, "sampling_rate": 16000},
        frame_length_ms=25, frame_shift_ms=10, include_energy=True,
        dtype="float64",
    )
    rng = np.random.RandomState(3)
    sig = np.zeros(32000)
    sig[8000:24000] = rng.randn(16000) * 5000  # speech burst mid-file
    feats = np.asarray(computer.compute_full(sig))
    voiced = np.asarray(energy_vad(feats[:, 0], frames_context=2))
    # the burst is detected, the silent edges are not
    assert voiced[60:140].mean() > 0.9
    assert voiced[:40].mean() < 0.1 and voiced[-40:].mean() < 0.1


@pytest.mark.parametrize("ctx,prop", [(0, 0.6), (2, 0.6), (5, 0.3), (30, 0.9)])
def test_energy_vad_np_twin(log_energy, ctx, prop):
    """The host twin used by the CLIs matches the device op exactly."""
    from speech_tpu.ops.vad import energy_vad_np

    want = np.asarray(
        energy_vad(log_energy, frames_context=ctx, proportion_threshold=prop)
    )
    got = energy_vad_np(
        log_energy, frames_context=ctx, proportion_threshold=prop
    )
    assert np.array_equal(got, want)
    # fixed threshold + empty input edge cases
    assert np.array_equal(
        energy_vad_np(log_energy, energy_mean_scale=0.0, energy_threshold=7.5),
        np.asarray(
            energy_vad(log_energy, energy_mean_scale=0.0, energy_threshold=7.5)
        ),
    )
    assert energy_vad_np(np.zeros(0)).shape == (0,)
    with pytest.raises(ValueError, match="1-D"):
        energy_vad_np(np.zeros((2, 3)))
