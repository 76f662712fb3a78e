"""Pitch tracker (Kaldi compute-kaldi-pitch-style; no reference
counterpart — oracle checks are physical: known-f0 synthetics)."""

import numpy as np
import pytest

import jax

from speech_tpu.ops.pitch import (
    PitchTrack,
    kaldi_pitch,
    nccf_to_pov,
    pitch_feats,
)

RATE = 16000


def _harmonic(f0, seconds=1.0, rate=RATE, noise=0.01, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(int(seconds * rate)) / rate
    sig = sum(
        (0.6 / k) * np.sin(2 * np.pi * f0 * k * t + 0.3 * k) for k in (1, 2, 3)
    )
    return (sig + noise * rng.randn(t.size)).astype(np.float32)


@pytest.mark.parametrize("f0", [120.0, 220.0, 330.0])
def test_tracks_harmonic_tone(f0):
    track = kaldi_pitch(_harmonic(f0), RATE)
    got = np.asarray(track.f0)
    assert np.asarray(track.valid).all()
    assert np.median(np.abs(got - f0)) < 0.02 * f0
    # interior frames (away from onset/offset edges) all lock on
    assert np.abs(got[5:-5] - f0).max() < 0.02 * f0
    assert np.median(np.asarray(nccf_to_pov(track.nccf))) > 0.9


def test_pure_tone_sweep_no_octave_errors():
    """Pure sines across the range: the fine (interpolated) lag grid
    must not lose to a subharmonic whose lag happens to fit the integer
    grid better (regression: 380 Hz tracked at 190 on the integer
    grid)."""
    rng = np.random.RandomState(0)
    t = np.arange(2 * RATE) / RATE
    want = np.arange(60, 400, 20.0)
    sigs = np.stack(
        [np.sin(2 * np.pi * f * t) + 0.05 * rng.randn(t.size) for f in want]
    ).astype(np.float32)
    med = np.median(np.asarray(kaldi_pitch(sigs, RATE).f0), axis=1)
    rel = np.abs(med - want) / want
    assert rel.max() < 0.01, (want[rel.argmax()], med[rel.argmax()])


def test_unvoiced_noise_reads_unvoiced():
    rng = np.random.RandomState(3)
    noise = (0.1 * rng.randn(RATE)).astype(np.float32)
    track = kaldi_pitch(noise, RATE)
    pov = np.asarray(nccf_to_pov(track.nccf))
    assert np.median(pov) < 0.3


def test_viterbi_smooth_on_chirp():
    t = np.arange(RATE) / RATE
    # 100 -> 200 Hz linear chirp: instantaneous f = 100 + 100 t
    phase = 2 * np.pi * (100 * t + 50 * t ** 2)
    sig = np.sin(phase).astype(np.float32)
    f0 = np.asarray(kaldi_pitch(sig, RATE).f0)
    inst = 100 + 100 * (np.arange(f0.size) * 0.010 + 0.0125)  # frame centers
    assert np.abs(f0 - inst).max() < 0.05 * inst.max()
    # Viterbi keeps the track continuous: no octave jumps
    assert np.abs(np.diff(np.log(f0))).max() < 0.2


def test_scale_invariance():
    sig = _harmonic(150.0)
    a = np.asarray(kaldi_pitch(sig, RATE).f0)
    b = np.asarray(kaldi_pitch(100.0 * sig, RATE).f0)
    assert np.allclose(a, b, rtol=1e-3)


def test_batch_lengths_match_solo():
    sig = _harmonic(180.0)
    short = sig[:8000]
    batch = np.stack([sig, np.pad(short, (0, 8000))])
    track = kaldi_pitch(batch, RATE, lengths=np.array([16000, 8000]))
    assert isinstance(track, PitchTrack)
    assert track.f0.shape == track.nccf.shape == track.valid.shape
    solo = kaldi_pitch(short, RATE)
    nv = int(np.asarray(solo.valid).sum())
    assert np.asarray(track.valid)[1].sum() == nv
    # padding is masked before the front-end convolutions, so the batch
    # row sees exactly the solo signal; equality is to f32 roundoff
    # (not bitwise: the NCCF matmuls' reduction grouping may differ
    # between the T=46 and T=96 frame counts)
    assert np.allclose(
        np.asarray(solo.f0)[:nv], np.asarray(track.f0)[1, :nv], rtol=1e-4
    )
    assert not np.asarray(track.valid)[1, nv:].any()


def test_jit_and_grad_free_shapes():
    sig = _harmonic(200.0, seconds=0.5)
    fn = jax.jit(lambda x: kaldi_pitch(x, RATE).f0)
    got = np.asarray(fn(sig))
    want = np.asarray(kaldi_pitch(sig, RATE).f0)
    assert np.allclose(got, want, atol=1e-5)


def test_pitch_feats_shape_and_voicing_split():
    rng = np.random.RandomState(5)
    voiced = _harmonic(140.0)
    noise = (0.1 * rng.randn(RATE)).astype(np.float32)
    fv = np.asarray(pitch_feats(voiced, RATE))
    fn_ = np.asarray(pitch_feats(noise, RATE))
    assert fv.shape == fn_.shape and fv.shape[-1] == 3
    # Kaldi POV feature is strongly negative when voiced, ~0 unvoiced
    assert fv[:, 0].mean() < -0.8
    assert fn_[:, 0].mean() > -0.3
    # normalized log pitch is centered on a steady tone
    assert np.abs(fv[5:-5, 1].mean()) < 0.05
    # delta log pitch ~ 0 on a steady tone
    assert np.abs(fv[5:-5, 2]).max() < 0.05


def test_pitch_feats_masks_padding():
    sig = _harmonic(160.0)
    batch = np.stack([sig, np.pad(sig[:6000], (0, 10000))])
    feats = np.asarray(
        pitch_feats(batch, RATE, lengths=np.array([16000, 6000]))
    )
    track = kaldi_pitch(batch, RATE, lengths=np.array([16000, 6000]))
    nv = int(np.asarray(track.valid)[1].sum())
    assert np.all(feats[1, nv:] == 0.0)
    assert not np.all(feats[1, :nv] == 0.0)


def test_validation_errors():
    with pytest.raises(ValueError, match="min_f0"):
        kaldi_pitch(np.zeros(8000, np.float32), RATE, min_f0=500, max_f0=400)
    with pytest.raises(ValueError, match="normalization_window"):
        pitch_feats(np.zeros(8000, np.float32), RATE, normalization_window=0)
    with pytest.raises(ValueError, match="delta_window"):
        pitch_feats(np.zeros(8000, np.float32), RATE, delta_window=0)
    with pytest.raises(ValueError, match="too short"):
        kaldi_pitch(np.zeros(100, np.float32), RATE)
    with pytest.raises(ValueError, match="lengths shape"):
        kaldi_pitch(
            np.zeros((2, 8000), np.float32), RATE, lengths=np.array([1, 2, 3])
        )


def test_works_at_native_rate_without_resample():
    sig = _harmonic(250.0)
    track = kaldi_pitch(sig, RATE, resample_rate=None, lowpass_cutoff=None)
    f0 = np.asarray(track.f0)
    assert np.median(np.abs(f0 - 250.0)) < 5.0


def test_real_speech_plausible():
    """On the repo's real utterance: f0 within speech range on voiced
    frames, and a nontrivial voiced/unvoiced split."""
    from speech_tpu.io import read_signal

    sig = read_signal("tests/audio/test.wav", dtype=np.float32)
    track = kaldi_pitch(sig, RATE)
    pov = np.asarray(nccf_to_pov(track.nccf))
    voiced = pov > 0.5
    assert 0.05 < voiced.mean() < 0.95
    f0 = np.asarray(track.f0)[voiced]
    # the search range, inclusive, with grid-edge f32 roundoff slack
    assert ((f0 >= 49.9) & (f0 <= 400.1)).all()
    assert 60 < np.median(f0) < 350


@pytest.mark.parametrize(
    "rate,kwargs",
    [
        (8000, {}),
        (44100, {}),
        (16000, {"resample_rate": 8000.0, "lowpass_cutoff": 2000.0}),
        (16000, {"min_f0": 80.0, "max_f0": 300.0}),
        (16000, {"frame_length_ms": 35.0, "frame_shift_ms": 15.0}),
        (16000, {"lag_resolution": 0.02, "penalty_factor": 0.3}),
        (4000, {"resample_rate": 4000.0}),  # no-op resample branch
    ],
)
def test_config_fuzz_tracks_tone(rate, kwargs):
    """Odd-but-legal configs must trace and still track a mid-range
    tone (guards the static shape arithmetic across rates/grids)."""
    rng = np.random.RandomState(11)
    t = np.arange(int(1.0 * rate)) / rate
    sig = (np.sin(2 * np.pi * 150.0 * t) + 0.05 * rng.randn(t.size)).astype(
        np.float32
    )
    f0 = np.asarray(kaldi_pitch(sig, rate, **kwargs).f0)
    assert np.abs(np.median(f0) - 150.0) < 7.5
