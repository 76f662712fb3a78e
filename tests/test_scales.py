import numpy as np
import pytest

from speech_tpu.scales import (
    BarkScaling,
    LinearScaling,
    MelScaling,
    OctaveScaling,
    ScalingFunction,
    VTLNScaling,
)


@pytest.fixture(
    params=[
        LinearScaling(10),
        LinearScaling(20, 2.0),
        OctaveScaling(10),
        MelScaling(),
        BarkScaling(),
        VTLNScaling(MelScaling(), warp=1.1),
        VTLNScaling("mel", warp=0.85),
    ],
    ids=[
        "linear", "linear_slope", "octave", "mel", "bark",
        "vtln_1.1", "vtln_0.85",
    ],
)
def scale(request):
    return request.param


def test_scales_invertible(scale):
    for hertz in range(20, 8000, 10):
        scaled = scale.hertz_to_scale(hertz)
        assert np.isclose(hertz, scale.scale_to_hertz(scaled)), hertz


def test_scales_invertible_vectorized(scale):
    hertz = np.linspace(20.0, 8000.0, 1001)
    assert np.allclose(scale.scale_to_hertz(scale.hertz_to_scale(hertz)), hertz)


def test_scales_monotone(scale):
    hertz = np.linspace(20.0, 8000.0, 1001)
    scaled = np.asarray(scale.hertz_to_scale(hertz))
    assert np.all(np.diff(scaled) > 0)


def test_aliases_resolve(scale):
    for alias in type(scale).aliases:
        if alias in {"linear", "uniform", "octave"}:
            args = [10]
        elif alias == "vtln":
            args = ["mel"]
        else:
            args = []
        cls = type(ScalingFunction.from_alias(alias, *args))
        assert issubclass(cls, ScalingFunction)


def test_vectorized_matches_scalar(scale):
    hertz = np.linspace(20.0, 8000.0, 57)
    vec = np.asarray(scale.hertz_to_scale(hertz))
    scal = np.array([scale.hertz_to_scale(float(h)) for h in hertz])
    assert np.allclose(vec, scal, rtol=0, atol=1e-12)


def _kaldi_vtln_warp_freq(
    vtln_low, vtln_high, low, high, warp, freq
):
    """Scalar oracle: Kaldi's VtlnWarpFreq piecewise-linear warp
    (mel-computations; also Ghahremani et al.'s description)."""
    if freq < low or freq > high:
        return freq
    l = vtln_low * max(1.0, warp)
    h = vtln_high * min(1.0, warp)
    scale = 1.0 / warp
    Fl = scale * l
    Fh = scale * h
    scale_left = (Fl - low) / (l - low)
    scale_right = (high - Fh) / (high - h)
    if freq < l:
        return low + scale_left * (freq - low)
    elif freq < h:
        return scale * freq
    else:
        return high + scale_right * (freq - high)


@pytest.mark.parametrize("warp", [0.8, 0.9, 1.0, 1.1, 1.25])
def test_vtln_matches_kaldi_formula(warp):
    vt = VTLNScaling(MelScaling(), warp=warp)
    for f in np.linspace(0.0, 8100.0, 163):
        want = _kaldi_vtln_warp_freq(100.0, 7500.0, 20.0, 8000.0, warp, f)
        assert np.isclose(vt.warp_hz(f), want, rtol=0, atol=1e-9), f
        # the warp round-trips exactly
        assert np.isclose(vt.unwarp_hz(vt.warp_hz(f)), f, atol=1e-9), f
    # warp > 1 moves mid-band filters DOWN, < 1 up (Kaldi convention)
    mel = MelScaling()
    mid = mel.hertz_to_scale(1000.0)
    if warp > 1:
        assert vt.scale_to_hertz(mid) < 1000.0
    elif warp < 1:
        assert vt.scale_to_hertz(mid) > 1000.0
    else:
        assert np.isclose(vt.scale_to_hertz(mid), 1000.0)


def test_vtln_bank_composition():
    """A bank on a VTLN-warped mel scale has warped center freqs, and
    Fbank's Kaldi-style ``vtln_warp`` option does the same."""
    from speech_tpu.filters import Fbank, TriangularOverlappingFilterBank

    base = TriangularOverlappingFilterBank(
        "mel", num_filts=20, low_hz=20.0, high_hz=8000.0
    )
    cfg = {
        "name": "vtln",
        "scaling_function": "mel",
        "warp": 1.1,
        "low_hz": 20.0,
        "high_hz": 8000.0,
    }
    warped = TriangularOverlappingFilterBank(
        cfg, num_filts=20, low_hz=20.0, high_hz=8000.0
    )
    vt = VTLNScaling("mel", warp=1.1, low_hz=20.0, high_hz=8000.0)
    got = np.asarray(warped.centers_hz)
    want = np.asarray([vt.warp_hz(f) for f in base.centers_hz])
    assert np.allclose(got, want, rtol=1e-10)

    fb_base = Fbank(num_filts=20, low_hz=20.0, high_hz=8000.0)
    fb_warp = Fbank(num_filts=20, low_hz=20.0, high_hz=8000.0, vtln_warp=1.1)
    got = np.asarray(fb_warp.centers_hz)
    want = np.asarray([vt.warp_hz(f) for f in fb_base.centers_hz])
    assert np.allclose(got, want, rtol=1e-10)
    # vtln_warp=1.0 is exactly the unwarped bank
    fb_id = Fbank(num_filts=20, low_hz=20.0, high_hz=8000.0, vtln_warp=1.0)
    assert np.allclose(fb_id.centers_hz, fb_base.centers_hz, rtol=0)


def test_vtln_validation():
    with pytest.raises(ValueError):
        VTLNScaling("mel", warp=0.0)
    with pytest.raises(ValueError):
        VTLNScaling("mel", vtln_low_hz=10.0)  # below low_hz
    with pytest.raises(ValueError):
        VTLNScaling("mel", warp=0.01)  # Fl = vtln_low/warp leaves the band
