import numpy as np
import pytest

from speech_tpu.scales import (
    BarkScaling,
    LinearScaling,
    MelScaling,
    OctaveScaling,
    ScalingFunction,
)


@pytest.fixture(
    params=[
        LinearScaling(10),
        LinearScaling(20, 2.0),
        OctaveScaling(10),
        MelScaling(),
        BarkScaling(),
    ],
    ids=["linear", "linear_slope", "octave", "mel", "bark"],
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
        cls = type(ScalingFunction.from_alias(alias, *
            ([10] if alias in {"linear", "uniform", "octave"} else [])))
        assert issubclass(cls, ScalingFunction)


def test_vectorized_matches_scalar(scale):
    hertz = np.linspace(20.0, 8000.0, 57)
    vec = np.asarray(scale.hertz_to_scale(hertz))
    scal = np.array([scale.hertz_to_scale(float(h)) for h in hertz])
    assert np.allclose(vec, scal, rtol=0, atol=1e-12)
