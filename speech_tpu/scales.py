"""Frequency scaling functions.

Invertible maps between frequency (Hz) and a perceptual "scale" domain, used
to lay out filter bandwidths (reference: src/pydrobert/speech/scales.py).

Unlike the reference (scalar-only), every scale here is vectorized: both
directions accept floats or numpy arrays, which lets filter banks lay out all
their vertices in one shot at construction time.  All arithmetic is float64
on the host; scales are construction-time objects and never run on the TPU.
"""

import abc

import numpy as np

from .alias import AliasedFactory

__all__ = [
    "BarkScaling",
    "LinearScaling",
    "MelScaling",
    "OctaveScaling",
    "ScalingFunction",
]


class ScalingFunction(AliasedFactory):
    """Invertible map between frequency (Hz) and a scale domain."""

    @abc.abstractmethod
    def scale_to_hertz(self, scale):
        """Convert scale value(s) to frequency in Hertz."""
        ...

    @abc.abstractmethod
    def hertz_to_scale(self, hertz):
        """Convert frequency (Hertz) to scale value(s)."""
        ...


class LinearScaling(ScalingFunction):
    """Linear scaling from a low frequency with a fixed slope.

    Parameters
    ----------
    low_hz
        Frequency (Hz) mapping to scale 0.
    slope_hz
        Scale increase per 1 Hz increase in frequency.
    """

    aliases = {"linear", "uniform"}

    def __init__(self, low_hz: float, slope_hz: float = 1.0):
        self.low_hz = low_hz
        self.slope_hz = slope_hz

    def scale_to_hertz(self, scale):
        return scale / self.slope_hz + self.low_hz

    def hertz_to_scale(self, hertz):
        return (hertz - self.low_hz) * self.slope_hz


class OctaveScaling(ScalingFunction):
    """Uniform scaling in the log2 (octave) domain above a low frequency.

    Parameters
    ----------
    low_hz
        Positive frequency (Hz) mapping to scale 0.
    """

    aliases = {"octave"}

    def __init__(self, low_hz: float):
        if low_hz <= 0:
            raise ValueError("low_hz must be positive")
        self.low_hz = low_hz

    def scale_to_hertz(self, scale):
        return np.exp2(scale) * max(1e-10, self.low_hz)

    def hertz_to_scale(self, hertz):
        return np.log2(hertz / max(1e-10, self.low_hz))


class MelScaling(ScalingFunction):
    r"""Mel psychoacoustic scale: :math:`s = 1127 \ln(1 + f / 700)`.

    O'Shaughnessy's functional approximation of Stevens' mel scale
    (reference: scales.py:104-125).
    """

    aliases = {"mel"}

    def scale_to_hertz(self, scale):
        return 700.0 * (np.exp(np.asarray(scale, dtype=np.float64) / 1127.0) - 1.0)

    def hertz_to_scale(self, hertz):
        return 1127.0 * np.log(1.0 + np.asarray(hertz, dtype=np.float64) / 700.0)


class BarkScaling(ScalingFunction):
    r"""Bark psychoacoustic scale (Traunmüller's approximation).

    .. math::

        z = 26.81 f / (1960 + f) - 0.53, \qquad
        s = \begin{cases}
            z + 0.15(2 - z) & z < 2 \\
            z + 0.22(z - 20.1) & z > 20.1 \\
            z & \text{otherwise}
        \end{cases}

    (reference: scales.py:128-171).
    """

    aliases = {"bark"}

    def scale_to_hertz(self, scale):
        scale = np.asarray(scale, dtype=np.float64)
        bark = np.where(
            scale < 2,
            (20.0 * scale - 6.0) / 17.0,
            np.where(scale > 20.1, (50.0 * scale + 221.1) / 61.0, scale),
        )
        out = 1960.0 * (bark + 0.53) / (26.28 - bark)
        return float(out) if out.ndim == 0 else out

    def hertz_to_scale(self, hertz):
        hertz = np.asarray(hertz, dtype=np.float64)
        bark = 26.81 * hertz / (1960.0 + hertz) - 0.53
        out = np.where(
            bark < 2,
            bark + 0.15 * (2.0 - bark),
            np.where(bark > 20.1, bark + 0.22 * (bark - 20.1), bark),
        )
        return float(out) if out.ndim == 0 else out
