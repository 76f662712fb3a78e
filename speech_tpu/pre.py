"""Pre-processors: transforms applied to raw signals before computing features.

Each processor exposes the reference-compatible host API
(``apply(signal, in_place=False)``; reference: src/pydrobert/speech/pre.py)
plus a pure, jittable functional form for fusing into on-device pipelines
(dither takes an explicit PRNG key, preserving the reference CLI's
seed-per-utterance determinism via ``jax.random.fold_in``).
"""

import abc

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from .alias import AliasedFactory

__all__ = [
    "Dither",
    "Preemphasize",
    "PreProcessor",
    "dither",
    "preemphasize",
]


def preemphasize(signal, coeff: float = 0.97):
    """Jittable preemphasis: ``new[i] = old[i] - coeff * old[i-1]``.

    ``new[0] = old[0]`` (reference: pre.py:107-149).
    """
    signal = jnp.asarray(signal)
    shifted = jnp.pad(signal[..., :-1], [(0, 0)] * (signal.ndim - 1) + [(1, 0)])
    return signal - coeff * shifted


def dither(key, signal, coeff: float = 1.0):
    """Jittable dithering: add N(0, coeff^2) noise (reference: pre.py:67-104)."""
    signal = jnp.asarray(signal)
    return signal + coeff * jax.random.normal(key, signal.shape, signal.dtype)


class PreProcessor(AliasedFactory):
    """A transform applied to a 1D signal tensor."""

    @abc.abstractmethod
    def apply(
        self, signal: np.ndarray, axis: Optional[int] = None, in_place: bool = False
    ) -> np.ndarray:
        """Apply the transformation to a signal.

        Intermediate values are float64; the result is cast back to the
        input dtype.  ``axis`` exists for API compatibility and is ignored
        (preprocessors apply to 1D signals).
        """
        ...


class Dither(PreProcessor):
    """Add Gaussian noise with standard deviation ``coeff`` to a signal.

    The host `apply` draws from numpy's global RNG for reference parity;
    the functional :func:`dither` takes an explicit JAX PRNG key.

    Parameters
    ----------
    coeff
        Standard deviation of the dither.
    """

    aliases = {"dither", "dithering"}

    def __init__(self, coeff: float = 1.0):
        super().__init__()
        self.coeff = coeff

    def apply(
        self, signal: np.ndarray, axis: Optional[int] = None, in_place: bool = False
    ) -> np.ndarray:
        signal_dtype = signal.dtype
        if not in_place or signal.dtype != np.float64:
            signal = signal.astype(np.float64)
        signal += np.random.normal(0, self.coeff, signal.shape)
        return signal.astype(signal_dtype, copy=False)

    def as_jax(self):
        """Return ``(key, signal) -> signal`` for on-device fusion."""
        coeff = self.coeff
        return lambda key, signal: dither(key, signal, coeff)


class Preemphasize(PreProcessor):
    """Attenuate low frequencies by differencing with the previous sample.

    ``new[i] = old[i] - coeff * old[i-1]`` with ``new[0] = old[0]``;
    essentially convolution with a Haar wavelet for positive ``coeff``.

    Parameters
    ----------
    coeff
        Preemphasis coefficient.
    """

    aliases = {"preemphasize", "preemphasis", "preemph"}

    def __init__(self, coeff: float = 0.97):
        super().__init__()
        self.coeff = coeff

    def apply(
        self, signal: np.ndarray, axis: Optional[int] = None, in_place: bool = False
    ) -> np.ndarray:
        signal_dtype = signal.dtype
        if not in_place or signal.dtype != np.float64:
            signal = signal.astype(np.float64)
        signal[..., 1:] -= self.coeff * signal[..., :-1]
        return signal.astype(signal_dtype, copy=False)

    def as_jax(self):
        """Return ``signal -> signal`` for on-device fusion."""
        coeff = self.coeff
        return lambda signal: preemphasize(signal, coeff)
