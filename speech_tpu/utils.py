"""Miscellaneous host-side math utilities.

(reference: src/pydrobert/speech/util.py:55-186; the signal-reading dispatch
that makes up the rest of that module lives in :mod:`speech_tpu.io`.)
"""

from typing import Optional

import numpy as np

__all__ = [
    "angular_to_hertz",
    "circshift_fourier",
    "gauss_quant",
    "hertz_to_angular",
]


def enable_persistent_compilation_cache(cache_dir=None, explain=False):
    """Point jax at an on-disk compilation cache (no-op if already set).

    TPU compiles of the feature pipelines can take minutes; the persistent
    cache makes every later process start instantly.  Called by the CLI and
    benchmarks; safe to call any time before the first compilation.

    ``explain=True`` additionally turns on jax's cache-miss logging
    (``jax_explain_cache_misses``) — every compile logs whether the
    persistent cache was consulted and why it missed, the first thing to
    reach for when a "warm" process still compiles.  For guaranteed
    zero-compile cold starts use :mod:`speech_tpu.aot` instead, which
    keys on the program's own StableHLO and does not depend on jax's
    internal cache keys.
    """
    import os

    import jax

    if explain:
        try:
            jax.config.update("jax_explain_cache_misses", True)
        except Exception:  # pragma: no cover - diagnosis is best-effort
            pass  # never let the explain flag disable the cache below
    try:
        if jax.default_backend() == "cpu":
            # CPU AOT cache entries are machine-feature specific and can
            # SIGILL when loaded on a different host; only cache TPU code
            return
        if jax.config.jax_compilation_cache_dir:
            return
        if cache_dir is None:
            cache_dir = os.environ.get(
                "JAX_COMPILATION_CACHE_DIR",
                os.path.join(
                    os.path.expanduser("~"), ".cache", "speech_tpu_jax"
                ),
            )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


def hertz_to_angular(hertz, samp_rate):
    """Convert cycles/sec to radians/sec."""
    return hertz * 2 * np.pi / samp_rate


def angular_to_hertz(angle, samp_rate):
    """Convert radians/sec to cycles/sec."""
    return angle * samp_rate / (2 * np.pi)


def _gauss_quant_odeh_evans(p: float, mu: float = 0, std: float = 1) -> float:
    # rational approximation of the normal quantile (Odeh & Evans 1974)
    r = 1 - p if p > 0.5 else p
    if r < 1e-20:
        z = 10
    else:
        y = (-2 * np.log(r)) ** 0.5
        z = (
            ((4.53642210148e-5 * y + 0.0204231210245) * y + 0.342242088547) * y + 1
        ) * y + 0.322232431088
        z /= (
            ((0.0038560700634 * y + 0.10353775285) * y + 0.531103462366) * y
            + 0.588581570495
        ) * y + 0.099348462606
        z = y - z
    if p < 0.5:
        z = -z
    return z * std + mu


try:
    from scipy.stats import norm as _norm

    def gauss_quant(p: float, mu: float = 0, std: float = 1) -> float:
        return _norm.ppf(p) * std + mu

except ImportError:  # pragma: no cover
    gauss_quant = _gauss_quant_odeh_evans

gauss_quant.__doc__ = """Gaussian quantile (inverse CDF) function.

Uses :func:`scipy.stats.norm.ppf` when scipy is importable, otherwise the
Odeh & Evans (1974) rational approximation.

Parameters
----------
p
    The probability.
mu
    The Gaussian mean.
std
    The Gaussian standard deviation.
"""


def circshift_fourier(
    filt: np.ndarray,
    shift: float,
    start_idx: int = 0,
    dft_size: Optional[int] = None,
    copy: bool = True,
) -> np.ndarray:
    r"""Circularly shift a filter in time, from the Fourier domain.

    Applies the DFT shift theorem
    :math:`DFT(T_u x)[k] = DFT(x)[k] e^{-2 i \pi k u}` with
    ``u = shift / dft_size`` (reference: util.py:118-186).

    Parameters
    ----------
    filt
        The filter, in the Fourier domain.
    shift
        Number of samples to translate by.
    start_idx
        If ``filt`` is a truncated response, the DFT index where its nonzero
        region starts.
    dft_size
        DFT size; defaults to ``len(filt) + start_idx``.
    copy
        Whether to leave ``filt`` untouched.

    Returns
    -------
    np.ndarray
        complex128 shifted frequency response.
    """
    if dft_size is None:
        dft_size = len(filt) + start_idx
    shift %= dft_size
    phase = np.exp(
        -2j
        * np.pi
        * shift
        / dft_size
        * (np.arange(start_idx, start_idx + len(filt)) % dft_size)
    )
    if copy or filt.dtype != np.complex128:
        return filt * phase
    filt *= phase
    return filt


def read_signal(*args, **kwargs):
    """Compatibility re-export of :func:`speech_tpu.io.read_signal`.

    The reference exposes signal reading from its util module
    (reference: util.py:362); the canonical home here is
    :mod:`speech_tpu.io`.
    """
    from .io import read_signal as _read_signal

    return _read_signal(*args, **kwargs)


def wds_read_signal(key, data):
    """Compatibility re-export of :func:`speech_tpu.io.wds_read_signal`
    (reference: util.py:513)."""
    from .io import wds_read_signal as _wds

    return _wds(key, data)


def alias_factory_subclass_from_arg(factory_class, arg):
    """Compatibility re-export of
    :func:`speech_tpu.alias.alias_factory_subclass_from_arg`.

    The reference re-exports the alias-factory helper from its util module
    (reference: util.py:28-34); the canonical home here is
    :mod:`speech_tpu.alias`.
    """
    from .alias import alias_factory_subclass_from_arg as _impl

    return _impl(factory_class, arg)
