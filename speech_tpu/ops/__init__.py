"""Jittable array programs (the TPU compute path).

Everything in this package is a pure function of arrays + static Python
config, safe to ``jax.jit``/``vmap``/``shard_map``.  Host-side precompute
(filter banks, windows) lives in :mod:`speech_tpu.filters`; classes tying the
two together live in :mod:`speech_tpu.compute`.
"""

from . import (  # noqa: F401
    augment,
    framing,
    invert,
    pallas_stft,
    pitch,
    plp,
    postops,
    resample,
    si,
    stft,
    vad,
    xmath,
)
