"""Package-wide constants and runtime flags.

TPU-native re-imagining of the constants module of ``pydrobert-speech``
(reference: src/pydrobert/speech/config.py).  The reference toggles between
numpy and scipy FFT backends; here the analogous runtime switch selects how
the short-time Fourier transform is realised on the accelerator: XLA's FFT
op, or a windowed-DFT expressed as two matrix multiplies that run on the
TPU's MXU (usually faster for speech-sized DFTs), or a fused Pallas kernel.
"""

from typing import Set

__all__ = [
    "EFFECTIVE_SUPPORT_THRESHOLD",
    "LOG_FLOOR_VALUE",
    "SOUNDFILE_SUPPORTED_FILE_TYPES",
    "FFT_MODE",
    "VALID_FFT_MODES",
    "SI_DIGIT_PARAM_BYTE_LIMIT",
]

EFFECTIVE_SUPPORT_THRESHOLD: float = 5e-4
"""Value considered roughly zero for filter support computations.

No function is compactly supported in both the time and Fourier domains, but
large regions of either domain can be very close to zero. This threshold
defines "effectively zero" when deriving finite supports of analytically
infinite filters (reference: config.py:43).
"""

LOG_FLOOR_VALUE: float = 1e-5
"""Floor applied before taking logarithms in feature computations
(reference: config.py:52)."""

VALID_FFT_MODES = ("auto", "fft", "matmul", "pallas")

SI_DIGIT_PARAM_BYTE_LIMIT: int = 1 << 29  # 512 MiB
"""Construction-time ceiling on the SI digit tiers' parameter planes.

The SI ``precision='double'``/``'accurate'`` tiers store banded-Toeplitz
conv matrices as integer digit planes whose size scales with the squared
filter support (``n_digits * parts * (K + 1) * num_filts * V * V``
float32s, ``K = ceil((max_support - 1) / V)``).  Gammatone/gabor-class
supports (hundreds of taps) cost 100-150 MiB; fbank-class SI supports
(~7000 taps) cost ~700-850 MiB of parameter planes alone — and several
times that again in live einsum buffers at production batch sizes — an
opaque OOM deep inside jit.  Constructors estimate the parameter bytes
up front and raise a descriptive ``ValueError`` above this limit; raise
it (or set to 0 to disable the guard) if the device really has the
memory.
"""

FFT_MODE: str = "auto"
"""How jitted computers realise the DFT on device.

- ``"fft"``: ``jnp.fft.rfft`` (XLA's FFT op).
- ``"matmul"``: windowed DFT as two real matmuls against precomputed
  cosine/sine matrices; runs on the MXU and is typically fastest for
  speech-sized DFTs (<= 2048 points).
- ``"pallas"``: fused Pallas TPU kernel (framing + DFT-matmul + filter
  reduction in one kernel).
- ``"auto"``: pick per dft size / platform.

This plays the role of the reference's ``USE_FFTPACK`` switch
(reference: config.py:27-41): a runtime-mutable global selecting the FFT
implementation, which must not change results beyond numerical noise.
"""

# Optional soundfile probing, mirroring reference config.py:56-85. libsndfile
# is not part of this environment's baked-in set, so this usually stays empty,
# but the dispatch logic in speech_tpu.io honors it when available.
_BASE_SOUNDFILE_SUPPORTED_TYPES = {"wav", "ogg", "flac", "aiff"}
_FULL_SOUNDFILE_SUPPORTED_TYPES: Set[str] = set()

SOUNDFILE_SUPPORTED_FILE_TYPES: Set[str] = set()
"""File suffixes delegated to :mod:`soundfile` when it is importable
(reference: config.py:61-85)."""

try:  # pragma: no cover - soundfile not in the baked-in environment
    import soundfile as _sf

    _FULL_SOUNDFILE_SUPPORTED_TYPES = set(
        x.lower() for x in _sf.available_formats()
    )
    SOUNDFILE_SUPPORTED_FILE_TYPES = (
        _BASE_SOUNDFILE_SUPPORTED_TYPES & _FULL_SOUNDFILE_SUPPORTED_TYPES
    )
except ImportError:
    pass
