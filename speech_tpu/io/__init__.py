"""Signal I/O: multi-format reading with filename-based dispatch.

``read_signal`` mirrors the reference's 10-way dispatch
(reference: src/pydrobert/speech/util.py:338-510): Kaldi tables and streams,
wave files, HDF5, numpy binaries/archives, PyTorch tensors, NIST SPHERE
(including shorten compression), raw binary, and soundfile-supported formats.
Optional backends degrade gracefully when unimportable.
"""

import io as _io

from re import match
from typing import Any, BinaryIO, Optional, Union

import numpy as np

from .. import config
from .sphere import sphere_read_signal  # noqa: F401

__all__ = [
    "read_signal",
    "sphere_read_signal",
    "wds_read_signal",
]


def _kaldi_table_read(rfilename, dtype, key, **kwargs):
    from pydrobert.kaldi.io import open as io_open  # optional external dep

    if key is None:
        key = 0
    if dtype is None:
        dtype = "bm"
    if isinstance(key, str):
        with io_open(rfilename, dtype, mode="r+", **kwargs) as table:
            return table[key]
    with io_open(rfilename, dtype, mode="r", **kwargs) as table:
        for _ in range(key):
            if not table.move():
                raise IndexError("table index out of range")
        return table.value()


def _wav_read(rfilename, dtype, key, **kwargs):
    try:
        from scipy.io import wavfile

        _, data = wavfile.read(rfilename, **kwargs)
    except ImportError:
        import wave

        wave_file = wave.open(rfilename, **kwargs)
        try:
            width = wave_file.getsampwidth()
            data = np.frombuffer(
                wave_file.readframes(wave_file.getnframes()),
                dtype="<i{}".format(width),
            )
            n_channels = wave_file.getnchannels()
            if len(data) % n_channels:
                raise IOError("Number of channels do not evenly divide wave samples")
            if n_channels > 1:
                data = data.reshape((-1, n_channels), order="C")
        finally:
            wave_file.close()
    if dtype:
        data = data.astype(dtype)
    return data


def _hdf5_read(rfilename, dtype, key, **kwargs):
    import h5py

    with h5py.File(rfilename, "r", **kwargs) as h5py_file:
        if key:
            data = h5py_file[key]
        else:
            # depth-first search for the first dataset
            stack = [h5py_file]
            data = None
            while stack:
                cur = stack.pop()
                if isinstance(cur, h5py.Dataset):
                    data = cur
                    break
                names = sorted(cur.keys(), reverse=True)
                stack.extend(cur[name] for name in names)
            if data is None:
                raise IOError("Could not find any dataset")
        data = np.array(data, dtype=dtype) if dtype else np.array(data)
    return data


def _npy_read(rfilename, dtype, key, **kwargs):
    data = np.load(rfilename, **kwargs)
    if dtype:
        data = data.astype(dtype)
    return data


def _npz_read(rfilename, dtype, key, **kwargs):
    archive = np.load(rfilename, **kwargs)
    data = archive[key] if key else archive["arr_0"]
    if dtype:
        data = data.astype(dtype)
    return data


def _torch_read(rfilename, dtype, key, **kwargs):
    import torch

    data = torch.load(rfilename, map_location="cpu", **kwargs).numpy()
    if dtype:
        data = data.astype(dtype)
    return data


def _kaldi_stream_read(rfilename, dtype, key, **kwargs):
    from pydrobert.kaldi.io import open as io_open  # optional external dep

    if dtype is None:
        dtype = "bm"
    with io_open(rfilename, mode="r", **kwargs) as inp_stream:
        return inp_stream.read(dtype)


def _fromfile_read(rfilename, dtype, key, **kwargs):
    if dtype:
        return np.fromfile(rfilename, dtype=dtype, **kwargs)
    return np.fromfile(rfilename, **kwargs)


def _soundfile_read(rfilename, dtype, key, **kwargs):
    import soundfile

    with soundfile.SoundFile(rfilename, **kwargs) as sf:
        if sf.subtype == "FLOAT":
            dtype_ = np.float32
        elif sf.subtype == "DOUBLE":
            dtype_ = np.float64
        elif sf.subtype == "PCM_S8":
            dtype_ = np.int8
        elif sf.subtype == "PCM_U8":
            dtype_ = np.uint8
        elif sf.subtype in {"PCM_32", "PCM_24"}:
            dtype_ = np.int32
        else:
            dtype_ = np.int16
        data = sf.read(dtype=dtype_)
    if dtype is not None:
        # two-stage cast: float dtypes straight from soundfile are rescaled
        # to +/-1, which would not match the other decoders
        data = data.astype(dtype)
    return data


def _infer_force_as(rfilename: str) -> str:
    if match(r"^(ark|scp)(,\w+)*:", rfilename):
        return "table"
    suffix = rfilename.rsplit(".", maxsplit=1)[-1]
    if suffix in config.SOUNDFILE_SUPPORTED_FILE_TYPES:
        return suffix
    if rfilename.endswith(".wav"):
        return "wav"
    if rfilename.endswith(".hdf5"):
        return "hdf5"
    if rfilename.endswith(".npy"):
        return "npy"
    if rfilename.endswith(".npz"):
        return "npz"
    if rfilename.endswith(".pt"):
        return "pt"
    if rfilename.endswith(".sph"):
        return "sph"
    if rfilename.endswith("|"):
        return "kaldi"
    raise IOError(f"Unable to infer file type from {rfilename}. Set force_as.")


_READERS = {
    "table": _kaldi_table_read,
    "wav": _wav_read,
    "hdf5": _hdf5_read,
    "npy": _npy_read,
    "npz": _npz_read,
    "pt": _torch_read,
    "kaldi": _kaldi_stream_read,
    "file": _fromfile_read,
}


def read_signal(
    rfilename: Union[str, BinaryIO],
    dtype: Optional[Any] = None,
    key: Any = None,
    force_as: Optional[str] = None,
    **kwargs,
) -> np.ndarray:
    r"""Read a signal from a variety of sources.

    Dispatch on ``rfilename`` (reference: util.py:362-510):

    1.  ``(ark|scp)(,\w+)*:`` prefix: Kaldi table (needs
        :mod:`pydrobert.kaldi`); ``key`` selects an entry.
    2.  Suffix in ``config.SOUNDFILE_SUPPORTED_FILE_TYPES``: via soundfile.
    3.  ``.wav``: scipy (falling back to :mod:`wave`).
    4.  ``.hdf5``: h5py; ``key`` or depth-first search for the first dataset.
    5.  ``.npy`` / 6. ``.npz``: numpy binary/archive (``key`` or ``arr_0``).
    7.  ``.pt``: PyTorch tensor.
    8.  ``.sph``: NIST SPHERE (pcm/ulaw/alaw/shorten).
    9.  trailing ``|``: Kaldi input stream.
    10. otherwise: error (set ``force_as``).

    Parameters
    ----------
    rfilename
        Path, rspecifier, or open binary file (the latter requires
        ``force_as``).
    dtype
        Cast the result to this numpy dtype.
    key
        Entry selector for table/hdf5/npz types.
    force_as
        Bypass inference: one of ``'table' 'wav' 'hdf5' 'npy' 'npz' 'pt'
        'sph' 'kaldi' 'file' 'soundfile'`` or a soundfile-supported suffix.
    """
    if not isinstance(rfilename, str):
        if force_as is None:
            raise ValueError("cannot infer type from IO stream. Set force_as")
        if force_as in {"kaldi", "table"}:
            raise ValueError("kaldi types can't be read from an IO stream")
    elif force_as is None:
        force_as = _infer_force_as(rfilename)
    if force_as in _READERS:
        return _READERS[force_as](rfilename, dtype, key, **kwargs)
    if force_as == "sph":
        return sphere_read_signal(rfilename, dtype, key)
    if force_as == "soundfile" or force_as in config.SOUNDFILE_SUPPORTED_FILE_TYPES:
        return _soundfile_read(rfilename, dtype, key, **kwargs)
    avail = set(_READERS) | {"sph", "soundfile"} | config.SOUNDFILE_SUPPORTED_FILE_TYPES
    msg = f"force_as ('{force_as}') is not one of {sorted(avail)}."
    if force_as in config._BASE_SOUNDFILE_SUPPORTED_TYPES:
        msg += (
            "\n... but it could be, with the proper version of libsndfile "
            "and pysoundfile installed"
        )
    elif force_as in config._FULL_SOUNDFILE_SUPPORTED_TYPES:
        msg += (
            "\n... but pysoundfile may be able to handle it. "
            "Try setting force_as = 'soundfile'"
        )
    raise ValueError(msg)


def wds_read_signal(key: str, data: bytes) -> Optional[np.ndarray]:
    """WebDataset decoder hook wrapping :func:`read_signal`.

    Returns None when the extension is unrecognized so other decoders get a
    chance (reference: util.py:513-544).  Kaldi types are unsupported.
    """
    try:
        force_as = _infer_force_as(key)
        return read_signal(_io.BytesIO(data), force_as=force_as)
    except Exception:
        return None
