"""Loader for the native (C++) shorten decoder.

Compiles ``speech_tpu/csrc/shorten.cpp`` with the system C++ compiler on
first use (cached as a ``.so`` beside the source), and exposes it via
ctypes.  Returns None when no compiler/library is available, in which case
callers fall back to the pure-Python decoder in
:mod:`speech_tpu.io.sphere` (same output, bit for bit).
"""

import ctypes
import os
import subprocess
import sysconfig
import tempfile
import threading
import warnings

import numpy as np

__all__ = ["get_shorten_lib", "decode_shorten_native"]

_CSRC = os.path.join(os.path.dirname(os.path.dirname(__file__)), "csrc")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _so_path() -> str:
    tag = sysconfig.get_config_var("SOABI") or "so"
    return os.path.join(_CSRC, f"_shorten.{tag}.so")


def _build() -> str:
    src = os.path.join(_CSRC, "shorten.cpp")
    out = _so_path()
    if os.path.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    # build into a temp file then atomically rename, so concurrent
    # processes never load a half-written library
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_CSRC)
    os.close(fd)
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", tmp, src],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.replace(tmp, out)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return out


def get_shorten_lib():
    """The loaded native library, building it if necessary; None if
    unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        try:
            lib = ctypes.CDLL(_build())
            fn = lib.stpu_decode_shorten
            fn.restype = ctypes.c_longlong
            fn.argtypes = [
                ctypes.c_void_p,
                ctypes.c_size_t,
                ctypes.c_void_p,
                ctypes.c_size_t,
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_int),
            ]
            _LIB = lib
        except Exception as e:  # no compiler, bad toolchain, ...
            warnings.warn(
                f"native shorten decoder unavailable ({e}); using the "
                "pure-Python fallback"
            )
            _LIB = None
        return _LIB


def decode_shorten_native(payload: bytes, out_len: int, ulaw_outward):
    """Decode a full shorten payload with the native library.

    Returns ``(samples, sampsdone)`` with ``samples`` an int32 array of
    interleaved post-fixup values, or None if the library is unavailable.
    Raises IOError on malformed streams (same conditions as the Python
    decoder).
    """
    lib = get_shorten_lib()
    if lib is None:
        return None
    out = np.zeros(out_len, dtype=np.int32)
    table = np.ascontiguousarray(ulaw_outward, dtype=np.uint8)
    assert table.shape == (13, 256)
    ftype = ctypes.c_int(0)
    ret = lib.stpu_decode_shorten(
        payload,
        len(payload),
        out.ctypes.data_as(ctypes.c_void_p),
        out.size,
        table.ctypes.data_as(ctypes.c_void_p),
        ctypes.byref(ftype),
    )
    if ret == -6:
        # header fields exceed the native decoder's working limits but may
        # still be valid; let the caller use the pure-Python decoder
        return None
    if ret < 0:
        messages = {
            -1: "unexpected end of shorten bitstream",
            -2: "unsupported shorten version",
            -3: "bad shorten file type",
            -4: "bad shorten command",
        }
        raise IOError(messages.get(int(ret), f"shorten decode error {ret}"))
    return out, int(ret), int(ftype.value)
