"""Native (C++) shorten decoder: builds, and is bit-exact vs Python."""

import glob
import os

import numpy as np
import pytest

from speech_tpu.io import _native
from speech_tpu.io import sphere

AUDIO_DIR = os.path.join(os.path.dirname(__file__), "audio")
SHN_FILES = sorted(glob.glob(os.path.join(AUDIO_DIR, "*_shn.sph")))


@pytest.fixture(scope="module")
def native_lib():
    lib = _native.get_shorten_lib()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    return lib


def test_library_builds(native_lib):
    assert native_lib is not None


@pytest.mark.parametrize("path", SHN_FILES, ids=os.path.basename)
def test_native_matches_python(native_lib, path):
    with open(path, "rb") as f:
        header = sphere.read_sphere_header(f)
        (_, _, sampcount, _, chancount, _) = header
        data_py = np.zeros(sampcount * chancount, dtype=np.int16)
        preread = f.read(16384)
        done_py = sphere._decode_shortened(preread, f, data_py)
    with open(path, "rb") as f:
        sphere.read_sphere_header(f)
        data_c = np.zeros(sampcount * chancount, dtype=np.int16)
        preread = f.read(16384)
        done_c = sphere._try_decode_shortened_native(
            preread, f, data_c, chancount
        )
    assert done_c == done_py
    assert np.array_equal(data_c, data_py)


@pytest.mark.parametrize("path", SHN_FILES, ids=os.path.basename)
def test_native_end_to_end_matches_wav(native_lib, path):
    """Full read path (now via native decode) still matches the wav."""
    from speech_tpu.io import read_signal

    wav_path = path.replace("_shn.sph", ".wav")
    want = read_signal(wav_path, dtype=np.int16)
    got = read_signal(path, dtype=np.int16)
    assert np.array_equal(got, want)


def test_native_rejects_garbage(native_lib):
    with pytest.raises(IOError):
        _native.decode_shorten_native(
            b"ajkg\x02" + b"\xff" * 40, 100, sphere.ULAW_OUTWARD
        )
