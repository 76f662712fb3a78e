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


class _BitWriter:
    """MSB-first bit packer matching the decoder's 32-bit word reads."""

    def __init__(self):
        self.bits = []

    def put_uvar(self, nbits, value):
        self.bits += [0] * (value >> nbits) + [1]
        for i in range(nbits - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def put_ulong(self, value):
        nbit = int(value).bit_length()
        self.put_uvar(2, nbit)
        self.put_uvar(nbit, value)

    def payload(self, version=2):
        bits = self.bits + [0] * (-len(self.bits) % 32)
        out = bytearray()
        for i in range(0, len(bits), 8):
            byte = 0
            for b in bits[i : i + 8]:
                byte = (byte << 1) | b
            out.append(byte)
        return b"ajkg" + bytes([version]) + bytes(out)


def _header(w, ftype, nchan=1, blocksize=4, maxnlpc=0, nmean=0, nskip=0):
    for v in (ftype, nchan, blocksize, maxnlpc, nmean, nskip):
        w.put_ulong(v)


def test_native_rejects_au_bitshift_beyond_table(native_lib):
    """bitshift > 12 for a u-law ftype must error, not index out of the
    13x256 ULAW_OUTWARD table (heap OOB in earlier builds)."""
    w = _BitWriter()
    _header(w, ftype=0)  # TYPE_AU1
    w.put_uvar(2, 6)  # FN_BITSHIFT
    w.put_uvar(2, 13)  # bitshift beyond the table
    with pytest.raises(IOError):
        _native.decode_shorten_native(w.payload(), 16, sphere.ULAW_OUTWARD)


def test_native_survives_random_payloads(native_lib):
    """Seeded garbage after the magic must never corrupt memory: every
    payload either decodes, returns None (unsupported), or raises
    IOError — the process must not crash."""
    rng = np.random.RandomState(20260816)
    for _ in range(200):
        body = rng.bytes(int(rng.randint(8, 400)))
        payload = b"ajkg" + bytes([int(rng.randint(0, 4))]) + body
        try:
            out = _native.decode_shorten_native(
                payload, int(rng.randint(1, 512)), sphere.ULAW_OUTWARD
            )
        except IOError:
            continue
        assert out is None or isinstance(out, tuple)


def test_native_survives_bitflipped_real_files(native_lib):
    """Single bit flips in a real shorten payload must decode, error, or
    fall back — never crash or read out of bounds."""
    if not SHN_FILES:
        pytest.skip("no shorten fixtures")
    with open(SHN_FILES[0], "rb") as f:
        header = sphere.read_sphere_header(f)
        sampcount, chancount = header[2], header[4]
        payload = f.read()
    rng = np.random.RandomState(7)
    for _ in range(100):
        corrupt = bytearray(payload)
        for _ in range(int(rng.randint(1, 4))):
            pos = int(rng.randint(0, len(corrupt)))
            corrupt[pos] ^= 1 << int(rng.randint(0, 8))
        try:
            out = _native.decode_shorten_native(
                bytes(corrupt), sampcount * chancount, sphere.ULAW_OUTWARD
            )
        except IOError:
            continue
        assert out is None or isinstance(out, tuple)


def test_native_falls_back_on_unusual_headers(native_lib):
    """Headers beyond the native decoder's working limits return None
    (caller falls back to Python) instead of raising."""
    w = _BitWriter()
    _header(w, ftype=2, nchan=17)  # TYPE_U8, more channels than native cap
    assert (
        _native.decode_shorten_native(w.payload(), 16, sphere.ULAW_OUTWARD)
        is None
    )
