import os

import numpy as np
import pytest

from speech_tpu.io import read_signal, wds_read_signal

AUDIO_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "audio")

SPHERE_CASES = [
    "123_1pcbe",
    "123_1pcle",
    "123_1ulaw",
    "123_2pcbe",
    "123_2pcle",
    "123_2ulaw",
    "123_2alaw",
]


@pytest.mark.parametrize("prefix", SPHERE_CASES)
def test_sphere_decode_bit_exact(prefix):
    # .sph fixtures (shorten-compressed except alaw) were converted to .wav
    # with sph2pipe; decode must be bit-exact
    sph_name = prefix + ("_shn.sph" if prefix != "123_2alaw" else ".sph")
    sph = read_signal(os.path.join(AUDIO_DIR, sph_name))
    wav = read_signal(os.path.join(AUDIO_DIR, prefix + ".wav"))
    assert sph.shape == wav.shape
    assert np.array_equal(sph, wav)


@pytest.mark.parametrize("prefix", SPHERE_CASES)
def test_sphere_decode_from_buffer(prefix):
    sph_name = prefix + ("_shn.sph" if prefix != "123_2alaw" else ".sph")
    with open(os.path.join(AUDIO_DIR, sph_name), "rb") as f:
        sph = read_signal(f, force_as="sph")
    wav = read_signal(os.path.join(AUDIO_DIR, prefix + ".wav"))
    assert np.array_equal(sph, wav)


def test_wav_read():
    data = read_signal(os.path.join(AUDIO_DIR, "test.wav"))
    assert data.ndim == 1
    assert len(data) > 1000


def test_wav_round_trip(temp_dir):
    from scipy.io import wavfile

    path = os.path.join(temp_dir, "x.wav")
    signal = (np.random.random(1000) * 30000).astype(np.int16)
    wavfile.write(path, 16000, signal)
    loaded = read_signal(path)
    assert np.array_equal(signal, loaded)
    loaded = read_signal(path, dtype=np.float64)
    assert loaded.dtype == np.float64


def test_npy_round_trip(temp_dir):
    path = os.path.join(temp_dir, "x.npy")
    signal = np.random.random(100)
    np.save(path, signal)
    assert np.array_equal(read_signal(path), signal)


def test_npz_round_trip(temp_dir):
    path = os.path.join(temp_dir, "x.npz")
    a, b = np.random.random(10), np.random.random(20)
    np.savez(path, a, foo=b)
    assert np.array_equal(read_signal(path), a)
    assert np.array_equal(read_signal(path, key="foo"), b)


def test_pt_round_trip(temp_dir):
    torch = pytest.importorskip("torch")
    path = os.path.join(temp_dir, "x.pt")
    signal = np.random.random(64).astype(np.float32)
    torch.save(torch.from_numpy(signal), path)
    assert np.allclose(read_signal(path), signal)


def test_hdf5_round_trip(temp_dir):
    h5py = pytest.importorskip("h5py")
    path = os.path.join(temp_dir, "x.hdf5")
    signal = np.random.random(128)
    with h5py.File(path, "w") as f:
        grp = f.create_group("g")
        grp.create_dataset("d", data=signal)
    assert np.allclose(read_signal(path), signal)
    assert np.allclose(read_signal(path, key="g/d"), signal)


def test_raw_round_trip(temp_dir):
    path = os.path.join(temp_dir, "x.bin")
    signal = np.random.random(77)
    signal.tofile(path)
    loaded = read_signal(path, dtype=np.float64, force_as="file")
    assert np.array_equal(signal, loaded)


def test_unknown_suffix_raises():
    with pytest.raises(IOError):
        read_signal("mystery.xyz")


def test_wds_read_signal(temp_dir):
    path = os.path.join(temp_dir, "x.npy")
    signal = np.random.random(32)
    np.save(path, signal)
    with open(path, "rb") as f:
        data = f.read()
    assert np.array_equal(wds_read_signal("sample.npy", data), signal)
    assert wds_read_signal("sample.mystery", data) is None


@pytest.mark.parametrize("suffix", ["flac", "ogg", "aiff"])
def test_soundfile_formats(suffix):
    pytest.importorskip("soundfile")
    data = read_signal(os.path.join(AUDIO_DIR, "sin1k." + suffix))
    # 1 kHz sine at 16 kHz: spectral peak at 1 kHz
    spec = np.abs(np.fft.rfft(data.astype(np.float64)))
    freq = np.fft.rfftfreq(len(data), 1 / 16000)
    assert abs(freq[np.argmax(spec)] - 1000) < 50


@pytest.mark.parametrize(
    "env_var,suffix", [("WSJ_DIR", ".wv1"), ("TIMIT_DIR", ".sph")], ids=["wsj", "timit"]
)
def test_real_corpus_sphere_sweep(env_var, suffix):
    """Optional: decode every SPHERE file in a real corpus and compare
    bit-exactly against sph2pipe output (reference pattern:
    tests/test_util.py:139-170).  Gated on WSJ_DIR/TIMIT_DIR + SPH2PIPE."""
    import subprocess
    import tempfile

    corpus_dir = os.environ.get(env_var)
    sph2pipe = os.environ.get("SPH2PIPE")
    if not corpus_dir:
        pytest.skip(f"{env_var} not set")
    if not sph2pipe:
        pytest.skip("SPH2PIPE not set")
    count = 0
    for root, _, files in os.walk(corpus_dir):
        for f in sorted(files):
            if not f.endswith(suffix):
                continue
            path = os.path.join(root, f)
            got = read_signal(path, force_as="sph")
            with tempfile.NamedTemporaryFile(suffix=".wav") as tmp:
                subprocess.run(
                    [sph2pipe, "-f", "wav", path, tmp.name], check=True
                )
                want = read_signal(tmp.name, force_as="wav")
            assert np.array_equal(got, want), path
            count += 1
            if count >= 50:  # bounded sweep
                return
    if not count:
        pytest.skip("no SPHERE files found")
