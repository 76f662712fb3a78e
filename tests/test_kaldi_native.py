"""Native (pure-Python, no-bindings) Kaldi table I/O.

Round-trips every value type through the real on-disk formats and runs the
``compute-feats-from-kaldi-tables`` CLI end-to-end WITHOUT pydrobert-kaldi
(the fake-shim tests in test_kaldi_tables.py cover the bindings code path;
these cover the native fallback, reference: command_line.py:245-359).
"""

import os
import sys

import numpy as np
import pytest

import speech_tpu.command_line as cli
from speech_tpu.alias import alias_factory_subclass_from_arg
from speech_tpu.compute import FrameComputer
from speech_tpu.io import read_signal
from speech_tpu.io import kaldi_tables as kt


def _no_bindings():
    try:
        import pydrobert.kaldi.io  # noqa: F401

        return False
    except ImportError:
        return True


RNG = np.random.RandomState(1234)


# --------------------------------------------------------------------------
# specifier parsing
# --------------------------------------------------------------------------


def test_parse_specifiers():
    assert kt.parse_rspecifier("ark:foo.ark") == ("ark", set(), "foo.ark")
    assert kt.parse_rspecifier("scp,p,o:x.scp") == ("scp", {"p", "o"}, "x.scp")
    assert kt.parse_wspecifier("ark:a") == ("a", None, set())
    assert kt.parse_wspecifier("ark,t:a") == ("a", None, {"t"})
    assert kt.parse_wspecifier("ark,scp:a,b") == ("a", "b", set())
    with pytest.raises(IOError):
        kt.parse_rspecifier("foo.ark")
    with pytest.raises(IOError):
        kt.parse_wspecifier("scp:only.scp")
    with pytest.raises(IOError):
        kt.parse_wspecifier("ark,scp:onlyone")


# --------------------------------------------------------------------------
# matrix / vector round trips
# --------------------------------------------------------------------------


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
@pytest.mark.parametrize("text", [False, True])
def test_matrix_round_trip(tmp_path, dtype, text):
    path = str(tmp_path / "m.ark")
    spec = ("ark,t:" if text else "ark:") + path
    mats = {
        "utt1": RNG.randn(7, 13).astype(dtype),
        "utt2": RNG.randn(1, 4).astype(dtype),
        "utt3": np.zeros((3, 2), dtype),
    }
    with kt.KaldiTableWriter(spec) as writer:
        for key, mat in mats.items():
            writer.write(key, mat)
    got = dict(kt.iter_table("ark:" + path))
    assert list(got) == list(mats)
    for key, mat in mats.items():
        if text:
            np.testing.assert_allclose(got[key], mat, rtol=1e-6, atol=1e-30)
        else:
            assert got[key].dtype == dtype
            np.testing.assert_array_equal(got[key], mat)


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_vector_round_trip(tmp_path, dtype):
    path = str(tmp_path / "v.ark")
    vecs = {"a": RNG.randn(9).astype(dtype), "b": RNG.randn(1).astype(dtype)}
    with kt.KaldiTableWriter("ark:" + path) as writer:
        for key, vec in vecs.items():
            writer.write(key, vec)
    got = dict(kt.iter_table("ark:" + path))
    for key, vec in vecs.items():
        assert got[key].ndim == 1
        np.testing.assert_array_equal(got[key], vec)


def test_ark_scp_write_and_scp_read(tmp_path):
    ark = str(tmp_path / "f.ark")
    scp = str(tmp_path / "f.scp")
    mats = {f"utt{i}": RNG.randn(4 + i, 5).astype(np.float32) for i in range(6)}
    with kt.KaldiTableWriter(f"ark,scp:{ark},{scp}") as writer:
        for key, mat in mats.items():
            writer.write(key, mat)
    # scp sequential
    got = dict(kt.iter_table("scp:" + scp))
    assert list(got) == list(mats)
    for key in mats:
        np.testing.assert_array_equal(got[key], mats[key])
    # scp offsets are real: cherry-pick a line and read just that entry
    with open(scp) as f:
        lines = f.read().splitlines()
    with open(str(tmp_path / "one.scp"), "w") as f:
        f.write(lines[3] + "\n")
    (only,) = list(kt.iter_table("scp:" + str(tmp_path / "one.scp")))
    assert only[0] == "utt3"
    np.testing.assert_array_equal(only[1], mats["utt3"])


def test_table_read_random_access(tmp_path):
    ark = str(tmp_path / "r.ark")
    mats = {"x": RNG.randn(3, 4).astype(np.float32),
            "y": RNG.randn(2, 4).astype(np.float32)}
    with kt.KaldiTableWriter("ark:" + ark) as writer:
        for key, mat in mats.items():
            writer.write(key, mat)
    np.testing.assert_array_equal(kt.table_read("ark:" + ark, "fm", "y"), mats["y"])
    np.testing.assert_array_equal(kt.table_read("ark:" + ark, None, 0), mats["x"])
    got = kt.table_read("ark:" + ark, "dm", "x")
    assert got.dtype == np.float64
    with pytest.raises(KeyError):
        kt.table_read("ark:" + ark, None, "nope")
    with pytest.raises(IndexError):
        kt.table_read("ark:" + ark, None, 5)


def test_invalid_keys_and_closed_writer(tmp_path):
    path = str(tmp_path / "w.ark")
    writer = kt.KaldiTableWriter("ark:" + path)
    with pytest.raises(IOError):
        writer.write("bad key", np.zeros((1, 1), np.float32))
    with pytest.raises(IOError):
        writer.write("", np.zeros((1, 1), np.float32))
    writer.close()
    with pytest.raises(IOError):
        writer.write("k", np.zeros((1, 1), np.float32))
    writer.close()  # idempotent


# --------------------------------------------------------------------------
# compressed matrices
# --------------------------------------------------------------------------


@pytest.mark.parametrize("method", [1, 2, 3])
def test_compressed_round_trip(tmp_path, method):
    path = str(tmp_path / "c.ark")
    mat = (RNG.randn(50, 13) * 7.0 + 3.0).astype(np.float32)
    with kt.KaldiTableWriter("ark:" + path, compress=method) as writer:
        writer.write("utt", mat)
    (got,) = [v for _, v in kt.iter_table("ark:" + path)]
    rng = float(mat.max() - mat.min())
    # quantization-bounded error: uint16 ~ range/65535, uint8 ~ range/255,
    # per-column percentile coding lands between (generous factor of 4)
    tol = {1: rng / 255 * 4, 2: rng / 65535 * 4, 3: rng / 255 * 4}[method]
    assert np.abs(got - mat).max() <= tol
    # token on disk matches the method
    with open(path, "rb") as f:
        blob = f.read()
    assert {1: b"CM ", 2: b"CM2 ", 3: b"CM3 "}[method] in blob


def test_compressed_constant_column(tmp_path):
    path = str(tmp_path / "cc.ark")
    mat = np.concatenate(
        [np.full((20, 3), 2.5, np.float32), RNG.randn(20, 2).astype(np.float32)],
        axis=1,
    )
    with kt.KaldiTableWriter("ark:" + path, compress=True) as writer:
        writer.write("utt", mat)
    (got,) = [v for _, v in kt.iter_table("ark:" + path)]
    rng = float(mat.max() - mat.min())
    assert np.abs(got - mat).max() <= rng / 255 * 4


def test_compress_auto_method_selection():
    tall = RNG.randn(20, 3).astype(np.float32)
    short = RNG.randn(4, 3).astype(np.float32)
    assert kt.compress_matrix(tall, "auto")[0] == "CM"
    assert kt.compress_matrix(short, "auto")[0] == "CM2"


# --------------------------------------------------------------------------
# wave tables
# --------------------------------------------------------------------------


def _pcm_wave(channels, samples, rate=8000.0):
    data = np.round(RNG.randn(channels, samples) * 3000).astype(np.float32)
    return kt.WaveData(data, rate)


@pytest.mark.parametrize("channels", [1, 2])
def test_wave_round_trip(tmp_path, channels):
    path = str(tmp_path / "w.ark")
    waves = {"u1": _pcm_wave(channels, 800), "u2": _pcm_wave(channels, 123)}
    with kt.KaldiTableWriter("ark:" + path) as writer:
        for key, wave in waves.items():
            writer.write(key, wave)
    got = dict(kt.iter_table("ark:" + path, wave=True))
    for key, wave in waves.items():
        assert isinstance(got[key], kt.WaveData)
        assert got[key].samp_freq == wave.samp_freq
        assert got[key].data.shape == wave.data.shape
        np.testing.assert_array_equal(got[key].data, wave.data)
        assert got[key].duration == pytest.approx(wave.data.shape[1] / 8000.0)


def test_wave_scp_plain_path(tmp_path):
    # a wav.scp line pointing at a bare .wav file
    wav_path = str(tmp_path / "a.wav")
    wave = _pcm_wave(1, 400, 16000.0)
    with open(wav_path, "wb") as f:
        kt.write_wave(f, wave)
    scp = str(tmp_path / "wav.scp")
    with open(scp, "w") as f:
        f.write(f"utt {wav_path}\n")
    (entry,) = list(kt.iter_table("scp:" + scp, wave=True))
    assert entry[0] == "utt"
    np.testing.assert_array_equal(entry[1].data, wave.data)
    assert entry[1].samp_freq == 16000.0


def test_wave_scp_pipe_command(tmp_path):
    wav_path = str(tmp_path / "p.wav")
    wave = _pcm_wave(1, 256)
    with open(wav_path, "wb") as f:
        kt.write_wave(f, wave)
    scp = str(tmp_path / "wav.scp")
    with open(scp, "w") as f:
        f.write(f"utt cat {wav_path} |\n")
    (entry,) = list(kt.iter_table("scp:" + scp, wave=True))
    np.testing.assert_array_equal(entry[1].data, wave.data)


def test_wave_scp_sphere(tmp_path):
    sph_fixtures = os.path.join(
        os.path.dirname(__file__), "audio", "123_1pcle_shn.sph"
    )
    if not os.path.exists(sph_fixtures):
        pytest.skip("sphere fixture missing")
    scp = str(tmp_path / "wav.scp")
    with open(scp, "w") as f:
        f.write(f"utt {sph_fixtures}\n")
    (entry,) = list(kt.iter_table("scp:" + scp, wave=True))
    ref = read_signal(sph_fixtures, np.float32)
    assert entry[1].data.shape[0] == 1
    np.testing.assert_array_equal(entry[1].data[0], ref)


def test_wave_scp_permissive_skips(tmp_path):
    wav_path = str(tmp_path / "ok.wav")
    with open(wav_path, "wb") as f:
        kt.write_wave(f, _pcm_wave(1, 64))
    scp = str(tmp_path / "wav.scp")
    with open(scp, "w") as f:
        f.write(f"bad {tmp_path}/missing.wav\n")
        f.write(f"ok {wav_path}\n")
    with pytest.raises(Exception):
        list(kt.iter_table("scp:" + scp, wave=True))
    keys = [k for k, _ in kt.iter_table("scp,p:" + scp, wave=True)]
    assert keys == ["ok"]


# --------------------------------------------------------------------------
# read_signal integration (table + stream backends, native fallback)
# --------------------------------------------------------------------------


@pytest.mark.skipif(not _no_bindings(), reason="real pydrobert-kaldi present")
def test_read_signal_table_native(tmp_path):
    ark = str(tmp_path / "t.ark")
    scp = str(tmp_path / "t.scp")
    mat = RNG.randn(6, 3).astype(np.float32)
    with kt.KaldiTableWriter(f"ark,scp:{ark},{scp}") as writer:
        writer.write("stats", mat)
    np.testing.assert_array_equal(read_signal("ark:" + ark, key="stats"), mat)
    np.testing.assert_array_equal(read_signal("scp:" + scp, key="stats"), mat)
    got = read_signal("ark:" + ark, dtype="dm", key="stats")
    assert got.dtype == np.float64


@pytest.mark.skipif(not _no_bindings(), reason="real pydrobert-kaldi present")
def test_read_signal_stream_native(tmp_path):
    # a trailing-| rfilename is a Kaldi input stream holding one bare value
    val_path = str(tmp_path / "value.bin")
    mat = RNG.randn(4, 2).astype(np.float32)
    with open(val_path, "wb") as f:
        kt.write_value(f, mat)
    got = read_signal(f"cat {val_path} |")
    np.testing.assert_array_equal(got, mat)


@pytest.mark.skipif(not _no_bindings(), reason="real pydrobert-kaldi present")
def test_standardize_stats_from_kaldi_table(tmp_path):
    from speech_tpu.post import Standardize

    feats = RNG.randn(100, 5)
    ref = Standardize()
    ref.accumulate(feats)
    stats = ref._stats  # [2, F+1] sufficient statistics
    ark = str(tmp_path / "cmvn.ark")
    with kt.KaldiTableWriter("ark:" + ark) as writer:
        writer.write("stats", np.asarray(stats, np.float64))
    loaded = Standardize("ark:" + ark, key="stats")
    np.testing.assert_allclose(
        loaded.apply(feats), ref.apply(feats), atol=1e-10
    )


# --------------------------------------------------------------------------
# CLI end-to-end without bindings
# --------------------------------------------------------------------------


COMPUTER_CONFIG = (
    '{"name": "stft", "bank": {"name": "fbank", "num_filts": 10, '
    '"sampling_rate": 8000}, "frame_length_ms": 25, "frame_shift_ms": 10}'
)


@pytest.mark.skipif(not _no_bindings(), reason="real pydrobert-kaldi present")
@pytest.mark.parametrize("batch_size", [0, 4])
def test_cli_kaldi_tables_native_end_to_end(tmp_path, batch_size):
    wav_ark = str(tmp_path / "wav.ark")
    feat_ark = str(tmp_path / "feat.ark")
    feat_scp = str(tmp_path / "feat.scp")
    waves = {}
    with kt.KaldiTableWriter("ark:" + wav_ark) as writer:
        for i in range(7):
            wave = _pcm_wave(1, 2000 + 321 * i)
            waves[f"utt{i}"] = wave
            writer.write(f"utt{i}", wave)
    ret = cli.compute_feats_from_kaldi_tables(
        [
            "ark:" + wav_ark,
            f"ark,scp:{feat_ark},{feat_scp}",
            COMPUTER_CONFIG,
            "--batch-size",
            str(batch_size),
        ]
    )
    assert ret == 0
    computer = alias_factory_subclass_from_arg(
        FrameComputer, __import__("json").loads(COMPUTER_CONFIG)
    )
    got = dict(kt.iter_table("scp:" + feat_scp))
    assert list(got) == list(waves)
    for key, wave in waves.items():
        want = computer.compute_full(
            wave.data[0].astype(np.float64)
        ).astype(np.float32)
        assert got[key].shape == want.shape
        np.testing.assert_allclose(got[key], want, atol=2e-4, rtol=2e-5)


@pytest.mark.skipif(not _no_bindings(), reason="real pydrobert-kaldi present")
def test_cli_kaldi_tables_native_missing_table(tmp_path):
    ret = cli.compute_feats_from_kaldi_tables(
        [
            "scp:" + str(tmp_path / "missing.scp"),
            "ark:" + str(tmp_path / "out.ark"),
            COMPUTER_CONFIG,
        ]
    )
    assert ret == 1


# --------------------------------------------------------------------------
# --compress on the CLI + copy-feats-tables
# --------------------------------------------------------------------------


@pytest.mark.skipif(not _no_bindings(), reason="real pydrobert-kaldi present")
def test_cli_compress_output(tmp_path):
    wav_ark = str(tmp_path / "wav.ark")
    with kt.KaldiTableWriter("ark:" + wav_ark) as writer:
        writer.write("utt0", _pcm_wave(1, 4000))
    plain_ark = str(tmp_path / "plain.ark")
    comp_ark = str(tmp_path / "comp.ark")
    for out, extra in ((plain_ark, []), (comp_ark, ["--compress"])):
        assert (
            cli.compute_feats_from_kaldi_tables(
                ["ark:" + wav_ark, "ark:" + out, COMPUTER_CONFIG, *extra]
            )
            == 0
        )
    plain = dict(kt.iter_table("ark:" + plain_ark))["utt0"]
    comp = dict(kt.iter_table("ark:" + comp_ark))["utt0"]
    rng = float(plain.max() - plain.min())
    assert np.abs(comp - plain).max() <= rng / 255 * 4
    assert os.path.getsize(comp_ark) < os.path.getsize(plain_ark) / 2.5
    with open(comp_ark, "rb") as f:
        assert b"CM " in f.read()


def test_copy_feats_tables_round_trips(tmp_path):
    src_ark = str(tmp_path / "src.ark")
    mats = {f"u{i}": RNG.randn(10 + i, 6).astype(np.float32) for i in range(4)}
    with kt.KaldiTableWriter("ark:" + src_ark) as writer:
        for key, mat in mats.items():
            writer.write(key, mat)
    # table -> text table -> table
    text_ark = str(tmp_path / "t.ark")
    assert cli.copy_feats_tables(["ark:" + src_ark, "ark,t:" + text_ark]) == 0
    back_ark = str(tmp_path / "b.ark")
    assert cli.copy_feats_tables(["ark:" + text_ark, "ark:" + back_ark]) == 0
    got = dict(kt.iter_table("ark:" + back_ark))
    for key, mat in mats.items():
        np.testing.assert_allclose(got[key], mat, rtol=1e-6, atol=1e-30)
    # table -> compressed table
    comp_ark = str(tmp_path / "c.ark")
    assert (
        cli.copy_feats_tables(
            ["ark:" + src_ark, "ark:" + comp_ark, "--compress", "2"]
        )
        == 0
    )
    got = dict(kt.iter_table("ark:" + comp_ark))
    for key, mat in mats.items():
        rng = float(mat.max() - mat.min())
        assert np.abs(got[key] - mat).max() <= rng / 65535 * 4
    # table -> .pt dir -> table
    pt_dir = str(tmp_path / "ptdir")
    assert cli.copy_feats_tables(["ark:" + src_ark, "dir:" + pt_dir]) == 0
    assert sorted(os.listdir(pt_dir)) == [f"u{i}.pt" for i in range(4)]
    dir_ark = str(tmp_path / "d.ark")
    assert cli.copy_feats_tables(["dir:" + pt_dir, "ark:" + dir_ark]) == 0
    got = dict(kt.iter_table("ark:" + dir_ark))
    for key, mat in mats.items():
        np.testing.assert_array_equal(got[key], mat)


def test_copy_feats_tables_errors(tmp_path):
    assert (
        cli.copy_feats_tables(
            ["ark:" + str(tmp_path / "missing.ark"), "ark:" + str(tmp_path / "o.ark")]
        )
        == 1
    )
    # empty input dir: nothing copied -> nonzero
    empty = str(tmp_path / "empty")
    os.makedirs(empty)
    assert cli.copy_feats_tables(["dir:" + empty, "ark:" + str(tmp_path / "e.ark")]) == 1


# --------------------------------------------------------------------------
# --segments (extract-segments fused into the CLI)
# --------------------------------------------------------------------------


@pytest.mark.skipif(not _no_bindings(), reason="real pydrobert-kaldi present")
def test_cli_segments(tmp_path):
    import json

    wav_ark = str(tmp_path / "wav.ark")
    recs = {"recA": _pcm_wave(1, 16000), "recB": _pcm_wave(1, 8000)}
    with kt.KaldiTableWriter("ark:" + wav_ark) as writer:
        for rec, wave in recs.items():
            writer.write(rec, wave)
    seg_path = str(tmp_path / "segments")
    with open(seg_path, "w") as f:
        f.write("recA-1 recA 0.25 1.00\n")       # plain cut
        f.write("recA-2 recA 1.50 -1\n")          # to the end
        f.write("recA-3 recA 1.90 2.25\n")        # overshoots 0.25s: clamp
        f.write("recA-4 recA 1.00 3.00\n")        # overshoots 1s: skip
        f.write("recA-5 recA 0.50 0.55\n")        # < 0.1 s: skip
        f.write("recB-1 recB 0.00 0.50\n")
        f.write("recC-1 recC 0.00 1.00\n")        # recording absent: warn
    feat_ark = str(tmp_path / "feat.ark")
    assert (
        cli.compute_feats_from_kaldi_tables(
            [
                "ark:" + wav_ark,
                "ark:" + feat_ark,
                COMPUTER_CONFIG,
                "--segments",
                seg_path,
            ]
        )
        == 0
    )
    got = dict(kt.iter_table("ark:" + feat_ark))
    assert sorted(got) == ["recA-1", "recA-2", "recA-3", "recB-1"]
    computer = alias_factory_subclass_from_arg(
        FrameComputer, json.loads(COMPUTER_CONFIG)
    )
    cuts = {
        "recA-1": ("recA", 2000, 8000),
        "recA-2": ("recA", 12000, 16000),
        "recA-3": ("recA", 15200, 16000),
        "recB-1": ("recB", 0, 4000),
    }
    for utt, (rec, s, e) in cuts.items():
        want = computer.compute_full(
            recs[rec].data[0, s:e].astype(np.float64)
        ).astype(np.float32)
        assert got[utt].shape == want.shape
        np.testing.assert_allclose(got[utt], want, atol=2e-4, rtol=2e-5)


@pytest.mark.skipif(not _no_bindings(), reason="real pydrobert-kaldi present")
def test_cli_segments_bad_lines(tmp_path, capsys):
    wav_ark = str(tmp_path / "wav.ark")
    with kt.KaldiTableWriter("ark:" + wav_ark) as writer:
        writer.write("rec", _pcm_wave(1, 800))
    for bad in ("utt rec 0.5\n", "utt rec 1.0 0.5\n", "utt rec x y\n"):
        seg = str(tmp_path / "seg")
        with open(seg, "w") as f:
            f.write(bad)
        ret = cli.compute_feats_from_kaldi_tables(
            [
                "ark:" + wav_ark,
                "ark:" + str(tmp_path / "f.ark"),
                COMPUTER_CONFIG,
                "--segments",
                seg,
            ]
        )
        assert ret == 1, bad
        assert "--segments" in capsys.readouterr().err


# --------------------------------------------------------------------------
# review regressions: CRLF archives, tab scp, dtype hints, text precision,
# streaming pipes
# --------------------------------------------------------------------------


def test_crlf_text_archive(tmp_path):
    path = str(tmp_path / "crlf.ark")
    with open(path, "wb") as f:
        f.write(b"utt1  [ 1 2 3 ]\r\nutt2  [ 4 5 6 ]\r\n")
    got = dict(kt.iter_table("ark:" + path))
    assert sorted(got) == ["utt1", "utt2"]
    np.testing.assert_array_equal(got["utt2"], [4.0, 5.0, 6.0])


def test_tab_separated_scp(tmp_path):
    ark = str(tmp_path / "x.ark")
    mat = RNG.randn(3, 2).astype(np.float32)
    with kt.KaldiTableWriter(f"ark,scp:{ark},{tmp_path}/x.scp") as writer:
        writer.write("u", mat)
    with open(str(tmp_path / "x.scp")) as f:
        key, target = f.read().split(None, 1)
    with open(str(tmp_path / "tab.scp"), "w") as f:
        f.write(f"{key}\t{target.strip()}\n")
    (entry,) = list(kt.iter_table("scp:" + str(tmp_path / "tab.scp")))
    np.testing.assert_array_equal(entry[1], mat)


def test_table_read_numpy_dtype_hint(tmp_path):
    ark = str(tmp_path / "d.ark")
    mat = RNG.randn(4, 3).astype(np.float32)
    with kt.KaldiTableWriter("ark:" + ark) as writer:
        writer.write("s", mat)
    got = kt.table_read("ark:" + ark, np.float64, "s")
    assert got.dtype == np.float64
    np.testing.assert_array_equal(got, mat.astype(np.float64))


def test_text_round_trip_preserves_double_precision(tmp_path):
    # CMVN-style sufficient statistics: huge sums whose low bits matter
    stats = np.array(
        [[1234567890.123456, 42.0], [9876543210.987654, 0.0]], np.float64
    )
    a1 = str(tmp_path / "a1.ark")
    t = str(tmp_path / "t.ark")
    a2 = str(tmp_path / "a2.ark")
    with kt.KaldiTableWriter("ark:" + a1) as w:
        w.write("s", stats)
    import speech_tpu.command_line as _cli

    assert _cli.copy_feats_tables(["ark:" + a1, "ark,t:" + t]) == 0
    assert _cli.copy_feats_tables(["ark:" + t, "ark:" + a2]) == 0
    got = dict(kt.iter_table("ark:" + a2))["s"]
    assert got.dtype == np.float64
    np.testing.assert_array_equal(got, stats)


def test_read_pipe_streams_and_propagates_failure(tmp_path):
    ark = str(tmp_path / "p.ark")
    mats = {f"u{i}": RNG.randn(5, 4).astype(np.float32) for i in range(3)}
    with kt.KaldiTableWriter("ark:" + ark) as writer:
        for key, mat in mats.items():
            writer.write(key, mat)
    # full drain through a pipe
    got = dict(kt.iter_table(f"ark:cat {ark} |"))
    for key, mat in mats.items():
        np.testing.assert_array_equal(got[key], mat)
    # a command that fails after EOF surfaces as IOError on full drain
    with pytest.raises(IOError):
        list(kt.iter_table(f"ark:cat {ark}; exit 3 |"))
    # ...but an early close (partial read) does not raise
    gen = kt.iter_table(f"ark:cat {ark}; exit 3 |")
    next(gen)
    gen.close()


def test_fuzz_malformed_archives_fail_cleanly(tmp_path):
    """Random garbage raises a clean error (never hangs or asserts)."""
    fuzz_rng = np.random.RandomState(99)
    path = str(tmp_path / "fuzz.ark")
    # seed corpus: a valid entry prefix with random corruptions appended
    with kt.KaldiTableWriter("ark:" + path) as writer:
        writer.write("ok", np.ones((2, 2), np.float32))
    with open(path, "rb") as f:
        valid = f.read()
    for trial in range(60):
        blob = bytes(fuzz_rng.bytes(fuzz_rng.randint(1, 120)))
        if trial % 3 == 0:
            blob = valid[: fuzz_rng.randint(1, len(valid))] + blob
        with open(path, "wb") as f:
            f.write(blob)
        try:
            entries = list(kt.iter_table("ark:" + path))
            for _, value in entries:
                assert isinstance(value, (np.ndarray, kt.WaveData))
        except (IOError, EOFError, ValueError):
            pass  # clean, typed failure


@pytest.mark.skipif(not _no_bindings(), reason="real pydrobert-kaldi present")
def test_read_signal_wav_pipe_stream(tmp_path):
    # the classic Kaldi idiom: a command producing RIFF on stdout,
    # consumed through read_signal's trailing-| stream dispatch
    wav_path = str(tmp_path / "x.wav")
    wave = _pcm_wave(1, 300, 16000.0)
    with open(wav_path, "wb") as f:
        kt.write_wave(f, wave)
    got = read_signal(f"cat {wav_path} |")
    np.testing.assert_array_equal(got, wave.data[0])
    # stereo comes back (samples, channels), the wav reader's layout
    wav2 = str(tmp_path / "x2.wav")
    wave2 = _pcm_wave(2, 200, 16000.0)
    with open(wav2, "wb") as f:
        kt.write_wave(f, wave2)
    got2 = read_signal(f"cat {wav2} |", dtype=np.float64)
    assert got2.shape == (200, 2) and got2.dtype == np.float64
    np.testing.assert_array_equal(got2, wave2.data.T)


def test_random_reader_ark_memoized(tmp_path):
    ark = str(tmp_path / "r.ark")
    mats = {f"u{i}": RNG.randn(3 + i, 4).astype(np.float32) for i in range(5)}
    with kt.KaldiTableWriter("ark:" + ark) as writer:
        for key, mat in mats.items():
            writer.write(key, mat)
    with kt.KaldiRandomReader("ark:" + ark) as reader:
        np.testing.assert_array_equal(reader["u3"], mats["u3"])
        np.testing.assert_array_equal(reader["u0"], mats["u0"])  # memoized
        np.testing.assert_array_equal(reader["u4"], mats["u4"])
        assert "u2" in reader and "nope" not in reader
        with pytest.raises(KeyError):
            reader["missing"]
        assert sorted(reader.keys()) == sorted(mats)


def test_random_reader_scp(tmp_path):
    ark = str(tmp_path / "s.ark")
    scp = str(tmp_path / "s.scp")
    mats = {f"u{i}": RNG.randn(2, 3).astype(np.float32) for i in range(3)}
    with kt.KaldiTableWriter(f"ark,scp:{ark},{scp}") as writer:
        for key, mat in mats.items():
            writer.write(key, mat)
    with kt.KaldiRandomReader("scp:" + scp) as reader:
        np.testing.assert_array_equal(reader["u1"], mats["u1"])
        assert sorted(reader.keys()) == sorted(mats)
        with pytest.raises(KeyError):
            reader["zz"]


def test_random_reader_rejects_pipes():
    with pytest.raises(IOError):
        kt.KaldiRandomReader("ark:cat foo |")


@pytest.mark.skipif(not _no_bindings(), reason="real pydrobert-kaldi present")
def test_signals_cli_wav_scp_pipe_entries(tmp_path):
    # a Kaldi wav.scp with 'cmd |' entries drives signals-to-torch-feat-dir
    torch = pytest.importorskip("torch")
    wav_path = str(tmp_path / "a.wav")
    wave = _pcm_wave(1, 4000)
    with open(wav_path, "wb") as f:
        kt.write_wave(f, wave)
    map_path = str(tmp_path / "wav.scp")
    with open(map_path, "w") as f:
        f.write(f"piped cat {wav_path} |\n")
        f.write(f"plain {wav_path}\n")
    out_dir = str(tmp_path / "feats")
    assert (
        cli.signals_to_torch_feat_dir([map_path, COMPUTER_CONFIG, out_dir])
        == 0
    )
    piped = torch.load(os.path.join(out_dir, "piped.pt")).numpy()
    plain = torch.load(os.path.join(out_dir, "plain.pt")).numpy()
    assert piped.shape == plain.shape and piped.shape[1] == 10
    np.testing.assert_allclose(piped, plain, atol=1e-5)
