"""End-to-end CLI tests (reference pattern: tests/test_command_line.py —
random wavs, in-process invocation, shape/determinism/manifest checks)."""

import json
import os
import wave

import numpy as np
import pytest

from speech_tpu import command_line


@pytest.fixture
def wav_dir(temp_dir):
    """20 random 16-bit wavs + a map file."""
    rng = np.random.RandomState(50)
    d = os.path.join(temp_dir, "wavs")
    os.makedirs(d)
    map_path = os.path.join(temp_dir, "map.txt")
    with open(map_path, "w") as mf:
        for i in range(20):
            n = rng.randint(1600, 8000)
            sig = (rng.randn(n) * 1000).astype(np.int16)
            path = os.path.join(d, f"utt{i:02d}.wav")
            with wave.open(path, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(8000)
                w.writeframes(sig.tobytes())
            mf.write(f"utt{i:02d} {path}\n")
    return map_path


COMPUTER_JSON = json.dumps(
    {
        "name": "stft",
        "bank": {"name": "fbank", "num_filts": 10, "sampling_rate": 8000},
        "frame_length_ms": 25,
        "frame_shift_ms": 10,
    }
)


def test_signals_to_torch_feat_dir(wav_dir, temp_dir):
    torch = pytest.importorskip("torch")
    out_dir = os.path.join(temp_dir, "feats")
    assert (
        command_line.signals_to_torch_feat_dir(
            [wav_dir, COMPUTER_JSON, out_dir]
        )
        == 0
    )
    files = sorted(os.listdir(out_dir))
    assert len(files) == 20
    for f in files:
        feats = torch.load(os.path.join(out_dir, f))
        assert feats.dtype == torch.float32
        assert feats.ndim == 2 and feats.shape[1] == 10
        assert torch.isfinite(feats).all()


def test_signals_to_torch_feat_dir_matches_compute_full(wav_dir, temp_dir):
    torch = pytest.importorskip("torch")
    from speech_tpu.alias import alias_factory_subclass_from_arg
    from speech_tpu.compute import FrameComputer
    from speech_tpu.io import read_signal

    out_dir = os.path.join(temp_dir, "feats")
    command_line.signals_to_torch_feat_dir([wav_dir, COMPUTER_JSON, out_dir])
    computer = alias_factory_subclass_from_arg(
        FrameComputer, json.loads(COMPUTER_JSON)
    )
    with open(wav_dir) as f:
        utt, path = f.readline().split()
    sig = read_signal(path, dtype=np.float64)
    want = computer.compute_full(sig)
    got = torch.load(os.path.join(out_dir, utt + ".pt")).numpy()
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=1e-4)


def test_signals_to_torch_feat_dir_raw(wav_dir, temp_dir):
    torch = pytest.importorskip("torch")
    out_dir = os.path.join(temp_dir, "raw")
    assert command_line.signals_to_torch_feat_dir([wav_dir, out_dir]) == 0
    f = sorted(os.listdir(out_dir))[0]
    feats = torch.load(os.path.join(out_dir, f))
    assert feats.ndim == 2 and feats.shape[1] == 1


def test_signals_to_torch_feat_dir_deterministic(wav_dir, temp_dir):
    torch = pytest.importorskip("torch")
    pre = json.dumps([{"name": "dither", "coeff": 0.1}])
    out1 = os.path.join(temp_dir, "f1")
    out2 = os.path.join(temp_dir, "f2")
    for out, workers in ((out1, "0"), (out2, "4")):
        assert (
            command_line.signals_to_torch_feat_dir(
                [
                    wav_dir,
                    COMPUTER_JSON,
                    out,
                    "--preprocess",
                    pre,
                    "--seed",
                    "5",
                    "--num-workers",
                    workers,
                ]
            )
            == 0
        )
    for f in sorted(os.listdir(out1)):
        a = torch.load(os.path.join(out1, f))
        b = torch.load(os.path.join(out2, f))
        assert torch.equal(a, b), f


def test_signals_to_torch_feat_dir_manifest_resume(wav_dir, temp_dir):
    pytest.importorskip("torch")
    out_dir = os.path.join(temp_dir, "feats")
    manifest = os.path.join(temp_dir, "manifest.txt")
    # pre-populate the manifest with some utterances
    with open(manifest, "w") as f:
        f.write("utt00\nutt01\n")
    assert (
        command_line.signals_to_torch_feat_dir(
            [wav_dir, COMPUTER_JSON, out_dir, "--manifest", manifest]
        )
        == 0
    )
    files = sorted(os.listdir(out_dir))
    assert len(files) == 18
    assert "utt00.pt" not in files and "utt02.pt" in files
    with open(manifest) as f:
        done = sorted(line.strip() for line in f if line.strip())
    assert done == [f"utt{i:02d}" for i in range(20)]
    # rerunning does nothing
    assert (
        command_line.signals_to_torch_feat_dir(
            [wav_dir, COMPUTER_JSON, out_dir, "--manifest", manifest]
        )
        == 0
    )
    assert sorted(os.listdir(out_dir)) == files


def test_signals_to_torch_feat_dir_postprocess(wav_dir, temp_dir):
    torch = pytest.importorskip("torch")
    out_dir = os.path.join(temp_dir, "feats")
    post = json.dumps([{"name": "deltas", "num_deltas": 2}])
    assert (
        command_line.signals_to_torch_feat_dir(
            [wav_dir, COMPUTER_JSON, out_dir, "--postprocess", post]
        )
        == 0
    )
    f = sorted(os.listdir(out_dir))[0]
    feats = torch.load(os.path.join(out_dir, f))
    assert feats.shape[1] == 30


def test_cli_help_exits_zero(capsys):
    assert command_line.signals_to_torch_feat_dir(["--help"]) == 0
    assert "map" in capsys.readouterr().out
    assert command_line.torch_feat_dir_to_signals(["--help"]) == 0
    assert "Griffin-Lim" in capsys.readouterr().out


def test_kaldi_tables_graceful_without_dep(capsys):
    # without pydrobert-kaldi the CLI falls back to the native table I/O
    # (tests/test_kaldi_native.py runs it end-to-end); a missing wave
    # table still exits nonzero without raising
    code = command_line.compute_feats_from_kaldi_tables(
        ["scp:foo.scp", "ark:bar.ark", COMPUTER_JSON]
    )
    assert code == 1


def test_signals_to_torch_feat_dir_si_computer(wav_dir, temp_dir):
    torch = pytest.importorskip("torch")
    si_json = json.dumps(
        {
            "name": "si",
            "bank": {"name": "fbank", "num_filts": 6, "sampling_rate": 8000},
            "frame_shift_ms": 10,
        }
    )
    out_dir = os.path.join(temp_dir, "si_feats")
    assert (
        command_line.signals_to_torch_feat_dir([wav_dir, si_json, out_dir])
        == 0
    )
    files = sorted(os.listdir(out_dir))
    assert len(files) == 20
    feats = torch.load(os.path.join(out_dir, files[0]))
    assert feats.shape[1] == 6 and torch.isfinite(feats).all()


def test_profile_flag(wav_dir, temp_dir, capsys):
    pytest.importorskip("torch")
    out_dir = os.path.join(temp_dir, "pf")
    assert (
        command_line.signals_to_torch_feat_dir(
            [wav_dir, COMPUTER_JSON, out_dir, "--profile"]
        )
        == 0
    )
    err = capsys.readouterr().err
    # batched path stages: async enqueue + device wait/readback
    assert "stages" in err and "dispatch" in err and "collect" in err


def test_config_type_yaml(temp_dir):
    """YAML configs load when a parser is available (pyyaml in this env),
    matching the JSON fixture (reference: command_line.py:47-64)."""
    pytest.importorskip("yaml")
    import json as _json
    import os

    from speech_tpu.command_line import _config_type

    data_dir = os.path.join(os.path.dirname(__file__), "data")
    got = _config_type(os.path.join(data_dir, "fbank.yaml"))
    with open(os.path.join(data_dir, "fbank.json")) as f:
        want = _json.load(f)
    assert got == want


def test_cli_accepts_yaml_computer_config(wav_dir, temp_dir):
    pytest.importorskip("yaml")
    pytest.importorskip("torch")
    import os

    from speech_tpu.command_line import signals_to_torch_feat_dir

    cfg = os.path.join(temp_dir, "c.yaml")
    with open(cfg, "w") as f:
        f.write(
            "name: stft\n"
            "bank: {name: fbank, num_filts: 6, sampling_rate: 8000}\n"
            "frame_length_ms: 25\nframe_shift_ms: 10\n"
        )
    out = os.path.join(temp_dir, "out")
    assert signals_to_torch_feat_dir([wav_dir, cfg, out]) == 0
    import torch

    t = torch.load(os.path.join(out, "utt00.pt"))
    assert t.shape[-1] == 6


def test_compact_pcm_decision():
    from speech_tpu.command_line import _compact_pcm

    exact = np.array([0.0, 1.0, -32768.0, 32767.0])
    assert _compact_pcm(exact).dtype == np.int16
    for bad in (
        np.array([0.5]),
        np.array([40000.0]),
        np.array([-40000.0]),
        np.array([np.nan]),
        np.array([np.inf]),
    ):
        assert _compact_pcm(bad).dtype == bad.dtype
    empty = np.zeros(0)
    assert _compact_pcm(empty).dtype == empty.dtype


def test_load_utt_compact_downcast(wav_dir):
    """The batched CLI loader ships exact-int16 wav PCM compactly; the
    float and compact loads hold identical sample values."""
    with open(wav_dir) as f:
        utt, path = f.readline().split()
    item = (0, (utt, path))
    _, sig_c = command_line._load_utt(item, [], -1, None, None, compact=True)
    _, sig_f = command_line._load_utt(item, [], -1, None, None, compact=False)
    assert sig_c.dtype == np.int16
    assert sig_f.dtype == np.float64
    assert np.array_equal(sig_c, sig_f)


def test_sort_window_invariant_outputs(wav_dir, temp_dir):
    """Windowed length-sorting changes batch composition, never the
    per-utterance features."""
    torch = pytest.importorskip("torch")
    outs = {}
    for win in ("1", "4"):
        out_dir = os.path.join(temp_dir, f"sw{win}")
        assert (
            command_line.signals_to_torch_feat_dir(
                [
                    wav_dir,
                    COMPUTER_JSON,
                    out_dir,
                    "--batch-size",
                    "4",
                    "--sort-window",
                    win,
                ]
            )
            == 0
        )
        outs[win] = {
            f: torch.load(os.path.join(out_dir, f))
            for f in os.listdir(out_dir)
        }
    assert outs["1"].keys() == outs["4"].keys()
    for f in outs["1"]:
        assert torch.equal(outs["1"][f], outs["4"][f]), f


def test_signals_resample_from(wav_dir, temp_dir):
    """--resample-from 8000 with a 16 kHz computer: outputs equal
    directly computing on host-resampled audio."""
    torch = pytest.importorskip("torch")
    from speech_tpu.alias import alias_factory_subclass_from_arg
    from speech_tpu.compute import FrameComputer
    from speech_tpu.io import read_signal
    from speech_tpu.ops.resample import resample_np

    cfg = json.loads(COMPUTER_JSON)
    cfg["bank"]["sampling_rate"] = 16000
    out_dir = os.path.join(temp_dir, "feats_rs")
    rc = command_line.signals_to_torch_feat_dir(
        [wav_dir, json.dumps(cfg), out_dir, "--resample-from", "8000",
         "--batch-size", "4"]
    )
    assert rc == 0
    computer = alias_factory_subclass_from_arg(FrameComputer, cfg)
    with open(wav_dir) as f:
        utt2path = dict(line.split() for line in f)
    for utt, path in sorted(utt2path.items())[:5]:
        sig = resample_np(read_signal(path, dtype=np.float64), 16000, 8000)
        want = np.asarray(computer.compute_full(sig))
        got = torch.load(os.path.join(out_dir, utt + ".pt")).numpy()
        assert got.shape == want.shape, utt
        assert np.allclose(got, want, atol=1e-4), utt


def test_signals_resample_from_requires_computer(wav_dir, temp_dir, capsys):
    rc = command_line.signals_to_torch_feat_dir(
        [wav_dir, os.path.join(temp_dir, "feats_rs2"), "--resample-from",
         "8000"]
    )
    assert rc == 1
    assert "computer config" in capsys.readouterr().err


def test_signals_resample_from_zero_rejected(wav_dir, temp_dir, capsys):
    rc = command_line.signals_to_torch_feat_dir(
        [wav_dir, COMPUTER_JSON, os.path.join(temp_dir, "f"),
         "--resample-from", "0"]
    )
    assert rc == 1
    assert "positive" in capsys.readouterr().err


def test_speed_perturb_outputs(wav_dir, temp_dir):
    """--speed-perturb 0.9,1.0,1.1: 3 copies per utterance; factor-1 is
    the plain id and matches an unperturbed run; others equal features
    of the host-resampled (1/f length, sox semantics) audio."""
    torch = pytest.importorskip("torch")
    from speech_tpu.alias import alias_factory_subclass_from_arg
    from speech_tpu.compute import FrameComputer
    from speech_tpu.io import read_signal
    from speech_tpu.ops.resample import resample_np

    out_dir = os.path.join(temp_dir, "feats_sp")
    rc = command_line.signals_to_torch_feat_dir(
        [wav_dir, COMPUTER_JSON, out_dir, "--speed-perturb", "0.9,1.0,1.1",
         "--batch-size", "4"]
    )
    assert rc == 0
    files = sorted(os.listdir(out_dir))
    assert len(files) == 60
    assert sum(f.startswith("sp0.9-") for f in files) == 20
    assert sum(f.startswith("sp1.1-") for f in files) == 20

    plain_dir = os.path.join(temp_dir, "feats_plain")
    assert (
        command_line.signals_to_torch_feat_dir(
            [wav_dir, COMPUTER_JSON, plain_dir, "--batch-size", "4"]
        )
        == 0
    )
    computer = alias_factory_subclass_from_arg(
        FrameComputer, json.loads(COMPUTER_JSON)
    )
    with open(wav_dir) as f:
        utt2path = dict(line.split() for line in f)
    for utt, path in sorted(utt2path.items())[:4]:
        base = torch.load(os.path.join(plain_dir, utt + ".pt"))
        fac1 = torch.load(os.path.join(out_dir, utt + ".pt"))
        assert torch.equal(base, fac1), utt
        sig = read_signal(path, dtype=np.float64)
        for tag, up, down in (("sp0.9-", 10, 9), ("sp1.1-", 10, 11)):
            want = np.asarray(
                computer.compute_full(resample_np(sig, up, down))
            )
            got = torch.load(os.path.join(out_dir, tag + utt + ".pt")).numpy()
            assert got.shape == want.shape, (tag, utt)
            assert np.allclose(got, want, atol=1e-4), (tag, utt)


def test_speed_perturb_bad_factor(wav_dir, temp_dir, capsys):
    rc = command_line.signals_to_torch_feat_dir(
        [wav_dir, COMPUTER_JSON, os.path.join(temp_dir, "f_sp"),
         "--speed-perturb", "0.9,-1"]
    )
    assert rc == 1
    assert "positive" in capsys.readouterr().err


def test_speed_perturb_manifest_resume(wav_dir, temp_dir):
    """Manifest entries name the emitted (prefixed) copies, so a resumed
    run skips exactly the copies already written."""
    pytest.importorskip("torch")
    out_dir = os.path.join(temp_dir, "feats_sp_m")
    manifest = os.path.join(temp_dir, "sp_manifest.txt")
    args = [wav_dir, COMPUTER_JSON, out_dir, "--speed-perturb", "0.9,1.1",
            "--manifest", manifest, "--batch-size", "4"]
    assert command_line.signals_to_torch_feat_dir(args) == 0
    with open(manifest) as f:
        done = set(line.strip() for line in f)
    assert len(done) == 40
    before = {
        f: os.path.getmtime(os.path.join(out_dir, f))
        for f in os.listdir(out_dir)
    }
    assert command_line.signals_to_torch_feat_dir(args) == 0
    after = {
        f: os.path.getmtime(os.path.join(out_dir, f))
        for f in os.listdir(out_dir)
    }
    assert before == after  # nothing recomputed


def test_vad_trim_outputs(wav_dir, temp_dir):
    """--vad-trim keeps exactly the voiced rows of the post-processed
    features (VAD over the raw energy column, trim after postprocess)."""
    torch = pytest.importorskip("torch")
    from speech_tpu.alias import alias_factory_subclass_from_arg
    from speech_tpu.compute import FrameComputer
    from speech_tpu.io import read_signal
    from speech_tpu.ops.vad import energy_vad_np
    from speech_tpu.post import Standardize

    cfg = json.loads(COMPUTER_JSON)
    cfg["include_energy"] = True
    post = json.dumps([{"name": "standardize"}])
    out_dir = os.path.join(temp_dir, "feats_vad")
    rc = command_line.signals_to_torch_feat_dir(
        [wav_dir, json.dumps(cfg), out_dir, "--vad-trim",
         '{"frames_context": 2}', "--postprocess", post,
         "--batch-size", "4"]
    )
    assert rc == 0
    computer = alias_factory_subclass_from_arg(FrameComputer, cfg)
    with open(wav_dir) as f:
        utt2path = dict(line.split() for line in f)
    trimmed_any = False
    for utt, path in sorted(utt2path.items())[:5]:
        raw = np.asarray(
            computer.compute_full(read_signal(path, dtype=np.float64))
        )
        mask = energy_vad_np(raw[:, 0], frames_context=2)
        want = Standardize().apply(raw, axis=-1)[mask]
        got = torch.load(os.path.join(out_dir, utt + ".pt")).numpy()
        assert got.shape == want.shape, utt
        assert np.allclose(got, want, atol=1e-4), utt
        trimmed_any |= mask.sum() < raw.shape[0]
    assert trimmed_any  # the random wavs have some unvoiced frames


def test_vad_trim_requires_energy(wav_dir, temp_dir, capsys):
    rc = command_line.signals_to_torch_feat_dir(
        [wav_dir, COMPUTER_JSON, os.path.join(temp_dir, "f_vad"),
         "--vad-trim", "{}"]
    )
    assert rc == 1
    assert "include_energy" in capsys.readouterr().err


def test_vad_trim_requires_computer(wav_dir, temp_dir, capsys):
    rc = command_line.signals_to_torch_feat_dir(
        [wav_dir, os.path.join(temp_dir, "f_vad2"), "--vad-trim", "{}"]
    )
    assert rc == 1
    assert "computer config" in capsys.readouterr().err


def test_vad_trim_bad_key_rejected(wav_dir, temp_dir, capsys):
    cfg = json.loads(COMPUTER_JSON)
    cfg["include_energy"] = True
    rc = command_line.signals_to_torch_feat_dir(
        [wav_dir, json.dumps(cfg), os.path.join(temp_dir, "f_vad3"),
         "--vad-trim", '{"not_a_knob": 1}']
    )
    assert rc == 1
    assert "--vad-trim" in capsys.readouterr().err


def test_vad_trim_frame_count_change_rejected(wav_dir, temp_dir):
    """A frame-count-changing postprocessor (stack) cannot align the trim."""
    pytest.importorskip("torch")
    cfg = json.loads(COMPUTER_JSON)
    cfg["include_energy"] = True
    post = json.dumps([{"name": "stack", "num_vectors": 3}])
    with pytest.raises(ValueError, match="frame count"):
        command_line.signals_to_torch_feat_dir(
            [wav_dir, json.dumps(cfg), os.path.join(temp_dir, "f_vad4"),
             "--vad-trim", "{}", "--postprocess", post, "--batch-size", "4"]
        )


def test_signals_to_torch_feat_dir_pitch(wav_dir, temp_dir):
    torch = pytest.importorskip("torch")
    out_b = os.path.join(temp_dir, "feats_pitch_b")
    out_h = os.path.join(temp_dir, "feats_pitch_h")
    # batched (device) path
    assert (
        command_line.signals_to_torch_feat_dir(
            [wav_dir, COMPUTER_JSON, out_b, "--pitch", "{}"]
        )
        == 0
    )
    # host per-utterance path
    assert (
        command_line.signals_to_torch_feat_dir(
            [wav_dir, COMPUTER_JSON, out_h, "--pitch", "{}", "--batch-size", "0"]
        )
        == 0
    )
    files = sorted(os.listdir(out_b))
    assert len(files) == 20
    for f in files:
        fb = torch.load(os.path.join(out_b, f)).numpy()
        fh = torch.load(os.path.join(out_h, f)).numpy()
        assert fb.shape[1] == 10 + 3  # fbank + [pov, nlp, dlp]
        assert fb.shape == fh.shape
        assert np.isfinite(fb).all()
        # batched and host paths agree (separately compiled f32 programs)
        assert np.allclose(fb, fh, atol=2e-3), f
    # the pitch columns match a direct pitch_feats call, row-aligned
    from speech_tpu.io import read_signal
    from speech_tpu.ops.pitch import pitch_feats

    with open(wav_dir) as fmap:
        utt, path = fmap.readline().split()
    sig = read_signal(path, dtype=np.float32)
    p3, valid = pitch_feats(
        sig, 8000, frame_shift_ms=10.0, return_valid=True
    )
    p3, valid = np.asarray(p3), int(np.asarray(valid))
    got = torch.load(os.path.join(out_h, utt + ".pt")).numpy()[:, 10:]
    v = min(valid, got.shape[0])
    assert np.allclose(got[:v], p3[:v], atol=2e-3)
    if v < got.shape[0]:  # tail rows repeat the last tracked frame
        assert np.allclose(got[v:], got[v - 1], atol=1e-6)


def test_pitch_requires_computer(wav_dir, temp_dir):
    out_dir = os.path.join(temp_dir, "nope")
    assert (
        command_line.signals_to_torch_feat_dir(
            [wav_dir, out_dir, "--pitch", "{}"]
        )
        == 1
    )
    assert (
        command_line.signals_to_torch_feat_dir(
            [wav_dir, COMPUTER_JSON, out_dir, "--pitch", "[1]"]
        )
        == 1
    )


def test_torch_feat_dir_to_signals_roundtrip(wav_dir, temp_dir):
    """Extract -> invert -> wav files whose re-analysis recovers the
    features (envelope inversion: rel-MSE well under 1)."""
    torch = pytest.importorskip("torch")
    import wave as wave_mod

    from speech_tpu.alias import alias_factory_subclass_from_arg
    from speech_tpu.compute import FrameComputer
    from speech_tpu.io import read_signal

    cfg = json.loads(COMPUTER_JSON)
    cfg["bank"]["num_filts"] = 20
    feat_dir = os.path.join(temp_dir, "feats_inv")
    assert (
        command_line.signals_to_torch_feat_dir(
            [wav_dir, json.dumps(cfg), feat_dir, "--batch-size", "4"]
        )
        == 0
    )
    wav_out = os.path.join(temp_dir, "wavs_inv")
    rc = command_line.torch_feat_dir_to_signals(
        [feat_dir, json.dumps(cfg), wav_out, "--n-iters", "8",
         "--batch-size", "4"]
    )
    assert rc == 0
    files = sorted(os.listdir(wav_out))
    assert len(files) == 20 and all(f.endswith(".wav") for f in files)
    computer = alias_factory_subclass_from_arg(FrameComputer, cfg)
    worst = 0.0
    for f in files[:4]:
        utt = f[:-4]
        with wave_mod.open(os.path.join(wav_out, f)) as w:
            assert w.getframerate() == 8000
            assert w.getnchannels() == 1
        want = torch.load(os.path.join(feat_dir, utt + ".pt")).numpy()
        y = read_signal(os.path.join(wav_out, f), dtype=np.float64)
        assert len(y) == want.shape[0] * computer.frame_shift
        got = np.asarray(computer.compute_full(y))[: want.shape[0]]
        rel = float(np.mean((got - want) ** 2) / np.var(want))
        worst = max(worst, rel)
    assert worst < 0.2, worst


def test_torch_feat_dir_to_signals_validation(wav_dir, temp_dir, capsys):
    si_cfg = json.dumps(
        {
            "name": "si",
            "bank": {"name": "fbank", "num_filts": 4, "sampling_rate": 8000},
        }
    )
    rc = command_line.torch_feat_dir_to_signals(
        [temp_dir, si_cfg, os.path.join(temp_dir, "w")]
    )
    assert rc == 1
    assert "STFT" in capsys.readouterr().err
    rc = command_line.torch_feat_dir_to_signals(
        [temp_dir, COMPUTER_JSON, os.path.join(temp_dir, "w")]
    )
    assert rc == 1
    assert "no '*.pt' files" in capsys.readouterr().err


def test_torch_feat_dir_to_signals_skips_bad_files(temp_dir, capsys):
    torch = pytest.importorskip("torch")
    import wave as wave_mod

    feat_dir = os.path.join(temp_dir, "feats_mixed")
    os.makedirs(feat_dir)
    rng = np.random.RandomState(4)
    torch.save(
        torch.as_tensor(rng.randn(50, 10).astype(np.float32)),
        os.path.join(feat_dir, "good.pt"),
    )
    torch.save(
        torch.as_tensor(rng.randn(50, 7).astype(np.float32)),  # wrong width
        os.path.join(feat_dir, "badwidth.pt"),
    )
    wav_out = os.path.join(temp_dir, "wavs_mixed")
    rc = command_line.torch_feat_dir_to_signals(
        [feat_dir, COMPUTER_JSON, wav_out, "--n-iters", "2",
         "--peak-norm", "0.9"]
    )
    assert rc == 0
    assert "badwidth" in capsys.readouterr().err
    assert sorted(os.listdir(wav_out)) == ["good.wav"]
    with wave_mod.open(os.path.join(wav_out, "good.wav")) as w:
        pcm = np.frombuffer(w.readframes(w.getnframes()), np.int16)
    assert np.abs(pcm).max() <= int(0.9 * 32767) + 1
