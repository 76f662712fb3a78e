"""compute-feats-from-kaldi-tables, executed for real.

pydrobert-kaldi is not installable in this environment, so a minimal fake
``pydrobert.kaldi.io`` module is injected to drive the command body
end-to-end (the reference exercises the same body against real Kaldi
tables; reference: tests/test_command_line.py).  If the genuine package is
present it wins and the shim is skipped.
"""

import sys
import types

import numpy as np
import pytest

import speech_tpu.command_line as cli
from speech_tpu.alias import alias_factory_subclass_from_arg
from speech_tpu.compute import FrameComputer

COMPUTER_CONFIG = {
    "name": "stft",
    "bank": {"name": "fbank", "num_filts": 10, "sampling_rate": 8000},
    "frame_length_ms": 25,
    "frame_shift_ms": 10,
}


class _FakeReader:
    def __init__(self, table):
        self._table = table

    def items(self):
        return self._table.items()

    def close(self):
        pass


class _FakeWriter:
    def __init__(self, store):
        self._store = store

    def write(self, key, value):
        self._store[key] = np.asarray(value)

    def close(self):
        pass


@pytest.fixture
def fake_kaldi(monkeypatch):
    """Inject a fake pydrobert.kaldi.io unless the real one exists."""
    try:
        import pydrobert.kaldi.io  # noqa: F401

        pytest.skip("real pydrobert-kaldi present; shim unnecessary")
    except ImportError:
        pass
    tables = {}
    written = {}

    def kaldi_open(specifier, dtype=None, mode="r", value_style=None):
        if mode == "w":
            written.setdefault(specifier, {})
            return _FakeWriter(written[specifier])
        if specifier not in tables:
            raise IOError(f"no such table: {specifier}")
        return _FakeReader(tables[specifier])

    io_mod = types.ModuleType("pydrobert.kaldi.io")
    io_mod.open = kaldi_open
    enums_mod = types.ModuleType("pydrobert.kaldi.io.enums")

    class _BaseMatrix:
        is_double = False

    class KaldiDataType:
        BaseMatrix = _BaseMatrix

    enums_mod.KaldiDataType = KaldiDataType
    io_mod.enums = enums_mod
    kaldi_mod = types.ModuleType("pydrobert.kaldi")
    kaldi_mod.io = io_mod
    pydrobert_mod = types.ModuleType("pydrobert")
    pydrobert_mod.kaldi = kaldi_mod
    for name, mod in (
        ("pydrobert", pydrobert_mod),
        ("pydrobert.kaldi", kaldi_mod),
        ("pydrobert.kaldi.io", io_mod),
        ("pydrobert.kaldi.io.enums", enums_mod),
    ):
        monkeypatch.setitem(sys.modules, name, mod)
    return tables, written


def _wave_entry(rng, seconds=0.5, rate=8000, channels=1):
    n = int(seconds * rate)
    buff = (rng.randn(channels, n) * 1000).astype(np.float64)
    return buff, float(rate), float(seconds)


def test_kaldi_tables_round_trip(fake_kaldi):
    tables, written = fake_kaldi
    rng = np.random.RandomState(17)
    tables["ark:wav.ark"] = {
        "utt1": _wave_entry(rng),
        "utt2": _wave_entry(rng, seconds=0.9),
    }
    rc = cli.compute_feats_from_kaldi_tables(
        ["ark:wav.ark", "ark:feats.ark", str(COMPUTER_CONFIG).replace("'", '"')]
    )
    assert rc == 0
    out = written["ark:feats.ark"]
    assert set(out) == {"utt1", "utt2"}
    computer = alias_factory_subclass_from_arg(FrameComputer, COMPUTER_CONFIG)
    for utt, (buff, _, _) in tables["ark:wav.ark"].items():
        want = computer.compute_full(buff[0]).astype(np.float32)
        assert out[utt].dtype == np.float32
        assert np.allclose(out[utt], want, atol=1e-5), utt


def test_kaldi_tables_skips_and_failures(fake_kaldi):
    tables, written = fake_kaldi
    rng = np.random.RandomState(18)
    good = _wave_entry(rng)
    tables["ark:wav.ark"] = {
        "ok": good,
        "too_short": _wave_entry(rng, seconds=0.05),
        "bad_rate": (good[0], 16000.0, good[2]),
        "multichan": _wave_entry(rng, channels=2),
        "bad_chan": _wave_entry(rng, channels=1),
    }
    cfg = str(COMPUTER_CONFIG).replace("'", '"')
    rc = cli.compute_feats_from_kaldi_tables(
        ["ark:wav.ark", "ark:feats.ark", cfg, "--min-duration", "0.2"]
    )
    assert rc == 0
    out = written["ark:feats.ark"]
    # too_short and bad_rate skipped; multichan defaults to channel 0
    assert set(out) == {"ok", "too_short", "bad_rate", "multichan", "bad_chan"} - {
        "too_short",
        "bad_rate",
    }

    # unreadable input table -> exit 1
    assert cli.compute_feats_from_kaldi_tables(["ark:absent", "ark:o", cfg]) == 1

    # channel out of range for every utterance -> zero successes -> exit 1
    tables["ark:mono.ark"] = {"m": _wave_entry(rng)}
    rc = cli.compute_feats_from_kaldi_tables(
        ["ark:mono.ark", "ark:o2.ark", cfg, "--channel", "3"]
    )
    assert rc == 1


def test_kaldi_tables_preprocess_seed_determinism(fake_kaldi):
    tables, written = fake_kaldi
    rng = np.random.RandomState(19)
    tables["ark:wav.ark"] = {"u": _wave_entry(rng)}
    cfg = str(COMPUTER_CONFIG).replace("'", '"')
    pre = '[{"name": "dither"}]'
    outs = []
    for spec in ("ark:a.ark", "ark:b.ark"):
        rc = cli.compute_feats_from_kaldi_tables(
            ["ark:wav.ark", spec, cfg, "--preprocess", pre, "--seed", "7"]
        )
        assert rc == 0
        outs.append(written[spec]["u"].copy())
        # dither mutates in place; restore the source for the second run
        tables["ark:wav.ark"] = {"u": _wave_entry(np.random.RandomState(19))}
    assert np.array_equal(outs[0], outs[1])
