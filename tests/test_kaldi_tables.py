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
    """Lazily decoding reader; counts entries handed out so tests can
    assert the CLI streams the table instead of materializing it."""

    def __init__(self, table, decoded):
        self._table = table
        self._decoded = decoded

    def items(self):
        for key, value in self._table.items():
            self._decoded.append(key)
            yield key, value

    def __getitem__(self, key):
        self._decoded.append(key)
        return self._table[key]

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def close(self):
        pass


class _FakeWriter:
    def __init__(self, store, decoded=None):
        self._store = store
        self._decoded = decoded
        self.decoded_at_first_write = None

    def write(self, key, value):
        if self.decoded_at_first_write is None and self._decoded is not None:
            self.decoded_at_first_write = len(self._decoded)
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
    decoded = []
    writers = []

    def kaldi_open(specifier, dtype=None, mode="r", value_style=None):
        # the real backend takes Kaldi dtype STRINGS; numpy dtypes raise
        # (Standardize's float-width attempts must fall through to 'dm')
        if dtype is not None and dtype not in ("b", "bm", "bv", "dm", "fm", "wm"):
            raise TypeError(f"unknown kaldi dtype: {dtype!r}")
        if mode == "w":
            written.setdefault(specifier, {})
            writer = _FakeWriter(written[specifier], decoded)
            writers.append(writer)
            return writer
        if specifier not in tables:
            raise IOError(f"no such table: {specifier}")
        return _FakeReader(tables[specifier], decoded)

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
    return types.SimpleNamespace(
        tables=tables, written=written, decoded=decoded, writers=writers
    )


def _wave_entry(rng, seconds=0.5, rate=8000, channels=1):
    n = int(seconds * rate)
    buff = (rng.randn(channels, n) * 1000).astype(np.float64)
    return buff, float(rate), float(seconds)


def test_kaldi_tables_round_trip(fake_kaldi):
    tables, written = fake_kaldi.tables, fake_kaldi.written
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
    tables, written = fake_kaldi.tables, fake_kaldi.written
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


def test_kaldi_tables_corpus_scale_lazy_and_batched(fake_kaldi):
    """A few hundred utterances stream through in micro-batches: the wave
    table must be consumed lazily (O(batch) entries in flight at first
    write, not the whole corpus) and outputs must match the per-utterance
    path."""
    tables, written = fake_kaldi.tables, fake_kaldi.written
    rng = np.random.RandomState(20)
    n_utts = 200
    table = {}
    for i in range(n_utts):
        table[f"utt{i:03d}"] = _wave_entry(
            rng, seconds=float(rng.uniform(0.3, 0.5))
        )
    tables["ark:big.ark"] = table
    cfg = str(COMPUTER_CONFIG).replace("'", '"')
    rc = cli.compute_feats_from_kaldi_tables(
        ["ark:big.ark", "ark:bigfeats.ark", cfg, "--batch-size", "16"]
    )
    assert rc == 0
    out = written["ark:bigfeats.ark"]
    assert list(out) == list(table)  # all utterances, in table order
    # laziness: at the first write at most ~2 batches (dispatch lookahead)
    # of the 200 entries had been decoded
    first = fake_kaldi.writers[0].decoded_at_first_write
    assert first is not None and first <= 3 * 16, first
    # batched output matches the host per-utterance oracle
    computer = alias_factory_subclass_from_arg(FrameComputer, COMPUTER_CONFIG)
    for utt in list(table)[:3] + list(table)[-2:]:
        want = computer.compute_full(table[utt][0][0]).astype(np.float32)
        assert out[utt].shape == want.shape, utt
        assert np.allclose(out[utt], want, atol=1e-5), utt


def test_kaldi_tables_batch_disabled_matches(fake_kaldi):
    """--batch-size 0 forces the host per-utterance path; results agree."""
    tables, written = fake_kaldi.tables, fake_kaldi.written
    rng = np.random.RandomState(21)
    tables["ark:wav.ark"] = {
        "a": _wave_entry(rng),
        "b": _wave_entry(rng, seconds=0.7),
    }
    cfg = str(COMPUTER_CONFIG).replace("'", '"')
    for spec, extra in (("ark:x.ark", ["--batch-size", "0"]), ("ark:y.ark", [])):
        rc = cli.compute_feats_from_kaldi_tables(
            ["ark:wav.ark", spec, cfg] + extra
        )
        assert rc == 0
    for utt in ("a", "b"):
        assert np.allclose(
            written["ark:x.ark"][utt], written["ark:y.ark"][utt], atol=1e-5
        )


def test_standardize_stats_load_from_kaldi_table(fake_kaldi):
    """Standardize stats archived in a Kaldi table load through the
    dm/fm dtype fallbacks (reference: post.py:109)."""
    import numpy as np

    from speech_tpu.post import Standardize

    rng = np.random.RandomState(22)
    feats = rng.randn(30, 8)
    ref = Standardize()
    ref.accumulate(feats)
    fake_kaldi.tables["ark:stats.ark"] = {"global": np.asarray(ref.stats)}
    # the fake reader returns the raw entry for any dtype string; the
    # real backend validates 'dm'/'fm' itself
    loaded = Standardize("ark:stats.ark", key="global")
    got = loaded.apply(feats)
    want = ref.apply(feats)
    assert np.allclose(got, want)


def test_kaldi_tables_preprocess_seed_determinism(fake_kaldi):
    tables, written = fake_kaldi.tables, fake_kaldi.written
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


def test_kaldi_tables_sort_window_preserves_table_order(fake_kaldi):
    """--sort-window N batches similar-length utterances together but
    still writes in exact table order, matching the per-utterance oracle;
    decode stays bounded by the window."""
    tables, written = fake_kaldi.tables, fake_kaldi.written
    rng = np.random.RandomState(23)
    n_utts = 96
    table = {}
    for i in range(n_utts):
        table[f"utt{i:03d}"] = _wave_entry(
            rng, seconds=float(rng.uniform(0.3, 1.1))
        )
    tables["ark:mixed.ark"] = table
    cfg = str(COMPUTER_CONFIG).replace("'", '"')
    rc = cli.compute_feats_from_kaldi_tables(
        [
            "ark:mixed.ark",
            "ark:sorted.ark",
            cfg,
            "--batch-size",
            "8",
            "--sort-window",
            "3",
        ]
    )
    assert rc == 0
    out = written["ark:sorted.ark"]
    assert list(out) == list(table)  # exact table order despite sorting
    # decode bounded by window + dispatch lookahead, not the whole table
    first = fake_kaldi.writers[0].decoded_at_first_write
    assert first is not None and first <= (2 * 3 + 2) * 8, first
    computer = alias_factory_subclass_from_arg(FrameComputer, COMPUTER_CONFIG)
    for utt in list(table)[:2] + list(table)[47:49] + list(table)[-2:]:
        want = computer.compute_full(table[utt][0][0]).astype(np.float32)
        assert out[utt].shape == want.shape, utt
        assert np.allclose(out[utt], want, atol=1e-5), utt


def test_kaldi_tables_fine_buckets(fake_kaldi):
    """--fine-buckets parses and the batched path still matches the
    oracle (regression: the flag was once wired but unparsed here)."""
    tables, written = fake_kaldi.tables, fake_kaldi.written
    rng = np.random.RandomState(24)
    tables["ark:wav.ark"] = {
        "a": _wave_entry(rng, seconds=0.62),
        "b": _wave_entry(rng, seconds=0.9),
    }
    cfg = str(COMPUTER_CONFIG).replace("'", '"')
    rc = cli.compute_feats_from_kaldi_tables(
        ["ark:wav.ark", "ark:f.ark", cfg, "--fine-buckets"]
    )
    assert rc == 0
    computer = alias_factory_subclass_from_arg(FrameComputer, COMPUTER_CONFIG)
    for utt, (buff, _, _) in tables["ark:wav.ark"].items():
        want = computer.compute_full(buff[0]).astype(np.float32)
        assert np.allclose(written["ark:f.ark"][utt], want, atol=1e-5), utt


def test_kaldi_tables_resample_flag(fake_kaldi):
    """A rate-mismatched utterance is skipped by default (reference
    semantics) but resampled to the computer's rate under --resample."""
    from speech_tpu.ops.resample import resample_np

    tables, written = fake_kaldi.tables, fake_kaldi.written
    rng = np.random.RandomState(23)
    tables["ark:wav.ark"] = {
        "ok": _wave_entry(rng),
        "fast": _wave_entry(rng, rate=16000),
    }
    cfg = str(COMPUTER_CONFIG).replace("'", '"')
    rc = cli.compute_feats_from_kaldi_tables(
        ["ark:wav.ark", "ark:skip.ark", cfg]
    )
    assert rc == 0
    assert set(written["ark:skip.ark"]) == {"ok"}

    rc = cli.compute_feats_from_kaldi_tables(
        ["ark:wav.ark", "ark:rs.ark", cfg, "--resample", "--batch-size", "2"]
    )
    assert rc == 0
    out = written["ark:rs.ark"]
    assert set(out) == {"ok", "fast"}
    computer = alias_factory_subclass_from_arg(FrameComputer, COMPUTER_CONFIG)
    buff = tables["ark:wav.ark"]["fast"][0][0]
    want = computer.compute_full(resample_np(buff, 8000, 16000))
    assert np.allclose(out["fast"], want, atol=1e-4)
    want_ok = computer.compute_full(tables["ark:wav.ark"]["ok"][0][0])
    assert np.allclose(out["ok"], want_ok, atol=1e-4)


@pytest.mark.parametrize("batch", ["2", "0"])
def test_kaldi_tables_pitch(fake_kaldi, batch):
    """--pitch appends 3 aligned columns in both batched and host paths."""
    tables, written = fake_kaldi.tables, fake_kaldi.written
    rng = np.random.RandomState(23)
    tables["ark:wav.ark"] = {
        f"utt{i}": _wave_entry(rng, seconds=0.5 + 0.2 * i) for i in range(4)
    }
    rc = cli.compute_feats_from_kaldi_tables(
        [
            "ark:wav.ark",
            "ark:feats.ark",
            str(COMPUTER_CONFIG).replace("'", '"'),
            "--pitch",
            "{}",
            "--batch-size",
            batch,
        ]
    )
    assert rc == 0
    out = written["ark:feats.ark"]
    computer = alias_factory_subclass_from_arg(FrameComputer, COMPUTER_CONFIG)
    from speech_tpu.ops.pitch import pitch_feats

    for utt, (buff, rate, _) in tables["ark:wav.ark"].items():
        feats = out[utt]
        want = computer.compute_full(buff[0]).astype(np.float32)
        assert feats.shape == (want.shape[0], want.shape[1] + 3)
        assert np.allclose(feats[:, : want.shape[1]], want, atol=1e-4), utt
        p3, valid = pitch_feats(
            buff[0].astype(np.float32),
            rate,
            frame_shift_ms=computer.frame_shift_ms,
            return_valid=True,
        )
        p3, valid = np.asarray(p3), int(np.asarray(valid))
        v = min(valid, feats.shape[0])
        assert np.allclose(feats[:v, want.shape[1]:], p3[:v], atol=2e-3), utt


@pytest.mark.parametrize("batch", ["4", "0"])
def test_kaldi_tables_vad_trim(fake_kaldi, batch):
    """--vad-trim keeps voiced rows in both the batched and host paths;
    an all-silent utterance is omitted, Kaldi select-voiced-frames style."""
    import json

    from speech_tpu.ops.vad import energy_vad_np

    tables, written = fake_kaldi.tables, fake_kaldi.written
    rng = np.random.RandomState(23)
    cfg = dict(COMPUTER_CONFIG, include_energy=True)
    entries = {}
    for i in range(6):
        buff, rate, dur = _wave_entry(rng, seconds=0.4 + 0.13 * i)
        buff[:, : buff.shape[1] // 3] *= 1e-6  # a quiet head to trim
        entries[f"utt{i}"] = (buff, rate, dur)
    entries["silent"] = (
        np.full((1, 3200), 1e-8), 8000.0, 0.4)
    tables["ark:wav.ark"] = entries
    rc = cli.compute_feats_from_kaldi_tables(
        ["ark:wav.ark", "ark:feats.ark", json.dumps(cfg),
         "--vad-trim", '{"frames_context": 2}', "--batch-size", batch]
    )
    assert rc == 0
    out = written["ark:feats.ark"]
    assert "silent" not in out  # no voiced frames -> no output
    computer = alias_factory_subclass_from_arg(FrameComputer, cfg)
    trimmed_any = False
    for utt in (f"utt{i}" for i in range(6)):
        raw = np.asarray(computer.compute_full(entries[utt][0][0]))
        mask = energy_vad_np(raw[:, 0], frames_context=2)
        want = raw[mask].astype(np.float32)
        assert out[utt].shape == want.shape, utt
        assert np.allclose(out[utt], want, atol=1e-5), utt
        trimmed_any |= mask.sum() < raw.shape[0]
    assert trimmed_any
