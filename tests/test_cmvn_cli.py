"""Per-speaker CMVN pipeline steps on the Kaldi CLI.

``--cmvn-stats-out`` mirrors Kaldi ``compute-cmvn-stats`` (one (2, F+1)
sufficient-statistics matrix per speaker, Kaldi archive layout) and
``--apply-cmvn`` mirrors ``apply-cmvn --utt2spk``; both ride the native
table I/O so the whole pipeline runs without bindings.
"""

import json

import numpy as np
import pytest

import speech_tpu.command_line as cli
from speech_tpu.io import kaldi_tables as kt
from speech_tpu.post import Standardize

def _no_bindings():
    try:
        import pydrobert.kaldi.io  # noqa: F401

        return False
    except ImportError:
        return True


pytestmark = pytest.mark.skipif(
    not _no_bindings(), reason="real pydrobert-kaldi present"
)

RNG = np.random.RandomState(7)

CONFIG = json.dumps(
    {
        "name": "stft",
        "bank": {"name": "fbank", "num_filts": 8, "sampling_rate": 8000},
        "frame_length_ms": 25,
        "frame_shift_ms": 10,
    }
)


@pytest.fixture
def corpus(tmp_path):
    wav_ark = str(tmp_path / "wav.ark")
    utt2spk_path = str(tmp_path / "utt2spk")
    spk_of = {}
    with kt.KaldiTableWriter("ark:" + wav_ark) as writer, open(
        utt2spk_path, "w"
    ) as u2s:
        for i in range(6):
            utt, spk = f"utt{i}", f"spk{i % 2}"
            spk_of[utt] = spk
            data = np.round(RNG.randn(1, 1600 + 100 * i) * 2000).astype(
                np.float32
            )
            writer.write(utt, kt.WaveData(data, 8000.0))
            u2s.write(f"{utt} {spk}\n")
    return wav_ark, utt2spk_path, spk_of


def _extract(wav_ark, tmp_path, name, *extra):
    ark = str(tmp_path / f"{name}.ark")
    assert (
        cli.compute_feats_from_kaldi_tables(
            ["ark:" + wav_ark, "ark:" + ark, CONFIG, *extra]
        )
        == 0
    )
    return dict(kt.iter_table("ark:" + ark))


def test_cmvn_stats_out_per_speaker(tmp_path, corpus):
    wav_ark, utt2spk, spk_of = corpus
    stats_ark = str(tmp_path / "cmvn.ark")
    feats = _extract(
        wav_ark,
        tmp_path,
        "feats",
        "--cmvn-stats-out",
        "ark:" + stats_ark,
        "--utt2spk",
        utt2spk,
    )
    stats = dict(kt.iter_table("ark:" + stats_ark))
    assert sorted(stats) == ["spk0", "spk1"]
    for spk in stats:
        ref = Standardize()
        for utt, mat in feats.items():
            if spk_of[utt] == spk:
                ref.accumulate(np.asarray(mat, np.float64))
        assert stats[spk].dtype == np.float64
        np.testing.assert_allclose(stats[spk], ref.stats, rtol=1e-6)


def test_cmvn_stats_out_default_per_utterance(tmp_path, corpus):
    wav_ark, _, spk_of = corpus
    stats_ark = str(tmp_path / "cmvn_utt.ark")
    feats = _extract(
        wav_ark, tmp_path, "feats_u", "--cmvn-stats-out", "ark:" + stats_ark
    )
    stats = dict(kt.iter_table("ark:" + stats_ark))
    assert sorted(stats) == sorted(spk_of)  # one entry per utterance
    for utt, mat in feats.items():
        assert stats[utt][0, -1] == mat.shape[0]


@pytest.mark.parametrize("norm_vars", [False, True])
def test_apply_cmvn_round(tmp_path, corpus, norm_vars):
    wav_ark, utt2spk, spk_of = corpus
    stats_ark = str(tmp_path / "cmvn.ark")
    raw = _extract(
        wav_ark,
        tmp_path,
        "raw",
        "--cmvn-stats-out",
        "ark:" + stats_ark,
        "--utt2spk",
        utt2spk,
    )
    extra = ["--apply-cmvn", "ark:" + stats_ark, "--utt2spk", utt2spk]
    if norm_vars:
        extra.append("--cmvn-norm-vars")
    normed = _extract(wav_ark, tmp_path, "normed", *extra)
    stats = dict(kt.iter_table("ark:" + stats_ark))
    for utt, mat in raw.items():
        std = Standardize.from_stats(stats[spk_of[utt]], norm_var=norm_vars)
        want = std.apply(np.asarray(mat, np.float64)).astype(np.float32)
        np.testing.assert_allclose(normed[utt], want, atol=1e-5)
    # per-speaker pooled mean is ~0 (and var ~1 when normalizing vars)
    for spk in ("spk0", "spk1"):
        pooled = np.concatenate(
            [normed[u] for u in normed if spk_of[u] == spk]
        )
        np.testing.assert_allclose(pooled.mean(0), 0.0, atol=1e-3)
        if norm_vars:
            np.testing.assert_allclose(pooled.std(0), 1.0, atol=1e-2)


def test_apply_cmvn_missing_speaker_skips(tmp_path, corpus):
    wav_ark, utt2spk, spk_of = corpus
    stats_ark = str(tmp_path / "cmvn_partial.ark")
    raw = _extract(
        wav_ark,
        tmp_path,
        "raw2",
        "--cmvn-stats-out",
        "ark:" + stats_ark,
        "--utt2spk",
        utt2spk,
    )
    # drop spk1's stats
    stats = dict(kt.iter_table("ark:" + stats_ark))
    partial_ark = str(tmp_path / "cmvn_only0.ark")
    with kt.KaldiTableWriter("ark:" + partial_ark) as writer:
        writer.write("spk0", stats["spk0"])
    normed = _extract(
        wav_ark,
        tmp_path,
        "normed2",
        "--apply-cmvn",
        "ark:" + partial_ark,
        "--utt2spk",
        utt2spk,
    )
    assert sorted(normed) == sorted(
        u for u in raw if spk_of[u] == "spk0"
    )


def test_cmvn_flags_mutually_exclusive(tmp_path, corpus, capsys):
    wav_ark, utt2spk, _ = corpus
    ret = cli.compute_feats_from_kaldi_tables(
        [
            "ark:" + wav_ark,
            "ark:" + str(tmp_path / "x.ark"),
            CONFIG,
            "--cmvn-stats-out",
            "ark:" + str(tmp_path / "s.ark"),
            "--apply-cmvn",
            "ark:" + str(tmp_path / "s.ark"),
        ]
    )
    assert ret == 2  # argparse mutual-exclusion error
    capsys.readouterr()


def test_bad_utt2spk(tmp_path, corpus, capsys):
    wav_ark, _, _ = corpus
    bad = str(tmp_path / "u2s")
    with open(bad, "w") as f:
        f.write("utt0 spk0 extra\n")
    ret = cli.compute_feats_from_kaldi_tables(
        [
            "ark:" + wav_ark,
            "ark:" + str(tmp_path / "y.ark"),
            CONFIG,
            "--cmvn-stats-out",
            "ark:" + str(tmp_path / "s.ark"),
            "--utt2spk",
            bad,
        ]
    )
    assert ret == 1
    assert "utt2spk" in capsys.readouterr().err
