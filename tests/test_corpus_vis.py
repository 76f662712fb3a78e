"""Corpus wrapper + visualization smoke tests."""

import numpy as np
import pytest

from speech_tpu import corpus as stpu_corpus
from speech_tpu import post as host_post


class _FakeData:
    """Duck-typed stand-in for a pydrobert-kaldi Data iterator."""

    def __init__(self, table, num_sub=1, **kwargs):
        self.table = table
        self.num_sub = num_sub

    def batch_generator(self, repeat=False):
        yield from self.table


def test_post_process_wrapper_single():
    Wrapped = stpu_corpus.post_process_wrapper(_FakeData)
    rng = np.random.RandomState(60)
    batches = [rng.randn(4, 10).astype(np.float64) for _ in range(3)]
    data = Wrapped(
        list(batches),
        postprocessors=[{"name": "standardize"}],
    )
    ref = host_post.Standardize()
    for got, raw in zip(data.batch_generator(), batches):
        want = ref.apply(raw.copy(), axis=-1)
        assert np.allclose(got, want)


def test_post_process_wrapper_subbatches():
    Wrapped = stpu_corpus.post_process_wrapper(_FakeData)
    rng = np.random.RandomState(61)
    batches = [
        (rng.randn(4, 10).astype(np.float64), rng.randn(4).astype(np.float64))
        for _ in range(2)
    ]
    data = Wrapped(
        list(batches),
        num_sub=2,
        postprocessors={0: [{"name": "standardize"}]},
        postprocess_axis=0,
    )
    ref = host_post.Standardize()
    for (got0, got1), (raw0, raw1) in zip(data.batch_generator(), batches):
        want0 = ref.apply(raw0.copy(), axis=0)
        assert np.allclose(got0, want0)
        assert np.allclose(got1, raw1)


def test_feature_corpus(temp_dir):
    import os
    import wave

    rng = np.random.RandomState(62)
    utt2path = {}
    for i in range(7):
        path = os.path.join(temp_dir, f"u{i}.wav")
        sig = (rng.randn(rng.randint(2000, 5000)) * 1000).astype(np.int16)
        with wave.open(path, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(sig.tobytes())
        utt2path[f"u{i}"] = path
    fc = stpu_corpus.FeatureCorpus(
        {
            "name": "stft",
            "bank": {"name": "fbank", "num_filts": 8, "sampling_rate": 8000},
            "frame_length_ms": 25,
            "dtype": "float64",
        },
        utt2path,
        batch_size=3,
        postprocessors=[{"name": "deltas", "num_deltas": 1}],
    )
    assert len(fc) == 3
    seen = set()
    for utts, feats in fc:
        for u, f in zip(utts, feats):
            seen.add(u)
            assert f.ndim == 2 and f.shape[1] == 16
            assert np.all(np.isfinite(f))
    assert seen == set(utt2path)


@pytest.fixture(scope="module")
def mpl():
    mpl = pytest.importorskip("matplotlib")
    mpl.use("Agg")
    return mpl


BANK = {"name": "fbank", "num_filts": 8, "sampling_rate": 8000}


@pytest.mark.parametrize("x_scale", ["hz", "ang", "bins"])
@pytest.mark.parametrize("y_scale", ["dB", "power", "real", "imag", "both"])
def test_plot_frequency_response(mpl, x_scale, y_scale):
    from speech_tpu.alias import alias_factory_subclass_from_arg
    from speech_tpu.filters import LinearFilterBank
    from speech_tpu.vis import plot_frequency_response

    bank = alias_factory_subclass_from_arg(LinearFilterBank, dict(BANK))
    fig = plot_frequency_response(
        bank, x_scale=x_scale, y_scale=y_scale, title="t"
    )
    assert fig is not None
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_compare_feature_frames(mpl):
    from speech_tpu.compute import SIFrameComputer, STFTFrameComputer
    from speech_tpu.vis import compare_feature_frames

    rng = np.random.RandomState(63)
    signal = rng.randn(4000)
    c1 = STFTFrameComputer(dict(BANK), frame_length_ms=25, dtype="float64")
    c2 = SIFrameComputer(dict(BANK), dtype="float64")
    fig = compare_feature_frames(
        [c1, c2],
        signal,
        plot_titles=("stft", "si"),
        post_ops=[host_post.Standardize()],
        title="compare",
    )
    assert len(fig.axes) >= 2
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_feature_corpus_with_workers(temp_dir):
    import os
    import wave

    rng = np.random.RandomState(64)
    utt2path = {}
    for i in range(5):
        path = os.path.join(temp_dir, f"w{i}.wav")
        sig = (rng.randn(3000) * 1000).astype(np.int16)
        with wave.open(path, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(sig.tobytes())
        utt2path[f"w{i}"] = path
    fc = stpu_corpus.FeatureCorpus(
        {
            "name": "stft",
            "bank": {"name": "fbank", "num_filts": 8, "sampling_rate": 8000},
            "frame_length_ms": 25,
            "dtype": "float64",
        },
        utt2path,
        batch_size=2,
        num_workers=3,
        preprocessors=[{"name": "preemphasize"}],
        seed=1,
    )
    seen = {}
    for utts, feats in fc:
        for u, f in zip(utts, feats):
            seen[u] = f
    assert set(seen) == set(utt2path)
    # determinism across iterations
    again = {}
    for utts, feats in fc:
        for u, f in zip(utts, feats):
            again[u] = f
    for u in seen:
        assert np.allclose(seen[u], again[u])


def test_hz_feature_bounds_match_reference_math(mpl):
    """Boundary derivation: support-weighted splits between filter centers,
    outer filters clipped to [0, Nyquist] (reference: vis.py:477-501)."""
    from speech_tpu.compute import STFTFrameComputer
    from speech_tpu.vis import _hz_feature_bounds

    c = STFTFrameComputer(dict(BANK), frame_length_ms=25, dtype="float64")
    bounds = _hz_feature_bounds(c)
    sup = c.bank.supports_hz
    assert bounds.shape == (c.bank.num_filts + 1,)
    assert bounds[0] == max(0.0, sup[0][0])
    assert bounds[-1] == min(c.sampling_rate / 2, sup[-1][1])
    centers = [(l + r) / 2 for l, r in sup]
    for j in range(1, c.bank.num_filts):
        lo_s, hi_s = sup[j - 1]
        want = centers[j - 1] * (hi_s / (lo_s + hi_s)) + centers[j] * (
            lo_s / (lo_s + hi_s)
        )
        assert np.isclose(bounds[j], want)
        # splits sit between the adjacent centers
        assert centers[j - 1] <= bounds[j] <= centers[j]


def test_compare_feature_frames_hz_axis_and_energy_slice(mpl):
    from speech_tpu.compute import STFTFrameComputer
    from speech_tpu.vis import compare_feature_frames

    rng = np.random.RandomState(64)
    signal = rng.randn(4000)
    c = STFTFrameComputer(
        dict(BANK), frame_length_ms=25, include_energy=True, dtype="float64"
    )
    fig = compare_feature_frames(c, signal)
    ax = fig.axes[0]
    assert ax.get_ylabel() == "Frequency (Hz)"
    # the heatmap has num_filts rows (energy coefficient sliced off)
    mesh = ax.collections[0]
    n_frames_cells = mesh.get_array().reshape(-1).shape[0]
    assert n_frames_cells % c.bank.num_filts == 0
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_compare_feature_frames_too_short_signal_raises(mpl):
    from speech_tpu.compute import STFTFrameComputer
    from speech_tpu.vis import compare_feature_frames

    c = STFTFrameComputer(dict(BANK), frame_length_ms=25, dtype="float64")
    with pytest.raises(ValueError):
        compare_feature_frames(c, np.zeros(10))
