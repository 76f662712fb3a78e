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


def test_feature_corpus_feature_file_mode(tmp_path):
    """computer=None reads precomputed feature matrices (.npy here)
    without a device extraction stage; preprocessors are rejected."""
    from speech_tpu.corpus import FeatureCorpus

    rng = np.random.RandomState(3)
    utt2path = []
    wants = {}
    for i, t in enumerate((7, 13, 9, 21, 4)):
        f = rng.randn(t, 6)
        path = str(tmp_path / f"utt{i}.npy")
        np.save(path, f)
        utt2path.append((f"utt{i}", path))
        wants[f"utt{i}"] = f
    corpus = FeatureCorpus(None, utt2path, batch_size=2)
    seen = {}
    for utts, feats in corpus:
        assert len(utts) == len(feats) <= 2
        for u, f in zip(utts, feats):
            seen[u] = np.asarray(f)
    assert set(seen) == set(wants)
    for u in wants:
        assert np.allclose(seen[u], wants[u])
    with pytest.raises(ValueError, match="preprocessors"):
        list(
            FeatureCorpus(
                None, utt2path, batch_size=2, preprocessors=["dither"]
            )
        )


def test_feature_frontend_contract():
    """FeatureFrontend satisfies the nn frontend contract over padded
    feature batches: identity frame counts, zeroed padding rows,
    optional mean/std standardization, KWSModel compatibility."""
    import jax

    from speech_tpu.models.kws import KWSModel
    from speech_tpu.nn import FeatureFrontend

    rng = np.random.RandomState(5)
    feats = rng.randn(3, 10, 8).astype(np.float32)
    counts = np.array([10, 6, 3], np.int32)
    fe = FeatureFrontend(8)
    params, consts = fe.init()
    out = np.asarray(fe.apply(params, consts, feats, counts))
    assert np.allclose(out[0], feats[0], atol=1e-6)
    assert np.all(out[1, 6:] == 0) and np.all(out[2, 3:] == 0)
    assert np.array_equal(np.asarray(fe.frame_counts(counts)), counts)
    mean, std = feats.reshape(-1, 8).mean(0), feats.reshape(-1, 8).std(0)
    fes = FeatureFrontend(8, mean=mean, std=std)
    p2, c2 = fes.init()
    out2 = np.asarray(fes.apply(p2, c2, feats, counts))
    assert np.allclose(out2[0], (feats[0] - mean) / std, atol=1e-5)
    with pytest.raises(ValueError, match="shape"):
        FeatureFrontend(8, mean=np.zeros(3))
    # drives a KWS model end to end (padding-invariant logits)
    model = KWSModel(fe, num_classes=4, channels=(8,))
    mp, mc = model.init(jax.random.PRNGKey(0))
    logits = model.apply(mp, mc, feats, counts)
    wider = np.concatenate([feats, rng.randn(3, 5, 8).astype(np.float32)], 1)
    logits2 = model.apply(mp, mc, wider, counts)
    assert np.allclose(np.asarray(logits), np.asarray(logits2), atol=1e-5)


def test_feature_corpus_feature_file_mode_ark(tmp_path):
    """Feature-file mode also reads ark rspecifiers (the
    compute-feats-from-kaldi-tables CLI's output container): utt2path
    entries like ('utt', 'ark:feats.ark') round-trip through
    read_signal's table dispatch with key= selection."""
    from speech_tpu.corpus import FeatureCorpus
    from speech_tpu.io import kaldi_tables as kt

    rng = np.random.RandomState(7)
    ark = str(tmp_path / "feats.ark")
    wants = {}
    with kt.KaldiTableWriter("ark:" + ark) as writer:
        for i, t in enumerate((5, 11, 8)):
            f = rng.randn(t, 4).astype(np.float32)
            writer.write(f"utt{i}", f)
            wants[f"utt{i}"] = f
    utt2path = [(u, "ark:" + ark) for u in wants]
    corpus = FeatureCorpus(None, utt2path, batch_size=2)
    seen = {}
    for utts, feats in corpus:
        for u, f in zip(utts, feats):
            seen[u] = np.asarray(f)
    assert set(seen) == set(wants)
    for u in wants:
        assert np.allclose(seen[u], wants[u], atol=1e-6)
