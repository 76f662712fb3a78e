"""CTC acoustic-model family (models.ctc).

The reference stops at feature extraction; these tests cover the acoustic
model built on top of it: padding invariance through conv subsampling and
masked attention, CTC-loss plumbing against hand-set paddings, a synthetic
tone-sequence transcription task learned to exact greedy decodes, the
greedy-decode collapse semantics, frontend freezing, and checkpoints.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from speech_tpu.compute import STFTFrameComputer
import itertools

from speech_tpu.models.ctc import (
    CTCModel,
    TransformerEncoder,
    beam_search_decode,
    greedy_decode,
    load_params,
    make_train_step,
    save_params,
)
from speech_tpu.nn import STFTFrontend

RNG = np.random.RandomState(4242)

SR = 8000
SEG = 800  # samples per symbol segment
TONES = {1: 500.0, 2: 2000.0}  # symbol id -> tone frequency


def _frontend(num_filts=8, dtype=jnp.float64):
    computer = STFTFrameComputer(
        {"name": "fbank", "num_filts": num_filts, "sampling_rate": SR},
        frame_length_ms=25,
        frame_shift_ms=10,
        dtype="float64",
    )
    return STFTFrontend(computer, dtype=dtype)


def _model(**kw):
    kw.setdefault("model_dim", 32)
    kw.setdefault("num_layers", 1)
    kw.setdefault("num_heads", 2)
    kw.setdefault("ffn_dim", 64)
    kw.setdefault("subsample_strides", (2,))
    return CTCModel(_frontend(), vocab_size=kw.pop("vocab_size", 2), **kw)


def _tone_sequence_batch(rng, batch, num_syms=3, max_syms=None):
    """Utterances made of tone segments; labels are the tone ids."""
    max_syms = max_syms or num_syms
    max_len = max_syms * SEG
    signals = np.zeros((batch, max_len))
    lengths = np.zeros(batch, dtype=np.int64)
    labels = np.zeros((batch, max_syms), dtype=np.int64)
    label_lengths = np.zeros(batch, dtype=np.int64)
    t = np.arange(SEG) / SR
    for i in range(batch):
        n = num_syms if max_syms == num_syms else rng.randint(1, max_syms + 1)
        seq = rng.randint(1, 3, size=n)
        for j, sym in enumerate(seq):
            tone = np.sin(
                2 * np.pi * TONES[sym] * t + rng.uniform(0, 2 * np.pi)
            )
            signals[i, j * SEG : (j + 1) * SEG] = tone
        signals[i, : n * SEG] += 0.05 * rng.randn(n * SEG)
        lengths[i] = n * SEG
        labels[i, :n] = seq
        label_lengths[i] = n
    return (
        jnp.asarray(signals),
        jnp.asarray(lengths, dtype=jnp.int32),
        jnp.asarray(labels, dtype=jnp.int32),
        jnp.asarray(label_lengths, dtype=jnp.int32),
    )


def test_encoder_padding_invariance():
    enc = TransformerEncoder(16, num_layers=2, num_heads=2, ffn_dim=32,
                             dtype=jnp.float64)
    params = enc.init(jax.random.PRNGKey(0))
    x = jnp.asarray(RNG.randn(3, 12, 16))
    counts = jnp.asarray([12, 7, 2], dtype=jnp.int32)
    base = enc.apply(params, x, counts)
    junk = jnp.asarray(50.0 + RNG.randn(3, 5, 16))
    wide = enc.apply(params, jnp.concatenate([x, junk], axis=1), counts)
    np.testing.assert_allclose(
        np.asarray(wide[:, :12]), np.asarray(base), atol=1e-10
    )
    assert float(jnp.abs(wide[1, 7:]).max()) == 0.0


def test_model_padding_invariance_and_counts():
    model = _model()
    params, consts = model.init(jax.random.PRNGKey(0))
    # non-zero head so log-probs depend on the encoder output
    params["head"]["w"] = jax.random.normal(
        jax.random.PRNGKey(7), params["head"]["w"].shape, dtype=jnp.float64
    )
    signals, lengths, _, _ = _tone_sequence_batch(RNG, 3, max_syms=3)
    base, counts = model.apply(params, consts, signals, lengths)
    np.testing.assert_array_equal(
        np.asarray(counts), np.asarray(model.out_frame_counts(lengths))
    )
    junk = jnp.asarray(10.0 + RNG.randn(3, 2 * SEG))
    wide, wide_counts = model.apply(
        params, consts, jnp.concatenate([signals, junk], axis=1), lengths
    )
    np.testing.assert_array_equal(np.asarray(counts), np.asarray(wide_counts))
    for i in range(3):
        c = int(counts[i])
        np.testing.assert_allclose(
            np.asarray(wide[i, :c]), np.asarray(base[i, :c]), atol=1e-9
        )


def test_ctc_loss_matches_manual_paddings():
    model = _model()
    params, consts = model.init(jax.random.PRNGKey(0))
    signals, lengths, labels, label_lengths = _tone_sequence_batch(
        RNG, 4, max_syms=3
    )
    loss, aux = model.loss(
        params, consts, signals, lengths, labels, label_lengths
    )
    assert np.isfinite(float(loss))
    log_probs, counts = model.apply(params, consts, signals, lengths)
    t_idx = np.arange(log_probs.shape[1])
    u_idx = np.arange(labels.shape[1])
    want = optax.ctc_loss(
        log_probs,
        jnp.asarray(
            (t_idx[None] >= np.asarray(counts)[:, None]).astype(np.float64)
        ),
        labels,
        jnp.asarray(
            (u_idx[None] >= np.asarray(label_lengths)[:, None]).astype(
                np.float64
            )
        ),
    )
    np.testing.assert_allclose(
        np.asarray(aux["per_example"]), np.asarray(want), atol=1e-10
    )
    np.testing.assert_allclose(float(loss), float(want.mean()), atol=1e-10)


def test_greedy_decode_collapse_semantics():
    # path: [1, 1, blank, 1, 2, 2, blank, blank] over counts=8 -> [1, 1, 2]
    V = 3  # vocab + blank
    path = [1, 1, 0, 1, 2, 2, 0, 0]
    lp = np.full((1, len(path), V), -10.0)
    for t, s in enumerate(path):
        lp[0, t, s] = 0.0
    (got,) = greedy_decode(lp, np.asarray([len(path)]))
    np.testing.assert_array_equal(got, [1, 1, 2])
    # count masking: only the first 4 frames [1, 1, blank, 1] are valid —
    # the blank separates the repeat, so the decode is [1, 1]
    (got,) = greedy_decode(lp, np.asarray([4]))
    np.testing.assert_array_equal(got, [1, 1])
    # without the blank, the repeat collapses: frames [1, 1] -> [1]
    (got,) = greedy_decode(lp, np.asarray([2]))
    np.testing.assert_array_equal(got, [1])
    # empty
    (got,) = greedy_decode(lp, np.asarray([0]))
    assert got.size == 0


def _exhaustive_ctc_best(lp, count, blank=0):
    """Enumerate every alignment path; sum per label sequence; return best."""
    lp = np.asarray(lp, dtype=np.float64)
    totals = {}
    for path in itertools.product(range(lp.shape[1]), repeat=int(count)):
        score = sum(lp[t, s] for t, s in enumerate(path))
        # CTC collapse: merge repeats, then drop blanks
        seq = []
        prev = None
        for s in path:
            if s != prev:
                seq.append(s)
            prev = s
        seq = tuple(s for s in seq if s != blank)
        if seq in totals:
            hi, lo = max(totals[seq], score), min(totals[seq], score)
            totals[seq] = hi + np.log1p(np.exp(lo - hi))
        else:
            totals[seq] = score
    best = max(totals.items(), key=lambda kv: kv[1])
    return np.asarray(best[0], dtype=np.int64), best[1]


def test_beam_search_matches_exhaustive_enumeration():
    rng = np.random.RandomState(3)
    for trial in range(4):
        logits = rng.randn(1, 4, 3)  # T=4, vocab=2 + blank
        lp = logits - np.log(
            np.exp(logits).sum(axis=-1, keepdims=True)
        )
        want_seq, want_lp = _exhaustive_ctc_best(lp[0], 4)
        ((got_seq, got_lp),) = beam_search_decode(
            lp, np.asarray([4]), beam_width=1000
        )
        np.testing.assert_array_equal(got_seq, want_seq)
        np.testing.assert_allclose(got_lp, want_lp, atol=1e-12)


def test_beam_search_beats_greedy_on_path_mass():
    # classic case: blank is the per-frame argmax, but label 1's three
    # alignments sum past the single all-blank path
    p = np.asarray([[0.6, 0.25, 0.15], [0.6, 0.25, 0.15]])
    lp = np.log(p)[None]
    (greedy,) = greedy_decode(lp, np.asarray([2]))
    assert greedy.size == 0  # best path is blank-blank
    ((seq, score),) = beam_search_decode(lp, np.asarray([2]), beam_width=8)
    np.testing.assert_array_equal(seq, [1])
    # mass check: 0.25*0.6 + 0.6*0.25 + 0.25*0.25 vs 0.36
    np.testing.assert_allclose(np.exp(score), 0.3625, atol=1e-12)


def test_beam_search_count_masking_and_validation():
    lp = np.log(
        np.asarray(
            [
                [[0.1, 0.9, 0.0001], [0.9, 0.05, 0.05], [0.05, 0.05, 0.9]],
                [[0.3, 0.4, 0.3], [0.3, 0.4, 0.3], [0.3, 0.4, 0.3]],
            ]
        )
    )
    got = beam_search_decode(lp, np.asarray([1, 0]), beam_width=4)
    np.testing.assert_array_equal(got[0][0], [1])
    assert got[1][0].size == 0 and got[1][1] == 0.0
    with pytest.raises(ValueError):
        beam_search_decode(lp, np.asarray([1, 0]), beam_width=0)


def test_training_learns_tone_transcription():
    model = _model()
    params, consts = model.init(jax.random.PRNGKey(1))
    tx = optax.adam(5e-3)
    step = make_train_step(model, consts, tx)
    opt_state = tx.init(params)
    # fixed training set: overfit it, then require exact greedy decodes
    rng = np.random.RandomState(7)
    signals, lengths, labels, label_lengths = _tone_sequence_batch(
        rng, 12, max_syms=3
    )
    first = None
    metrics = {}
    for i in range(150):
        params, opt_state, metrics = step(
            params, opt_state, signals, lengths, labels, label_lengths
        )
        if first is None:
            first = float(metrics["loss"])
    assert float(metrics["loss"]) < 0.3 * first, (first, metrics)
    log_probs, counts = model.apply(params, consts, signals, lengths)
    decoded = greedy_decode(log_probs, counts)
    exact = sum(
        np.array_equal(d, np.asarray(labels[i][: int(label_lengths[i])]))
        for i, d in enumerate(decoded)
    )
    assert exact >= 10, [list(map(int, d)) for d in decoded]


def test_freeze_frontend_zeroes_frontend_grads():
    signals, lengths, labels, label_lengths = _tone_sequence_batch(
        RNG, 2, max_syms=3
    )
    model = _model(train_frontend=False)
    params, consts = model.init(jax.random.PRNGKey(0))
    params["head"]["w"] = jax.random.normal(
        jax.random.PRNGKey(5), params["head"]["w"].shape, dtype=jnp.float64
    )
    g = jax.grad(
        lambda p: model.loss(
            p, consts, signals, lengths, labels, label_lengths
        )[0]
    )(params)
    for name, leaf in g["frontend"].items():
        assert float(jnp.abs(leaf).max()) == 0.0, name
    assert float(jnp.abs(g["head"]["w"]).max()) > 0
    assert any(
        float(jnp.abs(v).max()) > 0
        for v in jax.tree_util.tree_leaves(g["encoder"])
    )


def test_checkpoint_roundtrip(tmp_path):
    model = _model()
    params, consts = model.init(jax.random.PRNGKey(0))
    signals, lengths, _, _ = _tone_sequence_batch(RNG, 2, max_syms=3)
    want, counts = model.apply(params, consts, signals, lengths)
    path = str(tmp_path / "ctc.npz")
    save_params(path, params)
    loaded = load_params(path)
    got, counts2 = model.apply(loaded, consts, signals, lengths)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0)
    np.testing.assert_array_equal(np.asarray(counts), np.asarray(counts2))


def test_validates_config():
    with pytest.raises(ValueError):
        CTCModel(_frontend(), vocab_size=0)
    with pytest.raises(ValueError):
        CTCModel(_frontend(), vocab_size=2, subsample_strides=(0,))
    with pytest.raises(ValueError):
        CTCModel(_frontend(), vocab_size=2, subsample_width=0)
    with pytest.raises(ValueError):
        TransformerEncoder(15, num_heads=4)
    with pytest.raises(ValueError):
        TransformerEncoder(16, num_layers=0)
    enc = TransformerEncoder(16, max_len=8, dtype=jnp.float64)
    params = enc.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        enc.apply(params, jnp.zeros((1, 9, 16)))
