"""Speaker-embedding model family (models.speaker).

The reference ships no downstream model (its torch layer stops at learnable
feature parameters, reference torch.py:238-432).  These tests cover the
x-vector-style recipe end to end: masked TDNN/pooling padding invariance,
an AAM-softmax numpy oracle (both trig branches), margin semantics,
an actual synthetic speaker-ID task trained to separation, frontend
freezing, and checkpoint round-trips.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from speech_tpu.compute import STFTFrameComputer
from speech_tpu.models.speaker import (
    SpeakerModel,
    TDNNEncoder,
    aam_softmax_loss,
    cosine_scores,
    load_params,
    make_train_step,
    save_params,
)
from speech_tpu.nn import STFTFrontend

RNG = np.random.RandomState(5678)


def _frontend(num_filts=8, dtype=jnp.float64):
    computer = STFTFrameComputer(
        {"name": "fbank", "num_filts": num_filts, "sampling_rate": 8000},
        frame_length_ms=25,
        frame_shift_ms=10,
        dtype="float64",
    )
    return STFTFrontend(computer, dtype=dtype)


def _model(**kw):
    kw.setdefault("channels", (16, 16, 16))
    kw.setdefault("kernel_widths", (5, 3, 1))
    kw.setdefault("embed_dim", 16)
    return SpeakerModel(
        _frontend(), num_speakers=kw.pop("num_speakers", 4), **kw
    )


def _speaker_batch(rng, batch, num_speakers=4, max_len=2400, sr=8000):
    """Toy speakers: each speaker is a narrow tone band."""
    signals = np.zeros((batch, max_len))
    lengths = rng.randint(max_len // 2, max_len + 1, size=batch)
    labels = rng.randint(0, num_speakers, size=batch)
    bands = np.linspace(300.0, 3200.0, num_speakers + 1)
    t = np.arange(max_len) / sr
    for i in range(batch):
        lo, hi = bands[labels[i]], bands[labels[i] + 1]
        freq = rng.uniform(lo + 0.2 * (hi - lo), hi - 0.2 * (hi - lo))
        amp = rng.uniform(0.5, 1.5)
        phase = rng.uniform(0, 2 * np.pi)
        sig = amp * np.sin(2 * np.pi * freq * t + phase)
        sig += 0.05 * rng.randn(max_len)
        sig[lengths[i] :] = 0.0
        signals[i] = sig
    return (
        jnp.asarray(signals),
        jnp.asarray(lengths, dtype=jnp.int32),
        jnp.asarray(labels, dtype=jnp.int32),
    )


def test_encoder_padding_invariance():
    enc = TDNNEncoder(
        6, channels=(8, 8), kernel_widths=(5, 3), dilations=(1, 2),
        dtype=jnp.float64,
    )
    params = enc.init(jax.random.PRNGKey(0))
    feats = jnp.asarray(RNG.randn(4, 20, 6))
    counts = jnp.asarray([20, 13, 7, 1], dtype=jnp.int32)
    base = enc.apply(params, feats, counts)
    junk = jnp.asarray(100.0 + RNG.randn(4, 9, 6))
    wide = jnp.concatenate([feats, junk], axis=1)
    got = enc.apply(params, wide, counts)
    np.testing.assert_allclose(
        np.asarray(got[:, :20]), np.asarray(base), atol=1e-12
    )
    # rows past the count are exactly zero
    assert float(jnp.abs(got[1, 13:]).max()) == 0.0


def test_embed_padding_invariance():
    model = _model()
    params, consts = model.init(jax.random.PRNGKey(0))
    signals, lengths, _ = _speaker_batch(RNG, 3)
    base = model.embed(params, consts, signals, lengths)
    junk = jnp.asarray(10.0 + RNG.randn(3, 800))
    wide = jnp.concatenate([signals, junk], axis=1)
    np.testing.assert_allclose(
        np.asarray(model.embed(params, consts, wide, lengths)),
        np.asarray(base),
        atol=1e-9,
    )


def _aam_numpy(emb, w, labels, margin, scale, eps=1e-6):
    emb_n = emb / np.maximum(
        np.linalg.norm(emb, axis=-1, keepdims=True), eps
    )
    w_n = w / np.maximum(np.linalg.norm(w, axis=0, keepdims=True), eps)
    cos = emb_n @ w_n
    sin = np.sqrt(np.maximum(1.0 - cos * cos, 0.0))
    phi = cos * math.cos(margin) - sin * math.sin(margin)
    phi = np.where(cos > -math.cos(margin), phi, cos - margin * math.sin(margin))
    logits = cos.copy()
    logits[np.arange(len(labels)), labels] = phi[
        np.arange(len(labels)), labels
    ]
    logits *= scale
    shifted = logits - logits.max(axis=-1, keepdims=True)
    log_p = shifted - np.log(np.exp(shifted).sum(axis=-1, keepdims=True))
    return -log_p[np.arange(len(labels)), labels].mean(), logits


def test_aam_loss_numpy_oracle():
    emb = RNG.randn(6, 8)
    w = RNG.randn(8, 5)
    labels = RNG.randint(0, 5, size=6)
    # force the monotonicity-guard branch for one row: embedding exactly
    # opposite its class weight (cos = -1 < -cos(m))
    emb[0] = -w[:, labels[0]]
    want_loss, want_logits = _aam_numpy(emb, w, labels, 0.25, 16.0)
    got_loss, got_logits = aam_softmax_loss(
        jnp.asarray(emb), jnp.asarray(w), jnp.asarray(labels),
        margin=0.25, scale=16.0,
    )
    np.testing.assert_allclose(float(got_loss), want_loss, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(got_logits), want_logits, atol=1e-10
    )


def test_aam_margin_semantics():
    emb = RNG.randn(6, 8)
    w = RNG.randn(8, 5)
    labels = RNG.randint(0, 5, size=6)
    plain, _ = aam_softmax_loss(
        jnp.asarray(emb), jnp.asarray(w), jnp.asarray(labels),
        margin=0.0, scale=16.0,
    )
    penalized, _ = aam_softmax_loss(
        jnp.asarray(emb), jnp.asarray(w), jnp.asarray(labels),
        margin=0.3, scale=16.0,
    )
    # the margin strictly penalizes imperfect target cosines
    assert float(penalized) > float(plain)
    # margin 0 is plain normalized softmax cross-entropy
    emb_n = emb / np.linalg.norm(emb, axis=-1, keepdims=True)
    w_n = w / np.linalg.norm(w, axis=0, keepdims=True)
    logits = 16.0 * emb_n @ w_n
    shifted = logits - logits.max(axis=-1, keepdims=True)
    log_p = shifted - np.log(np.exp(shifted).sum(axis=-1, keepdims=True))
    want = -log_p[np.arange(6), labels].mean()
    np.testing.assert_allclose(float(plain), want, atol=1e-9)


def test_aam_gradient_finite_at_degenerate_cosines():
    """cos == +/-1 (embedding on a class-weight ray) must not NaN grads."""
    w = np.asarray(RNG.randn(8, 5))
    labels = np.asarray([0, 1, 2])
    emb = np.stack(
        [2.0 * w[:, 0], -3.0 * w[:, 1], RNG.randn(8)]
    )  # cos= +1 (target), cos= -1 (target), generic

    def loss_of(e):
        return aam_softmax_loss(
            e, jnp.asarray(w), jnp.asarray(labels), margin=0.2, scale=30.0
        )[0]

    g = jax.grad(loss_of)(jnp.asarray(emb))
    assert np.isfinite(np.asarray(g)).all()
    gw = jax.grad(
        lambda ww: aam_softmax_loss(
            jnp.asarray(emb), ww, jnp.asarray(labels), margin=0.2
        )[0]
    )(jnp.asarray(w))
    assert np.isfinite(np.asarray(gw)).all()


def test_accuracy_metric_ignores_margin_penalty():
    """A correct example that only leads by less than the margin must still
    count as correct in metrics['accuracy'] (unpenalized argmax)."""
    model = _model(num_speakers=2, margin=0.5)
    params, consts = model.init(jax.random.PRNGKey(0))
    signals, lengths, _ = _speaker_batch(RNG, 2, num_speakers=2)
    emb = model.embed(params, consts, signals, lengths)
    # head columns: class 0 slightly closer to emb[0] than class 1, within
    # the margin's reach; class assignments make both examples "correct"
    e = np.asarray(emb)
    w = np.stack(
        [e[0] + 0.05 * RNG.randn(*e[0].shape), e[1] + 0.05 * RNG.randn(*e[1].shape)],
        axis=1,
    )
    params["head"]["w"] = jnp.asarray(w)
    labels = jnp.asarray([0, 1], jnp.int32)
    _, aux = model.loss(params, consts, signals, lengths, labels)
    assert float(aux["accuracy"]) == 1.0
    # sanity: the penalized logits WOULD misclassify if the margin-depressed
    # target falls behind — accuracy must not use them
    _, logits = aam_softmax_loss(
        emb, params["head"]["w"], labels, margin=0.5, scale=30.0
    )
    # (not asserted — just ensure the penalized path is exercised)
    assert np.isfinite(np.asarray(logits)).all()


def test_training_separates_speakers():
    model = _model()
    params, consts = model.init(jax.random.PRNGKey(3))
    tx = optax.adam(3e-3)
    step = make_train_step(model, consts, tx)
    opt_state = tx.init(params)
    rng = np.random.RandomState(99)
    metrics = {}
    for _ in range(60):
        signals, lengths, labels = _speaker_batch(rng, 16)
        params, opt_state, metrics = step(
            params, opt_state, signals, lengths, labels
        )
    assert float(metrics["accuracy"]) >= 0.9, dict(
        (k, float(v)) for k, v in metrics.items()
    )
    # verification view: held-out same-speaker pairs score higher than
    # different-speaker pairs
    signals, lengths, labels = _speaker_batch(rng, 24)
    emb = model.embed(params, consts, signals, lengths)
    scores = np.asarray(cosine_scores(emb, emb))
    same = np.asarray(labels)[:, None] == np.asarray(labels)[None, :]
    off_diag = ~np.eye(len(scores), dtype=bool)
    same_scores = scores[same & off_diag]
    diff_scores = scores[~same]
    assert same_scores.size and diff_scores.size
    assert same_scores.mean() > diff_scores.mean() + 0.2


def test_freeze_frontend_zeroes_frontend_grads():
    signals, lengths, labels = _speaker_batch(RNG, 4)
    model = _model(train_frontend=False)
    params, consts = model.init(jax.random.PRNGKey(0))
    g = jax.grad(
        lambda p: model.loss(p, consts, signals, lengths, labels)[0]
    )(params)
    for name, leaf in g["frontend"].items():
        assert float(jnp.abs(leaf).max()) == 0.0, name
    assert float(jnp.abs(g["embed"]["w"]).max()) > 0
    assert float(jnp.abs(g["head"]["w"]).max()) > 0

    model_t = _model(train_frontend=True)
    params, consts = model_t.init(jax.random.PRNGKey(0))
    g = jax.grad(
        lambda p: model_t.loss(p, consts, signals, lengths, labels)[0]
    )(params)
    assert any(
        float(jnp.abs(leaf).max()) > 0 for leaf in g["frontend"].values()
    )


def test_streaming_speaker_matches_batch_at_full_window():
    from speech_tpu.models.speaker import StreamingSpeaker

    model = _model()
    params, consts = model.init(jax.random.PRNGKey(2))
    signals, lengths, _ = _speaker_batch(RNG, 1, max_len=3200)
    sig = np.asarray(signals)[0][: int(lengths[0])]
    want = np.asarray(
        model.embed(
            params,
            consts,
            jnp.asarray(sig)[None],
            jnp.asarray([len(sig)], jnp.int32),
        )
    )[0]
    ss = StreamingSpeaker(model, params, window_frames=200, chunk_size=800)
    state = ss.init_state()
    for start in range(0, len(sig), 800):
        chunk = np.zeros(800)
        piece = sig[start : start + 800]
        chunk[: len(piece)] = piece
        state, emb = ss.process(state, jnp.asarray(chunk), len(piece))
    final = np.asarray(ss.finalize(state))
    np.testing.assert_allclose(final, want, atol=1e-9)


def test_streaming_speaker_pools_and_validates():
    from speech_tpu.models.speaker import StreamingSpeaker
    from speech_tpu.serve import StreamPool

    model = _model()
    params, consts = model.init(jax.random.PRNGKey(2))
    ss = StreamingSpeaker(model, params, window_frames=100, chunk_size=640)
    pool = StreamPool(ss, slots=2)
    sig = np.asarray(_speaker_batch(RNG, 1, max_len=1920)[0])[0]
    h = pool.open()
    pool.feed(h, sig)
    closed = dict(pool.close_many([h]))
    want = np.asarray(
        model.embed(
            params,
            consts,
            jnp.asarray(sig)[None],
            jnp.asarray([len(sig)], jnp.int32),
        )
    )[0]
    np.testing.assert_allclose(
        np.asarray(closed[h])[-1], want, atol=1e-9
    )
    with pytest.raises(ValueError):
        StreamingSpeaker(model, params, window_frames=0, chunk_size=640)


def test_checkpoint_roundtrip(tmp_path):
    model = _model()
    params, consts = model.init(jax.random.PRNGKey(0))
    signals, lengths, _ = _speaker_batch(RNG, 2)
    want = np.asarray(model.embed(params, consts, signals, lengths))
    path = str(tmp_path / "spk.npz")
    save_params(path, params)
    loaded = load_params(path)
    got = np.asarray(model.embed(loaded, consts, signals, lengths))
    np.testing.assert_allclose(got, want, atol=0)


def test_validates_config():
    with pytest.raises(ValueError):
        SpeakerModel(_frontend(), num_speakers=1)
    with pytest.raises(ValueError):
        SpeakerModel(_frontend(), num_speakers=4, embed_dim=0)
    with pytest.raises(ValueError):
        SpeakerModel(_frontend(), num_speakers=4, margin=2.0)
    with pytest.raises(ValueError):
        SpeakerModel(_frontend(), num_speakers=4, scale=0.0)
    with pytest.raises(ValueError):
        TDNNEncoder(8, channels=(8, 8), kernel_widths=(3,))
    with pytest.raises(ValueError):
        TDNNEncoder(8, channels=(8,), kernel_widths=(0,))
