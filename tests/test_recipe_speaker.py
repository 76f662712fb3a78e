"""End-to-end speaker recipe on REAL SPEECH (VERDICT r3 item 4).

Two real recordings (the ``test.wav`` utterance at 44.1 kHz and the
``123_1pcle.wav`` utterance at 20 kHz, both resampled to 16 kHz) are two
"speakers"; training examples are seeded augmented crops (noise + gain,
lengths-aware).  The path: augment -> SpeakerModel (TDNN + AAM-softmax
over a trainable frontend) train steps -> held-out verification (same- vs
different-speaker cosine separation) -> ``TrainCheckpointer`` params-only
serving hand-off (``restore_params`` embeddings match the trained
model's exactly).  Deterministic, CPU float64, default test tier.


Real-speech diversity caveat: the image ships exactly three
recordings, so keyword/speaker classes here are segments of one
utterance expanded by augmentation — the recipes prove the
pipeline seams and training dynamics, not benchmark-grade
generalization.  Scale the same code to a real corpus for that.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from speech_tpu.compute import STFTFrameComputer
from speech_tpu.io import read_signal
from speech_tpu.models import TrainCheckpointer
from speech_tpu.models.speaker import (
    SpeakerModel,
    cosine_scores,
    make_train_step,
)
from speech_tpu.nn import STFTFrontend
from speech_tpu.ops.augment import mix_noise, random_gain
from speech_tpu.ops.resample import resample_np

RATE = 16000
CROP = 12800  # 0.8 s


def _speakers():
    base = os.path.join(os.path.dirname(__file__), "audio")
    a = read_signal(os.path.join(base, "test.wav"), dtype=np.float64)
    a = resample_np(a, 160, 441)  # 44.1 kHz -> 16 kHz
    b = read_signal(os.path.join(base, "123_1pcle.wav"), dtype=np.float64)
    b = resample_np(b.astype(np.float64), 4, 5)  # 20 kHz -> 16 kHz
    out = []
    for sig in (a, b):
        sig = sig / np.abs(sig).max()
        assert sig.size >= CROP + 1000
        out.append(sig)
    return out


def _batch(speakers, rng, key, batch):
    labels = rng.randint(0, len(speakers), size=batch)
    lengths = rng.randint(int(0.7 * CROP), CROP + 1, size=batch)
    signals = np.zeros((batch, CROP))
    for i in range(batch):
        src = speakers[labels[i]]
        off = rng.randint(0, src.size - lengths[i] + 1)
        signals[i, : lengths[i]] = src[off : off + lengths[i]]
    signals = jnp.asarray(signals)
    lengths_j = jnp.asarray(lengths, dtype=jnp.int32)
    k_noise, k_snr, k_gain = jax.random.split(key, 3)
    noise = jnp.asarray(rng.randn(2 * CROP))
    snr_db = jax.random.uniform(k_snr, (batch,), minval=10.0, maxval=25.0)
    signals = mix_noise(k_noise, signals, noise, snr_db, lengths=lengths_j)
    signals = random_gain(k_gain, signals)
    signals = jnp.where(
        jnp.arange(CROP)[None, :] < lengths_j[:, None], signals, 0.0
    )
    return signals, lengths_j, jnp.asarray(labels, dtype=jnp.int32)


def _model():
    computer = STFTFrameComputer(
        {"name": "fbank", "num_filts": 16, "sampling_rate": RATE},
        frame_length_ms=25,
        frame_shift_ms=10,
        dtype="float64",
    )
    return SpeakerModel(
        STFTFrontend(computer, dtype=jnp.float64),
        num_speakers=2,
        embed_dim=32,
        channels=(32, 32),
        kernel_widths=(5, 3),
        margin=0.2,
        scale=20.0,
    )


def test_speaker_real_speech_end_to_end(tmp_path):
    speakers = _speakers()
    model = _model()
    params, consts = model.init(jax.random.PRNGKey(10))
    tx = optax.adam(3e-3)
    opt = tx.init(params)
    step = make_train_step(model, consts, tx)

    rng = np.random.RandomState(700)
    keys = jax.random.split(jax.random.PRNGKey(11), 60)
    metrics = None
    for i in range(60):
        b = _batch(speakers, rng, keys[i], batch=16)
        params, opt, metrics = step(params, opt, *b)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["accuracy"]) >= 0.95, float(metrics["accuracy"])

    with TrainCheckpointer(str(tmp_path / "ck")) as ckpt:
        ckpt.save(60, params, opt)

    # held-out verification: embeddings of fresh augmented crops separate
    # by speaker — same-speaker cosines beat different-speaker by a margin
    eval_rng = np.random.RandomState(701)
    sigs, lens, labels = _batch(
        speakers, eval_rng, jax.random.PRNGKey(12), batch=32
    )
    emb = np.asarray(model.embed(params, consts, sigs, lens))
    labels = np.asarray(labels)
    scores = np.asarray(cosine_scores(emb, emb))
    iu = np.triu_indices(len(labels), k=1)
    same = scores[iu][labels[iu[0]] == labels[iu[1]]]
    diff = scores[iu][labels[iu[0]] != labels[iu[1]]]
    assert same.size and diff.size
    assert same.mean() > diff.mean() + 0.3, (same.mean(), diff.mean())
    # a usable operating point exists: nearly every same-speaker pair
    # scores above nearly every different-speaker pair
    thresh = (same.mean() + diff.mean()) / 2
    tpr = (same > thresh).mean()
    fpr = (diff > thresh).mean()
    assert tpr >= 0.9 and fpr <= 0.1, (tpr, fpr)

    # serving hand-off: params-only restore reproduces the embeddings
    fresh, _ = _model().init(jax.random.PRNGKey(13))
    with TrainCheckpointer(str(tmp_path / "ck")) as ckpt:
        p2 = ckpt.restore_params(like=fresh)
    emb2 = np.asarray(model.embed(p2, consts, sigs, lens))
    assert np.array_equal(emb, emb2)
