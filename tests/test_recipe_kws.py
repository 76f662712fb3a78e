"""End-to-end KWS recipe on REAL SPEECH (VERDICT r3 item 4).

The model-family stack proven on actual audio, one seam-covering path:
real speech -> ops.augment (reverb + noise + gain, lengths-aware) ->
trainable frontend -> train steps -> TrainCheckpointer mid-run resume
(bit-exact against the uninterrupted run) -> held-out accuracy ->
export_computer -> FeatureServer serving of the *trained* frontend.

The task: three 1-second segments of the in-repo ``tests/audio/test.wav``
utterance are three "keywords" (distinct real phonetic content); training
examples are seeded random crops with additive noise, a synthetic room
impulse response, and gain perturbation.  Everything is deterministic
(seeded numpy + jax PRNG), CPU float64, and small enough for the default
test tier.


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
from speech_tpu.models.kws import KWSModel, make_train_step
from speech_tpu.nn import STFTFrontend
from speech_tpu.ops.augment import mix_noise, random_gain, reverberate
from speech_tpu.ops.resample import resample_np

RATE = 16000
SEG = RATE  # 1 s keyword segments
CROP = 12800  # 0.8 s training crops
NUM_CLASSES = 3


def _segments():
    """Three real-speech keyword segments at 16 kHz, unit-normalized."""
    path = os.path.join(os.path.dirname(__file__), "audio", "test.wav")
    sig = read_signal(path, dtype=np.float64)  # 44.1 kHz
    sig = resample_np(sig, 160, 441)  # -> 16 kHz
    sig = sig / np.abs(sig).max()
    assert sig.size >= 3 * SEG
    return [sig[i * SEG : (i + 1) * SEG] for i in range(NUM_CLASSES)]


def _rir(rng):
    """Small synthetic room: direct path + decaying sparse reflections."""
    rir = np.zeros(320)
    rir[0] = 1.0
    taps = rng.randint(20, 320, size=12)
    rir[taps] += rng.uniform(-0.5, 0.5, size=12) * np.exp(-taps / 120.0)
    return rir


def _batch(segments, rng, key, batch, rir=None):
    """Seeded augmented batch: crop + (reverb) + noise + gain."""
    labels = rng.randint(0, NUM_CLASSES, size=batch)
    lengths = rng.randint(int(0.75 * CROP), CROP + 1, size=batch)
    signals = np.zeros((batch, CROP))
    for i in range(batch):
        off = rng.randint(0, SEG - lengths[i] + 1)
        signals[i, : lengths[i]] = segments[labels[i]][off : off + lengths[i]]
    signals = jnp.asarray(signals)
    lengths_j = jnp.asarray(lengths, dtype=jnp.int32)
    if rir is not None:
        signals = reverberate(signals, rir, lengths=lengths_j)
    key, k_noise, k_snr, k_gain = jax.random.split(key, 4)
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
    return KWSModel(
        STFTFrontend(computer, dtype=jnp.float64),
        num_classes=NUM_CLASSES,
        channels=(16, 16),
        kernel_width=5,
    )


def _leaves_equal(a, b):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    return all(np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(la, lb))


def test_kws_real_speech_end_to_end(tmp_path):
    segments = _segments()
    model = _model()
    params, consts = model.init(jax.random.PRNGKey(0))
    tx = optax.adam(3e-3)
    opt = tx.init(params)
    step = make_train_step(model, consts, tx)

    rng = np.random.RandomState(600)
    rir = _rir(rng)
    keys = jax.random.split(jax.random.PRNGKey(1), 90)
    batches = [
        _batch(segments, rng, keys[i], batch=16, rir=rir if i % 2 else None)
        for i in range(90)
    ]

    ckpt_step = 45
    with TrainCheckpointer(str(tmp_path / "ck")) as ckpt:
        metrics = None
        for i, b in enumerate(batches):
            params, opt, metrics = step(params, opt, *b)
            if i + 1 == ckpt_step:
                ckpt.save(i + 1, params, opt)
        final_loss = float(metrics["loss"])
        assert np.isfinite(final_loss)
        assert float(metrics["accuracy"]) >= 0.9, float(metrics["accuracy"])

        # mid-run resume is bit-exact against the uninterrupted run
        fresh, _ = _model().init(jax.random.PRNGKey(99))
        at, p2, o2, _ = ckpt.restore(like=(fresh, tx.init(fresh)))
    assert at == ckpt_step
    for b in batches[ckpt_step:]:
        p2, o2, _ = step(p2, o2, *b)
    assert _leaves_equal(params, p2)

    # held-out accuracy on fresh augmented real-speech crops
    eval_rng = np.random.RandomState(601)
    sigs, lens, labels = _batch(
        segments, eval_rng, jax.random.PRNGKey(2), batch=36, rir=_rir(eval_rng)
    )
    logits = model.apply(params, consts, sigs, lens)
    acc = float(np.mean(np.argmax(np.asarray(logits), -1) == np.asarray(labels)))
    assert acc >= 0.9, acc

    # trained frontend -> host computer -> FeatureServer: the serving
    # stack runs the LEARNED features, matching frontend.apply
    from speech_tpu.serve import FeatureServer

    computer = model.frontend.export_computer(params["frontend"])
    sig = np.asarray(sigs[0, : int(lens[0])])
    want = np.asarray(
        model.frontend.apply(
            params["frontend"], consts, sigs[:1, : int(lens[0])]
        )
    )[0]
    with FeatureServer(computer, max_batch=4) as server:
        got = server.extract(sig)
    assert got.shape == want.shape
    assert np.abs(got - want).max() < 1e-8, np.abs(got - want).max()
