"""Corpus -> training integration recipe (VERDICT r4 item 5).

ONE test drives the full production data path end to end across the
seam the other recipes skip: real-speech wavs on disk -> the
``signals-to-torch-feat-dir`` CLI (batched device extraction, manifest)
-> :class:`speech_tpu.corpus.FeatureCorpus` in feature-file mode (reads
the CLI's .pt outputs; no re-extraction) ->
:class:`speech_tpu.nn.FeatureFrontend` + KWS ``train_step`` loop ->
mid-run ``TrainCheckpointer`` resume (bit-exact vs uninterrupted) ->
held-out decode sanity (argmax accuracy on unseen crops).

Deterministic (seeded), CPU float32 training over float64-extracted
features, slow tier.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from speech_tpu.corpus import FeatureCorpus
from speech_tpu.io import read_signal
from speech_tpu.models import TrainCheckpointer
from speech_tpu.models.kws import KWSModel, make_train_step
from speech_tpu.nn import FeatureFrontend
from speech_tpu.ops.resample import resample_np

RATE = 16000
SEG = RATE
NUM_CLASSES = 3
FEATURE_DIM = 40
MAX_FRAMES = 80  # 0.8 s crops -> <= 80 frames at 10 ms shift

COMPUTER_CFG = (
    '{"name": "stft", "bank": {"name": "fbank", "num_filts": 40, '
    '"sampling_rate": 16000}, "frame_length_ms": 25, '
    '"frame_shift_ms": 10}'
)


def _segments():
    path = os.path.join(os.path.dirname(__file__), "audio", "test.wav")
    sig = read_signal(path, dtype=np.float64)  # 44.1 kHz
    sig = resample_np(sig, 160, 441)
    sig = sig / np.abs(sig).max()
    return [sig[i * SEG : (i + 1) * SEG] for i in range(NUM_CLASSES)]


def _write_corpus(root, segments, rng, per_class, prefix):
    """Seeded wav crops on disk + the CLI map file; labels ride utt ids."""
    import wave

    wav_dir = root / f"{prefix}_wavs"
    wav_dir.mkdir()
    map_path = root / f"{prefix}_map.txt"
    with open(map_path, "w") as mf:
        for cls in range(NUM_CLASSES):
            for k in range(per_class):
                n = rng.randint(int(0.6 * RATE * 0.8), int(RATE * 0.8))
                off = rng.randint(0, SEG - n + 1)
                crop = segments[cls][off : off + n]
                crop = crop + 0.01 * rng.randn(n)  # noise floor
                pcm = np.clip(np.round(crop * 20000), -32767, 32767)
                utt = f"c{cls}_{prefix}{k}"
                path = str(wav_dir / f"{utt}.wav")
                with wave.open(path, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(RATE)
                    w.writeframes(pcm.astype(np.int16).tobytes())
                mf.write(f"{utt} {path}\n")
    return map_path


def _extract(map_path, out_dir):
    from speech_tpu.command_line import signals_to_torch_feat_dir

    rc = signals_to_torch_feat_dir(
        [str(map_path), COMPUTER_CFG, str(out_dir), "--batch-size", "8"]
    )
    assert rc == 0


def _corpus_batches(out_dir, batch_size, seed):
    """CLI feat dir -> FeatureCorpus feature-file mode -> fixed-shape
    padded batches ``(feats, counts, labels)`` (fixed MAX_FRAMES pad so
    the train step compiles once)."""
    utt2path = sorted(
        (name[: -len(".pt")], os.path.join(out_dir, name))
        for name in os.listdir(out_dir)
        if name.endswith(".pt")
    )
    rng = np.random.RandomState(seed)
    order = rng.permutation(len(utt2path))
    utt2path = [utt2path[i] for i in order]
    corpus = FeatureCorpus(
        None,  # feature-file mode: no re-extraction
        utt2path,
        batch_size=batch_size,
        sort_by_length=False,  # keep label mixing
    )
    batches = []
    for utts, feats in corpus:
        b = len(feats)
        arr = np.zeros((b, MAX_FRAMES, FEATURE_DIM), np.float32)
        counts = np.zeros((b,), np.int32)
        labels = np.zeros((b,), np.int32)
        for i, (u, f) in enumerate(zip(utts, feats)):
            assert f.shape[1] == FEATURE_DIM
            t = min(len(f), MAX_FRAMES)
            arr[i, :t] = f[:t]
            counts[i] = t
            labels[i] = int(u[1])  # utt id "c<cls>_..."
        batches.append(
            (jnp.asarray(arr), jnp.asarray(counts), jnp.asarray(labels))
        )
    return batches


def test_cli_corpus_to_training_with_resume(tmp_path):
    segments = _segments()
    rng = np.random.RandomState(77)
    train_map = _write_corpus(tmp_path, segments, rng, 12, "train")
    held_map = _write_corpus(tmp_path, segments, rng, 4, "held")
    train_dir = tmp_path / "train_feats"
    held_dir = tmp_path / "held_feats"
    _extract(train_map, train_dir)
    _extract(held_map, held_dir)
    assert len(os.listdir(train_dir)) == NUM_CLASSES * 12

    train_batches = _corpus_batches(train_dir, 12, seed=5)
    held_batches = _corpus_batches(held_dir, 12, seed=6)

    model = KWSModel(
        FeatureFrontend(FEATURE_DIM),
        num_classes=NUM_CLASSES,
        channels=(16, 16),
        kernel_width=5,
    )
    params0, consts = model.init(jax.random.PRNGKey(3))
    tx = optax.adam(3e-3)
    step = make_train_step(model, consts, tx)

    def run(params, opt_state, batches, n_steps, start=0):
        metrics = None
        for s in range(start, n_steps):
            feats, counts, labels = batches[s % len(batches)]
            params, opt_state, metrics = step(
                params, opt_state, feats, counts, labels
            )
        return params, opt_state, metrics

    n_total, n_break = 60, 24
    # uninterrupted run
    p_full, o_full, m_full = run(
        jax.tree_util.tree_map(jnp.copy, params0), tx.init(params0),
        train_batches, n_total,
    )
    assert np.isfinite(float(m_full["loss"]))

    # interrupted run: checkpoint mid-training, restore into a FRESH
    # checkpointer, resume — bit-exact against the uninterrupted run
    p, o = jax.tree_util.tree_map(jnp.copy, params0), tx.init(params0)
    p, o, _ = run(p, o, train_batches, n_break)
    ck_dir = str(tmp_path / "ckpt")
    with TrainCheckpointer(ck_dir) as ck:
        ck.save(n_break, p, o)
    with TrainCheckpointer(ck_dir) as ck2:
        step_no, p_r, o_r, _ = ck2.restore(
            like=(params0, tx.init(params0))
        )
    assert step_no == n_break
    p_res, o_res, _ = run(p_r, o_r, train_batches, n_total, start=n_break)
    for a, b in zip(
        jax.tree_util.tree_leaves(p_full), jax.tree_util.tree_leaves(p_res)
    ):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    # held-out decode sanity on unseen crops through the same CLI->loader
    # path: the trained classifier must actually classify
    correct = total = 0
    for feats, counts, labels in held_batches:
        logits = model.apply(p_full, consts, feats, counts)
        pred = np.asarray(jnp.argmax(logits, axis=-1))
        correct += int((pred == np.asarray(labels)).sum())
        total += len(pred)
    acc = correct / total
    assert acc >= 0.9, f"held-out accuracy {acc} ({correct}/{total})"
