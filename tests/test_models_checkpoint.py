"""Train-state checkpoint/resume (models.checkpoint, orbax-backed).

The reference has no training loop and therefore no train-state
checkpointing (its persistence surface is the CMVN stats file,
reference post.py:107-116).  The contract these tests pin down: a run
interrupted after step k and resumed from the checkpoint produces
bit-identical params to the uninterrupted run (params AND optimizer
moments round-trip exactly), rotation keeps only the newest
``max_to_keep`` steps, ``extra`` loop metadata round-trips, and a
mesh-sharded template restores directly onto the mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from speech_tpu.compute import STFTFrameComputer
from speech_tpu.models import TrainCheckpointer
from speech_tpu.models.kws import KWSModel, make_train_step
from speech_tpu.nn import STFTFrontend

RNG = np.random.RandomState(4321)


def _model():
    computer = STFTFrameComputer(
        {"name": "fbank", "num_filts": 8, "sampling_rate": 8000},
        frame_length_ms=25,
        frame_shift_ms=10,
        dtype="float64",
    )
    return KWSModel(
        STFTFrontend(computer, dtype=jnp.float64),
        num_classes=2,
        channels=(8,),
        kernel_width=3,
    )


def _batch(rng, batch=8, max_len=1600, sr=8000):
    signals = np.zeros((batch, max_len))
    lengths = rng.randint(max_len // 2, max_len + 1, size=batch)
    labels = rng.randint(0, 2, size=batch)
    t = np.arange(max_len) / sr
    for i in range(batch):
        freq = rng.uniform(*((200.0, 600.0) if labels[i] == 0 else (1500.0, 3200.0)))
        sig = np.sin(2 * np.pi * freq * t) + 0.1 * rng.randn(max_len)
        sig[lengths[i]:] = 0.0
        signals[i] = sig
    return signals, lengths, labels


def _tree_equal(a, b):
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    assert len(leaves_a) == len(leaves_b)
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_resume_matches_uninterrupted_run_bitwise(tmp_path):
    model = _model()
    params, consts = model.init(jax.random.PRNGKey(0))
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    step = make_train_step(model, consts, tx)

    batches = [_batch(np.random.RandomState(100 + i)) for i in range(5)]

    # uninterrupted run: 5 steps
    p_ref = jax.tree_util.tree_map(jnp.copy, params)
    o_ref = jax.tree_util.tree_map(jnp.copy, opt_state)
    for b in batches:
        p_ref, o_ref, _ = step(p_ref, o_ref, *b)

    # interrupted run: 3 steps, checkpoint, then resume into FRESH state
    p, o = params, opt_state
    for b in batches[:3]:
        p, o, _ = step(p, o, *b)
    with TrainCheckpointer(str(tmp_path / "ckpt")) as ckpt:
        ckpt.save(3, p, o, extra={"epoch": np.int64(1)})

    model2 = _model()
    params2, consts2 = model2.init(jax.random.PRNGKey(99))  # different init
    opt2 = tx.init(params2)
    with TrainCheckpointer(str(tmp_path / "ckpt")) as ckpt:
        at, p2, o2, extra = ckpt.restore(
            like=(params2, opt2), extra_like={"epoch": np.int64(0)}
        )
    assert at == 3
    assert int(extra["epoch"]) == 1
    assert jax.tree_util.tree_structure(o2) == jax.tree_util.tree_structure(opt2)

    step2 = make_train_step(model2, consts2, tx)
    for b in batches[3:]:
        p2, o2, _ = step2(p2, o2, *b)
    _tree_equal(p_ref, p2)
    _tree_equal(o_ref, o2)


def test_chained_optimizer_state_roundtrip(tmp_path):
    """Production optimizers are chains (clipping + adamw + schedule); the
    schedule's inner step count and every moment must survive the
    round-trip or a resumed run silently restarts its LR schedule."""
    model = _model()
    params, consts = model.init(jax.random.PRNGKey(4))
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(optax.cosine_decay_schedule(1e-3, 100), weight_decay=1e-4),
    )
    opt = tx.init(params)
    step = make_train_step(model, consts, tx)
    b = _batch(np.random.RandomState(7))
    for _ in range(3):
        params, opt, _ = step(params, opt, *b)

    with TrainCheckpointer(str(tmp_path / "chain")) as ckpt:
        ckpt.save(3, params, opt)
        _, p2, o2, _ = ckpt.restore(like=(model.init(jax.random.PRNGKey(8))[0], tx.init(params)))
    _tree_equal(params, p2)
    _tree_equal(opt, o2)  # includes adamw mu/nu and the schedule count

    # one more step from each agrees bit-exactly
    p_a, o_a, _ = step(params, opt, *b)
    p_b, o_b, _ = make_train_step(model, consts, tx)(p2, o2, *b)
    _tree_equal(p_a, p_b)
    _tree_equal(o_a, o_b)


def test_rotation_and_latest(tmp_path):
    model = _model()
    params, _ = model.init(jax.random.PRNGKey(1))
    tx = optax.sgd(1e-2)
    opt = tx.init(params)
    with TrainCheckpointer(str(tmp_path / "ck"), max_to_keep=2) as ckpt:
        assert ckpt.latest_step() is None
        for s in (1, 2, 3):
            ckpt.save(s, params, opt)
        assert ckpt.latest_step() == 3
        assert ckpt.all_steps() == [2, 3]
        at, *_ = ckpt.restore(like=(params, opt), step=2)
        assert at == 2
        with pytest.raises(Exception):
            ckpt.restore(like=(params, opt), step=1)  # rotated away


def test_async_save_overlaps_then_restores(tmp_path):
    """``async_save=True`` returns before the files are durable; ``wait()``
    makes them so, after which restore round-trips exactly."""
    model = _model()
    params, _ = model.init(jax.random.PRNGKey(5))
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    with TrainCheckpointer(str(tmp_path / "async"), async_save=True) as ckpt:
        ckpt.save(11, params, opt)
        ckpt.wait()
        assert ckpt.latest_step() == 11
        at, p2, o2, _ = ckpt.restore(like=(params, opt))
    assert at == 11
    _tree_equal(params, p2)
    _tree_equal(opt, o2)


def test_restore_without_extra_template_still_works(tmp_path):
    """A checkpoint saved WITH ``extra`` restores fine when the caller
    forgets ``extra_like`` — the extra subtree comes back reconstructed
    from checkpoint metadata instead of raising a structure mismatch."""
    model = _model()
    params, _ = model.init(jax.random.PRNGKey(10))
    tx = optax.sgd(1e-2)
    opt = tx.init(params)
    with TrainCheckpointer(str(tmp_path / "ne")) as ckpt:
        ckpt.save(2, params, opt, extra={"epoch": np.int64(4)})
        at, p2, o2, extra = ckpt.restore(like=(params, opt))
    assert at == 2 and int(extra["epoch"]) == 4
    _tree_equal(params, p2)
    _tree_equal(opt, o2)


def test_restore_params_only_without_optimizer(tmp_path):
    """Serving-time hand-off: restore just the trained params from a full
    train checkpoint with no ``tx``/opt-state template in sight."""
    model = _model()
    params, consts = model.init(jax.random.PRNGKey(6))
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    step = make_train_step(model, consts, tx)
    b = _batch(np.random.RandomState(11))
    params, opt, _ = step(params, opt, *b)
    with TrainCheckpointer(str(tmp_path / "po")) as ckpt:
        ckpt.save(1, params, opt, extra={"epoch": np.int64(3)})

    fresh, _ = _model().init(jax.random.PRNGKey(12))
    with TrainCheckpointer(str(tmp_path / "po")) as ckpt:
        p2 = ckpt.restore_params(like=fresh)
    _tree_equal(params, p2)
    # restored params drive inference directly
    logits = model.apply(p2, consts, b[0], b[1])
    assert np.all(np.isfinite(np.asarray(logits)))


def test_restore_extra_like_against_extraless_checkpoint_raises(tmp_path):
    """The converse of the reconstruction path: passing ``extra_like``
    when the checkpoint was saved WITHOUT ``extra`` raises a descriptive
    ValueError, not an opaque orbax structure mismatch."""
    model = _model()
    params, _ = model.init(jax.random.PRNGKey(14))
    tx = optax.sgd(1e-2)
    opt = tx.init(params)
    with TrainCheckpointer(str(tmp_path / "xl")) as ckpt:
        ckpt.save(1, params, opt)  # no extra
        with pytest.raises(ValueError, match="saved without an 'extra'"):
            ckpt.restore(
                like=(params, opt), extra_like={"epoch": np.int64(0)}
            )


def test_restore_extra_like_wraps_when_metadata_unavailable(
    tmp_path, monkeypatch
):
    """When the manager cannot produce the metadata tree (fresh manager
    without item_handlers — a known orbax gotcha), the pre-check cannot
    run; the opaque orbax structure-mismatch must still come back wrapped
    with the extra_like hint."""
    model = _model()
    params, _ = model.init(jax.random.PRNGKey(15))
    tx = optax.sgd(1e-2)
    opt = tx.init(params)
    with TrainCheckpointer(str(tmp_path / "nm")) as ckpt:
        ckpt.save(1, params, opt)  # no extra
        monkeypatch.setattr(
            type(ckpt), "_metadata_tree", lambda self, step: None
        )
        with pytest.raises(ValueError, match="metadata is unavailable"):
            ckpt.restore(
                like=(params, opt), extra_like={"epoch": np.int64(0)}
            )


def test_restore_missing_raises(tmp_path):
    model = _model()
    params, _ = model.init(jax.random.PRNGKey(2))
    tx = optax.sgd(1e-2)
    with TrainCheckpointer(str(tmp_path / "empty")) as ckpt:
        with pytest.raises(FileNotFoundError):
            ckpt.restore(like=(params, tx.init(params)))


def test_restore_onto_mesh_sharding(tmp_path):
    from jax.sharding import NamedSharding, PartitionSpec as P

    from speech_tpu.parallel import make_mesh

    model = _model()
    params, _ = model.init(jax.random.PRNGKey(3))
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    with TrainCheckpointer(str(tmp_path / "mesh")) as ckpt:
        ckpt.save(7, params, opt)

    mesh = make_mesh(("data",))
    rep = NamedSharding(mesh, P())
    like = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), x.dtype, sharding=rep),
        (params, opt),
    )
    with TrainCheckpointer(str(tmp_path / "mesh")) as ckpt:
        at, p2, o2, _ = ckpt.restore(like=like)
    assert at == 7
    leaf = jax.tree_util.tree_leaves(p2)[0]
    assert leaf.sharding == rep
    _tree_equal(params, p2)
    _tree_equal(opt, o2)
