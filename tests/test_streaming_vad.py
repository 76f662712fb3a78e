"""Streaming energy VAD (streaming_post.StreamingVAD).

Contracts under test:

- fixed threshold (``energy_mean_scale=0``): streamed voiced-frame
  selection equals the batch :func:`speech_tpu.ops.vad.energy_vad` +
  boolean selection EXACTLY, under any chunking;
- adaptive threshold: decisions follow the documented causal rule
  (running mean over the first ``o + w + 1`` energies), verified
  against a from-scratch numpy oracle, and are chunk-size invariant;
- ``emit="flag"`` passes every frame through, in order, with the
  voiced bit appended;
- a ``valid 0`` step is a bitwise no-op on the carry (pool contract).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_tpu.ops.vad import energy_vad
from speech_tpu.streaming_post import (
    StreamingDeltas,
    StreamingPostChain,
    StreamingVAD,
)

CHUNKINGS = [
    [13, 1, 40, 7, 29, 60, 10],
    [1] * 140,
    [200],
    [137, 5],
]


def _stream_all(op, feats, chunks, dtype=np.float64):
    T = feats.shape[0]
    st = op.init_state(feats.shape[1], dtype)
    step = jax.jit(op._step_impl)
    outs = []
    i = 0
    for c in chunks:
        block = np.zeros((c, feats.shape[1]), dtype)
        n = min(c, max(0, T - i))
        block[:n] = feats[i : i + n]
        i += n
        st, out, nout = step(st, jnp.asarray(block), n)
        outs.append(np.asarray(out)[: int(nout)])
    out, nout = jax.jit(op._finalize_impl)(st)
    outs.append(np.asarray(out)[: int(nout)])
    return np.concatenate(outs)


@pytest.fixture
def feats():
    rng = np.random.default_rng(7171)
    f = rng.standard_normal((137, 5))
    # column 0 plays the log energy: alternate voiced/silence stretches
    energy = np.where(rng.random(137) < 0.5, 8.0, 2.0)
    f[:, 0] = energy + 0.3 * rng.standard_normal(137)
    return f


def _causal_oracle(feats, et, scale, w, prop, energy_idx=0):
    """Numpy re-derivation of the documented causal decision rule."""
    e = feats[:, energy_idx]
    T = len(e)
    voiced = np.zeros(T, bool)
    for o in range(T):
        hi = min(o + w, T - 1)
        thresh = et + scale * e[: hi + 1].mean() if scale else et
        lo = max(0, o - w)
        window = e[lo : hi + 1]
        voiced[o] = (window > thresh).sum() >= prop * len(window)
    return voiced


@pytest.mark.parametrize("chunks", CHUNKINGS, ids=["ragged", "one", "wide", "split"])
@pytest.mark.parametrize("w", [0, 2, 5])
def test_fixed_threshold_select_matches_batch_exactly(feats, chunks, w):
    op = StreamingVAD(
        energy_threshold=5.0,
        energy_mean_scale=0.0,
        frames_context=w,
        proportion_threshold=0.6,
    )
    got = _stream_all(op, feats, chunks)
    mask = np.asarray(
        energy_vad(
            feats[:, 0],
            energy_threshold=5.0,
            energy_mean_scale=0.0,
            frames_context=w,
            proportion_threshold=0.6,
        )
    )
    want = feats[mask]
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("w", [0, 3])
def test_flag_mode_passes_all_frames_with_voiced_bit(feats, w):
    op = StreamingVAD(
        energy_mean_scale=0.0, frames_context=w, emit="flag"
    )
    got = _stream_all(op, feats, [17, 60, 80])
    assert got.shape == (len(feats), feats.shape[1] + 1)
    np.testing.assert_array_equal(got[:, :-1], feats)
    mask = np.asarray(
        energy_vad(feats[:, 0], energy_mean_scale=0.0, frames_context=w)
    )
    np.testing.assert_array_equal(got[:, -1].astype(bool), mask)


@pytest.mark.parametrize("chunks", CHUNKINGS, ids=["ragged", "one", "wide", "split"])
@pytest.mark.parametrize("w", [0, 2])
def test_adaptive_threshold_matches_causal_oracle(feats, chunks, w):
    op = StreamingVAD(
        energy_threshold=1.0,
        energy_mean_scale=0.5,
        frames_context=w,
        proportion_threshold=0.6,
    )
    got = _stream_all(op, feats, chunks)
    mask = _causal_oracle(feats, 1.0, 0.5, w, 0.6)
    want = feats[mask]
    assert got.shape == want.shape
    np.testing.assert_array_equal(got, want)


def test_adaptive_chunk_invariance(feats):
    op = StreamingVAD(energy_mean_scale=0.5, frames_context=4)
    a = _stream_all(op, feats, [137])
    b = _stream_all(op, feats, [1] * 137)
    c = _stream_all(op, feats, [29, 3, 90, 40])
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, c)


def test_valid_zero_step_is_bitwise_noop(feats):
    op = StreamingVAD(energy_mean_scale=0.5, frames_context=3)
    st = op.init_state(5, np.float64)
    st, _, _ = jax.jit(op._step_impl)(st, jnp.asarray(feats[:32]), 32)
    garbage = jnp.asarray(np.full((16, 5), np.e))
    st2, _, n = jax.jit(op._step_impl)(st, garbage, 0)
    assert int(n) == 0
    for a, b in zip(jax.tree_util.tree_leaves(st), jax.tree_util.tree_leaves(st2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_chains_with_downstream_ops(feats):
    # VAD-trim then online deltas == batch select then batch deltas
    from speech_tpu import post as hpost

    op = StreamingPostChain(
        [
            StreamingVAD(energy_mean_scale=0.0, frames_context=2),
            StreamingDeltas(1, 2),
        ]
    )
    got = _stream_all(op, feats, [40, 40, 60])
    mask = np.asarray(
        energy_vad(feats[:, 0], energy_mean_scale=0.0, frames_context=2)
    )
    selected = feats[mask]
    want = hpost.Deltas(1, context_window=2, target_axis=-1).apply(
        selected.copy(), axis=0
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_empty_and_all_silent_streams():
    op = StreamingVAD(energy_mean_scale=0.0, frames_context=2)
    # nothing fed: finalize emits nothing
    st = op.init_state(4, np.float64)
    out, n = op._finalize_impl(st)
    assert int(n) == 0
    # all-silent: selection is empty
    silent = np.full((50, 4), -20.0)
    got = _stream_all(op, silent, [20, 30])
    assert got.shape == (0, 4)


def test_rejects_bad_config():
    with pytest.raises(ValueError):
        StreamingVAD(frames_context=-1)
    with pytest.raises(ValueError):
        StreamingVAD(proportion_threshold=1.5)
    with pytest.raises(ValueError):
        StreamingVAD(energy_mean_scale=-0.1)
    with pytest.raises(ValueError):
        StreamingVAD(emit="gate")


# --- host VADTrim PostProcessor + factory mapping ---------------------


def test_vadtrim_host_matches_energy_vad_np(feats):
    from speech_tpu.ops.vad import energy_vad_np
    from speech_tpu.post import VADTrim

    post = VADTrim(energy_mean_scale=0.5, frames_context=3)
    got = post.apply(feats.copy(), axis=-1)
    mask = energy_vad_np(
        feats[:, 0], energy_mean_scale=0.5, frames_context=3
    )
    np.testing.assert_array_equal(got, feats[mask])
    with pytest.raises(RuntimeError):
        post.apply(feats[None], axis=-1)  # 3-D
    with pytest.raises(RuntimeError):
        post.apply(feats, axis=0)  # axis collision


def test_vadtrim_constructs_from_config_alias(feats):
    from speech_tpu.alias import alias_factory_subclass_from_arg
    from speech_tpu.post import PostProcessor, VADTrim

    post = alias_factory_subclass_from_arg(
        PostProcessor, {"name": "vad_trim", "energy_mean_scale": 0.0}
    )
    assert isinstance(post, VADTrim)
    assert post.energy_mean_scale == 0.0


def test_streaming_factory_maps_vadtrim(feats):
    from speech_tpu.post import VADTrim
    from speech_tpu.streaming_post import streaming_post_op

    host = VADTrim(energy_mean_scale=0.0, frames_context=2)
    op = streaming_post_op(host)
    assert isinstance(op, StreamingVAD)
    got = _stream_all(op, feats, [40, 40, 60])
    want = host.apply(feats.copy(), axis=-1)
    np.testing.assert_array_equal(got, want)
    with pytest.raises(ValueError):
        streaming_post_op(VADTrim(energy_mean_scale=0.5))


def test_vad_in_streaming_pipeline_matches_batch():
    """Endpointing-style serving path: computer + VADTrim streamed as a
    pipeline equals compute_full + host VADTrim on the whole signal."""
    from speech_tpu.compute import STFTFrameComputer
    from speech_tpu.post import VADTrim
    from speech_tpu.streaming_post import StreamingPipeline

    comp = STFTFrameComputer(
        {"name": "fbank", "num_filts": 6, "sampling_rate": 8000},
        dtype="float64",
        include_energy=True,
    )
    rng = np.random.default_rng(99)
    # speech-ish: loud and quiet stretches so the trim bites
    sig = rng.standard_normal(8000 + 240)
    sig[2000:5000] *= 0.01
    post = VADTrim(energy_mean_scale=0.0, energy_threshold=-2.0,
                   frames_context=2)
    pipe = StreamingPipeline(comp, [post], chunk_size=800)
    got = pipe.transform(sig)
    ref = comp.compute_full(sig)
    want = post.apply(ref, axis=-1)
    assert 0 < want.shape[0] < ref.shape[0]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-10)
