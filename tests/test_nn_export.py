"""Train->serve loop closure: STFTFrontend.export_computer.

A trained frontend's parameters bake back into a fresh host
STFTFrameComputer, so the whole inference stack (compute_full,
compute_batch, streaming, serving) runs the learned frontend.  The
reference converts one way only (numpy computer -> torch module,
reference: torch.py:368-412); the reverse path is new.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_tpu.compute import STFTFrameComputer
from speech_tpu.nn import STFTFrontend

RNG = np.random.RandomState(77)


def _computer(**kw):
    kw.setdefault("frame_length_ms", 25)
    kw.setdefault("frame_shift_ms", 10)
    kw.setdefault("dtype", "float64")
    return STFTFrameComputer(
        {"name": "fbank", "num_filts": 8, "sampling_rate": 8000}, **kw
    )


def _perturbed(params, scale=0.05):
    rng = np.random.RandomState(3)
    return {
        "window": params["window"]
        * jnp.asarray(1 + scale * rng.randn(*params["window"].shape)),
        "weights": params["weights"]
        * jnp.asarray(
            np.abs(1 + scale * rng.randn(*params["weights"].shape))
        ),
    }


def test_export_identity_round_trip():
    computer = _computer()
    frontend = STFTFrontend(computer, dtype=jnp.float64)
    params, _ = frontend.init()
    out = frontend.export_computer(params)
    sig = RNG.randn(4000)
    np.testing.assert_allclose(
        out.compute_full(sig), computer.compute_full(sig), atol=1e-12
    )


def test_exported_computer_matches_trained_frontend():
    computer = _computer()
    frontend = STFTFrontend(computer, dtype=jnp.float64)
    params, consts = frontend.init()
    trained = _perturbed(params)
    out = frontend.export_computer(trained)

    sig = RNG.randn(4000)
    want = np.asarray(
        frontend.apply(
            trained,
            consts,
            jnp.asarray(sig)[None],
            jnp.asarray([len(sig)], jnp.int32),
        )
    )[0]
    n = int(frontend.frame_counts(jnp.asarray([len(sig)], jnp.int32))[0])
    got = np.asarray(out.compute_full(sig))
    assert got.shape[0] == n
    np.testing.assert_allclose(got, want[:n], atol=1e-10)


def test_exported_computer_streams_and_batches():
    computer = _computer()
    frontend = STFTFrontend(computer, dtype=jnp.float64)
    params, _ = frontend.init()
    out = frontend.export_computer(_perturbed(params))

    sig = RNG.randn(3210)
    full = np.asarray(out.compute_full(sig))
    # streaming == batch on the exported computer
    chunks = [sig[:1000], sig[1000:1024], sig[1024:]]
    rows = [out.compute_chunk(c) for c in chunks] + [out.finalize()]
    streamed = np.concatenate([r for r in rows if len(r)], axis=0)
    np.testing.assert_allclose(streamed, full, atol=1e-12)
    # device batch path == solo
    sigs = np.stack([sig, sig * 0.25])
    lengths = np.array([3210, 2000], dtype=np.int32)
    feats, counts = out.compute_batch(sigs, lengths)
    feats, counts = np.asarray(feats), np.asarray(counts)
    for i in range(2):
        solo = np.asarray(out.compute_full(sigs[i, : lengths[i]]))
        assert counts[i] == solo.shape[0]
        np.testing.assert_allclose(feats[i, : counts[i]], solo, atol=1e-10)


def test_export_leaves_original_computer_untouched():
    computer = _computer()
    frontend = STFTFrontend(computer, dtype=jnp.float64)
    params, _ = frontend.init()
    sig = RNG.randn(2000)
    before = computer.compute_full(sig)
    _ = computer.params  # populate device caches
    cached = computer._device_params
    out = frontend.export_computer(_perturbed(params))
    assert computer._device_params is cached
    np.testing.assert_allclose(computer.compute_full(sig), before, atol=0)
    assert out is not computer


def test_export_validates_shapes():
    computer = _computer()
    frontend = STFTFrontend(computer, dtype=jnp.float64)
    params, _ = frontend.init()
    bad = dict(params, window=jnp.zeros(7))
    with pytest.raises(ValueError):
        frontend.export_computer(bad)
    bad = dict(params, weights=jnp.zeros((3, 3)))
    with pytest.raises(ValueError):
        frontend.export_computer(bad)


def test_exported_double_tier_rederives_digits():
    # the digit tiers are float32-only; exported weights re-derive the
    # digit-plane decomposition, exact matmuls make batch ~= full at 1e-5
    computer = _computer(precision="double", dtype="float32")
    frontend = STFTFrontend(computer, dtype=jnp.float32)
    params, _ = frontend.init()
    out = frontend.export_computer(_perturbed(params))
    assert out._precision == "double"
    sig = RNG.randn(2400)
    feats, counts = out.compute_batch(
        sig[None].astype(np.float32), np.array([2400], np.int32)
    )
    full = np.asarray(out.compute_full(sig.astype(np.float32)))
    np.testing.assert_allclose(
        np.asarray(feats)[0, : int(np.asarray(counts)[0])], full, atol=1e-5
    )
