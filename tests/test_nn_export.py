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


# ---------------------------------------------------------------------------
# CLI integration: --learned-params
# ---------------------------------------------------------------------------

import json
import os
import wave


@pytest.fixture
def tiny_wav_map(tmp_path):
    rng = np.random.RandomState(51)
    map_path = tmp_path / "map.txt"
    with open(map_path, "w") as mf:
        for i in range(3):
            n = int(rng.randint(1600, 4000))
            sig = (rng.randn(n) * 1000).astype(np.int16)
            path = tmp_path / f"u{i}.wav"
            with wave.open(str(path), "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(8000)
                w.writeframes(sig.tobytes())
            mf.write(f"u{i} {path}\n")
    return str(map_path)


_CLI_JSON = json.dumps(
    {
        "name": "stft",
        "bank": {"name": "fbank", "num_filts": 8, "sampling_rate": 8000},
        "frame_length_ms": 25,
        "frame_shift_ms": 10,
    }
)


def test_cli_learned_params_runs_trained_frontend(tiny_wav_map, tmp_path):
    torch = pytest.importorskip("torch")
    from speech_tpu import command_line
    from speech_tpu.alias import alias_factory_subclass_from_arg
    from speech_tpu.compute import FrameComputer
    from speech_tpu.io import read_signal

    computer = alias_factory_subclass_from_arg(
        FrameComputer, json.loads(_CLI_JSON)
    )
    frontend = STFTFrontend(computer)
    params, _ = frontend.init()
    trained = _perturbed(params)
    ckpt = str(tmp_path / "frontend.npz")
    frontend.save_params(ckpt, trained)

    out_dir = str(tmp_path / "feats")
    assert (
        command_line.signals_to_torch_feat_dir(
            [tiny_wav_map, _CLI_JSON, out_dir, "--learned-params", ckpt]
        )
        == 0
    )
    served = frontend.export_computer(trained)
    with open(tiny_wav_map) as f:
        utt, path = f.readline().split()
    sig = read_signal(path, dtype=np.float64)
    want = np.asarray(served.compute_full(sig), np.float32)
    got = torch.load(os.path.join(out_dir, utt + ".pt")).numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)
    # and the checkpoint actually changed the features
    plain = np.asarray(computer.compute_full(sig), np.float32)
    assert np.abs(plain - got).max() > 1e-3


def test_cli_learned_params_accepts_kws_checkpoint(tiny_wav_map, tmp_path):
    pytest.importorskip("torch")
    from speech_tpu import command_line
    from speech_tpu.alias import alias_factory_subclass_from_arg
    from speech_tpu.compute import FrameComputer
    from speech_tpu.models.kws import KWSModel, save_params

    computer = alias_factory_subclass_from_arg(
        FrameComputer, json.loads(_CLI_JSON)
    )
    model = KWSModel(
        STFTFrontend(computer), num_classes=2, channels=(8,)
    )
    params, _ = model.init(jax.random.PRNGKey(0))
    ckpt = str(tmp_path / "kws.npz")
    save_params(ckpt, params)
    out_dir = str(tmp_path / "feats")
    assert (
        command_line.signals_to_torch_feat_dir(
            [tiny_wav_map, _CLI_JSON, out_dir, "--learned-params", ckpt]
        )
        == 0
    )
    assert len(os.listdir(out_dir)) == 3


def test_cli_learned_params_rejects_si_config(tiny_wav_map, tmp_path, capsys):
    from speech_tpu import command_line

    ckpt = str(tmp_path / "x.npz")
    np.savez(ckpt, window=np.zeros(3), weights=np.zeros((3, 3)))
    si_json = json.dumps(
        {
            "name": "si",
            "bank": {
                "name": "gammatone",
                "scaling_function": "mel",
                "num_filts": 4,
                "sampling_rate": 8000,
            },
        }
    )
    rc = command_line.signals_to_torch_feat_dir(
        [tiny_wav_map, si_json, str(tmp_path / "o"), "--learned-params", ckpt]
    )
    assert rc == 1
    assert "STFT computer" in capsys.readouterr().err
