"""PCEN: the associative-scan device op, host post-processor, and the
learnable layer agree with a naive sequential oracle and each other.

PCEN has no reference counterpart (it is a beyond-parity frontend op);
the oracle is the Wang et al. (2017) recurrence written as a plain
per-step Python loop inside the test.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_tpu.alias import alias_factory_subclass_from_arg
from speech_tpu.ops.postops import pcen
from speech_tpu.post import PCEN, PostProcessor

PARAMS = dict(smooth=0.025, alpha=0.98, delta=2.0, power=0.5, eps=1e-6)


def _oracle(E, init=None, **kw):
    p = dict(PARAMS)
    p.update(kw)
    s, a, d, r, eps = (
        p["smooth"], p["alpha"], p["delta"], p["power"], p["eps"],
    )
    m = np.array(E[..., 0, :] if init is None else init, dtype=np.float64)
    out = np.empty_like(E, dtype=np.float64)
    for t in range(E.shape[-2]):
        m = (1 - s) * m + s * E[..., t, :]
        out[..., t, :] = (E[..., t, :] / (eps + m) ** a + d) ** r - d ** r
    return out, m


@pytest.fixture
def energies():
    rng = np.random.RandomState(42)
    return np.abs(rng.randn(3, 64, 10)) * rng.gamma(1.0, 5.0, (3, 64, 10))


def test_pcen_matches_sequential_oracle(energies):
    want, _ = _oracle(energies)
    got = np.asarray(pcen(energies, **PARAMS))
    assert np.allclose(got, want, atol=1e-12), np.abs(got - want).max()


def test_pcen_per_channel_params(energies):
    alpha = np.linspace(0.9, 0.99, energies.shape[-1])
    delta = np.linspace(1.0, 3.0, energies.shape[-1])
    want, _ = _oracle(energies, alpha=alpha, delta=delta)
    got = np.asarray(pcen(energies, alpha=alpha, delta=delta))
    assert np.allclose(got, want, atol=1e-12)


def test_pcen_streaming_carry_equals_full(energies):
    """Threading the smoother state through chunks reproduces the full
    call exactly — the explicit-carry streaming contract."""
    full = np.asarray(pcen(energies))
    state = None
    outs = []
    for lo, hi in ((0, 7), (7, 8), (8, 40), (40, 64)):
        out, state = pcen(
            energies[:, lo:hi], init_state=state, return_state=True
        )
        outs.append(np.asarray(out))
    got = np.concatenate(outs, axis=1)
    assert np.allclose(got, full, atol=1e-12), np.abs(got - full).max()
    _, want_state = _oracle(energies)
    assert np.allclose(np.asarray(state), want_state, atol=1e-12)


def test_pcen_explicit_init_state(energies):
    init = np.full(energies.shape[-1], 3.0)
    want, _ = _oracle(energies, init=np.broadcast_to(init, energies[:, 0].shape))
    got = np.asarray(pcen(energies, init_state=init))
    assert np.allclose(got, want, atol=1e-12)


def test_pcen_jit_vmap_time_axis(energies):
    """jit/vmap compositions and a nonstandard time axis agree with the
    direct call."""
    direct = np.asarray(pcen(energies))
    under_jit = np.asarray(jax.jit(pcen)(energies))
    assert np.allclose(under_jit, direct, atol=1e-12)
    per_sig = np.asarray(jax.vmap(lambda e: pcen(e, time_axis=0))(energies))
    assert np.allclose(per_sig, direct, atol=1e-12)
    moved = np.moveaxis(energies, 1, 0)  # (time, batch, feats)
    via_axis0 = np.asarray(pcen(moved, time_axis=0))
    assert np.allclose(np.moveaxis(via_axis0, 0, 1), direct, atol=1e-12)


def test_pcen_gradients_finite(energies):
    def loss(alpha, delta, power, smooth):
        return jnp.sum(
            pcen(
                energies[0],
                smooth=smooth,
                alpha=alpha,
                delta=delta,
                power=power,
            )
        )

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(0.98, 2.0, 0.5, 0.025)
    assert all(np.isfinite(float(g)) for g in grads)


def test_host_pcen_matches_device_twin(energies):
    host = alias_factory_subclass_from_arg(PostProcessor, {"name": "pcen"})
    for sig in energies:
        want = np.asarray(pcen(sig, time_axis=0, **PARAMS))
        got = host.apply(sig)
        assert np.allclose(got, want, atol=1e-12), np.abs(got - want).max()


def test_host_pcen_validation():
    with pytest.raises(ValueError, match="smooth"):
        PCEN(smooth=0.0)
    with pytest.raises(RuntimeError, match="axes"):
        PCEN(time_axis=1).apply(np.ones((4, 5)), axis=1)


def test_host_pcen_in_postprocess_chain(energies):
    """PCEN composes in an ordered post-processor chain like any other
    PostProcessor (the CLI --postprocess contract)."""
    from speech_tpu.post import Deltas

    chain = [
        alias_factory_subclass_from_arg(PostProcessor, cfg)
        for cfg in ({"name": "pcen"}, {"name": "deltas", "num_deltas": 1})
    ]
    feats = energies[0]
    for p in chain:
        feats = p.apply(feats, axis=-1)
    assert feats.shape == (energies.shape[1], 2 * energies.shape[-1])
    assert np.isfinite(feats).all()


def test_learnable_pcen_layer(energies):
    from speech_tpu.nn import PCEN as LearnablePCEN

    E = energies.astype(np.float32)
    layer = LearnablePCEN(E.shape[-1], learn_smooth=True)
    params = layer.init()
    assert set(params) == {
        "log_alpha", "log_delta", "log_power", "smooth_logit",
    }
    out = np.asarray(layer.apply(params, E), dtype=np.float64)
    want, _ = _oracle(energies)
    assert np.allclose(out, want, atol=1e-4), np.abs(out - want).max()

    def loss(p):
        return jnp.sum(layer.apply(p, E) ** 2)

    grads = jax.grad(loss)(params)
    for name, g in grads.items():
        g = np.asarray(g)
        assert np.isfinite(g).all(), name
        assert (g != 0).any(), name  # every leaf receives signal

    # carry form streams exactly (f32)
    full = np.asarray(layer.apply(params, E))
    o1, st = layer.apply(params, E[:, :20], return_state=True)
    o2 = layer.apply(params, E[:, 20:], init_state=st)
    got = np.concatenate([np.asarray(o1), np.asarray(o2)], axis=1)
    assert np.allclose(got, full, atol=1e-6)


def test_pcen_after_linear_fbank():
    """End-to-end: a use_log=False fbank computer's linear features
    through PCEN — the intended composition (PCEN replaces log+CMVN)."""
    from speech_tpu.compute import STFTFrameComputer

    computer = STFTFrameComputer(
        {"name": "fbank", "num_filts": 10, "sampling_rate": 16000},
        frame_length_ms=25,
        frame_shift_ms=10,
        use_log=False,
        use_power=True,
        dtype="float64",
    )
    sig = np.random.RandomState(7).randn(16000) * 1000
    feats = np.asarray(computer.compute_full(sig))
    assert (feats >= 0).all()
    out = np.asarray(pcen(feats, time_axis=0))
    want, _ = _oracle(feats[None])[0][0], None
    assert np.allclose(out, want, atol=1e-10)
    # compression: the output dynamic range is far flatter than input
    assert np.ptp(out) < 0.01 * np.ptp(feats)


def test_pcen_sharded_over_mesh(energies):
    """PCEN shards over the batch axis on the 8-device mesh (the scan is
    per-signal, so no collectives): mesh result == single-device."""
    from speech_tpu import parallel as par

    mesh = par.make_mesh(("data",))
    n = mesh.shape["data"]
    E = np.tile(energies, (-(-n // energies.shape[0]), 1, 1))[:n]
    sharded = jax.device_put(E, par.named_sharding(mesh, "data"))
    got = np.asarray(jax.jit(pcen)(sharded))
    want = np.asarray(pcen(E))
    assert np.allclose(got, want, atol=1e-12)


def test_learnable_pcen_rejects_degenerate_smooth():
    from speech_tpu.nn import PCEN as LearnablePCEN

    LearnablePCEN(4, smooth=1.0)  # fine when fixed
    with pytest.raises(ValueError, match="learn_smooth"):
        LearnablePCEN(4, smooth=1.0, learn_smooth=True)
