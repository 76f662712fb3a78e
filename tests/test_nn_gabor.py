"""LEAF-style learnable Gabor frontend (nn.GaborFrontend).

Checked against a from-scratch numpy oracle (direct correlation + modulus +
Gaussian pooling), for spectral sanity vs the seeding bank's centers, and
for trainability (nonzero center/width/pooling gradients, a loss that
drops under SGD).  Dtype float64 on the CPU mesh for the oracle legs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_tpu.filters import GaborFilterBank
from speech_tpu.nn import GaborFrontend, PCEN

RNG = np.random.RandomState(42)


def _frontend(**kw):
    bank = GaborFilterBank(
        "mel", num_filts=kw.pop("num_filts", 8), sampling_rate=8000
    )
    kw.setdefault("frame_shift_ms", 10)
    kw.setdefault("dtype", jnp.float64)
    return GaborFrontend(bank, **kw)


def _oracle(frontend, params, signal):
    """Direct numpy re-implementation of apply() for one signal."""
    W, P = frontend.filter_size, frontend.pool_size
    shift = frontend.frame_shift
    t = np.arange(-(W // 2), W // 2 + 1, dtype=np.float64)[:, None]
    sigma = np.exp(np.asarray(params["log_sigma"], np.float64))[None, :]
    env = np.exp(-0.5 * (t / sigma) ** 2)
    env /= env.sum(0, keepdims=True)
    phase = np.asarray(params["eta"], np.float64)[None, :] * t
    cos_f, sin_f = env * np.cos(phase), env * np.sin(phase)
    T = len(signal)
    num_frames = (T + shift // 2) // shift
    energies = np.zeros((frontend.num_filts, T))
    for k in range(frontend.num_filts):
        # SAME correlation: np.correlate "same" aligns the filter center
        re = np.correlate(signal, cos_f[:, k], mode="same")
        im = np.correlate(signal, sin_f[:, k], mode="same")
        energies[k] = re * re + im * im
    pt = np.arange(-(P // 2), P // 2 + 1, dtype=np.float64)[:, None]
    psig = np.exp(np.asarray(params["log_pool_sigma"], np.float64))[None, :]
    pwin = np.exp(-0.5 * (pt / psig) ** 2)
    pwin /= pwin.sum(0, keepdims=True)
    feats = np.zeros((num_frames, frontend.num_filts))
    padded = np.pad(energies, ((0, 0), (P // 2, P // 2 + P + shift)))
    for k in range(num_frames):
        seg = padded[:, k * shift : k * shift + P]
        feats[k] = (seg * pwin.T).sum(-1)
    if frontend.use_log:
        feats = np.log(np.maximum(feats, 1e-5))
    return feats


def test_matches_numpy_oracle():
    frontend = _frontend(use_log=True)
    params, consts = frontend.init()
    sigs = RNG.randn(3, 1600) * 0.5
    feats = np.asarray(
        jax.jit(frontend.apply)(params, consts, jnp.asarray(sigs))
    )
    for b in range(3):
        want = _oracle(frontend, params, sigs[b])
        assert feats[b].shape == want.shape
        np.testing.assert_allclose(feats[b], want, atol=1e-9)


def test_matches_oracle_after_param_perturbation():
    frontend = _frontend(use_log=False)
    params, consts = frontend.init()
    params = {
        "eta": params["eta"] * 1.07,
        "log_sigma": params["log_sigma"] + 0.2,
        "log_pool_sigma": params["log_pool_sigma"] - 0.1,
    }
    sig = RNG.randn(1200)
    feats = np.asarray(frontend.apply(params, consts, sig[None]))[0]
    np.testing.assert_allclose(feats, _oracle(frontend, params, sig), atol=1e-12)


def test_filters_peak_at_seeded_centers():
    frontend = _frontend(num_filts=6)
    params, consts = frontend.init()
    cos_f, sin_f = frontend.filters(params, consts)
    taps = np.asarray(cos_f) + 1j * np.asarray(sin_f)  # (W, F)
    freqs = np.fft.fftfreq(4096)[:2049] * 2 * np.pi
    H = np.abs(np.fft.fft(taps, n=4096, axis=0))[:2049]
    peak_ang = freqs[np.argmax(H, axis=0)]
    bank = GaborFilterBank("mel", num_filts=6, sampling_rate=8000)
    np.testing.assert_allclose(
        peak_ang, np.asarray(bank._centers_ang), atol=0.02
    )
    # unit-area envelopes -> peak response ~1
    np.testing.assert_allclose(H.max(axis=0), 1.0, atol=0.05)


def test_pure_tone_lands_in_matching_filter():
    frontend = _frontend(num_filts=10, use_log=False)
    params, consts = frontend.init()
    centers_hz = (
        np.asarray(params["eta"]) * frontend.sampling_rate / (2 * np.pi)
    )
    k_target = 6
    n = np.arange(4000)
    tone = np.sin(2 * np.pi * centers_hz[k_target] * n / 8000)
    feats = np.asarray(frontend.apply(params, consts, tone[None]))[0]
    mean_energy = feats[5:-5].mean(0)  # steady-state frames
    assert np.argmax(mean_energy) == k_target


def test_gradients_flow_to_every_parameter():
    frontend = _frontend(use_log=True)
    params, consts = frontend.init()
    sig = jnp.asarray(RNG.randn(2, 900))

    def loss(p):
        return jnp.sum(frontend.apply(p, consts, sig) ** 2)

    grads = jax.grad(loss)(params)
    for name, g in grads.items():
        assert np.isfinite(np.asarray(g)).all(), name
        assert np.abs(np.asarray(g)).max() > 0, name


def test_sgd_step_reduces_loss():
    import optax

    frontend = _frontend(use_log=True)
    params, consts = frontend.init()
    sig = jnp.asarray(RNG.randn(2, 900))
    target = frontend.apply(params, consts, sig) * 1.5 + 0.3

    def loss(p):
        return jnp.mean((frontend.apply(p, consts, sig) - target) ** 2)

    opt = optax.sgd(1e-3)
    state = opt.init(params)
    l0 = float(loss(params))
    p = params
    for _ in range(5):
        g = jax.grad(loss)(p)
        updates, state = opt.update(g, state)
        p = optax.apply_updates(p, updates)
    assert float(loss(p)) < l0


def test_vmap_over_param_sets():
    frontend = _frontend()
    params, consts = frontend.init()
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.stack([x, x * 1.01]), params
    )
    sig = jnp.asarray(RNG.randn(1, 800))
    out = jax.vmap(lambda p: frontend.apply(p, consts, sig))(stacked)
    assert out.shape[0] == 2


def test_pcen_composition():
    frontend = _frontend(use_log=False)
    params, consts = frontend.init()
    pcen = PCEN(frontend.num_filts, dtype=jnp.float64)
    pp = pcen.init()
    sig = jnp.asarray(RNG.randn(2, 1000))
    feats = frontend.apply(params, consts, sig)
    out = pcen.apply(pp, feats)
    assert out.shape == feats.shape
    assert np.isfinite(np.asarray(out)).all()


def test_checkpoint_round_trip(tmp_path):
    frontend = _frontend()
    params, consts = frontend.init()
    path = str(tmp_path / "gabor.npz")
    frontend.save_params(path, params)
    loaded = frontend.load_params(path)
    for k in params:
        np.testing.assert_array_equal(
            np.asarray(loaded[k]), np.asarray(params[k])
        )


def test_rejects_non_gabor_bank():
    with pytest.raises(ValueError):
        GaborFrontend({"name": "fbank", "sampling_rate": 8000})


def test_frame_count_matches_computers():
    frontend = _frontend()
    counts = np.asarray(frontend.frame_counts(np.array([799, 800, 840])))
    shift = frontend.frame_shift
    want = [(n + shift // 2) // shift for n in (799, 800, 840)]
    assert counts.tolist() == want
