"""SincNet-style learnable band-edge frontend (nn.SincFrontend).

Checked against a from-scratch numpy oracle (windowed sinc-difference taps
+ direct correlation + pooling), for band selectivity, and for
trainability (nonzero band-edge gradients, a loss that drops under SGD).
Dtype float64 on the CPU mesh for the oracle legs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_tpu.nn import SincFrontend

RNG = np.random.RandomState(1234)


def _frontend(**kw):
    kw.setdefault("num_filts", 8)
    kw.setdefault("sampling_rate", 8000)
    kw.setdefault("frame_shift_ms", 10)
    kw.setdefault("dtype", jnp.float64)
    return SincFrontend(**kw)


def _oracle_taps(frontend, params):
    """Numpy re-derivation of the windowed sinc-difference tap bank."""
    sr = frontend.sampling_rate
    low = np.abs(np.asarray(params["low_hz"], np.float64))
    band = np.abs(np.asarray(params["band_hz"], np.float64))
    f1 = frontend.min_low_hz + low
    f2 = np.minimum(f1 + frontend.min_band_hz + band, sr / 2)
    half = frontend.filter_size // 2
    n = np.arange(-half, half + 1, dtype=np.float64)[:, None]
    g1, g2 = 2 * f1[None, :] / sr, 2 * f2[None, :] / sr
    taps = g2 * np.sinc(g2 * n) - g1 * np.sinc(g1 * n)
    window = 0.54 + 0.46 * np.cos(np.pi * n[:, 0] / half)
    return taps * window[:, None]


def _oracle(frontend, params, signal):
    """Direct numpy re-implementation of apply() for one signal."""
    taps = _oracle_taps(frontend, params)
    shift, P = frontend.frame_shift, frontend.pool_size
    T = len(signal)
    num_frames = (T + shift // 2) // shift
    energy = np.zeros((frontend.num_filts, T))
    for k in range(frontend.num_filts):
        r = np.correlate(signal, taps[:, k], mode="same")
        energy[k] = r * r
    padded = np.pad(energy, ((0, 0), (P // 2, P // 2 + P + shift)))
    feats = np.zeros((num_frames, frontend.num_filts))
    for k in range(num_frames):
        seg = padded[:, k * shift : k * shift + P]
        feats[k] = seg.max(-1) if frontend.pooling == "max" else seg.mean(-1)
    if frontend.use_log:
        feats = np.log(np.maximum(feats, 1e-5))
    return feats


@pytest.mark.parametrize("pooling", ["avg", "max"])
def test_matches_numpy_oracle(pooling):
    frontend = _frontend(use_log=True, pooling=pooling)
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
        "low_hz": params["low_hz"] * 1.13 + 5.0,
        "band_hz": params["band_hz"] * 0.91 + 11.0,
    }
    sig = RNG.randn(1200)
    feats = np.asarray(frontend.apply(params, consts, sig[None]))[0]
    np.testing.assert_allclose(
        feats, _oracle(frontend, params, sig), atol=1e-12
    )


def test_band_edges_cover_the_spectrum_in_order():
    frontend = _frontend(num_filts=12, sampling_rate=16000)
    params, _ = frontend.init()
    f1, f2 = (np.asarray(x) for x in frontend.band_edges(params))
    assert (f1 >= frontend.min_low_hz - 1e-9).all()
    assert (f2 - f1 >= frontend.min_band_hz - 1e-9).all()
    assert (f2 <= 8000 + 1e-9).all()
    # seeded edges tile the scale: consecutive bands touch (the 1 Hz
    # gradient-safety floor on the first seed allows a small offset)
    np.testing.assert_allclose(f1[1:], f2[:-1], atol=1.5)
    assert (np.diff(f1) > 0).all()


def test_filter_passband_gain_near_unity():
    frontend = _frontend(num_filts=6, sampling_rate=16000)
    params, consts = frontend.init()
    taps = np.asarray(frontend.filters(params, consts))
    f1, f2 = (np.asarray(x) for x in frontend.band_edges(params))
    freqs = np.fft.rfftfreq(8192) * 16000
    H = np.abs(np.fft.rfft(taps, n=8192, axis=0))
    for k in range(6):
        inband = (freqs >= f1[k]) & (freqs <= f2[k])
        # windowing smears narrow bands; peak response stays near 1
        assert 0.7 < H[inband, k].max() < 1.3, k


def test_pure_tone_lands_in_matching_filter():
    frontend = _frontend(num_filts=10, use_log=False)
    params, consts = frontend.init()
    f1, f2 = (np.asarray(x) for x in frontend.band_edges(params))
    k_target = 6
    tone_hz = (f1[k_target] + f2[k_target]) / 2
    n = np.arange(4000)
    tone = np.sin(2 * np.pi * tone_hz * n / 8000)
    feats = np.asarray(frontend.apply(params, consts, tone[None]))[0]
    mean_energy = feats[5:-5].mean(0)
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
    target = frontend.apply(params, consts, sig) * 1.4 - 0.2

    def loss(p):
        return jnp.mean((frontend.apply(p, consts, sig) - target) ** 2)

    opt = optax.sgd(1e-2)
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
        lambda x: jnp.stack([x, x * 1.02]), params
    )
    sig = jnp.asarray(RNG.randn(1, 800))
    out = jax.vmap(lambda p: frontend.apply(p, consts, sig))(stacked)
    assert out.shape[0] == 2


def test_checkpoint_round_trip(tmp_path):
    frontend = _frontend()
    params, consts = frontend.init()
    path = str(tmp_path / "sinc.npz")
    frontend.save_params(path, params)
    loaded = frontend.load_params(path)
    for k in params:
        np.testing.assert_array_equal(
            np.asarray(loaded[k]), np.asarray(params[k])
        )


def test_rejects_bad_config():
    with pytest.raises(ValueError):
        _frontend(pooling="median")
    with pytest.raises(ValueError):
        _frontend(filter_size=100)
    with pytest.raises(ValueError):
        _frontend(num_filts=0)


def test_frame_count_matches_computers():
    frontend = _frontend()
    counts = np.asarray(frontend.frame_counts(np.array([799, 800, 840])))
    shift = frontend.frame_shift
    want = [(n + shift // 2) // shift for n in (799, 800, 840)]
    assert counts.tolist() == want
