"""Randomized config-space sweep: streaming == batch and reference parity
must hold for arbitrary legal configurations (seeded, deterministic)."""

import numpy as np
import pytest

from speech_tpu.compute import (
    SIFrameComputer,
    STFTFrameComputer,
    frame_by_frame_calculation,
)

RNG = np.random.RandomState(12345)


def _random_bank(rng):
    name = rng.choice(["fbank", "tri", "gabor", "gammatone"])
    cfg = {
        "name": str(name),
        "num_filts": int(rng.randint(2, 12)),
        "sampling_rate": int(rng.choice([8000, 16000])),
    }
    if name != "fbank":
        scaling = str(rng.choice(["mel", "bark", "linear"]))
        if scaling == "linear":
            # linear scaling requires an explicit reference point
            cfg["scaling_function"] = {"name": "linear", "low_hz": 0.0}
        else:
            cfg["scaling_function"] = scaling
    return cfg


CASES = []
for i in range(16):
    rng = np.random.RandomState(1000 + i)
    bank = _random_bank(rng)
    kind = rng.choice(["stft", "si"])
    kw = dict(
        frame_style=str(rng.choice(["causal", "centered"])),
        use_power=bool(rng.randint(2)),
        use_log=bool(rng.randint(2)),
        include_energy=bool(rng.randint(2)),
        frame_shift_ms=float(rng.choice([8, 10, 16])),
    )
    if kind == "stft":
        kw["frame_length_ms"] = float(rng.choice([20, 25, 32]))
        kw["pad_to_nearest_power_of_two"] = bool(rng.randint(2))
        kw["kaldi_shift"] = bool(rng.randint(2))
        kw["fft_mode"] = str(rng.choice(["matmul", "fft"]))
    else:
        kw["conv_mode"] = str(rng.choice(["matmul", "fft"]))
    CASES.append((str(kind), bank, kw))


@pytest.mark.parametrize("kind,bank,kw", CASES, ids=[f"cfg{i}" for i in range(len(CASES))])
def test_random_config_streaming_matches_batch(kind, bank, kw):
    cls = STFTFrameComputer if kind == "stft" else SIFrameComputer
    computer = cls(dict(bank), dtype="float64", **kw)
    rng = np.random.RandomState(77)
    signal = rng.randn(int(rng.randint(2000, 6000)))
    want = computer.compute_full(signal)
    got = frame_by_frame_calculation(computer, signal, chunk_size=777)
    assert got.shape == want.shape
    # causal STFT finalize may diverge at the very last frames when the
    # tail is shorter than the reflection depth (reference-faithful quirk)
    if kind == "stft" and kw["frame_style"] == "causal":
        want = want[: got.shape[0] - 2]
        got = got[: want.shape[0]]
    assert np.allclose(got, want, atol=1e-8), np.abs(got - want).max()


@pytest.mark.parametrize("precision", ["double", "accurate"])
@pytest.mark.parametrize(
    "kind,bank,kw", CASES, ids=[f"cfg{i}" for i in range(len(CASES))]
)
def test_random_config_double_tier_tracks_float64(kind, bank, kw, precision):
    """The f32 digit tiers ('double' exact; 'accurate' reduced-pair) hold
    ~1e-5 of the float64 result across the random config space (both
    computers, all frame styles, power/mag, log on/off, odd DFT
    sizes)."""
    cls = STFTFrameComputer if kind == "stft" else SIFrameComputer
    kw = dict(kw)
    if kind == "si":
        kw["conv_mode"] = "matmul"  # the digit tiers' only conv backend
    c64 = cls(dict(bank), dtype="float64", **kw)
    cdd = cls(dict(bank), dtype="float32", precision=precision, **kw)
    rng = np.random.RandomState(79)
    signal = rng.randn(4000).astype(np.float32)
    want = c64.compute_full(signal.astype(np.float64))
    got = cdd.compute_full(signal).astype(np.float64)
    assert got.shape == want.shape
    # non-log features scale with the signal; bound relative to the peak
    tol = 1e-5 * max(1.0, np.abs(want).max())
    assert np.abs(got - want).max() < tol, np.abs(got - want).max()


@pytest.mark.parametrize("kind,bank,kw", CASES, ids=[f"cfg{i}" for i in range(len(CASES))])
def test_random_config_matches_reference(reference_speech, kind, bank, kw):
    from pydrobert.speech import compute as ref_compute

    ref_cls = (
        ref_compute.ShortTimeFourierTransformFrameComputer
        if kind == "stft"
        else ref_compute.ShortIntegrationFrameComputer
    )
    cls = STFTFrameComputer if kind == "stft" else SIFrameComputer
    ref_kw = dict(kw)
    ref_kw.pop("fft_mode", None)
    ref_kw.pop("conv_mode", None)
    if kind == "si":
        ref_kw.pop("frame_length_ms", None)
    ours = cls(dict(bank), dtype="float64", **kw)
    ref = ref_cls(dict(bank), **ref_kw)
    rng = np.random.RandomState(78)
    signal = rng.randn(3000)
    want = ref.compute_full(signal)
    got = ours.compute_full(signal)
    assert got.shape == want.shape, (got.shape, want.shape)
    assert np.allclose(got, want, atol=1e-8), np.abs(got - want).max()


@pytest.mark.parametrize(
    "kind,bank,kw", CASES, ids=[f"cfg{i}" for i in range(len(CASES))]
)
def test_random_config_device_streaming_matches_batch(kind, bank, kw):
    """The jittable streaming tier (StreamingSTFT/SI transform) must match
    compute_full across the random config space and random chunk sizes —
    the host-tier sweep above does not exercise the device tier, which
    has its own emit/FFT sizing logic (a real frame-misalignment bug hid
    there for small-support banks)."""
    from speech_tpu.streaming import StreamingSI, StreamingSTFT

    cls = STFTFrameComputer if kind == "stft" else SIFrameComputer
    computer = cls(dict(bank), dtype="float64", **kw)
    rng = np.random.RandomState(4000 + sum(map(ord, str(sorted(kw.items())))))
    chunk = int(rng.choice([160, 640, 800, 1024]))
    stream = (
        StreamingSTFT(computer, chunk)
        if kind == "stft"
        else StreamingSI(computer, chunk)
    )
    signal = rng.randn(int(rng.randint(2000, 6000)))
    want = computer.compute_full(signal)
    got = stream.transform(signal)
    assert got.shape == want.shape, (got.shape, want.shape)
    if kind == "stft" and kw["frame_style"] == "causal":
        # reference-faithful finalize quirk (see the host-tier sweep)
        want = want[: got.shape[0] - 2]
        got = got[: want.shape[0]]
    assert np.allclose(got, want, atol=1e-8), np.abs(got - want).max()


@pytest.mark.parametrize(
    "kind,bank,kw", CASES, ids=[f"cfg{i}" for i in range(len(CASES))]
)
def test_random_config_ragged_batch_matches_compute_full(kind, bank, kw):
    """compute_batch rows must equal per-signal compute_full for ragged
    lengths under every random config.  STFT padding values are garbage
    on purpose (the contract masks them); SI padding must be zero."""
    cls = STFTFrameComputer if kind == "stft" else SIFrameComputer
    computer = cls(dict(bank), dtype="float64", **kw)
    rng = np.random.RandomState(6000 + len(str(kw)))
    lengths = [int(rng.randint(1500, 5000)) for _ in range(3)]
    max_len = max(lengths)
    sigs = np.zeros((3, max_len))
    if kind == "stft":
        sigs[:] = rng.randn(3, max_len) * 100  # garbage past each length
    for i, n in enumerate(lengths):
        sigs[i, :n] = rng.randn(n)
    feats, counts = computer.compute_batch(sigs, np.asarray(lengths))
    feats, counts = np.asarray(feats), np.asarray(counts)
    for i, n in enumerate(lengths):
        want = computer.compute_full(sigs[i, :n])
        assert counts[i] == want.shape[0], (counts[i], want.shape)
        got = feats[i, : counts[i]]
        assert np.allclose(got, want, atol=1e-8), np.abs(got - want).max()


@pytest.mark.parametrize(
    "kind,bank,kw",
    [c for c in CASES if c[0] == "stft"],
    ids=[f"cfg{i}" for i, c in enumerate(CASES) if c[0] == "stft"],
)
def test_random_config_pallas_double_matches_xla(kind, bank, kw):
    """The fused Pallas exact kernel (interpret mode on CPU) agrees with
    the XLA digit path across random STFT configs — exercising rem
    pieces, every frame length/shift combination, and the fallbacks."""
    kw = dict(kw)
    kw.pop("fft_mode", None)
    xla = STFTFrameComputer(
        dict(bank), dtype="float32", precision="double", **kw
    )
    pal = STFTFrameComputer(
        dict(bank), dtype="float32", precision="double",
        fft_mode="pallas", **kw
    )
    rng = np.random.RandomState(83)
    sigs = np.stack([rng.randn(4000), rng.randn(4000) * 0.2]).astype(
        np.float32
    )
    lens = np.full((2,), 4000, np.int32)
    fx, cx = xla.compute_batch(sigs, lens)
    fp, cp = pal.compute_batch(sigs, lens)
    assert np.array_equal(np.asarray(cx), np.asarray(cp))
    tol = 2e-6 * max(1.0, float(np.abs(np.asarray(fx)).max()))
    assert np.allclose(np.asarray(fp), np.asarray(fx), atol=tol), np.abs(
        np.asarray(fp) - np.asarray(fx)
    ).max()


@pytest.mark.parametrize(
    "kind,bank,kw",
    [c for i, c in enumerate(CASES) if i % 3 == 0],
    ids=[f"cfg{i}" for i in range(len(CASES)) if i % 3 == 0],
)
def test_random_config_halo_sharded_matches_compute_full(kind, bank, kw):
    """The sequence-parallel halo paths equal single-device compute_full
    under random configs on the 8-device virtual mesh (the halo widths
    are config-dependent — exactly where edge bugs hide)."""
    from speech_tpu import parallel as par

    cls = STFTFrameComputer if kind == "stft" else SIFrameComputer
    computer = cls(dict(bank), dtype="float64", **kw)
    mesh = par.make_mesh(("t",))
    n = mesh.shape["t"]
    shift = computer.frame_shift
    if kind == "stft":
        per = (-(-computer.frame_length // shift) + 2) * shift
    else:
        halo = computer.max_support - 1 + 2 * shift
        per = (-(-halo // shift) + 2) * shift
    sig_len = n * per
    rng = np.random.RandomState(97)
    signal = rng.randn(sig_len)
    want = computer.compute_full(signal)
    if kind == "stft":
        got = np.asarray(
            par.sharded_stft_feats(computer, signal, mesh, "t")
        )
        assert got.shape == want.shape
        assert np.allclose(got, want, atol=1e-8), np.abs(got - want).max()
    else:
        got = np.asarray(
            par.sharded_si_feats(computer, signal, mesh, "t")
        )
        assert got.shape[0] >= want.shape[0]  # undershoot quirk tail
        assert np.allclose(
            got[: want.shape[0]], want, atol=1e-8
        ), np.abs(got[: want.shape[0]] - want).max()


@pytest.mark.parametrize(
    "kind,bank,kw",
    [c for i, c in enumerate(CASES) if i % 2 == 0],
    ids=[f"cfg{i}" for i in range(len(CASES)) if i % 2 == 0],
)
def test_random_config_torch_layer_matches_host(kind, bank, kw):
    """The PyTorch compat modules reproduce the host computers across the
    random config space (the reference's own accelerator-parity template,
    extended to every configuration axis)."""
    torch = pytest.importorskip("torch")
    from speech_tpu.torch import (
        PyTorchShortIntegrationFrameComputer,
        PyTorchShortTimeFourierTransformFrameComputer,
    )

    cls = STFTFrameComputer if kind == "stft" else SIFrameComputer
    computer = cls(dict(bank), dtype="float64", **kw)
    if kind == "stft":
        mod = PyTorchShortTimeFourierTransformFrameComputer.from_stft_frame_computer(
            computer
        )
    else:
        mod = PyTorchShortIntegrationFrameComputer.from_si_frame_computer(
            computer
        )
    rng = np.random.RandomState(101)
    signal = rng.randn(int(rng.randint(2000, 5000)))
    want = computer.compute_full(signal)
    with torch.no_grad():
        got = mod(torch.as_tensor(signal, dtype=torch.float32)).numpy()
    assert got.shape == want.shape, (got.shape, want.shape)
    assert np.allclose(got, want, atol=1e-4), np.abs(got - want).max()
