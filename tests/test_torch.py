"""Torch compat layer vs the host computers (reference test pattern:
tests/test_torch.py — numpy/torch parity at atol 1e-5, under
none/``torch.jit.script``/``torch.jit.trace``)."""

import warnings

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from speech_tpu.compute import SIFrameComputer, STFTFrameComputer  # noqa: E402
from speech_tpu import post as host_post  # noqa: E402
from speech_tpu import pre as host_pre  # noqa: E402
import speech_tpu.torch as stpu_torch  # noqa: E402


BANK = {"name": "fbank", "num_filts": 13, "sampling_rate": 8000}
JIT_MODES = ["none", "script", "trace"]


def _jitted(mod, mode, example):
    """Apply a torch.jit transform (reference parity matrix:
    tests/test_torch.py:25-133).  The functional computers are decorated
    ``script_if_tracing``, so traces generalize across signal lengths —
    asserted by tracing with a different-length example than the test
    signal."""
    if mode == "none":
        return mod
    with warnings.catch_warnings():
        # this torch version deprecates script/trace themselves; tracer
        # warnings (shape specialization) must still be errors —
        # script_if_tracing is what keeps them from firing
        warnings.filterwarnings("ignore", category=DeprecationWarning)
        if mode == "script":
            return torch.jit.script(mod)
        return torch.jit.trace(mod, (example,))


@pytest.fixture(scope="module")
def signal():
    return np.random.RandomState(30).randn(4000)


@pytest.mark.parametrize("jit_mode", JIT_MODES)
@pytest.mark.parametrize("include_energy", [False, True], ids=["", "energy"])
@pytest.mark.parametrize("use_power", [False, True], ids=["mag", "power"])
@pytest.mark.parametrize("style", ["centered", "causal"])
def test_stft_torch_matches_host(
    signal, include_energy, use_power, style, jit_mode
):
    computer = STFTFrameComputer(
        dict(BANK),
        frame_length_ms=25,
        frame_shift_ms=10,
        frame_style=style,
        include_energy=include_energy,
        use_power=use_power,
        dtype="float64",
    )
    want = computer.compute_full(signal)
    mod = stpu_torch.PyTorchSTFTFrameComputer.from_stft_frame_computer(computer)
    mod = _jitted(mod, jit_mode, torch.randn(2500))
    got = mod(torch.as_tensor(signal, dtype=torch.float32)).detach().numpy()
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=1e-4), np.abs(got - want).max()


@pytest.mark.parametrize("jit_mode", JIT_MODES)
@pytest.mark.parametrize("style", ["centered", "causal"])
def test_si_torch_matches_host(signal, style, jit_mode):
    computer = SIFrameComputer(
        dict(BANK), frame_style=style, include_energy=True, dtype="float64"
    )
    want = computer.compute_full(signal)
    mod = stpu_torch.PyTorchSIFrameComputer.from_si_frame_computer(computer)
    mod = _jitted(mod, jit_mode, torch.randn(2500))
    got = mod(torch.as_tensor(signal, dtype=torch.float32)).detach().numpy()
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=1e-4), np.abs(got - want).max()


def test_stft_torch_on_accelerator(signal):
    """Device leg (reference pattern: tests/test_torch.py runs its matrix
    on CUDA when available and skips gracefully otherwise)."""
    if torch.cuda.is_available():
        device = torch.device("cuda")
    elif getattr(torch.backends, "mps", None) and torch.backends.mps.is_available():
        device = torch.device("mps")
    else:
        pytest.skip("no torch accelerator available")
    computer = STFTFrameComputer(
        dict(BANK), frame_length_ms=25, frame_shift_ms=10, dtype="float64"
    )
    want = computer.compute_full(signal)
    mod = stpu_torch.PyTorchSTFTFrameComputer.from_stft_frame_computer(
        computer
    ).to(device)
    got = (
        mod(torch.as_tensor(signal, dtype=torch.float32, device=device))
        .detach()
        .cpu()
        .numpy()
    )
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=1e-4)


@pytest.mark.parametrize("jit_mode", ["script", "trace"])
def test_pre_modules_jit(signal, jit_mode):
    sig = torch.as_tensor(signal, dtype=torch.float32)
    pre = stpu_torch.PyTorchPreemphasize(0.95)
    assert torch.allclose(_jitted(pre, jit_mode, torch.randn(100))(sig), pre(sig))
    dit = stpu_torch.PyTorchDither(1.0)
    dit.eval()  # deterministic (dither only fires in training mode)
    assert torch.equal(_jitted(dit, jit_mode, torch.randn(100))(sig), sig)


def test_stft_torch_gradients(signal):
    computer = STFTFrameComputer(
        dict(BANK), frame_length_ms=25, frame_shift_ms=10, dtype="float64"
    )
    mod = stpu_torch.PyTorchSTFTFrameComputer.from_stft_frame_computer(computer)
    out = mod(torch.as_tensor(signal[:1000], dtype=torch.float32))
    assert out.shape[0] > 0
    out.mean().backward()
    assert mod.weights.grad is not None
    assert torch.isfinite(mod.weights.grad).all()
    assert mod.window.grad is not None
    assert torch.isfinite(mod.window.grad).all()


def test_preemphasize_torch_matches_host(signal):
    host = host_pre.Preemphasize(coeff=0.95)
    want = host.apply(signal)
    mod = stpu_torch.PyTorchPreemphasize.from_preemphasize(host)
    got = mod(torch.as_tensor(signal)).numpy()
    assert np.allclose(got, want)


def test_dither_torch_stats():
    host = host_pre.Dither(coeff=0.5)
    mod = stpu_torch.PyTorchDither.from_dither(host)
    sig = torch.zeros(100000)
    torch.manual_seed(0)
    out = mod(sig)
    assert abs(out.std().item() - 0.5) < 0.01
    mod.eval()
    assert torch.equal(mod(sig), sig)


def test_postprocessor_wrapper(signal):
    feats = np.random.RandomState(31).randn(40, 13)
    host = host_post.Deltas(2)
    want = host.apply(feats.astype(np.float64), axis=0)
    mod = stpu_torch.PyTorchPostProcessorWrapper.from_postprocessor(host, axis=0)
    got = mod(torch.as_tensor(feats)).numpy()
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=1e-5)


def test_stft_torch_empty():
    computer = STFTFrameComputer(dict(BANK), frame_shift_ms=10, dtype="float64")
    mod = stpu_torch.PyTorchSTFTFrameComputer.from_stft_frame_computer(computer)
    out = mod(torch.zeros(3))
    assert out.shape == (0, computer.num_coeffs)


def test_check_helpers():
    """Public validators on the torch surface (reference: torch.py:61-70)."""
    stpu_torch.check_in("mode", "a", ("a", "b"))
    with pytest.raises(ValueError, match="mode"):
        stpu_torch.check_in("mode", "c", ("a", "b"))
    stpu_torch.check_positive("n", 3)
    stpu_torch.check_positive("n", 0, nonnegative=True)
    with pytest.raises(ValueError, match="positive"):
        stpu_torch.check_positive("n", 0)
    with pytest.raises(ValueError, match="non-negative"):
        stpu_torch.check_positive("n", -1, nonnegative=True)
