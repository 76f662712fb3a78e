"""Jittable streaming vs the host streaming / batch paths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_tpu.compute import STFTFrameComputer
from speech_tpu.streaming import StreamingSTFT

BANK = {"name": "fbank", "num_filts": 10, "sampling_rate": 8000}


def _computer(**kw):
    kw.setdefault("frame_length_ms", 25)
    kw.setdefault("frame_shift_ms", 10)
    kw.setdefault("dtype", "float64")
    return STFTFrameComputer(dict(BANK), **kw)


@pytest.mark.parametrize("style", ["centered", "causal"])
@pytest.mark.parametrize("chunk_size", [400, 1024])
def test_streaming_matches_host_streaming(style, chunk_size):
    """The jittable stream reproduces the host streaming path exactly.

    (Host streaming itself is reference-parity; in causal mode the
    reference's own finalize diverges slightly from compute_full when the
    leftover tail is shorter than the final reflection depth, so the host
    chunked path — not compute_full — is the ground truth here.)
    """
    computer = _computer(frame_style=style)
    host = _computer(frame_style=style)
    stream = StreamingSTFT(computer, chunk_size)
    rng = np.random.RandomState(80)
    signal = rng.randn(chunk_size * 7)
    outs = []
    for i in range(7):
        outs.append(host.compute_chunk(signal[i * chunk_size : (i + 1) * chunk_size]))
    outs.append(host.finalize())
    want = np.concatenate(outs)
    got = stream.transform(signal)
    assert got.shape == want.shape, (got.shape, want.shape)
    assert np.allclose(got, want, atol=1e-8), np.abs(got - want).max()
    if style == "centered":
        full = computer.compute_full(signal)
        assert np.allclose(got, full, atol=1e-8)


def test_streaming_tiny_chunks():
    computer = _computer()
    # chunk barely larger than the reflection prefix
    cs = computer._pad_left + 3
    stream = StreamingSTFT(computer, cs)
    rng = np.random.RandomState(81)
    signal = rng.randn(cs * 30)
    want = computer.compute_full(signal)
    got = stream.transform(signal)
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=1e-8)


def test_streaming_state_is_a_pytree():
    computer = _computer()
    stream = StreamingSTFT(computer, 800)
    state = stream.init_state()
    leaves = jax.tree_util.tree_leaves(state)
    assert len(leaves) == 5


def test_streaming_vmapped_streams():
    computer = _computer()
    stream = StreamingSTFT(computer, 800)
    rng = np.random.RandomState(82)
    signals = rng.randn(3, 3200)

    states = jax.vmap(lambda _: stream.init_state())(jnp.arange(3))
    outs = [[] for _ in range(3)]
    for j in range(4):
        states, feats, nfs = jax.vmap(
            stream._process, in_axes=(0, 0, None)
        )(states, jnp.asarray(signals[:, j * 800 : (j + 1) * 800]), 800)
        for i in range(3):
            outs[i].append(np.asarray(feats[i])[: int(nfs[i])])
    feats, nfs = jax.vmap(stream._finalize)(states)
    for i in range(3):
        outs[i].append(np.asarray(feats[i])[: int(nfs[i])])
        got = np.concatenate(outs[i])
        want = computer.compute_full(signals[i])
        assert got.shape == want.shape
        assert np.allclose(got, want, atol=1e-8)


def test_streaming_validates_chunk_size():
    computer = _computer()
    stream = StreamingSTFT(computer, 800)
    with pytest.raises(ValueError):
        stream.process(stream.init_state(), jnp.zeros(799))
    with pytest.raises(ValueError):
        StreamingSTFT(computer, 0)


def test_streaming_kaldi_shift():
    computer = _computer(frame_style="centered", kaldi_shift=True)
    host = _computer(frame_style="centered", kaldi_shift=True)
    stream = StreamingSTFT(computer, 800)
    rng = np.random.RandomState(83)
    signal = rng.randn(4000)
    outs = []
    for i in range(5):
        outs.append(host.compute_chunk(signal[i * 800 : (i + 1) * 800]))
    outs.append(host.finalize())
    want = np.concatenate(outs)
    got = stream.transform(signal)
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=1e-8)


def test_streaming_finalize_before_emitting():
    """Finalize with buffered-but-unemitted samples (is_first still set)."""
    computer = _computer()
    host = _computer()
    cs = max(computer._pad_left, computer.frame_shift) + 5
    stream = StreamingSTFT(computer, cs)
    rng = np.random.RandomState(84)
    signal = rng.randn(cs)  # one tiny chunk; likely no frames emitted yet
    state, feats, nf = stream.process(stream.init_state(), jnp.asarray(signal))
    hf = [host.compute_chunk(signal)]
    assert int(nf) == hf[0].shape[0]
    out = [np.asarray(feats)[: int(nf)]] + hf[:0]
    ffeats, fnf = stream.finalize(state)
    hf.append(host.finalize())
    want = np.concatenate(hf)
    got = np.concatenate(out + [np.asarray(ffeats)[: int(fnf)]])
    assert got.shape == want.shape, (got.shape, want.shape)
    assert np.allclose(got, want, atol=1e-8), np.abs(got - want).max()


def test_streaming_finalize_empty_stream():
    computer = _computer()
    stream = StreamingSTFT(computer, 800)
    feats, nf = stream.finalize(stream.init_state())
    assert int(nf) == 0


from speech_tpu.compute import SIFrameComputer  # noqa: E402
from speech_tpu.streaming import StreamingSI  # noqa: E402


def _si_computer(**kw):
    kw.setdefault("dtype", "float64")
    return SIFrameComputer(dict(BANK), **kw)


@pytest.mark.parametrize("style", ["centered", "causal"])
@pytest.mark.parametrize("energy", [False, True], ids=["", "energy"])
def test_si_streaming_matches_host(style, energy):
    computer = _si_computer(frame_style=style, include_energy=energy)
    host = _si_computer(frame_style=style, include_energy=energy)
    cs = 1024
    stream = StreamingSI(computer, cs)
    rng = np.random.RandomState(85)
    signal = rng.randn(cs * 6)
    outs = []
    for i in range(6):
        outs.append(host.compute_chunk(signal[i * cs : (i + 1) * cs]))
    outs.append(host.finalize())
    want = np.concatenate(outs)
    got = stream.transform(signal)
    assert got.shape == want.shape, (got.shape, want.shape)
    assert np.allclose(got, want, atol=1e-8), np.abs(got - want).max()


def test_si_streaming_matches_compute_full():
    computer = _si_computer()
    stream = StreamingSI(computer, 800)
    rng = np.random.RandomState(86)
    signal = rng.randn(800 * 8)
    want = computer.compute_full(signal)
    got = stream.transform(signal)
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=1e-8), np.abs(got - want).max()


def test_si_streaming_complex_bank():
    bank = {
        "name": "gammatone",
        "scaling_function": "mel",
        "num_filts": 5,
        "sampling_rate": 8000,
    }
    computer = SIFrameComputer(dict(bank), dtype="float64")
    stream = StreamingSI(computer, 1600)
    rng = np.random.RandomState(87)
    signal = rng.randn(1600 * 4)
    want = computer.compute_full(signal)
    got = stream.transform(signal)
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=1e-8), np.abs(got - want).max()


def test_si_streaming_vmapped():
    computer = _si_computer()
    stream = StreamingSI(computer, 800)
    rng = np.random.RandomState(88)
    signals = rng.randn(3, 2400)
    states = jax.vmap(lambda _: stream.init_state())(jnp.arange(3))
    outs = [[] for _ in range(3)]
    for j in range(3):
        states, feats, nfs = jax.vmap(
            stream._process, in_axes=(0, 0, None)
        )(states, jnp.asarray(signals[:, j * 800 : (j + 1) * 800]), 800)
        for i in range(3):
            outs[i].append(np.asarray(feats[i])[: int(nfs[i])])
    feats, nfs = jax.vmap(stream._finalize)(states)
    for i in range(3):
        outs[i].append(np.asarray(feats[i])[: int(nfs[i])])
        got = np.concatenate(outs[i])
        want = computer.compute_full(signals[i])
        assert got.shape == want.shape
        assert np.allclose(got, want, atol=1e-8)


@pytest.mark.parametrize("length", [0, 1, 150, 799, 801, 4000, 4567])
def test_streaming_any_length_matches_full(length):
    """Masked final chunk: any signal length streams under jit with exact
    compute_full parity (no divisibility requirement)."""
    computer = _computer()
    stream = StreamingSTFT(computer, 800)
    rng = np.random.RandomState(90 + length)
    signal = rng.randn(length)
    got = stream.transform(signal)
    want = computer.compute_full(signal)
    assert got.shape == want.shape, (got.shape, want.shape)
    if length:
        assert np.allclose(got, want, atol=1e-8)


def test_streaming_tiny_chunks_smaller_than_pad_left():
    """chunk_size below the initial reflection length now works: the head
    accumulates across chunks before the reflection is applied."""
    computer = _computer()
    stream = StreamingSTFT(computer, 37)
    assert stream.pad_left > 37
    rng = np.random.RandomState(91)
    signal = rng.randn(1000)
    got = stream.transform(signal)
    want = computer.compute_full(signal)
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=1e-8)


def test_streaming_scan_driver():
    """Whole-utterance lax.scan driver (single jitted program)."""
    computer = _computer()
    stream = StreamingSTFT(computer, 512)
    rng = np.random.RandomState(92)
    signal = rng.randn(3210)
    feats, counts, fin_feats, fin_n = jax.jit(stream.scan)(
        jnp.asarray(signal), 3210
    )
    outs = [np.asarray(feats[i])[: int(counts[i])] for i in range(feats.shape[0])]
    outs.append(np.asarray(fin_feats)[: int(fin_n)])
    got = np.concatenate(outs)
    want = computer.compute_full(signal)
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=1e-8)


def test_streaming_masked_chunks_arbitrary_split():
    """Feeding valid_len-masked chunks mid-stream equals compute_full (the
    reference accepts arbitrary chunkings; reference: compute.py:462-540)."""
    computer = _computer()
    stream = StreamingSTFT(computer, 400)
    rng = np.random.RandomState(93)
    signal = rng.randn(2000)
    splits = [250, 400, 17, 0, 333, 400, 400, 200]
    assert sum(splits) == 2000
    state = stream.init_state()
    outs = []
    off = 0
    for v in splits:
        chunk = np.zeros(400)
        chunk[:v] = signal[off : off + v]
        off += v
        state, feats, nf = stream.process(state, jnp.asarray(chunk), v)
        outs.append(np.asarray(feats)[: int(nf)])
    feats, nf = stream.finalize(state)
    outs.append(np.asarray(feats)[: int(nf)])
    got = np.concatenate(outs)
    want = computer.compute_full(signal)
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=1e-8)


@pytest.mark.parametrize("length", [0, 799, 2401, 3000])
def test_si_streaming_any_length(length):
    computer = _si_computer()
    stream = StreamingSI(computer, 800)
    rng = np.random.RandomState(94 + length)
    signal = rng.randn(length)
    got = stream.transform(signal)
    want = computer.compute_full(signal)
    assert got.shape == want.shape
    if length:
        assert np.allclose(got, want, atol=1e-8)


@pytest.mark.parametrize("kind", ["stft", "si"])
def test_process_many_matches_single_steps(kind):
    """k chunks through one process_many dispatch == k process calls."""
    if kind == "stft":
        computer = _computer()
        stream = StreamingSTFT(computer, 800)
    else:
        computer = _si_computer()
        stream = StreamingSI(computer, 800)
    rng = np.random.RandomState(97)
    sig = rng.randn(800 * 5 + 321)
    k = 6
    pad = np.zeros(k * 800)
    pad[: len(sig)] = sig
    chunks = pad.reshape(k, 800)
    valids = np.clip(len(sig) - np.arange(k) * 800, 0, 800).astype(np.int32)
    # single steps
    state = stream.init_state()
    outs = []
    for j in range(k):
        state, feats, nf = stream.process(state, chunks[j], int(valids[j]))
        outs.append(np.asarray(feats)[: int(nf)])
    ff, fn_ = stream.finalize(state)
    outs.append(np.asarray(ff)[: int(fn_)])
    want = np.concatenate(outs)
    # one scan dispatch
    state = stream.init_state()
    state, feats, nfs = stream.process_many(
        state, jnp.asarray(chunks), jnp.asarray(valids)
    )
    outs = [np.asarray(feats[j, : int(nfs[j])]) for j in range(k)]
    ff, fn_ = stream.finalize(state)
    outs.append(np.asarray(ff)[: int(fn_)])
    got = np.concatenate(outs)
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=1e-12), np.abs(got - want).max()
    with pytest.raises(ValueError):
        stream.process_many(state, jnp.zeros((2, 999)), jnp.zeros((2,), jnp.int32))


@pytest.mark.parametrize("kind", ["stft", "si"])
def test_process_wide_matches_chunked(kind):
    """One wide masked call == the same samples fed chunk by chunk."""
    if kind == "stft":
        computer = _computer()
        stream = StreamingSTFT(computer, 800)
    else:
        computer = _si_computer()
        stream = StreamingSI(computer, 800)
    rng = np.random.RandomState(98)
    sig = rng.randn(800 * 4 + 137)
    # chunked
    state = stream.init_state()
    outs = []
    for i in range(0, 800 * 5, 800):
        chunk = np.zeros(800)
        seg = sig[i : i + 800]
        chunk[: len(seg)] = seg
        state, feats, nf = stream.process(state, chunk, len(seg))
        outs.append(np.asarray(feats)[: int(nf)])
    ff, fn_ = stream.finalize(state)
    outs.append(np.asarray(ff)[: int(fn_)])
    want = np.concatenate(outs)
    # one wide call (padded to a 4096-tier width)
    state = stream.init_state()
    wide = np.zeros(800 * 8)
    wide[: len(sig)] = sig
    state, feats, nf = stream.process_wide(state, jnp.asarray(wide), len(sig))
    outs = [np.asarray(feats)[: int(nf)]]
    ff, fn_ = stream.finalize(state)
    outs.append(np.asarray(ff)[: int(fn_)])
    got = np.concatenate(outs)
    assert got.shape == want.shape, (got.shape, want.shape)
    assert np.allclose(got, want, atol=1e-10), np.abs(got - want).max()


@pytest.mark.parametrize("conv_mode", ["fft", "matmul"])
def test_si_streaming_conv_backends_match_full(conv_mode):
    """The stream emit follows the computer's conv backend; both agree
    with compute_full."""
    computer = _si_computer(conv_mode=conv_mode)
    stream = StreamingSI(computer, 800)
    assert stream.conv_mode == conv_mode
    rng = np.random.RandomState(95)
    signal = rng.randn(2500)
    got = stream.transform(signal)
    want = computer.compute_full(signal)
    assert got.shape == want.shape
    assert np.allclose(got, want, atol=1e-8), np.abs(got - want).max()


@pytest.mark.parametrize("precision", ["double", "accurate"])
@pytest.mark.parametrize("bank_name", ["fbank", "gammatone"])
def test_si_streaming_double_tier_exact(bank_name, precision):
    """The digit tiers stream through the digit conv: stream == batch to
    <=1e-6 on hostile (loud-transient/quiet-tail) signals — the batch
    tier's accuracy contract extends to streaming (round-2 gap:
    StreamingSI silently fell back to plain-f32 FFT conv).  'accurate'
    is the base-256 chunked-contraction variant (ops/stft.py _SAK_*)."""
    bank = {"name": bank_name, "num_filts": 6, "sampling_rate": 8000}
    if bank_name == "gammatone":
        bank["scaling_function"] = "mel"
    computer = SIFrameComputer(
        dict(bank), dtype="float32", precision=precision, include_energy=True
    )
    stream = StreamingSI(computer, 640)
    rng = np.random.RandomState(96)
    for trial in range(3):
        n = int(rng.randint(1500, 4000))
        signal = rng.randn(n) * (1 + 100 * (rng.rand(n) < 0.01))
        signal[-n // 4 :] *= 1e-3  # quiet tail
        got = stream.transform(signal.astype(np.float32))
        want = computer.compute_full(signal.astype(np.float32))
        assert got.shape == want.shape
        assert np.allclose(got, want, atol=1e-6), (
            trial,
            np.abs(got - want).max(),
        )


def test_si_streaming_small_support_chunk_sweep():
    """Regression: when the bank's max support is small relative to the
    chunk, the emit FFT must still cover the extraction slice — the old
    sizing covered only the convolution, and the slice start clamped,
    misaligning every frame of some chunks (54-tap bank, 640 chunks)."""
    from speech_tpu.compute import ShortIntegrationFrameComputer

    computer = ShortIntegrationFrameComputer(
        {"name": "gammatone", "scaling_function": "mel", "num_filts": 6,
         "sampling_rate": 8000},
        frame_shift_ms=10, dtype="float64",
    )
    rng = np.random.RandomState(53)
    sig = rng.randn(3000)
    want = computer.compute_full(sig)
    from speech_tpu.streaming import StreamingSI

    for cs in (256, 640, 1024):
        stream = StreamingSI(computer, cs)
        state = stream.init_state()
        outs = []
        for i in range(-(-len(sig) // cs)):
            chunk = np.zeros(cs)
            n = min(cs, len(sig) - i * cs)
            chunk[:n] = sig[i * cs : i * cs + n]
            state, feats, nf = stream.process(state, chunk, n)
            outs.append(np.asarray(feats)[: int(nf)])
        feats, nf = stream.finalize(state)
        outs.append(np.asarray(feats)[: int(nf)])
        got = np.concatenate(outs)
        assert got.shape == want.shape, (cs, got.shape, want.shape)
        assert np.allclose(got, want, atol=1e-10), (
            cs, np.abs(got - want).max(),
        )


@pytest.mark.parametrize("kind", ["stft", "si"])
def test_streaming_garbage_in_masked_tails(kind):
    """Valid rows must be bit-identical whether masked chunk tails hold
    zeros or hostile garbage (NaN/inf/huge).  The roll-free chunk programs
    leave tail garbage in place and exclude it purely by index math —
    this pins that invariant against off-by-one regressions in the
    valid-region bounds (no other test feeds non-zero masked tails)."""
    if kind == "stft":
        computer = _computer()
        stream = StreamingSTFT(computer, 400)
    else:
        computer = _si_computer()
        stream = StreamingSI(computer, 400)
    rng = np.random.RandomState(95)
    signal = rng.randn(2000)
    splits = [250, 400, 17, 0, 333, 400, 400, 200]

    def run(tail_fill):
        state = stream.init_state()
        outs = []
        off = 0
        for v in splits:
            chunk = np.full(400, tail_fill)
            if tail_fill == tail_fill and np.isfinite(tail_fill):
                # vary finite garbage per chunk to catch value reuse
                chunk *= 1 + off
            chunk[:v] = signal[off : off + v]
            off += v
            state, feats, nf = stream.process(state, jnp.asarray(chunk), v)
            outs.append(np.asarray(feats)[: int(nf)])
        feats, nf = stream.finalize(state)
        outs.append(np.asarray(feats)[: int(nf)])
        return np.concatenate(outs)

    want = run(0.0)
    assert want.shape[0] == computer.compute_full(signal).shape[0]
    for fill in (np.nan, np.inf, 1e30):
        got = run(fill)
        assert got.shape == want.shape
        assert np.array_equal(got, want), (
            kind, fill, np.nanmax(np.abs(got - want)),
        )
