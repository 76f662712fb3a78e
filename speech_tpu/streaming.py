"""Jittable streaming: explicit-carry chunked feature extraction.

The host streaming API (``compute_chunk``/``finalize``) assembles frames in
numpy and is convenient for scripting, but its state lives in Python.  This
module is the TPU-serving formulation promised by the design plan: state is
a pytree, chunks have a static size, and ``process`` / ``finalize`` are
pure jitted functions returning padded frame blocks plus valid counts — so
streaming composes with ``jit``, ``vmap`` (many concurrent streams), and
``lax.scan`` (whole utterances on device).

Semantics match the reference streaming exactly (reference:
compute.py:462-572): the first centered frame's left context is reflected
("symmetric") from the stream head, after which framing is a causal
sliding window; ``finalize`` right-pads symmetrically and flushes.

Constraints (checked at construction): ``chunk_size >= pad_left`` (the
first chunk must cover the initial reflection) and
``frame_shift <= frame_length`` (no inter-frame skip).
"""

from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .ops.xmath import xlog

from . import config as _config
from .compute import SIFrameComputer, STFTFrameComputer
from .ops import stft as _stft
from .ops.framing import reflect_index

__all__ = ["StreamState", "StreamingSTFT", "SIStreamState", "StreamingSI"]


class StreamState(NamedTuple):
    """Carry between chunks: a tail ring of the virtual stream."""

    carry: jnp.ndarray  # (carry_len,) most recent virtual-stream samples
    n_carry: jnp.ndarray  # int32, valid samples at the END of `carry`
    is_first: jnp.ndarray  # bool, no frame emitted yet


class StreamingSTFT:
    """Explicit-carry streaming wrapper around an STFT computer.

    Example::

        stream = StreamingSTFT(computer, chunk_size=1600)
        state = stream.init_state()
        for chunk in chunks:                      # (1600,) each
            state, feats, n = stream.process(state, chunk)
            use(feats[:n])
        feats, n = stream.finalize(state)
        use(feats[:n])

    ``process``/``finalize`` are jitted; wrap with ``jax.vmap`` for many
    concurrent streams.
    """

    def __init__(self, computer: STFTFrameComputer, chunk_size: int):
        if not isinstance(computer, STFTFrameComputer):
            raise ValueError("StreamingSTFT requires an STFT computer")
        self.computer = computer
        self.chunk_size = int(chunk_size)
        self.frame_length = computer.frame_length
        self.frame_shift = computer.frame_shift
        self.pad_left = computer._pad_left if computer.frame_style == "centered" else 0
        if self.frame_shift > self.frame_length:
            raise ValueError(
                "jittable streaming requires frame_shift <= frame_length"
            )
        if self.chunk_size < max(self.pad_left, 1):
            raise ValueError(
                f"chunk_size must be at least pad_left ({self.pad_left})"
            )
        # carry keeps up to frame_length - 1 unconsumed stream samples
        self.carry_len = self.frame_length - 1
        total = self.carry_len + self.pad_left + self.chunk_size
        self.max_frames = max(0, (total - self.frame_length) // self.frame_shift + 1)
        self.finalize_max_frames = (
            self.carry_len + self.pad_left
        ) // self.frame_shift + 1
        self._dtype = computer._dtype
        computer.params  # materialize outside any trace (lazily cached)
        self._process = jax.jit(self._process_impl)
        self._finalize = jax.jit(self._finalize_impl)

    def init_state(self) -> StreamState:
        return StreamState(
            carry=jnp.zeros((self.carry_len,), self._dtype),
            n_carry=jnp.zeros((), jnp.int32),
            is_first=jnp.ones((), jnp.bool_),
        )

    # ------------------------------------------------------------------

    def _feats(self, frames):
        c = self.computer
        return _stft.stft_feats_from_frames(frames, c.params, **c._static_spec)

    def _emit(self, stream, total):
        """Frames + count from a stream buffer whose last ``total`` samples
        (ending at the buffer end) are valid."""
        FL, FS = self.frame_length, self.frame_shift
        buf_len = stream.shape[0]
        nf = jnp.maximum(0, (total - FL) // FS + 1)
        # frame k starts at (buf_len - total) + k*FS
        starts = (buf_len - total) + jnp.arange(self.max_frames) * FS
        idx = jnp.clip(starts[:, None] + jnp.arange(FL)[None, :], 0, buf_len - 1)
        frames = jnp.take(stream, idx, axis=0)
        return self._feats(frames), nf

    def _process_impl(self, state: StreamState, chunk):
        chunk = jnp.asarray(chunk, self._dtype)
        FS, PL = self.frame_shift, self.pad_left
        # first chunk: prepend the symmetric reflection of the stream head
        # (reference: compute.py:497-517); later chunks carry dead space in
        # the prefix slot instead
        prefix_first = (
            jnp.flip(chunk[:PL]) if PL else jnp.zeros((0,), self._dtype)
        )
        s_first = jnp.concatenate([state.carry, prefix_first, chunk])
        s_steady = jnp.concatenate(
            [jnp.zeros((PL,), self._dtype), state.carry, chunk]
        )
        stream = jnp.where(state.is_first, s_first, s_steady)
        n_new = jnp.where(state.is_first, PL + chunk.shape[0], chunk.shape[0])
        total = state.n_carry + n_new
        feats, nf = self._emit(stream, total)
        rem = jnp.minimum(total - nf * FS, self.carry_len)
        # new carry: last carry_len samples of the stream
        carry = stream[-self.carry_len :] if self.carry_len else stream[:0]
        return (
            StreamState(
                carry=carry,
                n_carry=rem.astype(jnp.int32),
                is_first=jnp.zeros((), jnp.bool_),
            ),
            feats,
            nf,
        )

    def _finalize_impl(self, state: StreamState):
        FL, FS, PL = self.frame_length, self.frame_shift, self.pad_left
        buf_len = state.carry.shape[0]
        total = state.n_carry
        # if the stream never emitted, the initial reflection still needs
        # prepending; otherwise discount its already-consumed pad_left from
        # the global frame-count bookkeeping (host twin logic, which is
        # parity-tested against the reference finalize)
        left_add = jnp.where(state.is_first, PL, 0)
        nf = jnp.maximum(0, (total + FS // 2 - PL + left_add) // FS)
        start = buf_len - total  # first valid sample in carry
        # virtual valid region v[0:T): prefix (left_add) then valid carry
        T = total + left_add
        head = jnp.take(
            state.carry,
            jnp.clip(start + jnp.arange(PL), 0, jnp.maximum(buf_len - 1, 0)),
            axis=0,
        ) if PL else state.carry[:0]
        vbuf = jnp.concatenate([jnp.flip(head), state.carry])
        # v index r -> vbuf index
        def v2b(r):
            return jnp.where(
                r < left_add, PL - left_add + r, PL + start + (r - left_add)
            )

        pos = (
            jnp.arange(self.finalize_max_frames)[:, None] * FS
            + jnp.arange(FL)[None, :]
        )
        rel = reflect_index(pos, jnp.maximum(T, 1))
        idx = jnp.clip(v2b(rel), 0, vbuf.shape[0] - 1)
        frames = jnp.take(vbuf, idx, axis=0)
        feats = self._feats(frames)
        return feats, nf

    # public jitted entry points -----------------------------------------

    def process(self, state: StreamState, chunk) -> Tuple[StreamState, jnp.ndarray, jnp.ndarray]:
        """Consume one ``(chunk_size,)`` chunk; returns
        ``(state, feats, n_valid)`` with feats ``(max_frames, num_coeffs)``.
        """
        if chunk.shape[-1] != self.chunk_size:
            raise ValueError(
                f"chunk must have static size {self.chunk_size}; "
                f"got {chunk.shape[-1]} (zero-pad and finalize early instead)"
            )
        return self._process(state, chunk)

    def finalize(self, state: StreamState):
        """Flush remaining samples; returns ``(feats, n_valid)``."""
        return self._finalize(state)

    # convenience ---------------------------------------------------------

    def transform(self, signal: np.ndarray) -> np.ndarray:
        """Host helper: stream a whole signal through fixed-size chunks and
        return the concatenated valid frames (for testing/parity)."""
        C = self.chunk_size
        state = self.init_state()
        outs = []
        n = len(signal)
        nchunks = n // C
        for i in range(nchunks):
            state, feats, nf = self.process(state, jnp.asarray(signal[i * C : (i + 1) * C]))
            outs.append(np.asarray(feats)[: int(nf)])
        tail = signal[nchunks * C :]
        if len(tail):
            # pad the last partial chunk as if the signal ended here: feed
            # it through the host API contract by reflecting... simplest:
            # use a final process on a zero-padded chunk is NOT equivalent;
            # instead fall back to finalize semantics on the carry plus
            # tail by processing tail with the host path
            raise ValueError(
                "transform requires len(signal) divisible by chunk_size"
            )
        feats, nf = self.finalize(state)
        outs.append(np.asarray(feats)[: int(nf)])
        return np.concatenate(outs)


class SIStreamState(NamedTuple):
    """Carry between chunks for the SI stream."""

    carry: jnp.ndarray  # (carry_len,) most recent raw samples (tail-valid)
    unconsumed: jnp.ndarray  # int32, counted-but-unframed samples (can be <0
    # early in causal/skip mode: counted = seen - shift_eff)
    seen: jnp.ndarray  # int32, total raw samples seen


class StreamingSI:
    """Explicit-carry jittable streaming for the SI computer.

    Same contract as :class:`StreamingSTFT`: static chunk size, pytree
    state, ``process``/``finalize`` under jit, exact parity with the host
    ``compute_chunk``/``finalize`` path.  The carry holds the last
    ``max_support - 1 + 2*frame_shift`` raw samples — enough history for
    every convolution tap of any not-yet-emitted frame.
    """

    def __init__(self, computer: SIFrameComputer, chunk_size: int):
        if not isinstance(computer, SIFrameComputer):
            raise ValueError("StreamingSI requires an SI computer")
        self.computer = computer
        self.chunk_size = int(chunk_size)
        k = computer._kernel
        self.T = k["max_support"]
        self.shift = computer.frame_shift
        self.shift_eff = k["shift_eff"]
        self.translation = k["translation"]
        self.is_real = k["is_real"]
        self.carry_len = self.T - 1 + 2 * self.shift
        # per-chunk frames bound: unconsumed < 2*shift before the chunk
        self.max_frames = (2 * self.shift + self.chunk_size) // self.shift
        # finalize pads at most ~2*shift + shift_eff zeros
        self.fin_pad = 2 * self.shift + max(0, self.shift_eff) + self.shift
        self.fin_max = (2 * self.shift + self.fin_pad) // self.shift + 1
        self._dtype = computer._dtype
        computer.params  # materialize outside any trace
        self._process = jax.jit(self._process_impl)
        self._finalize = jax.jit(self._finalize_impl)

    def init_state(self) -> SIStreamState:
        return SIStreamState(
            carry=jnp.zeros((self.carry_len,), self._dtype),
            unconsumed=jnp.asarray(-self.shift_eff, jnp.int32),
            seen=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------

    def _emit(self, stream, u_end, nf, max_frames: int):
        """Features for up to ``max_frames`` frames ending ``u_end`` counted
        samples before the buffer end (only the first ``nf`` rows valid)."""
        c = self.computer
        params = c.params
        s, T = self.shift, self.T
        buf_len = stream.shape[0]
        ny = (max_frames + 1) * s
        # cover both the linear convolution and the extraction window
        fft_size = 1 << max(0, int(max(buf_len + T - 1, ny))).bit_length()
        X = jnp.fft.rfft(stream, n=fft_size)
        # local y[0] sits at stream position buf_len - u_end... - ny offset:
        # frame j reads y at counted positions [j*s, j*s + 2s); counted
        # position q maps to the conv output at stream index
        # (buf_len - u_end) + q  (u_end counts positions from y[0] to end)
        y0 = buf_len - u_end  # traced

        def conv_vals(f):
            H = jnp.fft.rfft(f, n=fft_size, axis=-1)
            conv = jnp.fft.irfft(X[None, :] * H, n=fft_size, axis=-1)
            # extract ny values starting at y0 (clamped; OOB masked below)
            start = jnp.clip(y0, 0, fft_size - ny).astype(jnp.int32)
            vals = jax.lax.dynamic_slice(
                conv, (jnp.zeros((), jnp.int32), start), (f.shape[0], ny)
            )
            # positions beyond the linear-conv validity are zero already
            # (zero-padded fft buffer); positions before stream start only
            # occur when y0 < 0, which cannot happen (carry covers T-1+2s)
            return vals

        if self.is_real:
            y = conv_vals(params["firs_re"])
            y_mod = y * y if c._power else jnp.abs(y)
        else:
            yr = conv_vals(params["firs_re"])
            yi = conv_vals(params["firs_im"])
            y_mod = yr * yr + yi * yi
            if not c._power:
                y_mod = jnp.sqrt(y_mod)
        if c._include_energy:
            # energy Dirac: x at stream position y0 - translation + q
            # (can reach slightly before/after the buffer; pad covers it)
            e0 = y0 - self.translation
            xe = jax.lax.dynamic_slice(
                jnp.pad(stream, (ny, ny)),
                ((e0 + ny).astype(jnp.int32),),
                (ny,),
            )
            e_mod = xe * xe if c._power else jnp.abs(xe)
            y_mod = jnp.concatenate([e_mod[None, :], y_mod])
        idx = (
            jnp.arange(max_frames)[:, None] * s + jnp.arange(2 * s)[None, :]
        )
        framed = jnp.take(y_mod, idx, axis=-1)
        feats = jnp.einsum(
            "fkt,t->kf",
            framed,
            params["window"],
            precision=jax.lax.Precision.HIGHEST,
        )
        if c._log:
            feats = xlog(jnp.maximum(feats, _config.LOG_FLOOR_VALUE))
        return feats

    def _process_impl(self, state: SIStreamState, chunk):
        chunk = jnp.asarray(chunk, self._dtype)
        C = chunk.shape[0]
        s = self.shift
        stream = jnp.concatenate([state.carry, chunk])
        u = state.unconsumed + C
        nf = jnp.maximum(0, u // s - 1)
        nf = jnp.minimum(nf, self.max_frames)
        feats = self._emit(stream, u, nf, self.max_frames)
        return (
            SIStreamState(
                carry=stream[-self.carry_len :],
                unconsumed=(u - nf * s).astype(jnp.int32),
                seen=state.seen + C,
            ),
            feats,
            nf,
        )

    def _finalize_impl(self, state: SIStreamState):
        s, T = self.shift, self.T
        seen = state.seen
        target = (seen + s // 2) // s
        after_pad = (target * s + T - 1 - self.shift_eff) // s - 1
        # frames already emitted: (seen - shift_eff - unconsumed) / s
        done = (seen - self.shift_eff - state.unconsumed) // s
        total = jnp.maximum(done, jnp.minimum(target, after_pad))
        remaining = jnp.minimum(total - done, self.fin_max)
        stream = jnp.concatenate(
            [state.carry, jnp.zeros((self.fin_pad,), self._dtype)]
        )
        u = state.unconsumed + self.fin_pad
        feats = self._emit(stream, u, remaining, self.fin_max)
        return feats, remaining

    # public entry points --------------------------------------------------

    def process(self, state: SIStreamState, chunk):
        """Consume one ``(chunk_size,)`` chunk; returns
        ``(state, feats, n_valid)``."""
        if chunk.shape[-1] != self.chunk_size:
            raise ValueError(
                f"chunk must have static size {self.chunk_size}; "
                f"got {chunk.shape[-1]}"
            )
        return self._process(state, chunk)

    def finalize(self, state: SIStreamState):
        """Flush; returns ``(feats, n_valid)``."""
        return self._finalize(state)

    def transform(self, signal: np.ndarray) -> np.ndarray:
        """Stream a whole signal in fixed-size chunks (testing helper)."""
        Csz = self.chunk_size
        if len(signal) % Csz:
            raise ValueError(
                "transform requires len(signal) divisible by chunk_size"
            )
        state = self.init_state()
        outs = []
        for i in range(len(signal) // Csz):
            state, feats, nf = self.process(
                state, jnp.asarray(signal[i * Csz : (i + 1) * Csz])
            )
            outs.append(np.asarray(feats)[: int(nf)])
        feats, nf = self.finalize(state)
        outs.append(np.asarray(feats)[: int(nf)])
        return np.concatenate(outs)
