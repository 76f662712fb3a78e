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

Chunks have a static size, but any signal length streams: ``process``
takes a ``valid_len`` marking how many leading samples of the chunk are
real (the reference accepts arbitrary chunkings the same way; reference:
compute.py:462-540), and ``scan`` drives a whole utterance through
``lax.scan`` on device.  The only constraint (checked at construction) is
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
from .ops.framing import frame_count, reflect_index
from .ops.framing import frame_padded as _framing_frame_padded

__all__ = [
    "StreamState",
    "StreamingSTFT",
    "SIStreamState",
    "StreamingSI",
    "PitchStreamState",
    "StreamingPitch",
]


class StreamState(NamedTuple):
    """Carry between chunks: a tail ring of the virtual stream."""

    carry: jnp.ndarray  # (carry_len,) most recent virtual-stream samples
    n_carry: jnp.ndarray  # int32, valid samples at the END of `carry`
    is_first: jnp.ndarray  # bool, initial reflection not yet applied
    head: jnp.ndarray  # (pad_left,) raw stream head (for the reflection)
    n_raw: jnp.ndarray  # int32, raw samples seen so far


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
        if self.chunk_size < 1:
            raise ValueError("chunk_size must be positive")
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
        self._process_many = jax.jit(self._process_many_impl)
        self._finalize = jax.jit(self._finalize_impl)

    def init_state(self) -> StreamState:
        return StreamState(
            carry=jnp.zeros((self.carry_len,), self._dtype),
            n_carry=jnp.zeros((), jnp.int32),
            is_first=jnp.ones((), jnp.bool_),
            head=jnp.zeros((self.pad_left,), self._dtype),
            n_raw=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------

    def _feats(self, frames):
        c = self.computer
        return _stft.stft_feats_from_frames(frames, c.params, **c._static_spec)

    def _emit(self, stream, valid_end, total, max_frames: int):
        """Frames + count from a stream buffer whose ``total`` samples
        ending at index ``valid_end`` are valid."""
        from .ops.framing import frame_padded

        FL, FS = self.frame_length, self.frame_shift
        buf_len = stream.shape[0]
        nf = jnp.maximum(0, (total - FL) // FS + 1)
        # frame k starts at (valid_end - total) + k*FS.  ONE contiguous
        # dynamic_slice aligns the valid region at a static origin, then
        # framing is static strided slices (frame_padded) — a per-frame
        # index gather here cost more than the rest of the chunk program
        # combined (TPU gathers, the round-1 lesson).  Positions past
        # valid_end (chunk tail garbage, then the zero pad) are only read
        # by frames >= nf, masked by contract.
        win_len = (max_frames - 1) * FS + FL
        start = jnp.clip(valid_end - total, 0, buf_len).astype(jnp.int32)
        window = jax.lax.dynamic_slice(
            jnp.concatenate(
                [stream, jnp.zeros((win_len,), stream.dtype)]
            ),
            (start,),
            (win_len,),
        )
        frames = frame_padded(window, max_frames, FL, FS)
        return self._feats(frames), nf

    def _process_impl(self, state: StreamState, chunk, valid_len):
        chunk = jnp.asarray(chunk, self._dtype)
        C = chunk.shape[0]
        FS, PL, CL = self.frame_shift, self.pad_left, self.carry_len
        v = jnp.clip(jnp.asarray(valid_len, jnp.int32), 0, C)

        # grow the raw stream head while the initial reflection is pending
        # (chunk shifted to head coordinates via one contiguous
        # dynamic_slice — gather-free)
        if PL:
            pos = jnp.arange(PL)
            shifted = jax.lax.dynamic_slice(
                jnp.concatenate(
                    [
                        jnp.zeros((PL,), self._dtype),
                        chunk,
                        # keep the slice in bounds for chunks shorter
                        # than the head (dynamic_slice clamps silently)
                        jnp.zeros((max(0, PL - C),), self._dtype),
                    ]
                ),
                ((PL - jnp.minimum(state.n_raw, PL)).astype(jnp.int32),),
                (PL,),
            )
            head = jnp.where(
                (pos >= state.n_raw) & (pos < state.n_raw + v),
                shifted,
                state.head,
            )
        else:
            head = state.head
        n_raw = state.n_raw + v

        # no roll: the valid region ends at the traced index PL + CL + v
        # and _emit aligns by it directly; the carry below is ONE small
        # contiguous traced slice.  (The old tail-align roll's
        # doubled-buffer dynamic_slice was a large per-slot copy under the
        # pool's vmap.)
        total = state.n_carry + v
        stream = jnp.concatenate(
            [jnp.zeros((PL,), self._dtype), state.carry, chunk]
        )
        valid_end = (PL + CL + v).astype(jnp.int32)
        # apply the symmetric reflection of the stream head once it is
        # complete (reference: compute.py:497-517): insert flip(head)
        # immediately before the valid region
        apply_now = state.is_first & (n_raw >= PL) if PL else jnp.asarray(False)
        if PL:
            inserted = jax.lax.dynamic_update_slice(
                stream, jnp.flip(head), (valid_end - total - PL,)
            )
            stream = jnp.where(apply_now, inserted, stream)
            total = total + jnp.where(apply_now, PL, 0)
        is_first = state.is_first & ~apply_now if PL else jnp.asarray(False)

        # no frame may be emitted before the reflection is applied (frames
        # would claim virtual positions the prefix still owns).  The frame
        # capacity scales with the chunk length — any width processes in
        # ONE call (wide chunks batch all their frames into one matmul,
        # the serving backlog fast path; see serve.StreamPool.step)
        max_frames = max(0, (CL + PL + C - self.frame_length) // FS + 1)
        feats, nf = self._emit(stream, valid_end, total, max_frames)
        nf = jnp.where(is_first, 0, nf)
        rem = jnp.minimum(total - nf * FS, CL)
        # the carry holds the CL virtual samples ending at the newest
        # valid one (only the last ``rem`` are meaningful)
        carry = (
            jax.lax.dynamic_slice(stream, (valid_end - CL,), (CL,))
            if CL
            else stream[:0]
        )
        return (
            StreamState(
                carry=carry,
                n_carry=rem.astype(jnp.int32),
                is_first=is_first,
                head=head,
                n_raw=n_raw.astype(jnp.int32),
            ),
            feats,
            nf,
        )

    def _process_many_impl(self, state, chunks, valids):
        """Consume ``k`` chunks in ONE device call via ``lax.scan``.

        ``chunks (k, chunk_size)``, ``valids (k,)``; returns
        ``(state, feats (k, max_frames, C), nfs (k,))``.  Serving backlogs
        drain at one dispatch per call instead of one per chunk — on
        tunneled runtimes dispatch latency dominates per-chunk compute, so
        this is the streaming throughput lever (see serve.StreamPool).
        """

        def step(st, inp):
            chunk, v = inp
            st, feats, nf = self._process_impl(st, chunk, v)
            return st, (feats, nf)

        state, (feats, nfs) = jax.lax.scan(step, state, (chunks, valids))
        return state, feats, nfs

    def _finalize_impl(self, state: StreamState):
        FL, FS, PL = self.frame_length, self.frame_shift, self.pad_left
        buf_len = state.carry.shape[0]
        total = state.n_carry
        start = buf_len - total  # first valid sample in carry
        pos = (
            jnp.arange(self.finalize_max_frames)[:, None] * FS
            + jnp.arange(FL)[None, :]
        )
        if PL:
            # never-reflected stream (every chunk so far was too short to
            # complete the head): the carry holds the raw signal whole, so
            # frames follow full compute_full semantics — symmetric
            # reflection on BOTH sides, any depth (covers signals shorter
            # than the padding)
            n = state.n_raw
            sidx = reflect_index(pos - PL, jnp.maximum(n, 1))
            first_idx = jnp.clip(start + sidx, 0, jnp.maximum(buf_len - 1, 0))
            nf_first = frame_count(n, FL, FS)
        # steady stream: the reflection is already part of the carried
        # virtual samples; only the right edge still reflects.  The global
        # frame target (with the reference's short-signal zero clause)
        # minus frames already emitted gives the flush count.
        done = (state.n_raw + PL - total) // FS
        nf_steady = jnp.maximum(0, frame_count(state.n_raw, FL, FS) - done)
        rel = reflect_index(pos, jnp.maximum(total, 1))
        steady_idx = jnp.clip(start + rel, 0, jnp.maximum(buf_len - 1, 0))
        if PL:
            idx = jnp.where(state.is_first, first_idx, steady_idx)
            nf = jnp.where(state.is_first, nf_first, nf_steady)
        else:
            idx, nf = steady_idx, nf_steady
        frames = jnp.take(state.carry, idx, axis=0)
        feats = self._feats(frames)
        return feats, nf

    # public jitted entry points -----------------------------------------

    def process(
        self, state: StreamState, chunk, valid_len=None
    ) -> Tuple[StreamState, jnp.ndarray, jnp.ndarray]:
        """Consume one ``(chunk_size,)`` chunk; returns
        ``(state, feats, n_valid)`` with feats ``(max_frames, num_coeffs)``.

        ``valid_len`` (host int or traced) marks how many leading samples
        of the chunk are real; the rest are ignored.  Defaults to the full
        chunk, so any-length signals stream by zero-padding the final
        chunk and passing its true length.
        """
        if chunk.shape[-1] != self.chunk_size:
            raise ValueError(
                f"chunk must have static size {self.chunk_size}; "
                f"got {chunk.shape[-1]} (zero-pad and pass valid_len instead)"
            )
        if valid_len is None:
            valid_len = self.chunk_size
        return self._process(state, chunk, valid_len)

    def process_many(self, state, chunks, valids):
        """Consume ``chunks (k, chunk_size)`` with per-chunk ``valids
        (k,)`` in one device dispatch; returns ``(state, feats
        (k, max_frames, C), nfs (k,))``.  Each distinct ``k`` compiles
        once — batch backlogs into a few power-of-two depths."""
        if chunks.shape[-1] != self.chunk_size:
            raise ValueError(
                f"chunks must have static size {self.chunk_size}; "
                f"got {chunks.shape[-1]}"
            )
        return self._process_many(state, chunks, valids)

    def process_wide(self, state, samples, valid_len=None):
        """Consume an arbitrary-width masked sample buffer in ONE call.

        Identical semantics to successive :meth:`process` calls over the
        same samples, but every frame batches into a single matmul — the
        serving backlog fast path (measured ~4x over per-chunk scanning
        at 64-chunk widths on v5e; see :class:`speech_tpu.serve.StreamPool`).
        Each distinct buffer width compiles its own program: pad widths
        to a few power-of-two tiers.
        """
        if valid_len is None:
            valid_len = samples.shape[-1]
        return self._process(state, samples, valid_len)

    def finalize(self, state: StreamState):
        """Flush remaining samples; returns ``(feats, n_valid)``."""
        return self._finalize(state)

    def scan(self, signal, sig_len=None):
        """Whole-utterance streaming under one jitted ``lax.scan``.

        ``signal`` is a fixed-size buffer whose first ``sig_len`` (traced
        or host int; default: all) samples are valid.  Runs
        ``ceil(buf_len / chunk_size)`` process steps then finalize, all on
        device.  Returns ``(feats, counts, fin_feats, fin_count)`` with
        ``feats (n_steps, max_frames, num_coeffs)`` and per-step valid
        counts — rows past a step's count are garbage to mask (see
        :meth:`transform` for host-side compaction).
        """
        C = self.chunk_size
        buf_len = signal.shape[0]
        n_steps = max(1, -(-buf_len // C))
        if sig_len is None:
            sig_len = buf_len

        signal = jnp.asarray(signal, self._dtype)
        padded = jnp.pad(signal, (0, n_steps * C - buf_len))
        chunks = padded.reshape(n_steps, C)
        valids = jnp.clip(
            jnp.asarray(sig_len, jnp.int32) - jnp.arange(n_steps) * C, 0, C
        )

        def step(state, inp):
            chunk, v = inp
            state, feats, nf = self._process_impl(state, chunk, v)
            return state, (feats, nf)

        state, (feats, counts) = jax.lax.scan(
            step, self.init_state(), (chunks, valids)
        )
        fin_feats, fin_count = self._finalize_impl(state)
        return feats, counts, fin_feats, fin_count

    # convenience ---------------------------------------------------------

    def transform(self, signal: np.ndarray) -> np.ndarray:
        """Host helper: stream a whole signal (any length) through the
        jitted ``lax.scan`` driver and return the concatenated valid
        frames (for testing/parity)."""
        sig = np.asarray(signal)
        fn = jax.jit(self.scan, static_argnums=())
        feats, counts, fin_feats, fin_count = fn(
            jnp.asarray(sig, self._dtype), len(sig)
        )
        feats, counts = np.asarray(feats), np.asarray(counts)
        outs = [feats[i, : counts[i]] for i in range(feats.shape[0])]
        outs.append(np.asarray(fin_feats)[: int(fin_count)])
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
    ``hist + 2*frame_shift`` raw samples (``hist = max(max_support - 1,
    translation)``) — enough history for every convolution tap and energy
    Dirac of any not-yet-emitted frame.

    The per-chunk emit convolution follows the computer's ``conv_mode``:
    banded-Toeplitz block matmuls (the batch path's MXU backend,
    :func:`speech_tpu.ops.si.toeplitz_conv_blocks`) for ``matmul``/
    ``direct``/resolved-``auto``, or the FFT product for ``fft``.  A
    ``precision="double"`` computer streams through the exact
    digit-decomposition conv, so the batch tier's accuracy contract
    (~1e-6 vs float64 on any signal) holds for streaming too.
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
        # aligned-emit history depth: the conv needs T-1 taps before
        # counted position 0, the energy Dirac reads ``translation``
        # samples back (== T-1 or less for every real bank; the max guards
        # the degenerate fully-acausal case)
        self.hist = max(self.T - 1, self.translation)
        self.carry_len = self.hist + 2 * self.shift
        # per-chunk frames bound: unconsumed < 2*shift before the chunk
        self.max_frames = (2 * self.shift + self.chunk_size) // self.shift
        # finalize pads at most ~2*shift + shift_eff zeros
        self.fin_pad = 2 * self.shift + max(0, self.shift_eff) + self.shift
        self.fin_max = (2 * self.shift + self.fin_pad) // self.shift + 1
        self._dtype = computer._dtype
        # emit conv backend: resolve the computer's conv_mode the same way
        # its batch path does (auto -> matmul at speech-sized supports;
        # "direct" also maps to the block matmuls here — both are
        # full-precision MXU paths and the stream has no lax.conv tier)
        from .ops import si as _si

        conv_mode = computer._conv_mode
        if conv_mode == "auto":
            conv_mode = (
                "matmul" if self.T <= 16 * _si.CONV_BLOCK else "fft"
            )
        elif conv_mode == "direct":
            conv_mode = "matmul"
        self.conv_mode = conv_mode
        self.precision = computer._precision
        self._params = computer._params_for({"conv_mode": conv_mode})
        self._process = jax.jit(self._process_impl)
        self._process_many = jax.jit(self._process_many_impl)
        self._finalize = jax.jit(self._finalize_impl)

    def init_state(self) -> SIStreamState:
        return SIStreamState(
            carry=jnp.zeros((self.carry_len,), self._dtype),
            unconsumed=jnp.asarray(-self.shift_eff, jnp.int32),
            seen=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------

    def _conv_parts_fft(self, aligned, ny):
        """Per-part (re[, im]) conv values ``(F, ny)`` at the aligned
        buffer's static output window (counted position ``q`` sits at
        input index ``hist + q``), via one real-FFT product."""
        params = self._params
        H0 = aligned.shape[0] - ny  # == self.hist
        # linear conv over the aligned buffer; outputs [H0, H0+ny) read
        # only in-buffer taps, so the fft just needs to avoid wrap-around
        need = aligned.shape[0] + self.T - 1
        fft_size = 1 << max(0, int(need)).bit_length()
        X = jnp.fft.rfft(aligned, n=fft_size)

        def conv_vals(f):
            H = jnp.fft.rfft(f, n=fft_size, axis=-1)
            conv = jnp.fft.irfft(X[None, :] * H, n=fft_size, axis=-1)
            return conv[:, H0 : H0 + ny]

        parts = [conv_vals(params["firs_re"])]
        if not self.is_real:
            parts.append(conv_vals(params["firs_im"]))
        return parts

    def _conv_parts_matmul(self, aligned, ny):
        """Per-part conv values ``(F, ny)`` via the batch path's
        banded-Toeplitz block matmuls over the aligned buffer (counted
        position ``q``'s conv value sits at linear-conv index ``hist+q``
        — a STATIC output window).  The conv core — including the exact
        digit-decomposition passes under the digit precisions — is
        :func:`speech_tpu.ops.si.block_conv_parts`, SHARED with
        ``compute_batch``, so the stream inherits the batch tier's
        exactness by construction."""
        from .ops import si as _si

        params = self._params
        V = _si.CONV_BLOCK
        H0 = aligned.shape[0] - ny  # == self.hist
        nb = -(-aligned.shape[0] // V)
        x_pad = jnp.pad(aligned, (0, nb * V - aligned.shape[0]))
        if self.precision in ("double", "accurate"):
            Kk = params["conv_re_digits"].shape[1] - 1
        else:
            Kk = params["conv_re_blocks"].shape[0] - 1
        part = _si.block_conv_parts(x_pad, nb, V, Kk, self.precision)

        def sliced(y_full):
            return jax.lax.slice_in_dim(y_full, H0, H0 + ny, axis=1)

        parts = [sliced(part(params, "conv_re"))]
        if not self.is_real:
            parts.append(sliced(part(params, "conv_im")))
        return parts

    def _emit(self, stream, valid_end, u_end, max_frames: int):
        """Features for ``max_frames`` frames ending ``u_end`` counted
        samples before stream index ``valid_end`` (the position just past
        the newest valid sample).  Computes every row; the caller masks
        rows past its frame count."""
        c = self.computer
        params = self._params
        s = self.shift
        ny = (max_frames + 1) * s
        # Pre-align with ONE contiguous traced slice: counted position 0
        # sits at stream index valid_end - u_end (frame j reads conv
        # values at counted positions [j*s, j*s + 2s)); pulling its
        # ``hist`` history taps to the buffer front makes every downstream
        # read — the conv output window, the energy Diracs — a STATIC
        # slice, and the conv covers exactly hist+ny positions.  The old
        # traced-extraction form needed a ~2x-wider conv to bound the
        # slice, and its per-slot dynamic slices lowered to gathers under
        # the pool's vmap.
        # Left bound: carry_len = hist+2s and the invariant unconsumed
        # < 2s keep start = 2s - unconsumed >= 1 (process passes
        # valid_end = CL + v, u_end = unconsumed + v; finalize passes the
        # padded buffer end); the right overhang (u_end >= -|shift_eff|,
        # plus tail frames past the signal) reads static zero pad —
        # frames there fall past the caller's valid frame count.
        H = self.hist
        rpad = ny + abs(self.shift_eff)
        start = (valid_end - u_end - H).astype(jnp.int32)
        aligned = jax.lax.dynamic_slice(
            jnp.pad(stream, (0, rpad)), (start,), (H + ny,)
        )
        if self.conv_mode == "matmul":
            parts = self._conv_parts_matmul(aligned, ny)
        else:
            parts = self._conv_parts_fft(aligned, ny)
        if self.is_real:
            y = parts[0]
            y_mod = y * y if c._power else jnp.abs(y)
        else:
            yr, yi = parts
            y_mod = yr * yr + yi * yi
            if not c._power:
                y_mod = jnp.sqrt(y_mod)
        if c._include_energy:
            # energy Dirac at counted position q reads raw x at stream
            # index (valid_end - u_end) - translation + q = aligned index
            # hist - translation + q — STATIC and in-bounds (hist >=
            # translation by construction)
            off = H - self.translation
            xe = jax.lax.slice_in_dim(aligned, off, off + ny)
            e_mod = xe * xe if c._power else jnp.abs(xe)
            y_mod = jnp.concatenate([e_mod[None, :], y_mod])
        # the overlapping 2s-windows factor into non-overlapping s-blocks
        # hit by the window's two halves (the batch tail's form,
        # ops/si.py) — no gather, no duplicated y traffic, identical
        # reduction order to compute_full
        nF = y_mod.shape[0]
        prec = jax.lax.Precision.HIGHEST
        blocks = y_mod.reshape(nF, max_frames + 1, s)
        w = params["window"]
        lo = jnp.einsum("fkt,t->fk", blocks, w[:s], precision=prec)
        hi = jnp.einsum("fkt,t->fk", blocks, w[s:], precision=prec)
        feats = (lo[:, :-1] + hi[:, 1:]).T
        if c._log:
            feats = xlog(jnp.maximum(feats, _config.LOG_FLOOR_VALUE))
        return feats

    def _process_impl(self, state: SIStreamState, chunk, valid_len):
        chunk = jnp.asarray(chunk, self._dtype)
        C = chunk.shape[0]
        s = self.shift
        CL = self.carry_len
        v = jnp.clip(jnp.asarray(valid_len, jnp.int32), 0, C)
        # zero the masked tail (defensive: valid frames never read past
        # the newest valid sample — see _emit's alignment — but garbage
        # should not survive into any arithmetic).  No roll: the emit
        # aligns by the traced valid end directly, and the carry is ONE
        # small contiguous traced slice — the old tail-align roll's
        # doubled-buffer slice was the wide tick's second-largest cost
        # under the pool's vmap.
        chunk = jnp.where(jnp.arange(C) < v, chunk, 0)
        stream = jnp.concatenate([state.carry, chunk])
        u = state.unconsumed + v
        nf = jnp.maximum(0, u // s - 1)
        # per-call frame capacity scales with the chunk length (wide
        # chunks run as one call — the serving backlog fast path)
        max_frames = (2 * s + C) // s
        nf = jnp.minimum(nf, max_frames)
        feats = self._emit(stream, CL + v, u, max_frames)
        carry = jax.lax.dynamic_slice(stream, (v.astype(jnp.int32),), (CL,))
        return (
            SIStreamState(
                carry=carry,
                unconsumed=(u - nf * s).astype(jnp.int32),
                seen=state.seen + v,
            ),
            feats,
            nf,
        )

    def _process_many_impl(self, state, chunks, valids):
        """Consume ``k`` chunks in one device call (lax.scan); same
        contract as :meth:`StreamingSTFT._process_many_impl`."""

        def step(st, inp):
            chunk, v = inp
            st, feats, nf = self._process_impl(st, chunk, v)
            return st, (feats, nf)

        state, (feats, nfs) = jax.lax.scan(step, state, (chunks, valids))
        return state, feats, nfs

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
        feats = self._emit(stream, stream.shape[0], u, self.fin_max)
        return feats, remaining

    # public entry points --------------------------------------------------

    def process(self, state: SIStreamState, chunk, valid_len=None):
        """Consume one ``(chunk_size,)`` chunk; returns
        ``(state, feats, n_valid)``.  ``valid_len`` marks how many leading
        samples are real (default: all), so any-length signals stream by
        zero-padding the final chunk."""
        if chunk.shape[-1] != self.chunk_size:
            raise ValueError(
                f"chunk must have static size {self.chunk_size}; "
                f"got {chunk.shape[-1]}"
            )
        if valid_len is None:
            valid_len = self.chunk_size
        return self._process(state, chunk, valid_len)

    def process_many(self, state, chunks, valids):
        """Consume ``chunks (k, chunk_size)`` in one device dispatch (see
        :meth:`StreamingSTFT.process_many`)."""
        if chunks.shape[-1] != self.chunk_size:
            raise ValueError(
                f"chunks must have static size {self.chunk_size}; "
                f"got {chunks.shape[-1]}"
            )
        return self._process_many(state, chunks, valids)

    def process_wide(self, state, samples, valid_len=None):
        """Consume an arbitrary-width masked sample buffer in one call
        (see :meth:`StreamingSTFT.process_wide`)."""
        if valid_len is None:
            valid_len = samples.shape[-1]
        return self._process(state, samples, valid_len)

    def finalize(self, state: SIStreamState):
        """Flush; returns ``(feats, n_valid)``."""
        return self._finalize(state)

    def scan(self, signal, sig_len=None):
        """Whole-utterance streaming under one jitted ``lax.scan`` (same
        contract as :meth:`StreamingSTFT.scan`)."""
        C = self.chunk_size
        buf_len = signal.shape[0]
        n_steps = max(1, -(-buf_len // C))
        if sig_len is None:
            sig_len = buf_len
        signal = jnp.asarray(signal, self._dtype)
        padded = jnp.pad(signal, (0, n_steps * C - buf_len))
        chunks = padded.reshape(n_steps, C)
        valids = jnp.clip(
            jnp.asarray(sig_len, jnp.int32) - jnp.arange(n_steps) * C, 0, C
        )

        def step(state, inp):
            chunk, v = inp
            state, feats, nf = self._process_impl(state, chunk, v)
            return state, (feats, nf)

        state, (feats, counts) = jax.lax.scan(
            step, self.init_state(), (chunks, valids)
        )
        fin_feats, fin_count = self._finalize_impl(state)
        return feats, counts, fin_feats, fin_count

    def transform(self, signal: np.ndarray) -> np.ndarray:
        """Stream a whole signal (any length) via :meth:`scan` and return
        the concatenated valid frames (testing helper)."""
        sig = np.asarray(signal)
        feats, counts, fin_feats, fin_count = jax.jit(self.scan)(
            jnp.asarray(sig, self._dtype), len(sig)
        )
        feats, counts = np.asarray(feats), np.asarray(counts)
        outs = [feats[i, : counts[i]] for i in range(feats.shape[0])]
        outs.append(np.asarray(fin_feats)[: int(fin_count)])
        return np.concatenate(outs)


class PitchStreamState(NamedTuple):
    """Carry between chunks for the streaming pitch tracker."""

    stage: jnp.ndarray  # (chunk_size,) staged valid samples (head-valid,
    # zero beyond n_stage) awaiting a full aligned chunk
    n_stage: jnp.ndarray  # int32, valid samples at the START of `stage`
    raw_carry: jnp.ndarray  # (raw_ctx,) most recent raw samples absorbed
    n_chunks: jnp.ndarray  # int32, full aligned chunks absorbed so far
    n_raw: jnp.ndarray  # int32, VALID raw samples absorbed
    sumsq: jnp.ndarray  # running energy of valid work samples (ballast)
    wcount: jnp.ndarray  # int32, valid work samples counted into sumsq
    wcarry: jnp.ndarray  # (span - 1,) unconsumed work samples (tail-valid)
    n_wc: jnp.ndarray  # int32, valid samples at the END of wcarry
    cost: jnp.ndarray  # (n_lags,) Viterbi forward cost at the newest frame
    ring_ptr: jnp.ndarray  # (ring_len, n_lags) int32 backpointers (newest last)
    ring_pov: jnp.ndarray  # (ring_len, n_lags) ballast-free NCCF rows
    n_frames: jnp.ndarray  # int32, frames absorbed into the Viterbi
    n_out: jnp.ndarray  # int32, frames emitted so far


class StreamingPitch:
    """Explicit-carry jittable streaming for the Kaldi-style pitch tracker.

    The offline tracker (:func:`speech_tpu.ops.pitch.kaldi_pitch`) is a
    whole-utterance Viterbi; this is its chunked serving form, in the
    spirit of Kaldi's ``online2`` pitch (lookahead-bounded emission) but
    built like the other streamers in this module: pytree state, static
    shapes, ``process``/``finalize`` pure and jitted with the same
    ``(state, feats, n_valid)`` contract (feature columns ``[f0,
    nccf]``), masked chunks of any ``valid_len``, ``vmap`` for
    concurrent sessions — so :class:`speech_tpu.serve.StreamPool` and
    :class:`~speech_tpu.serve.StreamServer` multiplex pitch sessions
    unchanged.

    Stage by stage:

    - **Staging**: incoming valid samples compact into a one-chunk
      staging buffer, and absorption consumes full aligned chunks only
      (the polyphase front-end needs a fixed raw grid); ``finalize``
      absorbs the staged remainder as the final partial chunk.  A
      ``valid_len 0`` call is a bitwise no-op on the state (idle pool
      slots tick for free).
    - **Front-end** (resample to the work rate + lowpass) streams by
      overlap-save recompute: the carry keeps the last ``raw_ctx`` raw
      samples, each absorbed chunk recomputes the polyphase resample +
      FIR lowpass over ``[carry | chunk]`` (the same matrices as the
      batch path) and emits the ``chunk*up/down`` work samples whose
      full left/right tap context is known — a constant ``delay_w``
      emission delay, flushed by :meth:`finalize`.  The work samples
      therefore equal the batch front-end's to reduction roundoff.
    - **NCCF**: carried ``span - 1`` work samples + the new block frame
      gather-free (one contiguous ``dynamic_slice`` then static strided
      slices), then :func:`speech_tpu.ops.pitch._nccf_from_frames` —
      identical math to the batch tracker.  The energy ballast uses a
      RUNNING mean square over the work samples seen so far (an online
      tracker cannot see the whole signal; pass ``ballast_ms`` to
      freeze it, e.g. for stream-vs-batch parity).
    - **Lag search**: the Viterbi forward recursion runs incrementally;
      a ring of backpointer rows supports emission with AT LEAST
      ``lookahead_frames`` of future context — each emitted frame is on
      the optimal path to the newest frame's best lag, so once paths
      coalesce within the lookahead (typical for speech in well under
      50 frames) the emitted track equals the offline optimum, and
      :meth:`finalize`'s frames are exactly offline-optimal by
      construction.  With ``lookahead_frames >= total frames``, the
      whole track is the exact offline Viterbi (tested at 1e-15).

    Latency: up to one chunk of staging, plus ``delay_w`` work samples
    of front-end delay, plus ``lookahead_frames`` frames of Viterbi
    lookahead.  Feed emissions to
    :func:`speech_tpu.ops.pitch.pitch_feats_from_track` for the
    3-column Kaldi-style features.
    """

    def __init__(
        self,
        rate: float,
        chunk_size: int,
        lookahead_frames: int = 50,
        dtype=jnp.float32,
        ballast_ms=None,
        min_f0: float = 50.0,
        max_f0: float = 400.0,
        frame_length_ms: float = 25.0,
        frame_shift_ms: float = 10.0,
        resample_rate=4000.0,
        lowpass_cutoff=1000.0,
        penalty_factor: float = 0.1,
        nccf_ballast: float = 1.0,
        soft_min_f0: float = 10.0,
        lag_resolution: float = 0.01,
    ):
        from .ops import pitch as _pitch
        from .ops.resample import resample_matrices

        self._pitch = _pitch
        (
            self.work_rate,
            self.up,
            self.down,
            self.nccf_window,
            self.shift,
            self.tables,
        ) = _pitch._work_geometry(
            rate,
            min_f0,
            max_f0,
            frame_length_ms,
            frame_shift_ms,
            resample_rate,
            penalty_factor,
            lag_resolution,
        )
        self.chunk_size = int(chunk_size)
        if self.chunk_size < 1:
            raise ValueError("chunk_size must be positive")
        if self.chunk_size % self.down:
            raise ValueError(
                f"chunk_size must be a multiple of the resampling "
                f"denominator {self.down} (rate {rate} -> {resample_rate}); "
                f"got {self.chunk_size}"
            )
        self.lookahead = int(lookahead_frames)
        if self.lookahead < 0:
            raise ValueError("lookahead_frames must be >= 0")
        self._dtype = jnp.dtype(dtype)
        self.ballast_ms = None if ballast_ms is None else float(ballast_ms)
        self.nccf_ballast = float(nccf_ballast)
        self.lag_resolution = float(lag_resolution)
        self.soft_min_f0 = float(soft_min_f0)
        self.span = _pitch._nccf_span(self.nccf_window, self.tables)
        fine = self.tables[2]
        self.fine = fine
        self.n_lags = len(fine)
        self.lowpass_active = bool(
            lowpass_cutoff and lowpass_cutoff < self.work_rate / 2
        )
        self.lowpass_cutoff = (
            float(lowpass_cutoff) if self.lowpass_active else None
        )
        # lowpass FIR half-width (ops/pitch._lowpass_fir's fixed design)
        K2 = 32 if self.lowpass_active else 0
        L_, M_ = self.up, self.down
        N = self.chunk_size
        if (L_, M_) != (1, 1):
            phi_np, k_min = resample_matrices(L_, M_)
            self.w_width = phi_np.shape[1]
            self.phi_np = phi_np  # (up, W) host phases for fir_conv_matmul
        else:
            self.w_width, k_min, self.phi_np = 1, 0, None
        self.k_min = k_min
        self.work_per_chunk = N * L_ // M_
        Nw = self.work_per_chunk
        # emission delay (work samples): every emitted sample's lowpass
        # window and each window tap's resample raw window must lie in
        # the current buffer.  Start above K2 so mid-stream emissions
        # never read the (finalize-time) valid-length zeroing region.
        D = K2 + 1
        while (
            ((Nw - D - 1 + K2) // L_) * M_ + k_min + self.w_width - 1 > N - 1
        ):
            D += 1
        self.delay_w = D
        # raw context: the oldest emitted sample's leftmost tap
        need = -((((-D - K2) // L_) * M_) + k_min)
        self.raw_ctx = -(-max(need, 0) // M_) * M_  # round up to blocks
        self.r_w = self.raw_ctx * L_ // M_
        self.off = self.r_w - D  # emitted slice's static work-buffer offset
        self.n_blocks = (self.raw_ctx + N) // M_
        self.n_work_buf = self.n_blocks * L_
        self.pad_l = -k_min
        self.pad_r = max(
            (self.n_blocks - 1) * M_ + k_min + self.w_width - (self.raw_ctx + N),
            0,
        )
        self.max_frames_chunk = (Nw - 1) // self.shift + 1
        self.k_flush = -(-D // Nw)
        # finalize absorbs the staged remainder plus k_flush zero chunks
        # without emitting; the ring must retain every frame across that
        self.ring_len = self.lookahead + (1 + self.k_flush) * (
            self.max_frames_chunk
        )
        tmat = self.tables[4]
        self.tmat = jnp.asarray(tmat, self._dtype)
        self.soft = jnp.asarray(
            _pitch._soft_discount(fine, self.work_rate, self.soft_min_f0),
            self._dtype,
        )
        self._process = jax.jit(self._process_impl)
        self._finalize = jax.jit(self._finalize_impl)

    def init_state(self) -> PitchStreamState:
        Lf, RL = self.n_lags, self.ring_len
        return PitchStreamState(
            stage=jnp.zeros((self.chunk_size,), self._dtype),
            n_stage=jnp.zeros((), jnp.int32),
            raw_carry=jnp.zeros((self.raw_ctx,), self._dtype),
            n_chunks=jnp.zeros((), jnp.int32),
            n_raw=jnp.zeros((), jnp.int32),
            sumsq=jnp.zeros((), self._dtype),
            wcount=jnp.zeros((), jnp.int32),
            wcarry=jnp.zeros((self.span - 1,), self._dtype),
            n_wc=jnp.zeros((), jnp.int32),
            cost=jnp.zeros((Lf,), self._dtype),
            ring_ptr=jnp.zeros((RL, Lf), jnp.int32),
            ring_pov=jnp.zeros((RL, Lf), self._dtype),
            n_frames=jnp.zeros((), jnp.int32),
            n_out=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------

    def _front(self, buf):
        """Resampled work samples of the raw buffer (abs work index of
        output 0 is ``n_chunks*work_per_chunk - r_w``)."""
        if self.up == 1 and self.down == 1:
            return buf
        from .ops.resample import fir_conv_matmul

        # banded-Toeplitz block form (2 strided slices + one matmul) —
        # the naive framing is W/down slices per absorb, which the pool
        # pays per tick under vmap
        return fir_conv_matmul(
            buf,
            self.phi_np,
            stride=self.down,
            pad_left=self.pad_l,
            n_out=self.n_work_buf,
            precision=jax.lax.Precision.HIGHEST,
        )

    def _absorb_impl(self, state: PitchStreamState, chunk, v, advance):
        """Absorb ONE grid-aligned chunk (front-end + framing + NCCF +
        Viterbi); no emission.  ``advance`` False makes the call a
        bitwise no-op on the state (the staging layer and idle pool
        slots rely on it); the staging fields pass through untouched."""
        _pitch = self._pitch
        N, Nw = self.chunk_size, self.work_per_chunk
        v = jnp.clip(jnp.asarray(v, jnp.int32), 0, N)
        chunk = jnp.asarray(chunk, self._dtype)
        chunk = jnp.where(jnp.arange(N) < v, chunk, 0)
        buf = jnp.concatenate([state.raw_carry, chunk])
        c = state.n_chunks
        n_raw = state.n_raw + v
        # valid resampled length so far (batch: ceil(len * up / down))
        s_w_valid = (n_raw * self.up + self.down - 1) // self.down
        work = self._front(buf)
        # zero outside the valid resampled extent BEFORE the lowpass.
        # Right edge: the batch tracker re-zeroes past ceil(len*up/down)
        # (resampler taps leave nonzero output there); delay_w > K2 keeps
        # that a no-op mid-stream, so it only shapes the final flush.
        # Left edge: blocks before abs work 0 read real raw samples
        # through the FIR's left tail, but the batch lowpass zero-pads
        # before sample 0 — zero them so the first K2 emitted samples
        # match the batch head exactly.
        a_w0 = c * Nw - self.r_w  # abs work index of work[0]
        idx = jnp.arange(work.shape[0]) + a_w0
        work = jnp.where((idx >= 0) & (idx < s_w_valid), work, 0)
        if self.lowpass_active:
            work = _pitch._lowpass(work, self.work_rate, self.lowpass_cutoff)
        emit = work[self.off : self.off + Nw]
        e0 = c * Nw - self.delay_w  # abs work index of emit[0]
        pos = jnp.arange(Nw) + e0
        vmask = (pos >= 0) & (pos < s_w_valid)
        sumsq = state.sumsq + jnp.sum(jnp.where(vmask, emit * emit, 0))
        dv = jnp.sum(vmask.astype(jnp.int32))
        wcount = state.wcount + dv
        # valid region of `emit` is contiguous [lo, hi); lo > 0 happens
        # only before any valid work existed (the carry is empty then),
        # so [carry-tail | emit-valid] is one contiguous valid segment
        hi_loc = jnp.clip(s_w_valid - e0, 0, Nw).astype(jnp.int32)
        CL = self.span - 1
        stream = jnp.concatenate([state.wcarry, emit])
        total = state.n_wc + dv
        valid_end = CL + hi_loc
        nf = jnp.maximum(0, (total - self.span) // self.shift + 1)
        F = self.max_frames_chunk
        win_len = (F - 1) * self.shift + self.span
        start = jnp.clip(valid_end - total, 0, CL + Nw).astype(jnp.int32)
        windowed = jax.lax.dynamic_slice(
            jnp.concatenate([stream, jnp.zeros((win_len,), stream.dtype)]),
            (start,),
            (win_len,),
        )
        frames = _framing_frame_padded(windowed, F, self.span, self.shift)
        ms = (
            jnp.asarray(self.ballast_ms, self._dtype)
            if self.ballast_ms is not None
            else sumsq / jnp.maximum(wcount, 1)
        )
        ballast = self.nccf_ballast * self.nccf_window * ms
        nc_p, nc_v = _pitch._nccf_from_frames(
            frames, self.nccf_window, self.tables, ballast
        )
        fvalid = jnp.arange(F) < nf
        nc_eff = nc_p * self.soft
        Lf = self.n_lags
        tmat = self.tmat
        arangeL = jnp.arange(Lf, dtype=jnp.int32)

        def vstep(carry, inp):
            cost, nfr, rp, rv = carry
            nc_row, pov_row, ok = inp
            tot = cost[:, None] + tmat
            cost2 = jnp.min(tot, axis=0) - nc_row
            ptr = jnp.argmin(tot, axis=0).astype(jnp.int32)
            first = nfr == 0
            cost2 = jnp.where(first, -nc_row, cost2)
            ptr = jnp.where(first, arangeL, ptr)
            rp2 = jnp.concatenate([rp[1:], ptr[None]], axis=0)
            rv2 = jnp.concatenate([rv[1:], pov_row[None]], axis=0)
            return (
                jnp.where(ok, cost2, cost),
                nfr + ok.astype(jnp.int32),
                jnp.where(ok, rp2, rp),
                jnp.where(ok, rv2, rv),
            ), None

        # unroll: each step is tiny ([L, L] min + a ring shift), so the
        # per-frame loop is plumbing-bound, especially vmapped in pools
        (cost, n_frames, ring_ptr, ring_pov), _ = jax.lax.scan(
            vstep,
            (state.cost, state.n_frames, state.ring_ptr, state.ring_pov),
            (nc_eff, nc_v, fvalid),
        )
        rem = jnp.clip(total - nf * self.shift, 0, CL)
        wcarry = jax.lax.dynamic_slice(
            stream, ((valid_end - CL).astype(jnp.int32),), (CL,)
        )
        new = PitchStreamState(
            stage=state.stage,
            n_stage=state.n_stage,
            raw_carry=buf[N:],
            n_chunks=(c + 1).astype(jnp.int32),
            n_raw=n_raw.astype(jnp.int32),
            sumsq=sumsq,
            wcount=wcount.astype(jnp.int32),
            wcarry=wcarry,
            n_wc=rem.astype(jnp.int32),
            cost=cost,
            ring_ptr=ring_ptr,
            ring_pov=ring_pov,
            n_frames=n_frames.astype(jnp.int32),
            n_out=state.n_out,
        )
        adv = jnp.asarray(advance, jnp.bool_)
        return jax.tree_util.tree_map(
            lambda n_, o_: jnp.where(adv, n_, o_), new, state
        )

    def _emit_tracks(self, cost, ring_ptr, ring_pov, pending, e, out_n: int):
        """Backtrack from the newest frame's best lag through the ring
        and emit the OLDEST ``e`` pending frames (each thereby sees at
        least the full pending depth of future context), refined to
        sub-grid lags.  Returns ``(f0, nccf)`` of ``out_n`` rows, rows
        ``>= e`` zeroed.  Takes the emission-time snapshot explicitly so
        a wide buffer's per-chunk emissions batch under one ``vmap``
        (the per-chunk backtrack scans were the pool tick's bottleneck)."""
        _pitch = self._pitch
        j0 = jnp.argmin(cost).astype(jnp.int32)

        def bstep(j, ptr_row):
            return ptr_row[j], j

        _, path = jax.lax.scan(bstep, j0, ring_ptr, reverse=True)
        start = jnp.clip(self.ring_len - pending, 0, self.ring_len).astype(
            jnp.int32
        )
        pathp = jnp.concatenate([path, jnp.zeros((out_n,), jnp.int32)])
        povp = jnp.concatenate(
            [ring_pov, jnp.zeros((out_n, self.n_lags), ring_pov.dtype)]
        )
        p = jax.lax.dynamic_slice(pathp, (start,), (out_n,))
        pv = jax.lax.dynamic_slice(
            povp, (start, jnp.zeros((), jnp.int32)), (out_n, self.n_lags)
        )
        f0, nccf = _pitch._refine_lags(
            p, pv, self.work_rate, self.fine, self.lag_resolution
        )
        ok = jnp.arange(out_n) < e
        return jnp.where(ok, f0, 0.0), jnp.where(ok, nccf, 0.0)

    def _process_impl(self, state: PitchStreamState, samples, valid_len):
        """Stage + absorb full chunks + emit; ``samples`` is any static
        width that is a multiple of ``chunk_size`` (wide buffers batch a
        backlog into one call), ``valid_len`` marks the real prefix.
        Returns ``(state, feats, n_valid)`` with feats ``(capacity, 2)``
        columns ``[f0, nccf]`` — the StreamPool streamer contract."""
        N = self.chunk_size
        W = samples.shape[0]
        k_steps = W // N
        F = self.max_frames_chunk
        out_n = max(k_steps, 1) * F
        dtype = self._dtype
        v = jnp.clip(jnp.asarray(valid_len, jnp.int32), 0, W)
        samples = jnp.asarray(samples, dtype)
        samples = jnp.where(jnp.arange(W) < v, samples, 0)
        # compact the valid prefix onto the staged samples (both are
        # zero beyond their valid extents, so the traced-offset update
        # preserves the zero invariant bitwise)
        combined = jnp.concatenate([state.stage, jnp.zeros((W,), dtype)])
        combined = jax.lax.dynamic_update_slice(
            combined, samples, (state.n_stage,)
        )
        total_in = state.n_stage + v
        full = total_in // N

        # absorb all chunks first, SNAPSHOTTING each chunk's emission
        # state (cost + ring + pending), then run every chunk's
        # backtrack under ONE vmap: the per-chunk _emit_tracks scans
        # were the pool tick's bottleneck (each is ~ring_len tiny
        # sequential steps).  Emission inputs are bitwise the per-chunk
        # flow's, so emitted tracks are unchanged.
        def pstep(st, inp):
            chunk_i, i = inp
            st = self._absorb_impl(
                st, chunk_i, jnp.asarray(N, jnp.int32), advance=i < full
            )
            pending = st.n_frames - st.n_out
            e = jnp.clip(pending - self.lookahead, 0, F)
            st = st._replace(n_out=(st.n_out + e).astype(jnp.int32))
            return st, (st.cost, st.ring_ptr, st.ring_pov, pending, e)

        f0b = jnp.zeros((out_n,), dtype)
        ncb = jnp.zeros((out_n,), dtype)
        ne = jnp.zeros((), jnp.int32)
        if k_steps:
            chunks = combined[: k_steps * N].reshape(k_steps, N)
            state, (costs, rps, rvs, pendings, es) = jax.lax.scan(
                pstep, state, (chunks, jnp.arange(k_steps))
            )
            f0s, ncs = jax.vmap(
                lambda c, rp, rv, p, e: self._emit_tracks(c, rp, rv, p, e, F)
            )(costs, rps, rvs, pendings, es)
            # pack the per-chunk prefixes: rows >= e are zeros onto
            # zeros (output buffers start zero and only [0, ne) is ever
            # written), so each fixed-width update at the traced offset
            # appends exactly e rows; k_steps is static, so this is a
            # plain Python loop, not a scan
            for i in range(k_steps):
                f0b = jax.lax.dynamic_update_slice(f0b, f0s[i], (ne,))
                ncb = jax.lax.dynamic_update_slice(ncb, ncs[i], (ne,))
                ne = (ne + es[i]).astype(jnp.int32)
        stage = jax.lax.dynamic_slice(
            combined, ((full * N).astype(jnp.int32),), (N,)
        )
        state = state._replace(
            stage=stage, n_stage=(total_in - full * N).astype(jnp.int32)
        )
        return state, jnp.stack([f0b, ncb], axis=-1), ne

    def _finalize_impl(self, state: PitchStreamState):
        """Absorb the staged remainder as the final (masked) chunk, flush
        the front-end's emission delay with zero chunks, and emit every
        pending frame — the tail is the exact offline Viterbi optimum.
        Returns ``(feats (ring_len, 2), n_valid)``."""
        state = self._absorb_impl(
            state, state.stage, state.n_stage, advance=True
        )
        if self.k_flush:
            zeros = jnp.zeros((self.k_flush, self.chunk_size), self._dtype)

            def fstep(st, z):
                return (
                    self._absorb_impl(
                        st, z, jnp.zeros((), jnp.int32), advance=True
                    ),
                    None,
                )

            state, _ = jax.lax.scan(fstep, state, zeros)
        pending = state.n_frames - state.n_out
        f0, nccf = self._emit_tracks(
            state.cost,
            state.ring_ptr,
            state.ring_pov,
            pending,
            pending,
            self.ring_len,
        )
        return jnp.stack([f0, nccf], axis=-1), pending

    # public entry points --------------------------------------------------

    def process(self, state: PitchStreamState, samples, valid_len=None):
        """Consume a sample buffer (width any multiple of
        ``chunk_size``); returns ``(state, track)`` with ``track`` a
        prefix-valid :class:`~speech_tpu.ops.pitch.PitchTrack`.

        ``valid_len`` marks the real prefix (default: all); any
        chunking streams — short valids stage until a full aligned
        chunk accumulates, exactly like the other streamers."""
        from .ops.pitch import PitchTrack

        W = samples.shape[-1]
        if W < self.chunk_size or W % self.chunk_size:
            raise ValueError(
                f"sample buffers must be a multiple of chunk_size "
                f"({self.chunk_size}); got {W} (zero-pad and pass "
                f"valid_len instead)"
            )
        if valid_len is None:
            valid_len = W
        state, feats, ne = self._process(state, samples, valid_len)
        return state, PitchTrack(
            feats[..., 0], feats[..., 1], jnp.arange(feats.shape[-2]) < ne
        )

    def finalize(self, state: PitchStreamState):
        """Flush staging, the front-end delay, and the Viterbi lookahead;
        returns the final prefix-valid
        :class:`~speech_tpu.ops.pitch.PitchTrack` — its frames are
        exactly offline-optimal."""
        from .ops.pitch import PitchTrack

        feats, ne = self._finalize(state)
        return PitchTrack(
            feats[..., 0], feats[..., 1], jnp.arange(feats.shape[-2]) < ne
        )

    def scan(self, signal, sig_len=None):
        """Whole-utterance streaming under one jitted program; returns
        ``(feats (n_steps, max_frames_chunk, 2), counts, fin_feats,
        fin_count)`` — the same layout as the other streamers' scan."""
        C = self.chunk_size
        buf_len = signal.shape[0]
        n_steps = max(1, -(-buf_len // C))
        if sig_len is None:
            sig_len = buf_len
        signal = jnp.asarray(signal, self._dtype)
        padded = jnp.pad(signal, (0, n_steps * C - buf_len))
        chunks = padded.reshape(n_steps, C)
        valids = jnp.clip(
            jnp.asarray(sig_len, jnp.int32) - jnp.arange(n_steps) * C, 0, C
        )

        def step(state, inp):
            chunk, v = inp
            state, feats, ne = self._process_impl(state, chunk, v)
            return state, (feats, ne)

        state, (feats, counts) = jax.lax.scan(
            step, self.init_state(), (chunks, valids)
        )
        fin_feats, fin_count = self._finalize_impl(state)
        return feats, counts, fin_feats, fin_count

    def transform(self, signal: np.ndarray):
        """Stream a whole signal via :meth:`scan` and return the
        compacted ``(f0, nccf)`` numpy arrays (testing helper)."""
        sig = np.asarray(signal)
        feats, counts, fin_feats, fin_count = jax.jit(self.scan)(
            jnp.asarray(sig, self._dtype), len(sig)
        )
        feats, counts = np.asarray(feats), np.asarray(counts)
        rows = [feats[i, : counts[i]] for i in range(feats.shape[0])]
        rows.append(np.asarray(fin_feats)[: int(fin_count)])
        out = np.concatenate(rows)
        return out[:, 0], out[:, 1]
