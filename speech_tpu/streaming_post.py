"""Jittable streaming post-processing: online deltas, CMVN, PCEN, DCT, …

The batch pipelines apply post-processors over whole feature matrices
(:mod:`speech_tpu.post` on host, :mod:`speech_tpu.ops.postops` fused
on device), but a serving stack consumes features *online* — Kaldi's
``online2`` exists exactly because deltas, sliding CMVN, and splicing
need lookahead-bounded streaming forms (the reference library has no
streaming post-processing at all; reference: post.py applies to full
tensors only).  This module is the explicit-carry streaming tier for
the post-op family, built like :mod:`speech_tpu.streaming`: state is a
pytree of static shapes, ``_step_impl``/``_finalize_impl`` are pure
(jit/vmap/scan-safe), a ``valid 0`` step is a bitwise no-op on the
state (so idle :class:`~speech_tpu.serve.StreamPool` slots tick for
free), and frame blocks are prefix-valid ``(capacity, F)`` buffers
with a traced valid count.

Semantics contract: concatenating every step's valid rows plus the
finalize flush equals the batch post-op applied to the full feature
matrix — exactly for the ops whose math is frame-local or integral
(splice, stack, DCT, PLP, standardize), and to reduction roundoff for
the windowed/recursive ones (deltas, sliding CMVN, PCEN), whose
streaming forms re-associate sums.  Lookahead-delayed ops (deltas,
splice, centered sliding CMVN) emit late and flush on finalize, so
edge replication matches the batch edges bit-for-bit in shape.

:class:`StreamingPipeline` fuses a signal streamer
(:class:`~speech_tpu.streaming.StreamingSTFT`/``SI``/``Pitch``) with a
post chain under one jitted program and honors the streamer contract,
so :class:`~speech_tpu.serve.StreamPool` and
:class:`~speech_tpu.serve.StreamServer` multiplex fully post-processed
sessions unchanged.
"""

import abc

import numpy as np

import jax
import jax.numpy as jnp

from .ops.postops import _pcen_compress, delta_filters

__all__ = [
    "StreamingDeltas",
    "StreamingFrameLocal",
    "StreamingPCEN",
    "StreamingPipeline",
    "StreamingPostChain",
    "StreamingPostOp",
    "StreamingSlidingCMVN",
    "StreamingSplice",
    "StreamingStack",
    "StreamingVAD",
    "streaming_post_op",
]


def _scrub(frames, nin):
    """Zero rows at/after the valid count (garbage must never reach
    arithmetic that could overflow into valid rows)."""
    cap = frames.shape[0]
    nin = jnp.clip(jnp.asarray(nin, jnp.int32), 0, cap)
    mask = (jnp.arange(cap) < nin)[:, None]
    return jnp.where(mask, frames, 0), nin


class StreamingPostOp(abc.ABC):
    """One post-processor's streaming twin.

    Subclasses implement the pure pair ``_step_impl(state, frames,
    n_valid) -> (state, out, n_out)`` and ``_finalize_impl(state) ->
    (out, n_out)`` over prefix-valid ``(capacity, F)`` frame blocks,
    plus the static-capacity bookkeeping (``step_cap``/``fin_cap``/
    ``out_width``) the chain uses to size buffers.
    """

    @abc.abstractmethod
    def out_width(self, in_width: int) -> int:
        """Feature width of the output given the input width."""

    def step_cap(self, in_cap: int) -> int:
        """Max valid output rows for a step of ``in_cap`` input rows."""
        return in_cap

    def fin_cap(self) -> int:
        """Max valid output rows from :meth:`_finalize_impl`."""
        return 0

    @abc.abstractmethod
    def init_state(self, in_width: int, dtype=None):
        """Fresh carry pytree for ``in_width``-wide input frames.

        ``dtype`` sets the float leaves (default: jax's default float,
        which respects ``jax_enable_x64``)."""

    @abc.abstractmethod
    def _step_impl(self, state, frames, n_valid):
        ...

    def _finalize_impl(self, state):
        floats = [
            leaf
            for leaf in jax.tree_util.tree_leaves(state)
            if jnp.issubdtype(leaf.dtype, jnp.floating)
        ]
        dt = floats[0].dtype if floats else None
        out = jnp.zeros((0, self._fin_width(state)), dt)
        return out, jnp.zeros((), jnp.int32)

    def _fin_width(self, state) -> int:
        raise NotImplementedError  # only ops with fin_cap() == 0 need it


class _FIREdgeOp(StreamingPostOp):
    """Shared machinery for time-FIR ops with edge-replication padding.

    Covers :class:`StreamingDeltas` and :class:`StreamingSplice`: each
    output frame ``o`` is a function of the ``K = left + right + 1``
    input frames ``[o-left, o+right]``, where positions before frame 0
    replicate frame 0 and positions past the last frame replicate it
    (matching ``np.pad(mode="edge")`` in the batch forms).  Emission is
    delayed ``right`` frames; ``finalize`` flushes the tail against the
    replicated last frame.

    The carry holds the last ``left + right`` frames of the virtual
    (edge-extended) stream; once the first frame arrives the carry
    pre-fills with it, realizing the left edge replication with no
    per-frame index logic.  Outputs form by ONE contiguous
    ``dynamic_slice`` aligning the valid region then ``K`` static
    shifted slices — the gather-free pattern every hot path in this
    package uses (TPU gathers are the round-1 lesson).
    """

    def __init__(self, left: int, right: int):
        if left < 0 or right < 0:
            raise ValueError(f"left/right must be >= 0, got {left}/{right}")
        self.left = int(left)
        self.right = int(right)
        self._cl = self.left + self.right  # carried virtual frames

    def fin_cap(self) -> int:
        return self.right

    @abc.abstractmethod
    def _combine(self, slices):
        """Output block from the ``K`` shifted ``(cap, F)`` slices
        (oldest tap first)."""

    def init_state(self, in_width: int, dtype=None):
        return (
            jnp.zeros((self._cl, in_width), dtype),  # virtual-stream tail
            jnp.zeros((), jnp.int32),  # frames seen
            jnp.ones((), jnp.bool_),  # left edge not yet materialized
        )

    def _windows(self, stream_p, base, cap_out):
        K = self._cl + 1
        window = jax.lax.dynamic_slice_in_dim(
            stream_p, base, cap_out + K - 1, axis=0
        )
        return [
            jax.lax.slice_in_dim(window, k, k + cap_out, axis=0)
            for k in range(K)
        ]

    def _step_impl(self, state, frames, n_valid):
        buf, seen, is_first = state
        frames, nin = _scrub(frames, n_valid)
        cap = frames.shape[0]
        if cap == 0:
            out = jnp.zeros((0, self.out_width(frames.shape[1])), frames.dtype)
            return state, out, jnp.zeros((), jnp.int32)
        CL, R = self._cl, self.right
        buf = buf.astype(frames.dtype)
        if CL:
            prefill = jnp.broadcast_to(frames[0], buf.shape)
            buf = jnp.where(is_first & (nin > 0), prefill, buf)
        stream = jnp.concatenate([buf, frames])
        old_em = jnp.maximum(0, seen - R)
        new_em = jnp.maximum(0, seen + nin - R)
        nout = new_em - old_em
        # output o reads virtual frames [o-left, o+right]; virtual frame
        # t sits at stream row t - seen + CL
        base = (old_em - self.left - seen + CL).astype(jnp.int32)
        stream_p = (
            jnp.concatenate(
                [stream, jnp.zeros((R, stream.shape[1]), stream.dtype)]
            )
            if R
            else stream
        )
        out = self._combine(self._windows(stream_p, base, cap))
        new_buf = (
            jax.lax.dynamic_slice_in_dim(stream, nin, CL, axis=0)
            if CL
            else buf
        )
        return (
            (new_buf, (seen + nin).astype(jnp.int32), is_first & (nin == 0)),
            out,
            nout.astype(jnp.int32),
        )

    def _finalize_impl(self, state):
        buf, seen, _ = state
        CL, R = self._cl, self.right
        F = buf.shape[1]
        if R == 0:
            return (
                jnp.zeros((0, self.out_width(F)), buf.dtype),
                jnp.zeros((), jnp.int32),
            )
        last = buf[-1]  # frame seen-1 (tail-valid; zeros when seen == 0)
        fin_stream = jnp.concatenate(
            [buf, jnp.broadcast_to(last, (R, F)), jnp.zeros((R, F), buf.dtype)]
        )
        old_em = jnp.maximum(0, seen - R)
        nout = seen - old_em
        base = (old_em - self.left - seen + CL).astype(jnp.int32)
        out = self._combine(self._windows(fin_stream, base, R))
        return out, nout.astype(jnp.int32)


class StreamingDeltas(_FIREdgeOp):
    """Online :class:`speech_tpu.post.Deltas` (edge padding,
    concatenating form): emits ``[x | d1 | .. | dN]`` rows delayed by
    ``num_deltas * context_window`` frames; stream output equals the
    batch op to reduction roundoff.
    """

    def __init__(self, num_deltas: int, context_window: int = 2):
        if num_deltas < 1:
            raise ValueError(f"num_deltas must be >= 1, got {num_deltas}")
        if context_window < 1:
            raise ValueError(
                f"context_window must be >= 1, got {context_window}"
            )
        self.num_deltas = int(num_deltas)
        self.context_window = int(context_window)
        D = self.num_deltas * self.context_window
        super().__init__(D, D)
        # per-group taps over the full [-D, D] window (order 0 = identity)
        K = 2 * D + 1
        coeffs = np.zeros((self.num_deltas + 1, K))
        coeffs[0, D] = 1.0
        for d, filt in enumerate(
            delta_filters(self.num_deltas, self.context_window), start=1
        ):
            off = D - d * self.context_window
            coeffs[d, off : off + len(filt)] = filt
        self._coeffs = coeffs

    def out_width(self, in_width: int) -> int:
        return in_width * (self.num_deltas + 1)

    def _combine(self, slices):
        outs = []
        for g in range(self._coeffs.shape[0]):
            acc = None
            for k, c in enumerate(self._coeffs[g]):
                if c == 0.0:
                    continue
                term = slices[k] * slices[k].dtype.type(c)
                acc = term if acc is None else acc + term
            outs.append(acc)
        return jnp.concatenate(outs, axis=-1)


class StreamingSplice(_FIREdgeOp):
    """Online :class:`speech_tpu.post.Splice` (Kaldi ``splice-feats``):
    emits ``[x[o-left] | .. | x[o+right]]`` rows delayed by ``right``
    frames; stream output equals the batch op bitwise.
    """

    def out_width(self, in_width: int) -> int:
        return in_width * (self.left + self.right + 1)

    def _combine(self, slices):
        return jnp.concatenate(slices, axis=-1)


class StreamingFrameLocal(StreamingPostOp):
    """Streaming twin of any frame-local (stateless along time) op.

    ``fn`` maps a ``(n, F)`` block to ``(n, F')`` rows independently —
    e.g. :func:`speech_tpu.ops.postops.dct`,
    :func:`speech_tpu.ops.plp.plp`,
    :func:`~speech_tpu.ops.postops.standardize_with_stats`.  Stream
    output trivially equals batch.  ``width_fn`` maps input width to
    output width (identity by default).
    """

    def __init__(self, fn, width_fn=None):
        self._fn = fn
        self._width_fn = width_fn or (lambda w: w)

    def out_width(self, in_width: int) -> int:
        return self._width_fn(in_width)

    def init_state(self, in_width: int, dtype=None):
        return jnp.zeros((0, in_width), dtype)  # width/dtype breadcrumb

    def _fin_width(self, state) -> int:
        return self.out_width(state.shape[1])

    def _step_impl(self, state, frames, n_valid):
        frames, nin = _scrub(frames, n_valid)
        if frames.shape[0] == 0:
            out = jnp.zeros((0, self.out_width(frames.shape[1])), frames.dtype)
            return state, out, nin
        return state, self._fn(frames), nin


class StreamingPCEN(StreamingPostOp):
    """Online :class:`speech_tpu.post.PCEN`: the per-channel IIR
    smoother carries across chunks (``M_{-1}`` = first frame's energy,
    matching the batch start), the compression stage shares
    :func:`speech_tpu.ops.postops.pcen`'s exact formulation.  No
    lookahead; stream equals batch to reduction roundoff (the batch
    smoother is an associative scan, the stream re-associates it at
    chunk boundaries).
    """

    def __init__(
        self,
        smooth=0.025,
        alpha=0.98,
        delta=2.0,
        power=0.5,
        eps: float = 1e-6,
    ):
        self.smooth = smooth
        self.alpha = alpha
        self.delta = delta
        self.power = power
        self.eps = float(eps)

    def out_width(self, in_width: int) -> int:
        return in_width

    def init_state(self, in_width: int, dtype=None):
        return (
            jnp.zeros((in_width,), dtype),  # smoother state M
            jnp.zeros((), jnp.bool_),  # smoother initialized
        )

    def _fin_width(self, state) -> int:
        return state[0].shape[0]

    def _step_impl(self, state, frames, n_valid):
        m_prev, started = state
        frames, nin = _scrub(frames, n_valid)
        cap, F = frames.shape
        if cap == 0:
            return state, frames, nin
        dt = frames.dtype
        smooth = jnp.asarray(self.smooth, dt)
        decay = 1.0 - smooth
        valid = (jnp.arange(cap) < nin)[:, None]
        # invalid rows are scan identities (a=1, b=0): the smoother
        # carries through them untouched
        a = jnp.where(valid, jnp.broadcast_to(decay, frames.shape), 1.0)
        b = jnp.where(valid, smooth * frames, 0.0)
        first = frames[0]
        m0 = jnp.where(started, m_prev.astype(dt), first)
        b0 = decay * m0 + smooth * first
        b = jnp.concatenate(
            [jnp.where(valid[0], b0, 0.0)[None], b[1:]], axis=0
        )

        def combine(left, right):
            a_l, b_l = left
            a_r, b_r = right
            return a_l * a_r, b_l * a_r + b_r

        _, m = jax.lax.associative_scan(combine, (a, b), axis=0)
        out = _pcen_compress(
            frames, m, self.alpha, self.delta, self.power, self.eps
        )
        m_new = jnp.where(nin > 0, m[-1], m_prev.astype(dt))
        return (m_new, started | (nin > 0)), out, nin


class StreamingSlidingCMVN(StreamingPostOp):
    """Online :class:`speech_tpu.post.SlidingCMVN` (Kaldi
    ``apply-cmvn-sliding``).

    Non-centered (``center=False``, Kaldi's online mode): emission
    stalls only until ``min_window`` frames exist (early frames borrow
    lookahead exactly as the batch op does), then is causal.  Centered:
    each frame waits for its half-window of future context —
    ``window - window//2`` frames of latency — and the finalize flush
    applies the end-of-stream window clipping, so stream == batch
    (to summation roundoff: the stream re-derives window sums from its
    own prefix table each step).
    """

    def __init__(
        self,
        window: int = 600,
        center: bool = True,
        norm_var: bool = False,
        min_window: int = 100,
    ):
        if window < 1:
            raise ValueError(f"window must be positive, got {window}")
        if min_window < 1:
            raise ValueError(f"min_window must be positive, got {min_window}")
        if min_window > window:
            raise ValueError(
                f"streaming requires min_window <= window, got "
                f"{min_window} > {window}"
            )
        self.window = int(window)
        self.center = bool(center)
        self.norm_var = bool(norm_var)
        self.min_window = int(min_window)
        self._extra = (
            self.window // 2 + 1 if self.center else self.min_window - 1
        )

    def out_width(self, in_width: int) -> int:
        return in_width

    def step_cap(self, in_cap: int) -> int:
        return in_cap + self._extra

    def fin_cap(self) -> int:
        return self.window - 1 if self.center else self.min_window - 1

    def init_state(self, in_width: int, dtype=None):
        return (
            # ring: last `window` frames (zeros before the stream head —
            # the prefix-sum zero-region argument in _step_impl relies
            # on it)
            jnp.zeros((self.window, in_width), dtype),
            jnp.zeros((), jnp.int32),  # frames seen
        )

    def _emitted(self, seen):
        w = self.window
        if self.center:
            return jnp.where(seen >= w, seen - (w - w // 2) + 1, 0)
        return jnp.where(seen >= self.min_window, seen, 0)

    def _bounds(self, o, total=None):
        """Per-output window ``[lo, hi)`` (Kaldi's clipping rules);
        ``total`` applies the end-of-stream clamp (finalize only —
        mid-stream emission guarantees it cannot bind)."""
        w = self.window
        if self.center:
            lo0 = jnp.maximum(o - w // 2, 0)
            hi = lo0 + w
        else:
            hi = jnp.maximum(o + 1, self.min_window)
        if total is not None:
            hi = jnp.minimum(hi, total)
        lo = jnp.maximum(hi - w, 0)
        return lo, hi

    def _normalize(self, stream_p, row0, cap_out, lo, hi):
        """Outputs for frames at consecutive rows starting ``row0`` of
        the zero-left-padded buffer ``stream_p`` whose row ``r`` holds
        virtual frame ``r + (base virtual index)``; ``lo``/``hi`` are
        the per-output virtual window bounds shifted into row coords by
        the caller."""
        F = stream_p.shape[1]
        x = jax.lax.dynamic_slice_in_dim(stream_p, row0, cap_out, axis=0)
        cum = jnp.cumsum(stream_p, axis=0)
        zero = jnp.zeros((1, F), stream_p.dtype)
        cp = jnp.concatenate([zero, cum], axis=0)
        top = stream_p.shape[0]
        ra = jnp.clip(lo, 0, top)
        rb = jnp.clip(hi, 0, top)
        count = jnp.maximum(hi - lo, 1).astype(stream_p.dtype)[:, None]
        mean = (jnp.take(cp, rb, axis=0) - jnp.take(cp, ra, axis=0)) / count
        out = x - mean
        if self.norm_var:
            cums = jnp.cumsum(stream_p * stream_p, axis=0)
            cps = jnp.concatenate([zero, cums], axis=0)
            var = (
                jnp.take(cps, rb, axis=0) - jnp.take(cps, ra, axis=0)
            ) / count - mean * mean
            out = out * jax.lax.rsqrt(jnp.maximum(var, 1e-10))
        return out

    def _step_impl(self, state, frames, n_valid):
        ring, seen = state
        frames, nin = _scrub(frames, n_valid)
        cap, F = frames.shape
        if cap == 0:
            return state, jnp.zeros((0, F), frames.dtype), jnp.zeros(
                (), jnp.int32
            )
        w = self.window
        cap_out = self.step_cap(cap)
        stream = jnp.concatenate(
            [
                ring.astype(frames.dtype),
                frames,
                jnp.zeros((self._extra, F), frames.dtype),
            ]
        )
        seen2 = seen + nin
        em_old = self._emitted(seen)
        nout = self._emitted(seen2) - em_old
        o = em_old + jnp.arange(cap_out)
        lo, hi = self._bounds(o)
        # virtual frame t sits at stream row t - seen + w (ring rows
        # before the stream head are zeros, so the lo=0 clamp lands in
        # the prefix table's flat-zero region — correct by construction)
        shift = w - seen
        out = self._normalize(
            stream, (em_old + shift).astype(jnp.int32), cap_out,
            lo + shift, hi + shift,
        )
        new_ring = jax.lax.dynamic_slice_in_dim(stream, nin, w, axis=0)
        return (new_ring, seen2.astype(jnp.int32)), out, nout.astype(
            jnp.int32
        )

    def _fin_width(self, state) -> int:
        return state[0].shape[1]

    def _finalize_impl(self, state):
        ring, seen = state
        w = self.window
        F = ring.shape[1]
        cap_fin = self.fin_cap()
        if cap_fin == 0:
            return jnp.zeros((0, F)), jnp.zeros((), jnp.int32)
        em = self._emitted(seen)
        nout = seen - em
        o = em + jnp.arange(cap_fin)
        lo, hi = self._bounds(o, total=seen)
        stream_p = jnp.concatenate([ring, jnp.zeros((cap_fin, F), ring.dtype)])
        shift = w - seen
        out = self._normalize(
            stream_p, jnp.clip(em + shift, 0, w).astype(jnp.int32), cap_fin,
            lo + shift, hi + shift,
        )
        return out, nout.astype(jnp.int32)


class StreamingStack(StreamingPostOp):
    """Online :class:`speech_tpu.post.Stack`: every ``num_vectors``
    consecutive frames merge into one wide frame; the remainder is
    dropped (``pad=False``) or edge-padded to a final frame at
    finalize (``pad=True``).  Stream equals batch bitwise.
    """

    def __init__(self, num_vectors: int, pad: bool = False):
        if num_vectors < 1:
            raise ValueError(
                f"num_vectors must be positive, got {num_vectors}"
            )
        self.num_vectors = int(num_vectors)
        self.pad = bool(pad)

    def out_width(self, in_width: int) -> int:
        return in_width * self.num_vectors

    def step_cap(self, in_cap: int) -> int:
        return (self.num_vectors - 1 + in_cap) // self.num_vectors

    def fin_cap(self) -> int:
        return 1 if self.pad else 0

    def init_state(self, in_width: int, dtype=None):
        return (
            jnp.zeros((self.num_vectors - 1, in_width), dtype),  # head-valid
            jnp.zeros((), jnp.int32),
        )

    def _step_impl(self, state, frames, n_valid):
        carry, cnt = state
        frames, nin = _scrub(frames, n_valid)
        cap, F = frames.shape
        m = self.num_vectors
        if cap == 0:
            out = jnp.zeros((0, F * m), frames.dtype)
            return state, out, jnp.zeros((), jnp.int32)
        # head-valid compaction (both sides zero past their counts, so
        # the traced-offset paste preserves the zero invariant bitwise)
        carry = carry.astype(frames.dtype)
        combined = jnp.concatenate([carry, jnp.zeros((cap, F), carry.dtype)])
        combined = jax.lax.dynamic_update_slice_in_dim(
            combined, frames, cnt, axis=0
        )
        total = cnt + nin
        nfull = total // m
        ncap = self.step_cap(cap)
        out = combined[: ncap * m].reshape(ncap, m * F)
        # the carry slice may start past cap (nfull*m > cap when a small
        # chunk lands on a nearly-full carry) — right-pad so the slice
        # never clamps (padding rows are zeros, preserving the invariant)
        combined_p = jnp.concatenate(
            [combined, jnp.zeros((m - 1, F), combined.dtype)]
        )
        new_carry = (
            jax.lax.dynamic_slice_in_dim(combined_p, nfull * m, m - 1, axis=0)
            if m > 1
            else carry
        )
        return (
            (new_carry, (total - nfull * m).astype(jnp.int32)),
            out,
            nfull.astype(jnp.int32),
        )

    def _fin_width(self, state) -> int:
        return state[0].shape[1] * self.num_vectors

    def _finalize_impl(self, state):
        carry, cnt = state
        m = self.num_vectors
        F = carry.shape[1]
        if not self.pad or m == 1:
            return jnp.zeros((0, F * m), carry.dtype), jnp.zeros(
                (), jnp.int32
            )
        # rows past cnt-1 replicate the last valid frame (batch: np.pad
        # edge over the remainder); cnt <= m-1 so indices stay in carry
        idx = jnp.clip(jnp.arange(m), 0, jnp.maximum(cnt - 1, 0))
        out = jnp.take(carry, idx, axis=0).reshape(1, m * F)
        return out, (cnt > 0).astype(jnp.int32)


class StreamingVAD(StreamingPostOp):
    """Online energy VAD with voiced-frame selection.

    The streaming twin of :func:`speech_tpu.ops.vad.energy_vad` +
    ``select-voiced-frames`` (the batch CLIs' ``--vad-trim`` step), for
    serving stacks that must endpoint/trim online.  A frame is voiced
    when at least ``proportion_threshold`` of its ``[-w, w]`` context
    window's log energies (``w = frames_context``, edge-clipped like
    Kaldi's ``den_count``) exceed a threshold; emission is therefore
    delayed ``w`` frames and ``finalize`` flushes the tail.

    Threshold semantics: with ``energy_mean_scale == 0`` the threshold
    is the fixed ``energy_threshold`` and the stream's selected frames
    equal the batch op's **exactly**, any chunking.  With a nonzero
    scale the batch op's utterance-global mean is not causal; the
    stream uses the *running* mean over the first ``o + w + 1``
    energies — every frame that has arrived when frame ``o``'s decision
    is due — which makes decisions chunk-size invariant by
    construction (and equal to the batch rule in the limit of a
    lookahead covering the utterance).

    ``emit="select"`` (default) compacts voiced rows to the block
    prefix (``n_out`` = voiced count) so the op composes in a
    :class:`StreamingPostChain` as a true frame filter;
    ``emit="flag"`` passes every decided frame through with a trailing
    0/1 voiced column for caller-side policies (endpointing).

    Parameters follow :func:`~speech_tpu.ops.vad.energy_vad`;
    ``energy_idx`` selects the log-energy column (the computers'
    ``include_energy`` convention puts it first).
    """

    def __init__(
        self,
        energy_threshold: float = 5.0,
        energy_mean_scale: float = 0.5,
        frames_context: int = 0,
        proportion_threshold: float = 0.6,
        energy_idx: int = 0,
        emit: str = "select",
    ):
        if frames_context < 0:
            raise ValueError(
                f"frames_context must be >= 0, got {frames_context}"
            )
        if not 0.0 < proportion_threshold < 1.0:
            raise ValueError(
                f"proportion_threshold must be in (0, 1), got "
                f"{proportion_threshold}"
            )
        if energy_mean_scale < 0:
            raise ValueError(
                f"energy_mean_scale must be >= 0, got {energy_mean_scale}"
            )
        if emit not in ("select", "flag"):
            raise ValueError(f"emit must be 'select' or 'flag', got {emit}")
        self.energy_threshold = float(energy_threshold)
        self.energy_mean_scale = float(energy_mean_scale)
        self.w = int(frames_context)
        self.proportion_threshold = float(proportion_threshold)
        self.energy_idx = int(energy_idx)
        self.emit = emit

    def out_width(self, in_width: int) -> int:
        return in_width if self.emit == "select" else in_width + 1

    def fin_cap(self) -> int:
        return self.w

    def init_state(self, in_width: int, dtype=None):
        w = self.w
        zf = jnp.zeros((), dtype)
        return (
            jnp.zeros((w, in_width), dtype),  # frames [seen-w, seen)
            jnp.zeros((2 * w,), zf.dtype),  # energies [seen-2w, seen)
            zf,  # sum of energies [0, seen-2w)
            jnp.zeros((), jnp.int32),  # frames seen
        )

    def _decide(self, ewin, base_abs, pre_total, total_frames, cap):
        """Voiced flags for ``cap`` outputs whose first absolute frame
        index is ``base_abs``; ``ewin[i + k]`` is the energy of output
        ``i``'s window tap ``k`` (absolute frame ``base_abs + i - w +
        k``), zero outside the stream.  ``total_frames`` bounds the
        right edge (traced; only binds at finalize)."""
        w = self.w
        i_idx = jnp.arange(cap)
        o_abs = base_abs + i_idx
        if self.energy_mean_scale:
            cume = jnp.cumsum(ewin)
            # threshold for output o: running mean over energies
            # [0, min(o + w, total - 1)]; rows of ewin before/after the
            # stream are zeros, so the clipped cumulative read is exact
            hi = jnp.minimum(o_abs + w, total_frames - 1)
            n_hi = (hi - (base_abs - w)).astype(jnp.int32)  # ewin row of hi
            cnt = jnp.maximum(hi + 1, 1)
            run = pre_total + jnp.take(cume, jnp.clip(n_hi, 0, cap + 2 * w - 1))
            thresh = self.energy_threshold + self.energy_mean_scale * (
                run / cnt.astype(ewin.dtype)
            )
        else:
            thresh = jnp.full((cap,), self.energy_threshold, ewin.dtype)
        num = jnp.zeros((cap,), jnp.int32)
        den = jnp.zeros((cap,), jnp.int32)
        for k in range(2 * w + 1):
            j_abs = o_abs - w + k
            tap = jax.lax.slice_in_dim(ewin, k, k + cap, axis=0)
            ok = (j_abs >= 0) & (j_abs < total_frames)
            num = num + (ok & (tap > thresh)).astype(jnp.int32)
            den = den + ok.astype(jnp.int32)
        return num >= self.proportion_threshold * jnp.maximum(den, 1)

    def _emit_block(self, out_frames, voiced, nout):
        cap = out_frames.shape[0]
        decided = jnp.arange(cap) < nout
        if self.emit == "flag":
            flags = jnp.where(decided, voiced, False)
            out = jnp.concatenate(
                [out_frames, flags.astype(out_frames.dtype)[:, None]], -1
            )
            return out, nout.astype(jnp.int32)
        # select: stable-partition voiced decided rows to the prefix
        # (0 = keep, 1 = decided unvoiced, 2 = undecided garbage)
        key = jnp.where(decided, jnp.where(voiced, 0, 1), 2)
        order = jnp.argsort(key, stable=True)
        out = jnp.take(out_frames, order, axis=0)
        n_sel = jnp.sum((key == 0).astype(jnp.int32))
        return out, n_sel

    def _step_impl(self, state, frames, n_valid):
        feat_buf, e_buf, ptot, seen = state
        frames, nin = _scrub(frames, n_valid)
        cap, F = frames.shape
        if cap == 0:
            out = jnp.zeros((0, self.out_width(F)), frames.dtype)
            return state, out, jnp.zeros((), jnp.int32)
        w = self.w
        feat_buf = feat_buf.astype(frames.dtype)
        e_buf = e_buf.astype(frames.dtype)
        ptot = ptot.astype(frames.dtype)
        fstream = jnp.concatenate([feat_buf, frames])  # [seen-w, seen+cap)
        estream = jnp.concatenate(
            [e_buf, frames[:, self.energy_idx]]
        )  # [seen-2w, seen+cap)
        old_em = jnp.maximum(0, seen - w)
        new_em = jnp.maximum(0, seen + nin - w)
        nout = (new_em - old_em).astype(jnp.int32)
        # align once (contiguous dynamic slice), then static shifts
        fbase = (old_em - (seen - w)).astype(jnp.int32)  # in [0, w]
        out_frames = jax.lax.dynamic_slice_in_dim(fstream, fbase, cap, axis=0)
        ewin = jax.lax.dynamic_slice_in_dim(
            jnp.concatenate([estream, jnp.zeros((w,), estream.dtype)]),
            fbase,
            cap + 2 * w,
            axis=0,
        )
        # running-mean bookkeeping: ewin row 0 is absolute frame
        # old_em - w; pre_total covers [0, seen-2w) plus the fbase
        # stream rows before the window
        if self.energy_mean_scale:
            head = estream[: 2 * w] if w else estream[:0]
            pre = ptot + jnp.sum(
                jnp.where(jnp.arange(head.shape[0]) < fbase, head, 0)
            )
        else:
            pre = ptot
        voiced = self._decide(
            ewin, old_em, pre, seen + nin + w + 1, cap  # right edge unbound
        )
        out, n_sel = self._emit_block(out_frames, voiced, nout)
        new_feat = (
            jax.lax.dynamic_slice_in_dim(fstream, nin, w, axis=0)
            if w
            else feat_buf
        )
        new_e = (
            jax.lax.dynamic_slice_in_dim(estream, nin, 2 * w, axis=0)
            if w
            else e_buf
        )
        shed = jnp.sum(
            jnp.where(jnp.arange(estream.shape[0]) < nin, estream, 0)
        )
        new_ptot = jnp.where(nin > 0, ptot + shed, ptot)
        return (
            (new_feat, new_e, new_ptot, (seen + nin).astype(jnp.int32)),
            out,
            n_sel,
        )

    def _fin_width(self, state) -> int:
        return self.out_width(state[0].shape[1])

    def _finalize_impl(self, state):
        feat_buf, e_buf, ptot, seen = state
        w = self.w
        F = feat_buf.shape[1]
        if w == 0:
            return (
                jnp.zeros((0, self.out_width(F)), feat_buf.dtype),
                jnp.zeros((), jnp.int32),
            )
        nout = jnp.minimum(seen, w).astype(jnp.int32)
        fb_base = (w - nout).astype(jnp.int32)
        out_frames = jax.lax.dynamic_slice_in_dim(
            jnp.concatenate([feat_buf, jnp.zeros((w, F), feat_buf.dtype)]),
            fb_base,
            w,
            axis=0,
        )
        ewin = jax.lax.dynamic_slice_in_dim(
            jnp.concatenate([e_buf, jnp.zeros((2 * w,), e_buf.dtype)]),
            fb_base,
            3 * w,
            axis=0,
        )
        base_abs = seen - nout
        if self.energy_mean_scale:
            # ewin row 0 is absolute frame base_abs - w = seen - 2w +
            # fb_base; pre covers [0, seen-2w) plus the fb_base rows
            pre = ptot + jnp.sum(
                jnp.where(jnp.arange(2 * w) < fb_base, e_buf, 0)
            )
        else:
            pre = ptot
        voiced = self._decide(ewin, base_abs, pre, seen, w)
        return self._emit_block(out_frames, voiced, nout)


class StreamingPostChain(StreamingPostOp):
    """Sequential composition of streaming post-ops (itself an op).

    Mirrors the batch CLIs' ``--postprocess`` chain order: stage k+1
    consumes stage k's emitted rows.  ``finalize`` flushes stage by
    stage, pushing each flush through the downstream stages, so the
    concatenated output equals the batch chain over the full matrix.
    """

    def __init__(self, ops):
        self.ops = list(ops)
        for op in self.ops:
            if not isinstance(op, StreamingPostOp):
                raise TypeError(
                    f"chain entries must be StreamingPostOp, got {type(op)}"
                )

    def out_width(self, in_width: int) -> int:
        for op in self.ops:
            in_width = op.out_width(in_width)
        return in_width

    def step_cap(self, in_cap: int) -> int:
        for op in self.ops:
            in_cap = op.step_cap(in_cap)
        return in_cap

    def fin_cap(self) -> int:
        total = 0
        for k, op in enumerate(self.ops):
            cap = op.fin_cap()
            for later in self.ops[k + 1 :]:
                cap = later.step_cap(cap)
            total += cap
        return total

    def init_state(self, in_width: int, dtype=None):
        states = []
        for op in self.ops:
            states.append(op.init_state(in_width, dtype))
            in_width = op.out_width(in_width)
        return tuple(states)

    def _step_impl(self, state, frames, n_valid):
        states = list(state)
        cur, ncur = frames, n_valid
        for k, op in enumerate(self.ops):
            states[k], cur, ncur = op._step_impl(states[k], cur, ncur)
        return tuple(states), cur, ncur

    def _finalize_impl(self, state):
        states = list(state)
        blocks = []
        for k, op in enumerate(self.ops):
            cur, ncur = op._finalize_impl(states[k])
            for j in range(k + 1, len(self.ops)):
                states[j], cur, ncur = self.ops[j]._step_impl(
                    states[j], cur, ncur
                )
            blocks.append((cur, ncur))
        # every block carries the final stage's width (the per-op
        # zero-capacity early-outs preserve widths through the pushes)
        total_cap = sum(b.shape[0] for b, _ in blocks)
        width = max((b.shape[1] for b, _ in blocks), default=0)
        dtype = (
            jnp.result_type(*(b.dtype for b, _ in blocks))
            if blocks
            else jnp.float32
        )
        buf = jnp.zeros((total_cap, width), dtype)
        off = jnp.zeros((), jnp.int32)
        for b, nb in blocks:
            if b.shape[0] == 0:
                continue
            b, nb = _scrub(b.astype(dtype), nb)
            buf = jax.lax.dynamic_update_slice_in_dim(buf, b, off, axis=0)
            off = (off + nb).astype(jnp.int32)
        return buf, off


def streaming_post_op(post) -> StreamingPostOp:
    """The streaming twin of a host post-processor instance.

    Maps :mod:`speech_tpu.post` classes onto this module's ops,
    checking that the instance's configuration is streamable (time
    axis 0, feature axis last — the batch CLIs' convention).  Raises
    ``ValueError`` for inherently non-streamable configurations
    (e.g. :class:`~speech_tpu.post.Standardize` without accumulated
    stats normalizes by whole-tensor moments).
    """
    from . import post as _post
    from .ops import postops as _postops
    from .ops.plp import plp as _plp

    if isinstance(post, StreamingPostOp):
        return post
    if isinstance(post, _post.Deltas):
        if not post.concatenate:
            raise ValueError(
                "streaming Deltas supports the concatenating form only"
            )
        if post._target_axis not in (-1, 1):
            raise ValueError(
                "streaming Deltas requires target_axis -1 (feature axis)"
            )
        if post._pad_mode != "edge":
            raise ValueError(
                f"streaming Deltas requires pad_mode='edge', got "
                f"{post._pad_mode!r}"
            )
        if post.num_deltas == 0:  # degenerate: identity
            return StreamingFrameLocal(lambda f: f)
        W = (len(post.filters[1]) - 1) // 2
        return StreamingDeltas(post.num_deltas, W)
    if isinstance(post, _post.Splice):
        if post.time_axis % 2 != 0:
            raise ValueError("streaming Splice requires time_axis 0")
        return StreamingSplice(post.left, post.right)
    if isinstance(post, _post.Stack):
        if post.time_axis % 2 != 0:
            raise ValueError("streaming Stack requires time_axis 0")
        if post._pad_mode not in (None, "edge"):
            raise ValueError(
                f"streaming Stack supports pad_mode None or 'edge', got "
                f"{post._pad_mode!r}"
            )
        return StreamingStack(post.num_vectors, pad=post._pad_mode == "edge")
    if isinstance(post, _post.PCEN):
        if post.time_axis % 2 != 0:
            raise ValueError("streaming PCEN requires time_axis 0")
        return StreamingPCEN(
            post.smooth, post.alpha, post.delta, post.power, post.eps
        )
    if isinstance(post, _post.SlidingCMVN):
        if post.time_axis % 2 != 0:
            raise ValueError("streaming SlidingCMVN requires time_axis 0")
        return StreamingSlidingCMVN(
            post.window, post.center, post.norm_var, post.min_window
        )
    if isinstance(post, _post.DCT):
        num_ceps, lifter = post.num_ceps, post.lifter
        return StreamingFrameLocal(
            lambda f: _postops.dct(f, num_ceps, lifter),
            (lambda w: num_ceps) if num_ceps is not None else None,
        )
    if isinstance(post, _post.PLP):
        center_hz = post.center_hz
        kw = dict(
            order=post.order,
            num_ceps=post.num_ceps,
            compress=post.compress,
            lifter=post.lifter,
            eps=post.eps,
        )
        return StreamingFrameLocal(
            lambda f: _plp(f, center_hz, **kw), lambda w: kw["num_ceps"]
        )
    if isinstance(post, _post.Transform):
        mat = np.asarray(post.matrix)
        out_dim = post.out_dim
        return StreamingFrameLocal(
            lambda f: _postops.transform(f, mat), lambda w: out_dim
        )
    if isinstance(post, _post.VADTrim):
        if post.time_axis % 2 != 0:
            raise ValueError("streaming VADTrim requires time_axis 0")
        if post.energy_mean_scale:
            raise ValueError(
                "streaming VADTrim requires energy_mean_scale 0 (the "
                "utterance-global mean threshold is not causal); build "
                "StreamingVAD directly for the running-mean form"
            )
        return StreamingVAD(
            energy_threshold=post.energy_threshold,
            energy_mean_scale=0.0,
            frames_context=post.frames_context,
            proportion_threshold=post.proportion_threshold,
            energy_idx=post.energy_idx,
        )
    if isinstance(post, _post.Standardize):
        if not post.have_stats:
            raise ValueError(
                "streaming Standardize needs accumulated/loaded statistics "
                "(whole-tensor local standardization is not causal)"
            )
        stats = np.asarray(post.stats)
        norm_var = post._norm_var
        return StreamingFrameLocal(
            lambda f: _postops.standardize_with_stats(f, stats, norm_var)
        )
    raise ValueError(f"no streaming twin for {type(post).__name__}")


class StreamingPipeline:
    """A signal streamer fused with a streaming post chain.

    Honors the streamer contract (``init_state`` /
    ``_process_impl(state, chunk, valid_len)`` /
    ``_finalize_impl(state)`` with prefix-valid outputs and bitwise
    no-op ``valid 0`` steps), so it drops into
    :class:`~speech_tpu.serve.StreamPool` /
    :class:`~speech_tpu.serve.StreamServer` directly::

        computer = STFTFrameComputer(...)
        pipe = StreamingPipeline(computer, [Deltas(2), SlidingCMVN(center=False)],
                                 chunk_size=1600)
        pool = StreamPool(pipe, slots=16)

    Parameters
    ----------
    computer
        A frame computer (STFT/SI — wrapped in its streaming class) or
        a pre-built streamer honoring the contract
        (:class:`~speech_tpu.streaming.StreamingPitch` included).
    postprocessors
        Host post-processor instances (converted via
        :func:`streaming_post_op`) and/or :class:`StreamingPostOp`s,
        applied in order.
    chunk_size
        Chunk size for a computer argument (ignored for a pre-built
        streamer, which carries its own).
    in_width
        Feature width entering the chain; inferred from the computer's
        ``num_coeffs`` (or 2 for a pitch streamer) when omitted.
    """

    def __init__(
        self, computer, postprocessors, chunk_size: int = 1600, in_width=None
    ):
        from .compute import FrameComputer, ShortIntegrationFrameComputer
        from .streaming import StreamingSI, StreamingSTFT

        if hasattr(computer, "init_state") and hasattr(
            computer, "_process_impl"
        ):
            self.stream = computer
        elif isinstance(computer, FrameComputer):
            cls = (
                StreamingSI
                if isinstance(computer, ShortIntegrationFrameComputer)
                else StreamingSTFT
            )
            self.stream = cls(computer, chunk_size)
        else:
            raise ValueError(
                f"expected a frame computer or streamer, got {type(computer)}"
            )
        self.chain = StreamingPostChain(
            [streaming_post_op(p) for p in postprocessors]
        )
        if in_width is None:
            inner = getattr(self.stream, "computer", None)
            if inner is not None and hasattr(inner, "num_coeffs"):
                in_width = inner.num_coeffs
            elif type(self.stream).__name__ == "StreamingPitch":
                in_width = 2
            else:
                raise ValueError(
                    "cannot infer the streamer's feature width; pass "
                    "in_width="
                )
        self.in_width = int(in_width)
        self.num_coeffs = self.chain.out_width(self.in_width)
        self.chunk_size = self.stream.chunk_size
        self._dtype = self.stream._dtype
        self._process = jax.jit(self._process_impl)
        self._finalize = jax.jit(self._finalize_impl)

    def init_state(self):
        return (
            self.stream.init_state(),
            self.chain.init_state(self.in_width, self._dtype),
        )

    def _process_impl(self, state, chunk, valid_len):
        sig_state, post_state = state
        sig_state, feats, nf = self.stream._process_impl(
            sig_state, chunk, valid_len
        )
        post_state, out, nout = self.chain._step_impl(post_state, feats, nf)
        return (sig_state, post_state), out, nout

    def _finalize_impl(self, state):
        sig_state, post_state = state
        fin_feats, fin_n = self.stream._finalize_impl(sig_state)
        post_state, out1, n1 = self.chain._step_impl(
            post_state, fin_feats, fin_n
        )
        out2, n2 = self.chain._finalize_impl(post_state)
        cap1, cap2 = out1.shape[0], out2.shape[0]
        out1, n1 = _scrub(out1, n1)
        buf = jnp.concatenate(
            [out1, jnp.zeros((cap2, out1.shape[1]), out1.dtype)]
        )
        if cap2:
            out2, n2 = _scrub(out2, n2)
            buf = jax.lax.dynamic_update_slice_in_dim(buf, out2, n1, axis=0)
        return buf, (n1 + n2).astype(jnp.int32)

    # public entry points ------------------------------------------------

    def process(self, state, chunk, valid_len=None):
        """Consume one chunk; returns ``(state, feats, n_valid)`` with
        the post chain already applied."""
        if valid_len is None:
            valid_len = chunk.shape[-1]
        return self._process(state, chunk, valid_len)

    def finalize(self, state):
        """Flush the streamer and every post stage; returns
        ``(feats, n_valid)``."""
        return self._finalize(state)

    def transform(self, signal: np.ndarray) -> np.ndarray:
        """Host helper: stream a whole signal chunk by chunk and return
        the concatenated valid rows (for parity testing)."""
        sig = np.asarray(signal)
        C = self.chunk_size
        state = self.init_state()
        outs = []
        for start in range(0, max(len(sig), 1), C):
            piece = sig[start : start + C]
            buf = np.zeros((C,), self._dtype)
            buf[: len(piece)] = piece
            state, feats, n = self.process(state, jnp.asarray(buf), len(piece))
            outs.append(np.asarray(feats)[: int(n)])
        feats, n = self.finalize(state)
        outs.append(np.asarray(feats)[: int(n)])
        return np.concatenate(outs)
