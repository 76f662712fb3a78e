"""Framing: slicing signals into (possibly overlapping) analysis frames.

The reference materializes a symmetrically padded copy of the signal and
loops frame-by-frame in Python (reference: compute.py:574-607).  The
production path here is :func:`pad_signal` (device symmetric padding for a
traced true length — flips, one tiny edge gather, one
dynamic_update_slice) followed by :func:`frame_padded` (overlapped frames
as static strided slices via a gcd row decomposition, which XLA compiles
to plain copies).  An index-gather formulation (:func:`frame_signal`) is
kept for the halo-sharded path and as a reference: it is algebraically
identical but lowers to a TPU gather, which measured ~200x slower at
production batch sizes.
"""

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "frame_count",
    "frame_count_np",
    "left_pad_width",
    "frame_signal",
    "pad_signal_np",
    "frame_padded",
]


def left_pad_width(
    frame_style: str, frame_length: int, frame_shift: int, kaldi_shift: bool
) -> int:
    """Samples of left context before sample 0 of the signal.

    Matches the reference's framing modes (reference: compute.py:76-84,
    280-285, 583-587): 0 for causal framing; for centered framing either the
    Kaldi convention (``kaldi_shift=True``) or the reference's own.
    """
    if frame_style == "causal":
        return 0
    if kaldi_shift:
        return frame_length // 2 - frame_shift // 2
    return (frame_length + 1) // 2 - 1


def frame_count_np(sig_len: int, frame_length: int, frame_shift: int) -> int:
    """Number of frames ``compute_full`` produces for a signal (host math).

    ``(len + shift // 2) // shift``, but 0 for signals shorter than half a
    frame (reference: compute.py:580-596).
    """
    if sig_len < frame_length // 2 + 1:
        return 0
    return max(0, (sig_len + frame_shift // 2) // frame_shift)


def frame_count(sig_len, frame_length: int, frame_shift: int):
    """Traced-value version of :func:`frame_count_np`."""
    n = jnp.maximum(0, (sig_len + frame_shift // 2) // frame_shift)
    return jnp.where(sig_len < frame_length // 2 + 1, 0, n)


def reflect_index(pos, length):
    """Map arbitrary integer positions onto ``[0, length)`` by symmetric
    reflection.

    Equivalent to indexing a ``numpy.pad(..., mode="symmetric")``-padded
    signal at any depth of reflection: ``..., x1, x0 | x0, x1, ..., xl-1 |
    xl-1, ..., x0 | x0, ...``.
    """
    period = 2 * length
    m = jnp.mod(pos, period)  # jnp.mod is floor-mod: negatives land in range
    return jnp.where(m < length, m, period - 1 - m)


def frame_signal(
    signal,
    sig_len,
    max_frames: int,
    frame_length: int,
    frame_shift: int,
    pad_left: int,
):
    """Gather ``(max_frames, frame_length)`` frames out of a 1D buffer.

    ``signal`` is a fixed-size buffer whose first ``sig_len`` samples are
    valid (``sig_len`` may be traced).  Frame ``k`` covers virtual positions
    ``k * frame_shift - pad_left + t`` for ``t in [0, frame_length)``;
    positions outside ``[0, sig_len)`` resolve by symmetric reflection,
    reproducing the reference's ``numpy.pad(..., "symmetric")`` semantics
    without materializing the pad.  Rows beyond the true frame count contain
    reflected garbage and must be masked by the caller.
    """
    k = jnp.arange(max_frames)[:, None] * frame_shift - pad_left
    pos = k + jnp.arange(frame_length)[None, :]
    safe_len = jnp.maximum(sig_len, 1)
    idx = reflect_index(pos, safe_len)
    return jnp.take(signal, idx, axis=0, unique_indices=False)


def frame_positions_np(num_frames: int, frame_length: int, frame_shift: int):
    """Host-side frame start positions (padded coordinates)."""
    return np.arange(num_frames) * frame_shift


def pad_signal_full(signal, frame_length: int, pad_left: int,
                    min_len: int = 0):
    """Symmetric padding for a fully-valid buffer — static ops only.

    Equivalent to :func:`pad_signal` when ``sig_len == len(signal) >=
    frame_length``, but with no traced-offset op touching the buffer:
    under ``vmap``, :func:`pad_signal`'s small per-signal
    ``take``/``dynamic_update_slice`` lower to gathers/scatters that cost
    ~2.5 ms on the v5e headline batch — a quarter of the whole pipeline.
    Callers must guarantee every row is valid to its end (the
    ``compute_batch`` host-lengths fast path does).

    ``min_len`` right-pads with zeros to at least that length IN THE
    SAME concat — the Pallas kernels need their row-segment length, and
    folding it here saves them a second whole-buffer pad copy
    (~0.3 ms/call on the v5e headline batch).
    """
    pieces = [
        jnp.flip(signal[:pad_left]),
        signal,
        jnp.flip(signal[-frame_length:]),
    ]
    base = pad_left + signal.shape[0] + frame_length
    if min_len > base:
        pieces.append(jnp.zeros((min_len - base,), signal.dtype))
    return jnp.concatenate(pieces)


def pad_signal_np(
    signal: np.ndarray,
    sig_len: int,
    frame_length: int,
    frame_shift: int,
    pad_left: int,
    out: np.ndarray = None,
):
    """Assemble the symmetrically padded stream for static framing (host).

    Writes ``[reflect(pad_left) | signal | reflect(pad_right)]`` into
    ``out`` (or a new array), where ``pad_right`` completes the last frame
    per the reference's batch semantics (reference: compute.py:596-600).
    Returns ``(padded, num_frames)`` either way (``padded`` is the fresh
    array, or ``out`` itself when given).  The padding regions are at most
    ``frame_length`` samples — a negligible host memcpy — and let the
    device frame with static slices instead of gathers.
    """
    num_frames = frame_count_np(sig_len, frame_length, frame_shift)
    total = max(0, (num_frames - 1) * frame_shift + frame_length)
    pad_right = max(0, total - pad_left - sig_len)
    padded = np.pad(signal[:sig_len], (pad_left, pad_right), "symmetric")
    if out is not None:
        out[: len(padded)] = padded
        return out, num_frames
    return padded, num_frames


def pad_signal(signal, sig_len, frame_length: int, frame_shift: int, pad_left: int):
    """Device-side symmetric padding with a traced true length.

    ``signal`` is a fixed-size buffer whose first ``sig_len`` samples are
    valid.  Returns a ``(pad_left + buf_len + frame_length,)`` buffer laid
    out as ``[reflect(pad_left) | signal | reflect(...)]`` using only
    flips, a roll, and one dynamic_update_slice — no gather (TPU gathers
    are catastrophically slow; see :func:`frame_padded`).  Single-depth
    reflection, which covers every case where the frame count is nonzero.
    Contents past the right reflection are unspecified (they only feed
    frame rows past the true frame count, which callers mask).
    """
    left = jnp.flip(signal[:pad_left])
    padded = jnp.concatenate(
        [left, signal, jnp.zeros((frame_length,), signal.dtype)]
    )
    # right reflection (any depth): padded[pad_left + sig_len + k] =
    # sym(sig_len + k).  This gather is only frame_length elements per
    # signal — negligible, unlike gathering whole frames.
    pos = reflect_index(
        sig_len + jnp.arange(frame_length), jnp.maximum(sig_len, 1)
    )
    rtail = jnp.take(signal, pos, axis=0)
    return jax.lax.dynamic_update_slice(padded, rtail, (pad_left + sig_len,))


def frame_padded(padded, max_frames: int, frame_length: int, frame_shift: int):
    """Frame an already-padded buffer with static strided slices (no
    gather).

    Decomposes by ``g = gcd(frame_length, frame_shift)``: the buffer is
    viewed as rows of ``g`` samples and frame ``k`` is rows
    ``[k*shift/g, k*shift/g + length/g)`` — each row-column ``j`` of the
    output is one strided slice, so the whole framing compiles to plain
    copies (TPU gathers are catastrophically slow; slices are free).
    """
    g = int(np.gcd(frame_length, frame_shift))
    rows_per_frame = frame_length // g
    row_step = frame_shift // g
    need_rows = (max_frames - 1) * row_step + rows_per_frame
    need = need_rows * g
    buf_len = padded.shape[0]
    if buf_len < need:
        padded = jnp.pad(padded, (0, need - buf_len))
    rows = padded[: need_rows * g].reshape(need_rows, g)
    cols = [
        jax.lax.slice(
            rows,
            (j, 0),
            (j + (max_frames - 1) * row_step + 1, g),
            (row_step, 1),
        )
        for j in range(rows_per_frame)
    ]
    return jnp.concatenate(cols, axis=1).reshape(max_frames, frame_length)
