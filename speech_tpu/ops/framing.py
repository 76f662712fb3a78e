"""Framing: slicing signals into (possibly overlapping) analysis frames.

The reference materializes a symmetrically padded copy of the signal and
loops frame-by-frame in Python (reference: compute.py:574-607).  Here frames
are produced by a single gather whose indices bake in the symmetric-padding
math, so no padded copy is ever materialized, the whole thing jits, and it
works on batches of *different-length* signals padded to a common buffer
(lengths passed as traced values).
"""

import numpy as np

import jax.numpy as jnp

__all__ = [
    "frame_count",
    "frame_count_np",
    "left_pad_width",
    "frame_signal",
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
