"""Sequence parallelism: time-axis sharding of one long signal.

The reference handles unbounded signals with a streaming chunk API in
bounded memory (reference: src/pydrobert/speech/compute.py:462-572).  The
multi-chip analog shards the *time axis* of a long signal over a mesh axis:
each chip frames its own span, which requires up to ``frame_length`` samples
of left/right context from its neighbors.  That context is a **static halo
exchange** — one :func:`jax.lax.ppermute` each way over ICI — after which
framing and the feature pipeline are purely chip-local.  Reflection
("symmetric") padding applies at the *global* signal edges only; the index
math reflects in global coordinates, so edge chips reproduce the exact
single-chip output.

Static-shape contract: the sharded span per chip ``C = sig_len / n`` must be
a multiple of ``frame_shift`` and at least ``frame_length``; then each chip
owns exactly ``C / frame_shift`` frames and the global output matches
``compute_full``'s ``(len + shift//2) // shift`` frame count.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.framing import reflect_index
from ..ops import si as _si
from ..ops import stft as _stft

__all__ = ["halo_frame_signal", "sharded_stft_feats", "sharded_si_feats"]


def _next_pow2(n: int) -> int:
    return 1 << max(0, (int(n) - 1)).bit_length()


def _halo_exchange(chunk, halo: int, axis: str, n: int):
    """Fetch the last ``halo`` samples of the left neighbor and the first
    ``halo`` of the right neighbor (zeros at the mesh edges, never read)."""
    left = lax.ppermute(
        chunk[-halo:], axis, [(i, i + 1) for i in range(n - 1)]
    )
    right = lax.ppermute(
        chunk[:halo], axis, [(i + 1, i) for i in range(n - 1)]
    )
    return jnp.concatenate([left, chunk, right])


def _local_frames(
    chunk,
    *,
    axis: str,
    n: int,
    sig_len: int,
    frame_length: int,
    frame_shift: int,
    pad_left: int,
):
    span = chunk.shape[0]
    frames_per_shard = span // frame_shift
    buf = _halo_exchange(chunk, frame_length, axis, n)
    d = lax.axis_index(axis)
    base = d * span
    # Global-edge fix-up: halo samples whose global positions fall outside
    # [0, sig_len) take their symmetric reflections (which always land
    # inside this chip's own span).  Two frame_length-element gathers —
    # negligible; interior chips gather identity positions.
    halo_i = jnp.arange(frame_length)
    lpos = reflect_index(base - frame_length + halo_i, sig_len)
    buf = buf.at[:frame_length].set(
        jnp.take(buf, lpos - base + frame_length, axis=0)
    )
    rpos = reflect_index(base + span + halo_i, sig_len)
    buf = buf.at[frame_length + span :].set(
        jnp.take(buf, rpos - base + frame_length, axis=0)
    )
    # local frame j covers buffer [j*shift + frame_length - pad_left, ...):
    # static offsets, so framing is pure strided slices
    from ..ops.framing import frame_padded

    return frame_padded(
        buf[frame_length - pad_left :],
        frames_per_shard,
        frame_length,
        frame_shift,
    )


def halo_frame_signal(
    signal,
    mesh: Mesh,
    axis: str,
    frame_length: int,
    frame_shift: int,
    pad_left: int,
):
    """Frame a time-sharded signal with neighbor halo exchange.

    ``signal`` is the full ``(sig_len,)`` array (sharded or shardable over
    ``axis``); returns ``(sig_len // frame_shift, frame_length)`` frames
    sharded over ``axis`` on the frame dimension.  Bit-equivalent to
    single-device :func:`speech_tpu.ops.framing.frame_signal` on the whole
    signal.
    """
    n = mesh.shape[axis]
    sig_len = signal.shape[0]
    span = sig_len // n
    if sig_len % n or span % frame_shift or span < frame_length:
        raise ValueError(
            f"sig_len ({sig_len}) must split into per-chip spans that are "
            f"multiples of frame_shift ({frame_shift}) and at least "
            f"frame_length ({frame_length})"
        )
    fn = jax.shard_map(
        functools.partial(
            _local_frames,
            axis=axis,
            n=n,
            sig_len=sig_len,
            frame_length=frame_length,
            frame_shift=frame_shift,
            pad_left=pad_left,
        ),
        mesh=mesh,
        in_specs=P(axis),
        out_specs=P(axis, None),
    )
    return fn(signal)


def sharded_stft_feats(computer, signal, mesh: Mesh, axis: str):
    """Full sequence-parallel STFT features for one long signal.

    Halo-exchange framing (above) followed by the chip-local fused pipeline;
    everything downstream of the single ppermute pair is collective-free.
    When ``sig_len`` is a multiple of ``n * frame_shift`` the global frame
    count ``(sig_len + shift//2) // shift == sig_len // shift`` and the
    output matches ``computer.compute_full(signal)`` exactly.
    """
    params = computer.params
    spec = computer._static_spec
    frames = halo_frame_signal(
        signal,
        mesh,
        axis,
        computer._frame_length,
        computer._frame_shift,
        computer._pad_left,
    )
    return _stft.stft_feats_from_frames(frames, params, **spec)


def sharded_si_feats(computer, signal, mesh: Mesh, axis: str):
    """Sequence-parallel SI features for one long, time-sharded signal.

    Each chip owns ``span = sig_len / n`` samples and the corresponding
    ``span / shift`` frames.  A frame's convolution taps plus its
    integration window reach at most ``max_support - 1 + 2 * frame_shift``
    samples beyond the span — one static halo exchange (a ``ppermute``
    pair over ICI), after which the fused SI pipeline runs chip-local with
    its alignment constants rebased into halo-extended coordinates.  At
    the mesh edges ``ppermute`` yields zeros, which *is* the global
    semantics: the SI computer zero-extends the signal (unlike the STFT
    computer's symmetric reflection; reference: compute.py:774-847).

    Returns ``(sig_len // shift, num_coeffs)``; the first
    ``computer.frame_counts_np(sig_len)`` rows match
    ``computer.compute_full(signal)`` exactly (the remainder, when any,
    are the final-frame undershoot the reference also drops).
    """
    n = mesh.shape[axis]
    sig_len = signal.shape[0]
    s = computer._frame_shift
    T = computer._kernel["max_support"]
    halo = T - 1 + 2 * s
    span = sig_len // n
    if sig_len % n or span % s or span < halo:
        raise ValueError(
            f"sig_len ({sig_len}) must split into per-chip spans that are "
            f"multiples of frame_shift ({s}) and at least the halo "
            f"({halo} = max_support - 1 + 2*frame_shift)"
        )
    frames_per_shard = span // s
    buf_len = span + 2 * halo
    spec = computer._spec(_next_pow2(buf_len + T))
    # rebase the y[0] anchor: local buffer position 0 is global sample
    # d*span - halo, so the chip's first frame reads the local convolution
    # starting halo samples later than the global shift_eff
    spec["shift_eff"] = computer._shift_eff + halo
    spec["energy_offset"] = spec["shift_eff"] - computer._kernel["translation"]
    params = computer._params_for(spec)

    def local(chunk):
        left = lax.ppermute(
            chunk[-halo:], axis, [(i, i + 1) for i in range(n - 1)]
        )
        right = lax.ppermute(
            chunk[:halo], axis, [(i + 1, i) for i in range(n - 1)]
        )
        buf = jnp.concatenate([left, chunk, right])
        return _si.si_feats_from_signal(
            buf, buf_len, frames_per_shard, params, **spec
        )

    fn = jax.shard_map(
        functools.partial(local),
        mesh=mesh,
        in_specs=P(axis),
        out_specs=P(axis, None),
    )
    return fn(signal)
