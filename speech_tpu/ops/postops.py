"""Jittable functional forms of the post-processors.

The host classes in :mod:`speech_tpu.post` mirror the reference's NumPy API
(reference: src/pydrobert/speech/post.py); these are their pure-function
device twins, written to fuse into the feature pipeline under one ``jit``
(and to batch with ``vmap`` / shard with ``pjit``).  All take and return
``(..., time, feats)`` tensors unless noted.
"""

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from .xmath import xlog

__all__ = [
    "dct",
    "dct_matrix",
    "delta_filters",
    "device_post_chain",
    "pcen",
    "sliding_cmvn",
    "splice",
    "deltas",
    "stack",
    "standardize",
    "standardize_with_stats",
]


def delta_filters(num_deltas: int, context_window: int = 2):
    """The per-order Kaldi delta filters (order 1..num_deltas), host-side.

    Order-1 filter is ``t / sum t^2`` over ``[-W, W]``; higher orders are
    repeated convolutions (reference: post.py:455-460).
    """
    filts = [np.ones(1, dtype=np.float64)]
    base = np.arange(1 + 2 * context_window, dtype=np.float64) - context_window
    base /= np.sum(base ** 2)
    for idx in range(num_deltas):
        filts.append(np.convolve(filts[idx], base))
    return filts[1:]


def _valid_mask_and_last(features, lengths, time_axis):
    """``(scrubbed, valid (..., T), x_last (..., 1, F))`` for per-row
    valid counts ``lengths`` over ``(..., T, F)`` features with
    ``time_axis == -2``: rows at/after the count zero out, and the last
    valid frame extracts by a one-hot contraction (gather-free — the
    ragged-batch building block for edge replication)."""
    T = features.shape[time_axis]
    lengths = jnp.asarray(lengths, jnp.int32)[..., None]  # (..., 1)
    pos = jnp.arange(T)
    valid = pos < lengths  # (..., T)
    scrubbed = jnp.where(valid[..., None], features, 0)
    onehot = (pos == lengths - 1).astype(features.dtype)
    x_last = jnp.einsum("...tf,...t->...f", scrubbed, onehot)[..., None, :]
    return scrubbed, valid, x_last


def deltas(
    features,
    filts: Sequence,
    concatenate: bool = True,
    time_axis: int = -2,
    target_axis: int = -1,
    lengths=None,
):
    """Append/stack delta orders of ``features``.

    ``filts`` from :func:`delta_filters` (device or host arrays).  Edge
    (replication) padding, matching the reference default
    (reference: post.py:471-487).

    ``lengths`` (optional, ``(...,)`` per-row valid frame counts for
    ``(..., T, F)`` input, requires ``time_axis == -2``) makes the op
    ragged-batch-aware: each row's edges replicate at ITS valid extent,
    so output rows ``< lengths`` match the unbatched op on the
    length-``lengths`` prefix exactly (rows at/after the count are
    garbage to mask).  Realized gather-free: the zero-scrubbed
    correlation plus a rank-1 correction ``S(count - t) * x_last``
    where ``S(m)`` sums the filter taps that overhang the row's end.
    """
    features = jnp.asarray(features)
    time_axis = time_axis % features.ndim
    T = features.shape[time_axis]
    if lengths is not None:
        if time_axis != features.ndim - 2:
            raise ValueError("lengths-aware deltas requires time_axis=-2")
        features, valid, x_last = _valid_mask_and_last(
            features, lengths, time_axis
        )
        m = jnp.asarray(lengths, jnp.int32)[..., None] - jnp.arange(T)
    outs = [features]
    for filt in filts:
        filt = np.asarray(filt)
        K = filt.shape[0]
        off = (K - 1) // 2
        pad = [(0, 0)] * features.ndim
        pad[time_axis] = (off, off)
        if lengths is None:
            padded = jnp.pad(features, pad, mode="edge")
        else:
            # left edge replicates frame 0 statically; the right edge is
            # ragged — zero-pad and correct below
            pad[time_axis] = (off, 0)
            padded = jnp.pad(features, pad, mode="edge")
            pad[time_axis] = (0, off)
            padded = jnp.pad(padded, pad)
        # correlation as K static shifted slices (never a gather — TPU
        # gathers are ~200x slower than slices at production sizes)
        acc = None
        for k in range(K):
            sl = jax.lax.slice_in_dim(padded, k, k + T, axis=time_axis)
            term = sl * features.dtype.type(filt[k])
            acc = term if acc is None else acc + term
        if lengths is not None:
            # taps k with t - off + k >= count read the replicated last
            # frame: for overhang depth j = count - t in [1, off] their
            # coefficient sum is S(j) = sum_{k >= j + off} filt[k]
            corr = jnp.zeros(features.shape[:-1], features.dtype)
            for j in range(1, off + 1):
                s_j = float(filt[j + off :].sum())
                if s_j:
                    corr = corr + jnp.where(m == j, s_j, 0.0).astype(
                        features.dtype
                    )
            acc = acc + corr[..., None] * x_last
        outs.append(acc)
    if concatenate:
        return jnp.concatenate(outs, axis=target_axis)
    return jnp.stack(outs, axis=target_axis)


def stack(
    features,
    num_vectors: int,
    time_axis: int = -2,
    feat_axis: int = -1,
    pad: bool = False,
    lengths=None,
):
    """Merge ``num_vectors`` consecutive frames into wider vectors.

    With ``pad``, the tail is edge-padded to divisibility; otherwise
    leftover frames are dropped (reference: post.py:536-554).

    ``lengths`` (per-row valid frame counts, requires the default
    axes) makes the op ragged-batch-aware: each row's tail
    drops/edge-pads at ITS valid extent.  Output row counts become
    ``lengths // num_vectors`` (``pad=False``) or the ceiling
    (``pad=True``); rows past a row's count are garbage to mask.
    """
    features = jnp.asarray(features)
    time_axis = time_axis % features.ndim
    feat_axis = feat_axis % features.ndim
    if time_axis == feat_axis:
        raise RuntimeError(f"feature and time axes are the same ({time_axis})")
    T = features.shape[time_axis]
    if lengths is not None:
        if time_axis != features.ndim - 2 or feat_axis != features.ndim - 1:
            raise ValueError(
                "lengths-aware stack requires time_axis=-2, feat_axis=-1"
            )
        features, valid, x_last = _valid_mask_and_last(
            features, lengths, time_axis
        )
        if pad:
            # fill each row's final partial group with its last valid
            # frame (the per-row twin of the static edge pad below)
            cnt = jnp.asarray(lengths, jnp.int32)[..., None]
            pos = jnp.arange(T)
            grp_end = -(-cnt // num_vectors) * num_vectors
            fill = ((pos >= cnt) & (pos < grp_end))[..., None]
            features = jnp.where(
                fill, jnp.broadcast_to(x_last, features.shape), features
            )
    rem = T % num_vectors
    if rem and pad:
        padding = [(0, 0)] * features.ndim
        padding[time_axis] = (0, num_vectors - rem)
        features = jnp.pad(features, padding, mode="edge")
        T += num_vectors - rem
    nT = T // num_vectors
    T = nT * num_vectors
    sl = [slice(None)] * features.ndim
    buffs = []
    for i in range(num_vectors):
        sl[time_axis] = slice(i, T, num_vectors)
        buffs.append(features[tuple(sl)])
    return jnp.concatenate(buffs, axis=feat_axis)


def standardize(features, norm_var: bool = True, feat_axis: int = -1):
    """Local (per-tensor) standardization over all axes but ``feat_axis``.

    Zero-variance coefficients scale by 1 (reference: post.py:282-287).
    """
    features = jnp.asarray(features)
    feat_axis = feat_axis % features.ndim
    other = tuple(i for i in range(features.ndim) if i != feat_axis)
    means = features.mean(axis=other, keepdims=True)
    if norm_var:
        varss = (features ** 2).mean(axis=other, keepdims=True) - means ** 2
        varss = jnp.where(jnp.isclose(varss, 0), 1.0, varss)
        scales = jax.lax.rsqrt(varss)
    else:
        scales = jnp.ones_like(means)
    return features * scales - means * scales


def standardize_with_stats(
    features, stats, norm_var: bool = True, feat_axis: int = -1
):
    """Global standardization from ``(2, F+1)`` sufficient statistics
    (reference: post.py:258-276)."""
    features = jnp.asarray(features)
    stats = jnp.asarray(stats, dtype=features.dtype)
    feat_axis = feat_axis % features.ndim
    count = stats[0, -1]
    means = stats[0, :-1] / count
    if norm_var:
        varss = stats[1, :-1] / count - means ** 2
        varss = jnp.where(jnp.isclose(varss, 0), 1.0, varss)
        scales = jax.lax.rsqrt(varss)
    else:
        scales = jnp.ones_like(means)
    shape = [1] * features.ndim
    shape[feat_axis] = -1
    scales = scales.reshape(shape)
    means = means.reshape(shape)
    return features * scales - means * scales


def dct_matrix(
    num_feats: int, num_ceps: int = None, lifter: float = 0.0
) -> np.ndarray:
    """Host-side ``(num_feats, num_ceps)`` orthonormal DCT-II matrix.

    ``y = x @ dct_matrix(F, K)`` equals ``scipy.fft.dct(x, type=2,
    norm="ortho")[..., :K]``.  With ``lifter`` Q > 0, Kaldi's cepstral
    liftering ``c_k *= 1 + (Q/2) sin(pi k / Q)`` is folded into the
    matrix columns, so truncation + liftering stay one matmul.
    """
    if num_ceps is None:
        num_ceps = num_feats
    if not 1 <= num_ceps <= num_feats:
        raise ValueError(
            f"Expected num_ceps in [1, {num_feats}], got {num_ceps}"
        )
    if lifter < 0:
        raise ValueError(f"Expected lifter >= 0, got {lifter}")
    n = np.arange(num_feats, dtype=np.float64)
    k = np.arange(num_ceps, dtype=np.float64)
    mat = np.cos(np.pi * np.outer(n + 0.5, k) / num_feats)
    mat *= np.sqrt(2.0 / num_feats)
    mat[:, 0] /= np.sqrt(2.0)
    if lifter:
        mat *= 1.0 + 0.5 * lifter * np.sin(np.pi * k / lifter)
    return mat


def dct(
    features,
    num_ceps: int = None,
    lifter: float = 0.0,
    feat_axis: int = -1,
    precision=jax.lax.Precision.HIGHEST,
):
    """Type-II orthonormal DCT along the feature axis (MFCC cepstrum).

    Applied to log-mel features this yields MFCCs, Kaldi
    ``compute-mfcc-feats``-style: keep the first ``num_ceps``
    coefficients and (optionally) lifter with coefficient ``lifter``
    (Kaldi's ``--cepstral-lifter``, conventionally 22).  No reference
    counterpart; one ``(F, K)`` matmul on the MXU — the transform,
    truncation, and liftering all fold into a single constant matrix
    from :func:`dct_matrix`.
    """
    features = jnp.asarray(features)
    feat_axis = feat_axis % features.ndim
    mat = jnp.asarray(
        dct_matrix(features.shape[feat_axis], num_ceps, lifter),
        dtype=features.dtype,
    )
    moved = jnp.moveaxis(features, feat_axis, -1)
    out = jnp.matmul(moved, mat, precision=precision)
    return jnp.moveaxis(out, -1, feat_axis)


def transform(
    features,
    matrix,
    feat_axis: int = -1,
    precision=jax.lax.Precision.HIGHEST,
):
    """Apply a linear or affine feature transform (Kaldi ``transform-feats``).

    ``matrix`` is ``(out_dim, in_dim)`` for a linear transform
    ``y = M x`` or ``(out_dim, in_dim + 1)`` for an affine one whose
    last column is the bias, ``y = M[:, :-1] x + M[:, -1]`` — the
    Kaldi LDA/MLLT/fMLLR matrix convention.  No reference counterpart;
    one constant matmul on the MXU, frame-local (streams trivially).
    """
    features = jnp.asarray(features)
    feat_axis = feat_axis % features.ndim
    matrix = np.asarray(matrix)
    if matrix.ndim != 2:
        raise ValueError(f"expected a 2-D transform, got shape {matrix.shape}")
    in_dim = features.shape[feat_axis]
    if matrix.shape[1] == in_dim:
        bias = None
    elif matrix.shape[1] == in_dim + 1:
        matrix, bias = matrix[:, :-1], jnp.asarray(
            matrix[:, -1], dtype=features.dtype
        )
    else:
        raise ValueError(
            f"transform of shape {matrix.shape} does not apply to "
            f"{in_dim}-dimensional features (expected {in_dim} columns, "
            f"or {in_dim + 1} for an affine transform)"
        )
    mat = jnp.asarray(np.ascontiguousarray(matrix.T), dtype=features.dtype)
    moved = jnp.moveaxis(features, feat_axis, -1)
    out = jnp.matmul(moved, mat, precision=precision)
    if bias is not None:
        out = out + bias
    return jnp.moveaxis(out, -1, feat_axis)


def _pcen_compress(features, m, alpha, delta, power, eps):
    """The PCEN gain/compression stage given the smoothed energies
    ``m`` — shared by :func:`pcen` and the streaming twin
    (:class:`speech_tpu.streaming_post.StreamingPCEN`) so both tiers
    compress bit-identically."""
    dt = features.dtype
    alpha = jnp.asarray(alpha, dt)
    delta = jnp.asarray(delta, dt)
    power = jnp.asarray(power, dt)
    # every power lowers via exp/xlog rather than lax.pow: non-integer
    # pow expands through the TPU's hardware f32 log (~1e-4 abs error —
    # the exact term log32 exists to remove); all bases here are >= 0,
    # and log32(0) -> ~-88 so exp(p * .) underflows gracefully to 0
    gain = jnp.exp(-alpha * xlog(eps + m))
    return jnp.exp(power * xlog(features * gain + delta)) - jnp.exp(
        power * xlog(delta)
    )


def pcen(
    features,
    smooth=0.025,
    alpha=0.98,
    delta=2.0,
    power=0.5,
    eps: float = 1e-6,
    init_state=None,
    time_axis: int = -2,
    return_state: bool = False,
    lengths=None,
):
    """Per-channel energy normalization (PCEN, Wang et al. 2017).

    ``PCEN = (E / (eps + M)^alpha + delta)^power - delta^power`` where
    ``M`` is the first-order IIR smoother ``M_t = (1-s) M_{t-1} + s E_t``.
    Applies to *linear* (magnitude or power) features — PCEN replaces log
    compression, so build the computer with ``use_log=False``.

    TPU-first formulation: the smoother is a first-order linear
    recurrence, realized as a :func:`jax.lax.associative_scan` over the
    time axis (log-depth parallel prefix instead of a sequential frame
    loop), so the whole op stays a handful of fused elementwise passes.

    ``smooth``/``alpha``/``delta``/``power`` may be scalars or per-channel
    arrays broadcastable against the feature (last) axis; all are
    differentiable.  ``init_state`` is the smoother carry ``M_{-1}``
    (per-channel, broadcastable): ``None`` starts the smoother at the
    first frame's energy (no attack transient).  With ``return_state``
    the final smoother state is returned too — thread it through
    successive chunks to stream PCEN exactly:
    ``out_k, state = pcen(chunk_k, ..., init_state=state,
    return_state=True)`` equals one call over the concatenation.

    ``lengths`` (per-row valid frame counts, requires
    ``time_axis == -2``) makes the smoother ragged-batch-aware: rows
    at/after a row's count are scan identities, so valid rows match the
    unbatched op on each prefix (rows past the count are garbage).
    """
    features = jnp.asarray(features)
    time_axis = time_axis % features.ndim
    smooth = jnp.asarray(smooth, dtype=features.dtype)
    decay = 1.0 - smooth
    valid = None
    if lengths is not None:
        if time_axis != features.ndim - 2:
            raise ValueError("lengths-aware pcen requires time_axis=-2")
        T = features.shape[-2]
        valid = (
            jnp.arange(T) < jnp.asarray(lengths, jnp.int32)[..., None]
        )[..., None]
        features = jnp.where(valid, features, 0)
    b = smooth * features
    # fold the initial state into the first element so the prefix scan
    # directly yields M_t; M_{-1} = E_0 by default (steady start)
    first = jax.lax.index_in_dim(features, 0, axis=time_axis)
    if init_state is None:
        m0 = first
    else:
        m0 = jnp.asarray(init_state, features.dtype)
        if m0.ndim == features.ndim - 1:  # the return_state convention
            m0 = jnp.expand_dims(m0, time_axis)
    b0 = decay * jnp.broadcast_to(m0, first.shape) + smooth * first
    b = jax.lax.concatenate(
        [b0, jax.lax.slice_in_dim(b, 1, None, axis=time_axis)], time_axis
    )
    a = jnp.broadcast_to(decay, features.shape)
    if valid is not None:
        # invalid rows are scan identities (a=1, b=0): the smoother
        # carries through them untouched (row 0 is valid whenever the
        # row has any valid frame, so the b0 fold is unaffected)
        a = jnp.where(valid, a, 1.0)
        b = jnp.where(valid, b, 0.0)

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_l * a_r, b_l * a_r + b_r

    _, m = jax.lax.associative_scan(combine, (a, b), axis=time_axis)
    out = _pcen_compress(features, m, alpha, delta, power, eps)
    if return_state:
        return out, jax.lax.index_in_dim(
            m, m.shape[time_axis] - 1, axis=time_axis, keepdims=False
        )
    return out


def sliding_cmvn(
    features,
    window: int = 600,
    center: bool = True,
    norm_var: bool = False,
    min_window: int = 100,
    time_axis: int = -2,
    lengths=None,
):
    """Sliding-window cepstral mean (and variance) normalization.

    Kaldi ``apply-cmvn-sliding`` semantics (no reference counterpart;
    included for Kaldi speaker-id pipelines alongside
    :func:`speech_tpu.ops.vad.energy_vad`): each frame normalizes by
    statistics over a ``window``-frame context — centered and
    edge-clipped when ``center`` (the window shrinks near boundaries),
    else trailing, with at least ``min_window`` frames (looking ahead
    near the start).  Windowed moments come from padded-prefix-sum
    slices — static shapes, no gathers, jit/vmap/shard-safe.

    ``lengths`` (per-row valid frame counts, requires
    ``time_axis == -2``) makes the window clipping ragged-aware: each
    row clips at ITS valid extent, matching the unbatched op on the
    prefix.  Where a row's count binds the window (``hi`` clamped to
    the count) the statistics collapse to one per-row value, realized
    as one-hot prefix-table contractions — still gather-free.
    """
    if window < 1:
        raise ValueError(f"window must be positive, got {window}")
    features = jnp.asarray(features)
    time_axis = time_axis % features.ndim
    if time_axis != features.ndim - 2:
        if lengths is not None:
            raise ValueError("lengths-aware sliding_cmvn requires time_axis=-2")
        moved = jnp.moveaxis(features, time_axis, -2)
        out = sliding_cmvn(moved, window, center, norm_var, min_window, -2)
        return jnp.moveaxis(out, -2, time_axis)
    T = features.shape[-2]
    idx = np.arange(T)
    # unclamped (infinite-stream) bounds — static per frame index
    if center:
        lo_nat = np.maximum(idx - window // 2, 0)
        hi_nat = lo_nat + window
    else:
        hi_nat = np.maximum(idx + 1, min_window)
        lo_nat = np.maximum(hi_nat - window, 0)
    if lengths is None:
        hi = np.minimum(hi_nat, T)
        lo = np.maximum(hi - window, 0)

        # prefix sums along time; windows are static per frame index, so
        # the per-frame sums are two static takes of rows lo/hi — but
        # lo/hi are nonuniform, so express them as gathers of *rows* of
        # the (T+1, F) prefix table: one small take per tensor, not per
        # element
        def moments(x):
            c = jnp.cumsum(x, axis=-2)
            zero = jnp.zeros_like(c[..., :1, :])
            c = jnp.concatenate([zero, c], axis=-2)
            return jnp.take(c, hi, axis=-2) - jnp.take(c, lo, axis=-2)

        count = jnp.asarray((hi - lo)[:, None], features.dtype)
        mean = moments(features) / count
        out = features - mean
        if norm_var:
            var = moments(features**2) / count - mean**2
            out = out * jax.lax.rsqrt(jnp.maximum(var, 1e-10))
        return out

    cnt = jnp.asarray(lengths, jnp.int32)[..., None]  # (..., 1)
    pos = jnp.arange(T)
    scrubbed = jnp.where((pos < cnt)[..., None], features, 0)
    # where hi_nat <= count the static bounds hold (interior); where the
    # count binds, hi = count and lo = max(count - window, 0) — ONE
    # window per row, so its statistics are a single one-hot contraction
    # against the prefix table (rows before the stream head are zeros,
    # so the lo = 0 clamp reads the table's flat-zero region correctly)
    interior = hi_nat[None] <= cnt  # (..., T) w/ leading broadcast
    onehot_hi = (pos[:, None] + 1 == cnt[..., None, :]).astype(
        features.dtype
    )  # (..., T, 1): row t -> cp row t+1 == count
    lo_tail = jnp.maximum(cnt - window, 0)  # (..., 1)
    onehot_lo = (pos[:, None] == lo_tail[..., None, :]).astype(features.dtype)

    def moments(x):
        c = jnp.cumsum(x, axis=-2)
        zero = jnp.zeros_like(c[..., :1, :])
        cp = jnp.concatenate([zero, c], axis=-2)  # (..., T+1, F)
        static = jnp.take(cp, hi_nat, axis=-2) - jnp.take(cp, lo_nat, axis=-2)
        # per-row tail stats: cp[count] - cp[max(count - window, 0)]
        tail_hi = jnp.einsum("...tf,...to->...of", c, onehot_hi)
        tail_lo = jnp.einsum("...tf,...to->...of", cp[..., :-1, :], onehot_lo)
        return jnp.where(interior[..., None], static, tail_hi - tail_lo)

    # jnp.take with hi_nat may exceed T: clamp by padding the table — the
    # interior mask discards those rows anyway, but reads must stay in
    # bounds; simplest is clipping the static index vectors
    hi_nat = np.minimum(hi_nat, T)
    lo_nat = np.minimum(lo_nat, T)
    count = jnp.minimum(jnp.asarray(hi_nat), cnt) - jnp.where(
        interior, jnp.asarray(lo_nat), lo_tail
    )
    count = jnp.maximum(count, 1).astype(features.dtype)[..., None]
    mean = moments(scrubbed) / count
    out = features - mean
    if norm_var:
        var = moments(scrubbed**2) / count - mean**2
        out = out * jax.lax.rsqrt(jnp.maximum(var, 1e-10))
    return out


def splice(
    features, left: int = 4, right: int = 4, time_axis: int = -2,
    lengths=None,
):
    """Concatenate each frame with its ``[-left, right]`` context
    (Kaldi ``splice-feats``; no reference counterpart).

    Edge frames replicate (Kaldi's boundary behavior).  Output feature
    width is ``(left + right + 1) * F``, context ordered oldest-first.
    Static shifted slices — the same gather-free correlation machinery
    as :func:`deltas`.  ``lengths`` makes the right edge ragged-aware
    (see :func:`deltas`); with it the taps that overhang a row's valid
    extent select its last valid frame instead (bitwise equal to the
    unbatched op on each prefix).
    """
    if left < 0 or right < 0:
        raise ValueError(f"left/right must be >= 0, got {left}/{right}")
    features = jnp.asarray(features)
    time_axis = time_axis % features.ndim
    T = features.shape[time_axis]
    pad = [(0, 0)] * features.ndim
    if lengths is None:
        pad[time_axis] = (left, right)
        padded = jnp.pad(features, pad, mode="edge")
        outs = [
            jax.lax.slice_in_dim(padded, k, k + T, axis=time_axis)
            for k in range(left + right + 1)
        ]
        return jnp.concatenate(outs, axis=-1)
    if time_axis != features.ndim - 2:
        raise ValueError("lengths-aware splice requires time_axis=-2")
    features, valid, x_last = _valid_mask_and_last(
        features, lengths, time_axis
    )
    pos = jnp.arange(T)
    cnt = jnp.asarray(lengths, jnp.int32)[..., None]
    pad[time_axis] = (left, 0)
    padded = jnp.pad(features, pad, mode="edge")
    pad[time_axis] = (0, right)
    padded = jnp.pad(padded, pad)
    outs = []
    for k in range(left + right + 1):
        sl = jax.lax.slice_in_dim(padded, k, k + T, axis=time_axis)
        d = k - left  # tap offset relative to the output frame
        if d > 0:
            over = (pos + d >= cnt)[..., None]
            sl = jnp.where(over, jnp.broadcast_to(x_last, sl.shape), sl)
        outs.append(sl)
    return jnp.concatenate(outs, axis=-1)


def device_post_chain(postprocessors):
    """A fused, ragged-batch-aware device twin of a post-processor chain.

    Maps host :mod:`speech_tpu.post` instances (and/or raw
    ``(feats, counts) -> (feats, counts)`` callables) onto this
    module's lengths-aware functional forms and returns one pure
    ``apply(feats, counts) -> (feats, counts)`` over ``(..., T, F)``
    feature blocks with per-row valid frame counts — jit/vmap/shard
    safe, so a batched extractor fuses the whole chain into its device
    program (see :class:`speech_tpu.parallel.ShardedExtractor`).

    Semantics are the device twins' (Kaldi-style: deltas/splice/
    stacking run along the TIME axis with per-row edge handling) —
    matching per-utterance host application of each post-processor
    with its natural time axis, NOT the reference CLI's literal
    ``apply(feats, axis=-1)`` quirk (which correlates Deltas along the
    feature axis; reference: command_line.py applies ``axis=-1``
    everywhere).  Raises ``ValueError`` for configurations with no
    device twin (e.g. :class:`~speech_tpu.post.Standardize` without
    statistics).
    """
    from .. import post as _post
    from .plp import plp as _plp

    stages = []
    for p in postprocessors:
        if callable(p) and not isinstance(p, _post.PostProcessor):
            stages.append(p)
            continue
        if isinstance(p, _post.Deltas):
            if not p.concatenate:
                raise ValueError(
                    "device Deltas supports the concatenating form only"
                )
            if p._target_axis not in (-1, 1):
                raise ValueError(
                    "device Deltas requires target_axis -1 (feature axis)"
                )
            if p._pad_mode != "edge":
                raise ValueError(
                    f"device Deltas requires pad_mode='edge', got "
                    f"{p._pad_mode!r}"
                )
            filts = [np.asarray(f) for f in p.filters[1:]]

            def f(x, n, filts=filts):
                return deltas(x, filts, lengths=n), n

        elif isinstance(p, _post.Splice):
            if p.time_axis % 2 != 0:
                raise ValueError("device Splice requires time_axis 0")
            left, right = p.left, p.right

            def f(x, n, left=left, right=right):
                return splice(x, left, right, lengths=n), n

        elif isinstance(p, _post.Stack):
            if p.time_axis % 2 != 0:
                raise ValueError("device Stack requires time_axis 0")
            if p._pad_mode not in (None, "edge"):
                raise ValueError(
                    f"device Stack supports pad_mode None or 'edge', got "
                    f"{p._pad_mode!r}"
                )
            m, do_pad = p.num_vectors, p._pad_mode == "edge"

            def f(x, n, m=m, do_pad=do_pad):
                out = stack(x, m, pad=do_pad, lengths=n)
                n2 = -(-n // m) if do_pad else n // m
                return out, n2

        elif isinstance(p, _post.PCEN):
            if p.time_axis % 2 != 0:
                raise ValueError("device PCEN requires time_axis 0")
            kw = dict(
                smooth=p.smooth, alpha=p.alpha, delta=p.delta,
                power=p.power, eps=p.eps,
            )

            def f(x, n, kw=kw):
                return pcen(x, lengths=n, **kw), n

        elif isinstance(p, _post.SlidingCMVN):
            if p.time_axis % 2 != 0:
                raise ValueError("device SlidingCMVN requires time_axis 0")
            kw = dict(
                window=p.window, center=p.center, norm_var=p.norm_var,
                min_window=p.min_window,
            )

            def f(x, n, kw=kw):
                return sliding_cmvn(x, lengths=n, **kw), n

        elif isinstance(p, _post.DCT):
            num_ceps, lifter = p.num_ceps, p.lifter

            def f(x, n, num_ceps=num_ceps, lifter=lifter):
                return dct(x, num_ceps, lifter), n

        elif isinstance(p, _post.PLP):
            center_hz = p.center_hz
            kw = dict(
                order=p.order, num_ceps=p.num_ceps, compress=p.compress,
                lifter=p.lifter, eps=p.eps,
            )

            def f(x, n, center_hz=center_hz, kw=kw):
                return _plp(x, center_hz, **kw), n

        elif isinstance(p, _post.Transform):
            mat = np.asarray(p.matrix)

            def f(x, n, mat=mat):
                return transform(x, mat), n

        elif isinstance(p, _post.Standardize):
            if not p.have_stats:
                raise ValueError(
                    "device Standardize needs accumulated/loaded statistics"
                )
            stats = np.asarray(p.stats)
            norm_var = p._norm_var

            def f(x, n, stats=stats, norm_var=norm_var):
                return standardize_with_stats(x, stats, norm_var), n

        else:
            raise ValueError(f"no device twin for {type(p).__name__}")
        stages.append(f)

    def apply(feats, counts):
        counts = jnp.asarray(counts, jnp.int32)
        for stage in stages:
            feats, counts = stage(feats, counts)
        return feats, counts

    return apply
