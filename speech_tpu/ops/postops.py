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


def deltas(
    features,
    filts: Sequence,
    concatenate: bool = True,
    time_axis: int = -2,
    target_axis: int = -1,
):
    """Append/stack delta orders of ``features``.

    ``filts`` from :func:`delta_filters` (device or host arrays).  Edge
    (replication) padding, matching the reference default
    (reference: post.py:471-487).
    """
    features = jnp.asarray(features)
    time_axis = time_axis % features.ndim
    outs = [features]
    T = features.shape[time_axis]
    for filt in filts:
        filt = np.asarray(filt)
        K = filt.shape[0]
        off = (K - 1) // 2
        pad = [(0, 0)] * features.ndim
        pad[time_axis] = (off, off)
        padded = jnp.pad(features, pad, mode="edge")
        # correlation as K static shifted slices (never a gather — TPU
        # gathers are ~200x slower than slices at production sizes)
        acc = None
        for k in range(K):
            sl = jax.lax.slice_in_dim(padded, k, k + T, axis=time_axis)
            term = sl * features.dtype.type(filt[k])
            acc = term if acc is None else acc + term
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
):
    """Merge ``num_vectors`` consecutive frames into wider vectors.

    With ``pad``, the tail is edge-padded to divisibility; otherwise
    leftover frames are dropped (reference: post.py:536-554).
    """
    features = jnp.asarray(features)
    time_axis = time_axis % features.ndim
    feat_axis = feat_axis % features.ndim
    if time_axis == feat_axis:
        raise RuntimeError(f"feature and time axes are the same ({time_axis})")
    T = features.shape[time_axis]
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
    """
    features = jnp.asarray(features)
    time_axis = time_axis % features.ndim
    smooth = jnp.asarray(smooth, dtype=features.dtype)
    decay = 1.0 - smooth
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

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_l * a_r, b_l * a_r + b_r

    _, m = jax.lax.associative_scan(combine, (a, b), axis=time_axis)
    alpha = jnp.asarray(alpha, features.dtype)
    delta = jnp.asarray(delta, features.dtype)
    power = jnp.asarray(power, features.dtype)
    # every power lowers via exp/xlog rather than lax.pow: non-integer
    # pow expands through the TPU's hardware f32 log (~1e-4 abs error —
    # the exact term log32 exists to remove); all bases here are >= 0,
    # and log32(0) -> ~-88 so exp(p * .) underflows gracefully to 0
    gain = jnp.exp(-alpha * xlog(eps + m))
    out = jnp.exp(power * xlog(features * gain + delta)) - jnp.exp(
        power * xlog(delta)
    )
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
    """
    if window < 1:
        raise ValueError(f"window must be positive, got {window}")
    features = jnp.asarray(features)
    time_axis = time_axis % features.ndim
    if time_axis != features.ndim - 2:
        moved = jnp.moveaxis(features, time_axis, -2)
        out = sliding_cmvn(moved, window, center, norm_var, min_window, -2)
        return jnp.moveaxis(out, -2, time_axis)
    T = features.shape[-2]
    idx = np.arange(T)
    if center:
        # kaldi: window [i - w/2, i + w/2) clipped into [0, T)
        lo = np.maximum(idx - window // 2, 0)
        hi = np.minimum(lo + window, T)
        lo = np.maximum(hi - window, 0)
    else:
        hi = np.minimum(np.maximum(idx + 1, min_window), T)
        lo = np.maximum(hi - window, 0)
    # prefix sums along time; windows are static per frame index, so the
    # per-frame sums are two static takes of rows lo/hi — but lo/hi are
    # nonuniform, so express them as gathers of *rows* of the (T+1, F)
    # prefix table: one small take per tensor, not per element
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


def splice(features, left: int = 4, right: int = 4, time_axis: int = -2):
    """Concatenate each frame with its ``[-left, right]`` context
    (Kaldi ``splice-feats``; no reference counterpart).

    Edge frames replicate (Kaldi's boundary behavior).  Output feature
    width is ``(left + right + 1) * F``, context ordered oldest-first.
    Static shifted slices — the same gather-free correlation machinery
    as :func:`deltas`.
    """
    if left < 0 or right < 0:
        raise ValueError(f"left/right must be >= 0, got {left}/{right}")
    features = jnp.asarray(features)
    time_axis = time_axis % features.ndim
    T = features.shape[time_axis]
    pad = [(0, 0)] * features.ndim
    pad[time_axis] = (left, right)
    padded = jnp.pad(features, pad, mode="edge")
    outs = [
        jax.lax.slice_in_dim(padded, k, k + T, axis=time_axis)
        for k in range(left + right + 1)
    ]
    return jnp.concatenate(outs, axis=-1)
