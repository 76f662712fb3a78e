"""Rational-ratio polyphase resampling as slice-framing + one matmul.

No reference counterpart (pydrobert-speech requires the caller to match
``sampling_rate``); sample-rate mismatch is the most common ingestion
problem, so the framework ships a resampler built the way everything
else here is built: the polyphase decomposition turns
upsample-filter-downsample into *gather-free slice framing at stride M
plus a single ``(W, L)`` MXU matmul*.

Derivation: with reduced ratio ``L/M`` and a centered odd FIR ``h`` of
half-width ``K``, output ``i = j*L + p`` is
``y[i] = sum_k h[p*M + K - L*k] x[j*M + k]`` — block ``j`` reads one
window of the input at stride ``M``, and phase ``p`` dots it with a
fixed row of the phase matrix.  So ``Y = frames @ Phi^T`` with
``frames`` from :func:`speech_tpu.ops.framing.frame_padded` (static
strided slices) and ``Phi[p, k] = h[p*M + K - L*(k + k_min)]``.

The anti-alias/anti-image FIR is the classic Kaiser-windowed sinc at
cutoff ``1/max(L, M)`` — the same design (half-width ``10*max(L, M)``,
beta 5.0) scipy's ``resample_poly`` defaults to, so float64 outputs
match scipy to roundoff (tested).
"""

from functools import lru_cache
from math import gcd
from typing import Optional, Union

import numpy as np

import jax
import jax.numpy as jnp

from . import framing as _framing

__all__ = ["resample", "resample_matrices", "resample_np", "fir_conv_matmul"]


@lru_cache(maxsize=32)
def _toeplitz_block(h_key, n_phases: int, stride: int, group: int, depth: int = 2):
    """Host precompute of the banded-Toeplitz block ``T`` for
    :func:`fir_conv_matmul`: with ``phi`` the ``(n_phases, W)`` phase
    matrix (``h_key`` row-major), ``T[m, q*n_phases + p] =
    phi[p, m - stride*q]`` (zero outside the taps), shape
    ``(depth*group*stride, group*n_phases)`` — ``depth`` is how many
    hop-sized input blocks one output block's window spans (2 when the
    taps fit one extra block; more for long FIRs like room impulse
    responses)."""
    phi = np.asarray(h_key, np.float64).reshape(n_phases, -1)
    W = phi.shape[1]
    rows = depth * group * stride
    m = np.arange(rows)[:, None] - stride * np.arange(group)[None, :]
    band = np.where(
        (m >= 0)[None] & (m < W)[None],
        phi[:, np.clip(m, 0, W - 1)],
        0.0,
    )  # (n_phases, rows, group)
    return band.transpose(1, 2, 0).reshape(rows, group * n_phases)


def fir_conv_matmul(
    signal,
    h,
    stride: int = 1,
    pad_left: int = 0,
    n_out: Optional[int] = None,
    precision: Union[str, jax.lax.Precision] = jax.lax.Precision.HIGHEST,
    group: int = 128,
):
    """Strided polyphase FIR correlation as banded-Toeplitz block
    matmuls.

    With ``h`` a single ``(W,)`` filter:
    ``y[i] = sum_t h[t] * x[i*stride + t - pad_left]`` (``x`` zero
    outside its extent).  With ``h`` a ``(P, W)`` phase matrix, output
    phases interleave: ``y[b*P + p] = sum_t h[p, t] *
    x[b*stride + t - pad_left]`` — the polyphase upsampler's layout.

    Single-channel FIRs via ``lax.conv_general_dilated`` miss the MXU on
    TPU (they lower to VPU loops: the pitch front-end's two convs were
    6.0 + 5.4 ms of its 27.6 ms v5e device budget, vs 1.65 + 1.6 in this
    form); this form frames the signal into overlapping blocks of
    ``depth*group*stride`` at hop ``group*stride`` — ``depth`` static
    strided slices, no gather, ~depth x HBM read — and dots them with
    one constant ``(depth*group*stride, group*P)`` Toeplitz block, so
    the whole filter is a single MXU matmul.  ``depth`` is chosen as
    the smallest window covering the taps (2 for short filters — the
    measured resample/pitch configs are unchanged; a W-tap FIR needs
    ``depth ~= W/(group*stride) + 1``, so an 8000-tap room impulse
    response at ``group=1024`` is a 9-block window with a 9216x1024
    band — the constant stays O(depth*group^2), never O(W^2)).  The
    band's zero-padding FLOPs are free at MXU rates.

    Batched over leading axes; jittable for static shapes.
    """
    signal = jnp.asarray(signal)
    if not jnp.issubdtype(signal.dtype, jnp.floating):
        signal = signal.astype(jnp.float32)
    h = np.asarray(h, np.float64)
    P = 1 if h.ndim == 1 else h.shape[0]
    W = h.shape[-1]
    stride = int(stride)
    N = signal.shape[-1]
    if n_out is None:
        n_out = (-(-N // stride)) * P
    # keep the Toeplitz block ~512-1024 rows: G output blocks span
    # G*stride input samples, so large strides shrink the group (at
    # stride 160 a 128-group block would be a 41k x 56k constant)
    G = max(1, min(int(group), -(-512 // stride)))
    # window depth: smallest D with D*G*stride >= (G-1)*stride + W (the
    # last output of a block reads up to (G-1)*stride + W - 1 into it)
    D = max(2, -(-((G - 1) * stride + W) // (G * stride)))
    out_blocks = -(-n_out // P)
    n_blocks = -(-out_blocks // G)
    T = jnp.asarray(
        _toeplitz_block(tuple(h.ravel().tolist()), P, stride, G, D),
        signal.dtype,
    )

    def one(sig):
        padded = jnp.pad(sig, (int(pad_left), 0))
        frames = _framing.frame_padded(
            padded, n_blocks, D * G * stride, G * stride
        )
        out = jnp.matmul(frames, T, precision=precision)
        return out.reshape(n_blocks * G * P)[:n_out]

    for _ in range(signal.ndim - 1):
        one = jax.vmap(one)
    return one(signal)


@lru_cache(maxsize=32)
def resample_matrices(up: int, down: int, half_width: int = 10, beta: float = 5.0):
    """Host precompute: ``(Phi, k_min)`` for a reduced ``up/down`` ratio.

    ``Phi`` is the float64 ``(up, W)`` phase-filter matrix; window ``j``
    of the input (``W`` samples starting at ``j*down + k_min``) maps to
    output block ``j`` (phases ``0..up-1``) via ``window @ Phi.T``.
    Cached per ratio: the CLI ingestion paths call :func:`resample_np`
    once per utterance, and a corpus run's ratios are fixed.
    """
    L, M = int(up), int(down)
    if L < 1 or M < 1:
        raise ValueError(f"up/down must be positive, got {up}/{down}")
    K = half_width * max(L, M)
    n = np.arange(-K, K + 1, dtype=np.float64)
    cutoff = 1.0 / max(L, M)
    h = cutoff * np.sinc(cutoff * n) * np.kaiser(2 * K + 1, beta)
    h *= L / h.sum()  # unit DC gain, then the interpolation gain L
    # phase p of output block j reads input samples j*M + k for
    # k in [k_min, k_max]; taps outside h's support are zero
    k_min = -(K // L) - 1
    k_max = ((L - 1) * M + K) // L
    W = k_max - k_min + 1
    phi = np.zeros((L, W), dtype=np.float64)
    for p in range(L):
        idx = p * M + K - L * (np.arange(k_min, k_max + 1))
        valid = (idx >= 0) & (idx <= 2 * K)
        phi[p, valid] = h[idx[valid]]
    phi.setflags(write=False)  # lru_cache shares the instance
    return phi, k_min


def resample(
    signal,
    up: int,
    down: int,
    half_width: int = 10,
    beta: float = 5.0,
    precision: Union[str, jax.lax.Precision] = jax.lax.Precision.HIGHEST,
):
    """Resample ``(..., N)`` signals by the rational factor ``up/down``.

    Jittable for static shapes; batched over leading axes (the framing
    vmaps as batched static slices).  Returns ``(..., ceil(N*up/down))``
    in the input's (floating) dtype; the signal is treated as zero
    outside its extent (scipy ``resample_poly`` semantics).
    """
    if int(up) < 1 or int(down) < 1:
        raise ValueError(f"up/down must be positive, got {up}/{down}")
    g = gcd(int(up), int(down))
    L, M = int(up) // g, int(down) // g
    signal = jnp.asarray(signal)
    if not jnp.issubdtype(signal.dtype, jnp.floating):
        signal = signal.astype(jnp.float32)
    N = signal.shape[-1]
    if L == 1 and M == 1:
        return signal
    n_out = -(-N * L // M)
    if L == 1:
        # pure decimation: the banded-Toeplitz block matmul beats both a
        # strided conv (single-channel convs miss the MXU: 6.0 vs 1.65 ms
        # on a v5e 32x10 s batch at 1/4) and the naive framing path
        # (which writes W~(2K/L+M)-times-inflated frames to HBM — 24 ms).
        # (The L>1 analog, lhs_dilation, lowers poorly on TPU: 61 vs
        # 17 ms at 3/2 — upsampling keeps the framing+matmul form.)
        K = half_width * M
        # the L=1 phase matrix is one row = [0, h[::-1]] — the FIR is
        # that row's tail (one design, shared with the general path and
        # resample_np)
        phi1, _ = resample_matrices(1, M, half_width, beta)
        return fir_conv_matmul(
            signal,
            phi1[0, 1:],
            stride=M,
            pad_left=K,
            n_out=n_out,
            precision=precision,
        )
    n_blocks = -(-n_out // L)
    phi, k_min = resample_matrices(L, M, half_width, beta)
    W = phi.shape[1]
    if W > 4 * M:
        # strong upsampling (small M, wide windows): the naive framing
        # path writes W/M-times-inflated frames to HBM; the Toeplitz
        # block form reads ~2x and keeps the matmul on the MXU.  v5e
        # 128x15 s batch: 3/2 17.8 -> 7.1 ms, 2/1 32.0 -> 6.4 ms; at
        # 441/160 (inflation 1.13) framing wins (8.7 vs 13.6 ms), hence
        # the W/M gate.
        return fir_conv_matmul(
            signal,
            phi,
            stride=M,
            pad_left=-k_min,
            n_out=n_out,
            precision=precision,
        )
    phi = jnp.asarray(phi.T, dtype=signal.dtype)  # (W, L)
    pad_left = -k_min
    pad_right = max((n_blocks - 1) * M + k_min + W - N, 0)

    def one(sig):
        padded = jnp.pad(sig, (pad_left, pad_right))
        frames = _framing.frame_padded(padded, n_blocks, W, M)
        out = jnp.matmul(frames, phi, precision=precision)
        return out.reshape(n_blocks * L)[:n_out]

    for _ in range(signal.ndim - 1):
        one = jax.vmap(one)
    return one(signal)


def resample_np(signal, up: int, down: int, half_width: int = 10, beta: float = 5.0):
    """Host (numpy, float64) twin of :func:`resample` for ingestion paths.

    The CLIs resample per utterance while decoding on the host — a
    device round trip per utterance would serialize the pipeline on
    tunneled runtimes — so this runs the same phase-matrix product with
    a strided numpy view.  1-D in, 1-D out; exact to :func:`resample`'s
    float64 path (same matrices, same framing).
    """
    if int(up) < 1 or int(down) < 1:
        raise ValueError(f"up/down must be positive, got {up}/{down}")
    g = gcd(int(up), int(down))
    L, M = int(up) // g, int(down) // g
    signal = np.asarray(signal, dtype=np.float64)
    N = signal.shape[-1]
    if L == 1 and M == 1:
        return signal
    n_out = -(-N * L // M)
    n_blocks = -(-n_out // L)
    phi, k_min = resample_matrices(L, M, half_width, beta)
    W = phi.shape[1]
    pad_left = -k_min
    pad_right = max((n_blocks - 1) * M + k_min + W - N, 0)
    padded = np.pad(signal, (pad_left, pad_right))
    frames = np.lib.stride_tricks.sliding_window_view(padded, W)[::M]
    return (frames[:n_blocks] @ phi.T).reshape(n_blocks * L)[:n_out]
