"""Feature inversion: ISTFT, Griffin-Lim, and filter-bank pseudo-inverse.

The reference library is analysis-only (reference: compute.py documents
the forward ``signal -> frames -> windowed DFT -> |.|^p -> bank -> log``
pipeline, compute.py:388-460, and has no inverse).  This module closes
the loop TPU-first: every stage is a constant-matrix matmul or a
reshape, so the whole inversion — including the Griffin-Lim iteration,
expressed as a ``lax.scan`` over matmuls — runs on the MXU with static
shapes and no gathers or complex dtypes (the TPU backend has no c64
FFT; all spectra are carried as real/imaginary float pairs, like the
forward path in :mod:`speech_tpu.ops.stft`).

Pipeline (the exact adjoint of :func:`..ops.stft.stft_feats_from_frames`):

- :func:`overlap_add` — gather-free OLA: each frame is cut into
  ``ceil(L/S)`` shift-aligned segments; segment ``k`` of every frame
  reshapes *contiguously* into one length ``T*S`` strand at offset
  ``k*S``, so OLA is ``K`` pads + adds instead of a scatter.
- :func:`istft` — least-squares inverse STFT: half-spectrum (re, im)
  -> synthesis matmul -> windowed OLA, normalized by the window-power
  OLA (exact reconstruction wherever the window-power sum is nonzero,
  for any window/shift — no COLA requirement).
- :func:`griffin_lim` — fast Griffin-Lim (momentum/FGLA, Perraudin et
  al. 2013) recovering phase from magnitude.
- :func:`bank_pseudo_inverse` — host-side ridge pseudo-inverse of the
  folded filter-weight matrix (:func:`..ops.stft.fold_bank_to_weights`).
- :func:`feats_to_signal` — end to end: log-bank features from a
  ``ShortTimeFourierTransformFrameComputer`` back to a waveform.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import framing as _framing
from . import stft as _stft

__all__ = [
    "overlap_add",
    "synthesis_matrices",
    "istft",
    "griffin_lim",
    "bank_pseudo_inverse",
    "feats_to_signal",
]


def overlap_add(frames, frame_shift: int, length: Optional[int] = None):
    """Overlap-add ``(..., T, L)`` frames at hop ``frame_shift`` — no
    scatter.

    Frame ``t`` is added at position ``t * frame_shift``.  Returns
    ``(..., (T-1)*frame_shift + L)`` (or trimmed/zero-padded to
    ``length``).  Decomposition: pad ``L`` up to ``K*S`` and view each
    frame as ``K`` segments of ``S`` samples; segment ``k`` of frame
    ``t`` lands at ``(t+k)*S``, so for fixed ``k`` the segments of all
    frames are *disjoint and contiguous* — one reshape — and the OLA is
    the sum of the ``K`` shifted strands.
    """
    *batch, T, L = frames.shape
    S = int(frame_shift)
    if S <= 0:
        raise ValueError(f"frame_shift must be positive, got {frame_shift}")
    nb = len(batch)
    K = -(-L // S)
    if K * S != L:
        frames = jnp.pad(frames, [(0, 0)] * (nb + 1) + [(0, K * S - L)])
    out = None
    for k in range(K):
        seg = frames[..., k * S : (k + 1) * S].reshape(*batch, T * S)
        seg = jnp.pad(seg, [(0, 0)] * nb + [(k * S, (K - 1 - k) * S)])
        out = seg if out is None else out + seg
    out = out[..., : (T - 1) * S + L]
    if length is not None:
        if length <= out.shape[-1]:
            out = out[..., :length]
        else:
            out = jnp.pad(out, [(0, 0)] * nb + [(0, length - out.shape[-1])])
    return out


def synthesis_matrices(window: np.ndarray, dft_size: int):
    """Host float64 inverse-rDFT matrices with the synthesis window
    folded in.

    Returns ``(IC, IS)``, each ``(half_len, frame_length)``, such that
    ``w * irfft([re, im], dft_size)[:frame_length] = re @ IC + im @ IS``
    — the adjoint of :func:`..ops.stft.windowed_dft_matrices` up to the
    Hermitian bin weights.
    """
    window = np.asarray(window, np.float64)
    frame_length = len(window)
    half_len = dft_size // 2 + 1
    b = np.arange(half_len, dtype=np.float64)[:, None]
    t = np.arange(frame_length, dtype=np.float64)[None, :]
    ang = 2 * np.pi * b * t / dft_size
    scale = np.full((half_len, 1), 2.0 / dft_size)
    scale[0] = 1.0 / dft_size
    if dft_size % 2 == 0:
        scale[-1] = 1.0 / dft_size
    IC = scale * np.cos(ang) * window[None, :]
    IS = -scale * np.sin(ang) * window[None, :]
    return IC, IS


def _synthesis_params(window, dft_size: int, dtype):
    IC, IS = synthesis_matrices(window, dft_size)
    C, S = _stft.windowed_dft_matrices(np.asarray(window, np.float64), dft_size)
    wsq = np.asarray(window, np.float64) ** 2
    return {
        "idft_cos": jnp.asarray(IC, dtype),
        "idft_sin": jnp.asarray(IS, dtype),
        "dft_cos": jnp.asarray(C, dtype),
        "dft_sin": jnp.asarray(S, dtype),
        "wsq": jnp.asarray(wsq, dtype),
    }


def _ls_istft(re, im, params, frame_shift: int, length, eps, frame_mask=None):
    prec = jax.lax.Precision.HIGHEST
    frames = jnp.matmul(re, params["idft_cos"], precision=prec) + jnp.matmul(
        im, params["idft_sin"], precision=prec
    )
    T = frames.shape[-2]
    if frame_mask is not None:
        # ragged batches: padded frames contribute neither signal nor
        # window power, so each example's valid extent reconstructs
        # exactly as it would solo (the OLA strands of masked frames
        # are zeros — sums over the valid region are unchanged)
        frames = frames * frame_mask[..., None]
        wsq = frame_mask[..., None] * params["wsq"]
    else:
        wsq = jnp.broadcast_to(params["wsq"], (T, params["wsq"].shape[-1]))
    num = overlap_add(frames, frame_shift, length)
    den = overlap_add(wsq, frame_shift, length)
    dt = num.dtype
    return num / jnp.maximum(den, jnp.asarray(eps, dt))


def istft(
    re,
    im,
    window: np.ndarray,
    frame_shift: int,
    *,
    dft_size: Optional[int] = None,
    length: Optional[int] = None,
    eps: float = 1e-12,
):
    """Least-squares inverse STFT of a half spectrum.

    ``re``/``im``: ``(..., T, dft_size//2 + 1)`` real/imaginary parts as
    produced by framing at hop ``frame_shift`` and multiplying by
    :func:`..ops.stft.windowed_dft_matrices` (frame ``t`` starts at
    sample ``t * frame_shift``; no implicit centering).  Returns the
    minimum-error signal ``(..., (T-1)*frame_shift + frame_length)``:
    windowed inverse frames overlap-added and normalized by the
    window-power overlap-add, which reproduces the input signal
    *exactly* at every sample where that normalizer exceeds ``eps`` —
    for any window and shift.
    """
    if dft_size is None:
        dft_size = 2 * (re.shape[-1] - 1)
    params = _synthesis_params(window, dft_size, jnp.asarray(re).dtype)
    return _ls_istft(re, im, params, int(frame_shift), length, eps)


def _frame_last(y, num_frames: int, frame_length: int, frame_shift: int):
    batch = y.shape[:-1]
    flat = y.reshape((-1, y.shape[-1]))
    frames = jax.vmap(
        lambda b: _framing.frame_padded(
            b, num_frames, frame_length, frame_shift
        )
    )(flat)
    return frames.reshape(batch + (num_frames, frame_length))


def griffin_lim(
    mag,
    window: np.ndarray,
    frame_shift: int,
    *,
    dft_size: Optional[int] = None,
    n_iters: int = 64,
    momentum: float = 0.99,
    length: Optional[int] = None,
    lengths=None,
    eps: float = 1e-12,
):
    """Fast Griffin-Lim: recover a waveform from an STFT magnitude.

    ``mag``: ``(..., T, dft_size//2 + 1)`` half-spectrum magnitudes on
    the same analysis grid as :func:`istft` (hop ``frame_shift``, the
    given analysis ``window``).  Runs ``n_iters`` accelerated
    projections (FGLA, momentum ``momentum``; ``0`` recovers classic
    Griffin-Lim & Lim 1984) as one ``lax.scan`` whose body is four
    MXU matmuls (synthesis, OLA, re-analysis, magnitude projection) —
    static shapes, no complex dtype, no FFT.  Returns the signal
    ``(..., (T-1)*frame_shift + frame_length)`` (or ``length``).
    """
    mag = jnp.asarray(mag)
    dt = mag.dtype
    if dft_size is None:
        dft_size = 2 * (mag.shape[-1] - 1)
    frame_length = len(window)
    frame_shift = int(frame_shift)
    params = _synthesis_params(window, dft_size, dt)
    T = mag.shape[-2]
    prec = jax.lax.Precision.HIGHEST
    alpha = dt.type(momentum)
    tiny = dt.type(eps)
    frame_mask = None
    if lengths is not None:
        # per-example valid frame counts: padded frames are zeroed out
        # of the magnitude AND the window-power normalizer, so every
        # example inverts exactly as it would solo (ragged batching)
        frame_mask = (
            jnp.arange(T) < jnp.asarray(lengths)[..., None]
        ).astype(dt)
        mag = mag * frame_mask[..., None]

    def project(re, im):
        """C1 then C2: consistency (istft -> stft), then magnitude."""
        y = _ls_istft(re, im, params, frame_shift, None, eps, frame_mask)
        frames = _frame_last(y, T, frame_length, frame_shift)
        re2 = jnp.matmul(frames, params["dft_cos"], precision=prec)
        im2 = jnp.matmul(frames, params["dft_sin"], precision=prec)
        norm = jnp.sqrt(re2 * re2 + im2 * im2)
        scale = mag / jnp.maximum(norm, tiny)
        return re2 * scale, im2 * scale

    re0, im0 = project(mag, jnp.zeros_like(mag))

    def step(carry, _):
        re, im, pre, pim = carry
        cre = re + alpha * (re - pre)
        cim = im + alpha * (im - pim)
        nre, nim = project(cre, cim)
        return (nre, nim, re, im), None

    (re, im, _, _), _ = jax.lax.scan(
        step, (re0, im0, mag, jnp.zeros_like(mag)), None,
        length=max(int(n_iters) - 1, 0),
    )
    return _ls_istft(re, im, params, frame_shift, length, eps, frame_mask)


def bank_pseudo_inverse(weights: np.ndarray, ridge: float = 1e-8) -> np.ndarray:
    """Host ``(num_filts, half_len)`` ridge pseudo-inverse of the folded
    filter-weight matrix.

    ``weights`` is the ``(half_len, num_filts)`` matrix from
    :func:`..ops.stft.fold_bank_to_weights` mapping a half spectrum to
    bank outputs (``feats = spec @ weights``).  Returns ``P`` with
    ``spec ~= feats @ P`` in the least-squares sense (``ridge`` is the
    Tikhonov term relative to the largest squared singular value).  The
    bank is a many-to-few projection, so the recovered spectrum is the
    minimum-norm envelope; negative leakage should be clipped by the
    caller (:func:`feats_to_signal` does).
    """
    W = np.asarray(weights, np.float64)
    G = W.T @ W
    lam = float(ridge) * max(np.linalg.norm(G, 2), 1e-300)
    # P = (W^T W + lam I)^{-1} W^T, transposed into feats @ P form
    return np.linalg.solve(G + lam * np.eye(G.shape[0]), W.T)


def feats_to_signal(
    feats,
    computer,
    *,
    n_iters: int = 64,
    momentum: float = 0.99,
    length: Optional[int] = None,
    lengths=None,
    ridge: float = 1e-8,
):
    """Invert log filter-bank features back to a waveform (Griffin-Lim).

    ``feats``: ``(..., T, num_coeffs)`` output of a
    ``ShortTimeFourierTransformFrameComputer`` (any bank).  Undoes the
    forward pipeline stage by stage — energy column dropped, log
    inverted, bank pseudo-inverted (:func:`bank_pseudo_inverse`),
    power square-rooted — then runs :func:`griffin_lim` on the
    recovered magnitude with the computer's own analysis window, hop,
    and DFT size, and trims the computer's left padding so sample 0 of
    the output aligns with sample 0 of the original signal.  ``length``
    defaults to ``T * frame_shift``.

    The inversion is as good as the bank is invertible: a 40-filter
    mel bank only pins 40 numbers per frame, so this recovers the
    spectral envelope (intelligible, vocoder-grade), not the exact
    waveform.  All device work is matmuls + reshapes (jit/vmap-safe).

    ``lengths`` (int array over the leading axes, optional) gives each
    example's valid frame count for ragged batches: padded rows are
    masked out of both the magnitudes and the Griffin-Lim window-power
    normalizer, so each row inverts exactly as it would solo; samples
    past ``lengths[i] * frame_shift`` are zero (trim on the host).
    """
    feats = jnp.asarray(feats)
    dt = feats.dtype
    if computer.includes_energy:
        feats = feats[..., 1:]
    if computer._log:
        lin = jnp.exp(feats)
    else:
        lin = feats
    P = bank_pseudo_inverse(np.asarray(computer._weights), ridge)
    spec = jnp.maximum(
        jnp.matmul(lin, jnp.asarray(P, dt), precision=jax.lax.Precision.HIGHEST),
        dt.type(0),
    )
    mag = jnp.sqrt(spec) if computer._power else spec
    T = feats.shape[-2]
    if length is None:
        length = T * computer.frame_shift
    pad_left = computer._pad_left
    y = griffin_lim(
        mag,
        np.asarray(computer._window, np.float64),
        computer.frame_shift,
        dft_size=computer._dft_size,
        n_iters=n_iters,
        momentum=momentum,
        length=pad_left + int(length),
        lengths=lengths,
    )
    return y[..., pad_left:]
