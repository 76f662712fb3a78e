"""The STFT feature pipeline as a fused array program.

The reference computes, per frame and per filter, a Python-level walk over
the truncated filter response with conjugate wrap-around
(reference: compute.py:388-460).  Because both reductions it supports are
linear in ``|H|`` (magnitude: ``sum |X_b . H_j| = sum |H_j| |X_b|``) or
``|H|^2`` (power: ``sum |X_b . H_j|^2 = sum |H_j|^2 |X_b|^2``), and
``|conj(X)| = |X|``, the *entire* per-filter walk folds at construction time
into one dense nonnegative weight matrix ``W`` over the half spectrum, and
the whole pipeline becomes

    frames -> window -> rDFT -> |.|^p -> matmul(W) -> log

On TPU the rDFT itself is optionally expressed as two real matmuls against
precomputed cosine/sine matrices (with the analysis window folded in), so the
complete computer is three MXU matmuls plus elementwise ops — no FFT op, no
gather-scatter, no Python loops.

Weight folding emulates the reference walk's *exact* index arithmetic
(including its wrap quirks for even DFT sizes) rather than the textbook
``b -> N - b`` conjugate mapping; the two disagree for wrapped complex banks
and parity with the reference is the contract.
"""

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from .xmath import xlog

from .. import config as _config

__all__ = [
    "digitize_matrix",
    "digit_group_matrices",
    "digit_kernel_matrices",
    "fold_bank_to_weights",
    "windowed_dft_matrices",
    "stft_feats_from_frames",
    "power_half_spectrum",
]

# --- exact digit-decomposition matmul (precision="double") ----------------
#
# On TPU, even a HIGHEST-precision f32 matmul rounds in its f32
# accumulator (~2 ulp of the summand scale, measured on v5e), which at
# high-cancellation DFT bins of real speech leaves log-feature errors up
# to ~1e-4 — over the 1e-5 north-star bound.  The exact tier removes the
# rounding entirely: operands split into base-64 integer digits (7-bit,
# exactly representable in bf16), so every single-pass MXU matmul
# multiplies exact products and accumulates integers below 2^24 — exact
# in f32.  Kept digit pairs reach 2^-36 relative; measured feature error
# on real speech is ~7e-7 max.  Equal-weight pairs run as one grouped
# matmul (digit_group_matrices), so the whole tier is ~6 MXU passes.

_DIGIT_BASE = 64.0  # 7-bit signed digits: products <= 64^2, K-sums < 2^24
# The earlier bf16 Pallas kernel (stft_feats_pallas_double, kept as a
# reference implementation; production uses the int8 kernel below) uses
# coarser base-256 digits: 4 x-planes (31
# bits below the frame peak after the one-bit scale margin) x 4 M-planes
# (32 bits of the f64 DFT matrices), 13 kept pairs instead of 20.  The
# margin keeps |x digits| <= 128 so every per-piece MXU pass still
# multiplies and accumulates integers below 2^24; pair weights apply per
# pair (cross-pair f32 adds, ascending) because a base-256 group sum
# would overflow the exact range.
_PDK_BASE = 256.0
_PDK_X_DIGITS = 4
_PDK_M_DIGITS = 4
_PDK_CUTOFF = 4  # truncation ~2^-40 of the summand scale
# precision="accurate": the reduced-pair variant of the fused kernel —
# the full 4x4 digit planes (30-bit signal capture is NOT negotiable:
# 3 planes measured 2.9e-3 on near-degenerate tone pairs even with every
# pair kept) but pairs cut at i+j <= 3 (10 dots instead of 13).
# Measured vs float64 (interpret mode): <=1e-6 on speech-like signals,
# 1.3e-5 worst on an adversarial high-cancellation tonal signal where
# the exact tier reads 4.8e-6 — a <=1e-5 real-speech tier at ~3/4 of
# the exact tier's MXU passes.  Configs swept (nx, nm, cutoff -> max
# err): (3,3,2) 3.5e-3; (4,4,2) 3.5e-3; (3,3,4) 2.9e-3; (4,4,3)
# 1.3e-5; (4,4,4)=double 4.8e-6.
_PAK_X_DIGITS = 4
_PAK_M_DIGITS = 4
_PAK_CUTOFF = 3
# int8 digit kernel (round 5): base-128 digits with a margin bit on BOTH
# operands keep every digit in [-64, 64] — int8 — with POWER-OF-TWO pair
# weights.  The MXU's int8 path runs at ~2x the bf16 rate on v5e, and
# int32 accumulation is ALWAYS exact, so equal-weight pairs group into
# ONE dot each with no 2^24 bound: the kernel analog of the XLA tier's
# 38->8 pass grouping.  5x5 planes capture 34 bits below the frame peak
# / of the f64 DFT matrices; 'double' cuts pairs at i+j <= 5 (19 pairs,
# 6 dots, truncation ~2^-42) and 'accurate' at i+j <= 4 (15 pairs, 5
# dots, ~2^-35 — BETTER than the old base-256 accurate's 2^-32 class).
# The po2 weights are load-bearing for accuracy, not a convenience: a
# base-254 variant (7.99 bits/plane, 13 pairs — measured 8.4 ms) put a
# ~6e-8-relative rounding on every group term (t * w rounds when w is
# not a power of two), and term-level dirt is exactly what digit-tier
# cancellation amplifies: 2e-5 on real speech regardless of plane depth
# or cutoff.  With po2 weights every term is exact (the int32->f32
# conversion splits the low 12 bits so both halves convert exactly) and
# cross-term cancellation is benign, like the bf16 kernel's.
# Measured (tools/bench_pallas_decomp*.py, v5e 128 x 15 s headline):
# bf16 pair-dot kernel 13.05 ms -> int8 c=5 10.13 ms; per-stage floors:
# grid ~1.5 ms (384 steps), input DMA ~0.9 ms (160-lane rows), digitize
# ~0.9 ms, tail ~1 ms, dots ~5.4 ms at ~80% of the int8 ceiling.
# Lower cutoffs cannot beat the plain HIGHEST path as a reduced tier:
# c=3 measures 1.9e-5 speech / 4.6e-5 adversary (HIGHEST's accuracy
# class) at a projected ~7.1 ms ~= HIGHEST's 7.2 — the fixed stages eat
# the dot savings; c=2 is 1.7e-3 on speech (not a tier).  Measured and
# rejected.
_I8_BASE = 128.0
_I8_X_DIGITS = 5
_I8_M_DIGITS = 5
_I8_CUTOFF = 5  # 'double'
_I8_ACC_CUTOFF = 4  # 'accurate'
_X_DIGITS = 5  # 30 bits below the frame peak.  4 planes (24 bits) are NOT
# enough: samples quieter than the frame peak truncate at 2^-25*peak, and
# on real speech those residues add coherently across a frame into DFT
# errors up to ~3e-6*peak — measured 5.3e-5 max log-feature error on a
# 15 s utterance.  The 5th plane puts the worst case back to ~7e-7.
_SI_X_DIGITS = 6  # the SI conv scales per signal, not per frame, so a loud
# transient followed by quiet speech stresses capture depth the way quiet
# in-frame samples do above: 5 planes measured 6.8e-6 max on a 60 dB
# click-to-speech gap; the 6th (one extra pair, +5%) holds it at ~6e-7
_M_DIGITS = 6  # 36 bits of the float64 DFT matrices
_PAIR_CUTOFF = 5  # keep i + j <= 5 (weight >= 64^-7 ~ 2^-42 of the scale)
_SI_PAIR_CUTOFF = 5  # the SI conv's own budget (see ops/si.py)
# SI precision="accurate": base-256 digit conv — 5 x-planes x 5
# A-planes, pairs cut at i + j <= 4 (15 pairs vs the base-64 tier's
# 21; MXU block-passes 105 -> 75).  The cutoff is NOT further
# reducible: on 60 dB click-to-tail signals the quiet content's
# leading digits sit 1-2 planes down, so its products live at i + j
# >= 3-4 — cutoff 3 (even with single-sided edge pairs) measured
# 2-4e-5, the same coherent quiet-sample truncation that set
# _SI_X_DIGITS = 6.  First dropped weight at cutoff 4 is
# 256^-5 * K/4 ~ 2^-33 of the signal scale (beats base-64 cutoff 5's
# 2^-29); measured <=7e-7 on the hostile set.  BOTH operands carry a
# one-bit scale margin (|d| <= 128 on every plane), so each einsum
# accumulates integers below contraction * 2^14 — exact up to
# 2^24 / 2^14 = 1024 contraction lanes = 8 shifted blocks (supports to
# ~1023 taps) with NO pass splitting; longer supports split the block
# dimension into <=8-block chunks whose partial sums stay exact
# integers (a 4-block split without the margin measured SLOWER than
# the base-64 tier — 180 vs 152 ms — from scan-step overhead).
_SAK_BASE = 256.0
_SAK_X_DIGITS = 5
_SAK_M_DIGITS = 5
_SAK_CUTOFF = 4
_SAK_KCHUNK = 8


def digitize_matrix(
    M: np.ndarray,
    ndig: int = _M_DIGITS,
    base: float = _DIGIT_BASE,
    margin: bool = False,
):
    """Host: float64 matrix -> (ndig, *M.shape) integer-valued float32
    digit planes plus the power-of-two scale, ``M ~= scale * sum_i
    digits[i] * base^-(i+1)``.  ``margin`` doubles the scale so every
    digit (including plane 0) stays <= base/2 — one captured bit traded
    for a 2x larger exact-contraction bound downstream."""
    scale = 2.0 ** np.ceil(np.log2(np.abs(M).max()))
    if margin:
        scale *= 2.0
    v = M / scale
    planes = []
    for _ in range(ndig):
        d = np.round(v * base)
        v = v * base - d
        planes.append(d.astype(np.float32))
    return np.stack(planes), np.float32(scale)


def _digitize_frames(x):
    """(..., K) float32 -> (..., _X_DIGITS * K) stacked digit planes + po2
    scale.

    Every step is exact in f32: the scale is a power of two, v*64 shifts
    the exponent, and subtracting the rounded integer leaves |v| <= 1/2.
    Planes are concatenated along the last axis (plane 0 first) so one
    matmul against a block matrix contracts all of them at once.
    """
    m = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    _, e = jnp.frexp(jnp.maximum(m, np.float32(1e-30)))
    scale = jnp.ldexp(jnp.ones_like(m), e)
    v = x / scale
    base = np.float32(_DIGIT_BASE)
    planes = []
    for _ in range(_X_DIGITS):
        d = jnp.round(v * base)
        v = v * base - d
        planes.append(d)
    return jnp.concatenate(planes, axis=-1), scale


def digit_pair_schedule(n_x: int, n_m: int, cutoff: int = _PAIR_CUTOFF):
    """Kept ``(i, j)`` digit pairs, smallest weight first — so a single
    running accumulator sums ascending in magnitude (each add rounds
    against a partial no larger than the result) and only one pair buffer
    is ever live at a time (memory, not just accuracy)."""
    pairs = [
        (i, j) for i in range(n_x) for j in range(n_m) if i + j <= cutoff
    ]
    return sorted(pairs, key=lambda ij: -(ij[0] + ij[1]))


def digit_group_schedule(n_x: int, n_m: int, K: int, cutoff=_PAIR_CUTOFF):
    """Digit pairs grouped by shared weight, split to preserve exactness.

    Pairs with equal ``s = i + j`` share the single power-of-two weight
    ``base^-(s+2)``, so each group can run as ONE matmul of the stacked
    signal planes against a block matrix (zero blocks for absent pairs)
    and stay exact: zero rows add nothing, and a group of ``m`` members
    accumulates at most ``m * K * base^2 < 2^24``.  Groups exceeding that
    bound are split; ordering is smallest weight first, as in
    :func:`digit_pair_schedule`.  Returns a list of (pair-list, weight).
    """
    cap = max(1, int(2**24 // (K * _DIGIT_BASE * _DIGIT_BASE)))
    by_s = {}
    for i, j in digit_pair_schedule(n_x, n_m, cutoff):
        by_s.setdefault(i + j, []).append((i, j))
    groups = []
    for s in sorted(by_s, reverse=True):
        members = by_s[s]
        for lo in range(0, len(members), cap):
            groups.append(
                (members[lo : lo + cap], _DIGIT_BASE ** -(s + 2))
            )
    return groups


def digit_group_matrices(C: np.ndarray, S: np.ndarray):
    """Host: per-weight-group block matrices for the exact double tier.

    The digit decomposition turns ``x @ C`` / ``x @ S`` into a sum of
    pair matmuls ``planes[i] @ C_digits[j]`` weighted ``base^-(i+j+2)``
    (see module header).  Equal-weight pairs fold into one matmul against
    a block matrix, and the cos/sin targets share it column-wise —
    ``[cos | sin]`` — with sin's identically-zero columns (DC always;
    Nyquist for even DFT sizes) dropped so the lane dimension stays
    tight.  38 MXU passes collapse to ``len(groups)`` (typically 6) with
    bit-identical group terms.

    Returns ``(mats (G, n_x*K, half + n_im), weights (G,), cos_scale,
    sin_scale, n_im)`` where the imaginary part reconstructs as
    ``im[, 1 : 1 + n_im]`` of the matmul's sin columns (zeros elsewhere).
    """
    K, half = C.shape
    cos_planes, cos_scale = digitize_matrix(C)
    sin_planes, sin_scale = digitize_matrix(S)
    n_m = cos_planes.shape[0]
    # sin's DC column is analytically zero; its Nyquist column (even DFT
    # sizes) only holds sin(pi*t) rounding dust — drop either only if its
    # digit planes vanish, so the kept columns reproduce the exact tier.
    im_hi = half - 1 if not np.any(sin_planes[:, :, -1]) else half
    assert not np.any(sin_planes[:, :, 0]), "sin DC column must be zero"
    n_im = im_hi - 1
    groups = digit_group_schedule(_X_DIGITS, n_m, K)
    mats = np.zeros((len(groups), _X_DIGITS * K, half + n_im), np.float32)
    for g, (members, _) in enumerate(groups):
        for i, j in members:
            mats[g, i * K : (i + 1) * K, :half] = cos_planes[j]
            mats[g, i * K : (i + 1) * K, half:] = sin_planes[j][:, 1:im_hi]
    weights = np.asarray([w for _, w in groups], np.float32)
    return mats, weights, cos_scale, sin_scale, n_im


def digit_kernel_matrices(
    C: np.ndarray,
    S: np.ndarray,
    W: np.ndarray,
    ndig: int = _PDK_M_DIGITS,
):
    """Host: digit planes laid out for the fused Pallas double-tier kernel.

    The kernel cannot lane-slice at the odd half-spectrum width
    (``2^k + 1``), so the combined per-digit matrix packs the Nyquist
    cosine column into the sin block's identically-zero DC slot:
    ``[cos 0..nb-1 | nyq-cos, sin 1..nb-1]`` with ``nb = dft//2`` — both
    blocks exactly ``nb`` lanes.  Requires an even DFT size.

    Uses the coarser base-256 kernel digit config (see ``_PDK_BASE``):
    13 exact pair dots instead of 20, truncation ~2^-40 of the summand
    scale.

    Returns a dict of host arrays: ``mats (n_m, K, 2*nb)`` digit planes,
    ``mixed_scale (nb,)`` (cos scale at DC, sin scale elsewhere — the
    per-matrix power-of-two scales baked per column), ``mask (nb,)``
    (zero at DC, one elsewhere: isolates the imaginary part), ``w_hi`` /
    ``w_lo`` ``(nb, F)`` (filter weights for bins 0..nb-1, split
    f32-hi + residual), ``w_nyq (nb, F)`` (Nyquist weight row at DC,
    zeros elsewhere), and ``cos_scale``.
    """
    K, half = C.shape
    assert half % 2 == 1, "even DFT sizes only (half = dft//2 + 1)"
    nb = half - 1
    cos_planes, cos_scale = digitize_matrix(C, ndig, _PDK_BASE)
    sin_planes, sin_scale = digitize_matrix(S, ndig, _PDK_BASE)
    n_m = cos_planes.shape[0]
    mats = np.zeros((n_m, K, 2 * nb), np.float32)
    for j in range(n_m):
        mats[j, :, :nb] = cos_planes[j][:, :nb]
        mats[j, :, nb] = cos_planes[j][:, nb]  # Nyquist cos in the DC slot
        mats[j, :, nb + 1 :] = sin_planes[j][:, 1:nb]
    mixed_scale = np.full((nb,), sin_scale, np.float32)
    mixed_scale[0] = cos_scale
    mask = np.ones((nb,), np.float32)
    mask[0] = 0.0
    w_hi = W[:nb].astype(np.float32)
    w_lo = (W[:nb] - w_hi.astype(np.float64)).astype(np.float32)
    w_nyq = np.zeros((nb, W.shape[1]), np.float32)
    w_nyq[0] = W[nb].astype(np.float32)
    return {
        "mats": mats,
        "mixed_scale": mixed_scale,
        "mask": mask,
        "w_hi": w_hi,
        "w_lo": w_lo,
        "w_nyq": w_nyq,
        "cos_scale": np.float32(cos_scale),
    }


def int8_kernel_matrices(
    C: np.ndarray,
    S: np.ndarray,
    W: np.ndarray,
    cutoff: int = _I8_CUTOFF,
):
    """Host: weight-grouped int8 digit planes for the fused int8 kernel.

    Same combined ``[cos 0..nb-1 | nyq-cos, sin 1..nb-1]`` lane layout as
    :func:`digit_kernel_matrices` (even DFT sizes only), but digitized at
    base 128 with margin bits (|digit| <= 64: int8, po2 weights), and with the
    equal-weight pair groups pre-stacked row-wise: group ``s = i + j``
    multiplies the lane-concatenated x planes ``[x_i ...]`` against the
    row-stack of the matching M planes in ONE int8 dot with exact int32
    accumulation.  Returns ``gmats (sum_g m_g*K, 2*nb) int8``, the group
    schedule ``offsets`` (``(s, x_plane_ids, row_offset, row_span)``
    tuples, ascending weight), and the same tail arrays as the bf16
    kernel layout.
    """
    K, half = C.shape
    assert half % 2 == 1, "even DFT sizes only (half = dft//2 + 1)"
    nb = half - 1
    n_x, n_m = _I8_X_DIGITS, _I8_M_DIGITS
    cos_planes, cos_scale = digitize_matrix(C, n_m, _I8_BASE, margin=True)
    sin_planes, sin_scale = digitize_matrix(S, n_m, _I8_BASE, margin=True)
    assert np.abs(cos_planes).max() <= _I8_BASE / 2
    assert np.abs(sin_planes).max() <= _I8_BASE / 2
    mats = np.zeros((n_m, K, 2 * nb), np.float32)
    for j in range(n_m):
        mats[j, :, :nb] = cos_planes[j][:, :nb]
        mats[j, :, nb] = cos_planes[j][:, nb]  # Nyquist cos in the DC slot
        mats[j, :, nb + 1 :] = sin_planes[j][:, 1:nb]
    groups = []
    for s in range(n_x + n_m - 2, -1, -1):  # ascending weight
        if s > cutoff:
            continue
        members = [(i, s - i) for i in range(n_x) if 0 <= s - i < n_m]
        if members:
            groups.append((s, members))
    gmats = np.concatenate(
        [
            np.concatenate([mats[j] for (_, j) in mem], axis=0)
            for _, mem in groups
        ],
        axis=0,
    ).astype(np.int8)
    offsets = []
    off = 0
    for s, mem in groups:
        offsets.append((s, tuple(i for i, _ in mem), off, len(mem) * K))
        off += len(mem) * K
    mixed_scale = np.full((nb,), sin_scale, np.float32)
    mixed_scale[0] = cos_scale
    mask = np.ones((nb,), np.float32)
    mask[0] = 0.0
    w_hi = W[:nb].astype(np.float32)
    w_lo = (W[:nb] - w_hi.astype(np.float64)).astype(np.float32)
    w_nyq = np.zeros((nb, W.shape[1]), np.float32)
    w_nyq[0] = W[nb].astype(np.float32)
    return {
        "gmats": gmats,
        "offsets": tuple(offsets),
        "mixed_scale": mixed_scale,
        "mask": mask,
        "w_hi": w_hi,
        "w_lo": w_lo,
        "w_nyq": w_nyq,
        "cos_scale": np.float32(cos_scale),
    }


def fold_bank_to_weights(bank, dft_size: int, use_power: bool) -> np.ndarray:
    """Fold a bank's truncated responses into half-spectrum weights.

    Returns a float64 ``(dft_size // 2 + 1, num_filts)`` matrix ``W`` such
    that feature ``f`` of a frame equals ``sum_b W[b, f] * |X_b|^p`` with
    ``p = 2`` (power) or ``1`` (magnitude), exactly reproducing the
    reference's truncated-response walk (reference: compute.py:416-460),
    including the factor of 2 applied to real banks for Hermitian symmetry.
    """
    half_len = dft_size // 2 + 1
    mod = half_len % 2
    p = 2 if use_power else 1
    half_positions = np.arange(half_len)
    weights = np.zeros((half_len, bank.num_filts), dtype=np.float64)
    for filt_idx in range(bank.num_filts):
        start_idx, truncated = bank.get_truncated_response(filt_idx, dft_size)
        magp = np.abs(truncated) ** p
        trunc_len = len(truncated)
        # emulate the reference's alternating direct/conjugate segment walk,
        # accumulating |H|^p at whichever half-spectrum bin each tap lands on
        consumed = 0
        conjugate = False
        while consumed < trunc_len:
            if conjugate:
                seg_len = (
                    min(start_idx + trunc_len - consumed, half_len - 2 + mod)
                    - start_idx
                )
                seg_len = max(0, seg_len)
                if seg_len:
                    bins = half_positions[
                        (-2 + mod - start_idx) : (-2 + mod - start_idx - seg_len) : -1
                    ]
                    np.add.at(
                        weights[:, filt_idx], bins, magp[consumed : consumed + seg_len]
                    )
                start_idx -= half_len - 2 + mod
            else:
                seg_len = min(start_idx + trunc_len - consumed, half_len) - start_idx
                seg_len = max(0, seg_len)
                if seg_len:
                    bins = half_positions[start_idx : start_idx + seg_len]
                    np.add.at(
                        weights[:, filt_idx], bins, magp[consumed : consumed + seg_len]
                    )
                start_idx -= half_len
            conjugate = not conjugate
            consumed += seg_len
            start_idx = max(0, start_idx)
    if bank.is_real:
        weights *= 2
    return weights


def windowed_dft_matrices(window: np.ndarray, dft_size: int):
    """Real cos/sin DFT matrices with the analysis window folded in.

    Returns float64 ``(frame_length, half_len)`` matrices ``C, S`` with
    ``X_b = sum_t w_t x_t e^{-2 pi i t b / N}``, i.e.
    ``Re X = x @ C`` and ``Im X = x @ S``.
    """
    frame_length = len(window)
    half_len = dft_size // 2 + 1
    t = np.arange(frame_length, dtype=np.float64)[:, None]
    b = np.arange(half_len, dtype=np.float64)[None, :]
    ang = 2 * np.pi * t * b / dft_size
    C = np.cos(ang) * window[:, None]
    S = -np.sin(ang) * window[:, None]
    return C, S


def _resolve_fft_mode(mode: Optional[str], dft_size: int) -> str:
    if mode is None or mode == "auto":
        mode = _config.FFT_MODE
    if mode == "auto":
        # the DFT-as-matmul runs on the MXU and wins for speech-sized DFTs
        mode = "matmul" if dft_size <= 4096 else "fft"
    return mode


def _resolve_precision(precision):
    if precision is None or precision == "highest":
        return jax.lax.Precision.HIGHEST
    if isinstance(precision, str):
        return jax.lax.Precision(precision.lower())
    return precision


def power_half_spectrum(frames, params, dft_size: int, fft_mode: Optional[str]):
    """``|X_b|^2`` over the half spectrum of windowed frames.

    ``frames``: (..., frame_length) raw (unwindowed) frames.
    ``params``: dict with ``window`` (frame_length,) and, for matmul mode,
    ``dft_cos``/``dft_sin`` (frame_length, half_len).
    """
    mode = _resolve_fft_mode(fft_mode, dft_size)
    if mode == "fft":
        spect = jnp.fft.rfft(frames * params["window"], n=dft_size, axis=-1)
        return jnp.real(spect) ** 2 + jnp.imag(spect) ** 2
    # matmul mode: window folded into the DFT matrices
    re = jnp.matmul(
        frames, params["dft_cos"], precision=jax.lax.Precision.HIGHEST
    )
    im = jnp.matmul(
        frames, params["dft_sin"], precision=jax.lax.Precision.HIGHEST
    )
    return re * re + im * im


def _digit_feats(frames, params, use_power: bool, dft_size: int):
    """The ``precision="double"`` pipeline: exact grouped digit matmuls
    for the two DFT stages plus an operand-split (hi+lo) filter-weight
    matmul.

    Measured on v5e against float64 on real speech: ~8e-7 max abs log
    error (the residual is the W/log stage, not the DFT).  The grouped
    formulation (:func:`digit_group_matrices`) runs all equal-weight
    digit pairs for cos AND sin as one MXU pass — typically 6 passes
    plus 2 for the weights, down from 38 ungrouped.
    """
    half = dft_size // 2 + 1
    X, scale = _digitize_frames(frames)
    # digits are integers below 2^7 — exact in bf16, so the operands are
    # stored and read at half the HBM traffic with no rounding anywhere
    X = X.astype(jnp.bfloat16)
    mats = params["dft_group_mats"]  # (G, n_x*K, half + n_im), bf16
    gw = params["dft_group_weights"]
    n_im = mats.shape[-1] - half
    acc = None
    for g in range(mats.shape[0]):
        p = jnp.matmul(X, mats[g], preferred_element_type=jnp.float32)
        term = p * gw[g]  # exact pass, po2 weight
        acc = term if acc is None else acc + term
    re = acc[..., :half] * (scale * params["dft_cos_scale"])
    im_mid = acc[..., half:] * (scale * params["dft_sin_scale"])
    power = re * re
    power = power.at[..., 1 : 1 + n_im].add(im_mid * im_mid)
    spec = power if use_power else jnp.sqrt(power)
    hi = jax.lax.Precision.HIGHEST
    return jnp.matmul(spec, params["weights"], precision=hi) + jnp.matmul(
        spec, params["weights_lo"], precision=hi
    )


def _matmul_feats_nyquist_split(frames, params, use_power: bool, precision=None):
    """Matmul-mode features with the Nyquist bin as a rank-1 correction.

    For even DFT sizes the half spectrum has ``2^k + 1`` bins, which pads
    the MXU lane dimension by a full extra 128-tile (~33% wasted work on
    the two big DFT matmuls).  Splitting the last bin — whose imaginary
    part is identically zero (``sin(pi t) = 0``) — keeps the matmuls a
    clean power-of-two wide and adds it back as one dot product and an
    outer product.  Numerically identical to the unsplit path.
    """
    prec = _resolve_precision(precision)
    cos, sin, w = params["dft_cos"], params["dft_sin"], params["weights"]
    re = jnp.matmul(frames, cos[:, :-1], precision=prec)
    im = jnp.matmul(frames, sin[:, :-1], precision=prec)
    power = re * re + im * im
    spec = power if use_power else jnp.sqrt(power)
    feats = jnp.matmul(spec, w[:-1], precision=prec)
    x_nyq = jnp.matmul(frames, cos[:, -1:], precision=prec)
    nyq = x_nyq * x_nyq if use_power else jnp.abs(x_nyq)
    return feats + nyq * w[-1]


def stft_feats_from_frames(
    frames,
    params,
    *,
    dft_size: int,
    use_log: bool,
    use_power: bool,
    include_energy: bool,
    log_floor: float,
    fft_mode: Optional[str] = None,
    precision: Optional[str] = None,
):
    """Features for a batch of raw frames: the full post-framing pipeline.

    ``frames``: (..., frame_length); returns (..., num_coeffs).

    Pipeline: [energy from raw frame] ; window -> rDFT -> |.|^2 ->
    [sqrt for magnitude mode] -> matmul with folded filter weights ->
    [log floor].  Matches reference ``_compute_frame``
    (reference: compute.py:388-460) with the filter walk pre-folded into
    ``params["weights"]``.
    """
    frame_length = frames.shape[-1]
    mode = _resolve_fft_mode(fft_mode, dft_size)
    if precision in ("double", "accurate"):
        # 'accurate' shares the exact XLA digit path off-kernel: its
        # reduced-plane formulation only pays on the fused Pallas tier
        feats = _digit_feats(frames, params, use_power, dft_size)
    elif mode != "fft" and dft_size % 2 == 0:
        feats = _matmul_feats_nyquist_split(
            frames, params, use_power, precision
        )
    else:
        power_spec = power_half_spectrum(frames, params, dft_size, fft_mode)
        spec = power_spec if use_power else jnp.sqrt(power_spec)
        feats = jnp.matmul(
            spec, params["weights"], precision=_resolve_precision(precision)
        )
    if use_log:
        feats = xlog(jnp.maximum(feats, log_floor))
    if include_energy:
        energy = jnp.sum(frames * frames, axis=-1) / frame_length
        if not use_power:
            energy = jnp.sqrt(energy)
        if use_log:
            energy = xlog(jnp.maximum(energy, log_floor))
        feats = jnp.concatenate([energy[..., None], feats], axis=-1)
    return feats
