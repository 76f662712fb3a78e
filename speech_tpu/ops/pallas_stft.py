"""Fused Pallas TPU kernels for the STFT feature pipeline.

The kernels:

- :func:`stft_feats_pallas` — the full fused pipeline from padded signals.
  Frames are never materialized: the signal arrives as rows of
  ``frame_shift`` samples and each grid step maps an *overlapping* block of
  rows into VMEM via Element-indexed BlockSpecs (block ``j`` covers rows
  ``[j*B, j*B + B + q)``), then runs the window-folded DFT matmuls as
  per-row-band accumulations, |.|^p, the filter matmul, and the log —
  everything between the raw signal and the features stays in VMEM.
- :func:`stft_feats_pallas_from_frames` — same post-framing fusion for
  pre-materialized frames.
- :func:`stft_feats_pallas_int8` — the exact/accurate digit tiers on the
  int8 MXU (round 5): base-128 margin digits (|d| <= 64, power-of-two
  weights), exact int32 accumulation, one dot per equal-weight pair
  group.  Carries both ``precision='double'`` and ``'accurate'`` (the
  pair schedule is baked into the params).
- :func:`stft_feats_pallas_double` — the earlier bf16 digit kernel
  (base-256 per-pair dots), kept as a reference implementation; the
  production digit path is the int8 kernel.

Measured on v5e (128 x 15 s batch, host-readback timing): the fused kernel
at DEFAULT matmul precision is the fastest tier end to end (7.5 ms,
~255,000x real time, ~1.5e-2 max abs error on log features); at HIGHEST
precision Mosaic's f32 matmuls trail XLA's (13.1 ms vs 9.2 ms), so the
accurate default remains the XLA matmul path.  The int8 digit kernel runs
the exact tier at 10.5 ms (~183,000x RT) and the accurate schedule at
9.8 ms (~196,000x) — see ops/stft.py's ``_I8_*`` notes and
ARCHITECTURE.md for the measured decomposition.

Mosaic notes (hard-won): vector slices must be unit-stride; no 1D->2D
reshape of loaded vectors; no concat of slices at different sublane
offsets (values inherit their source slice's layout OFFSETS — a store
to a scratch ref normalizes them, which is what lets the int8 kernel
lane-concatenate its digit planes); block sublane dims must be
multiples of 8; Element-indexed blocks must be all-Element;
``jnp.dot(int8, int8, preferred_element_type=int32)`` engages the int8
MXU (~1.8x bf16 measured) — XLA einsums do NOT.
"""

import functools

from typing import Optional


import jax
import jax.numpy as jnp

from .xmath import xlog

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

try:  # Element-indexed (overlapping) blocks; private API in this jax
    from jax._src.pallas.core import Element as _Element
except ImportError:  # pragma: no cover
    _Element = None

__all__ = [
    "stft_feats_pallas",
    "stft_feats_pallas_from_frames",
    "stft_feats_pallas_double",
    "stft_feats_pallas_int8",
]

# v5e scoped-VMEM budget the int8 kernel sizes itself against (the
# hardware limit is 16 MB; headroom for Mosaic's own scratch)
_I8_VMEM_BUDGET = 13 * 1024 * 1024

# default frame-block sizes (grid-step granularity).  int8: 768 beat 512
# (fewer grid steps; the int8 scratch is 4x smaller so VMEM allows it)
# and 1024 regressed — see tools/bench_int8_prod.py
_I8_BLOCK_FRAMES = 768
_BLOCK_FRAMES = 512


def padded_need(
    num_frames: int,
    frame_length: int,
    frame_shift: int,
    block_frames: int,
) -> int:
    """The padded sample count the fused kernels' rows layout needs.

    Callers that pad their own buffers (``pad_signal_full(...,
    min_len=padded_need(...))``) save the kernels' internal whole-buffer
    pad copy.
    """
    q_full, rem = divmod(frame_length, frame_shift)
    q_rows = q_full + (1 if rem else 0)
    blocks = -(-num_frames // block_frames)
    seg_rows = -(-(block_frames + q_rows) // 8) * 8
    return (blocks * block_frames + (seg_rows - block_frames)) * frame_shift


def _resolve_precision(precision):
    if precision is None or precision == "highest":
        return jax.lax.Precision.HIGHEST
    if isinstance(precision, str):
        return jax.lax.Precision(precision.lower())
    return precision


def _feats_from_pieces(
    pieces,
    cos_ref,
    sin_ref,
    w_ref,
    *,
    frame_shift: int,
    frame_length: int,
    use_log: bool,
    use_power: bool,
    include_energy: bool,
    log_floor: float,
    prec,
):
    """Shared kernel tail: per-band DFT accumulation -> features.

    ``pieces``: list of ``(block, row_offset, width)`` — the unit-stride
    row bands whose concatenation along the last axis would form the frame
    matrix (never materialized; Mosaic cannot concat at mixed sublane
    offsets).  ``frames @ M == sum_r piece_r @ M_r``.
    """
    re = im = energy = None
    for piece, r, width in pieces:
        band = slice(r * frame_shift, r * frame_shift + width)
        re_t = jnp.dot(
            piece, cos_ref[band, :], preferred_element_type=jnp.float32,
            precision=prec,
        )
        im_t = jnp.dot(
            piece, sin_ref[band, :], preferred_element_type=jnp.float32,
            precision=prec,
        )
        re = re_t if re is None else re + re_t
        im = im_t if im is None else im + im_t
        if include_energy:
            e_t = jnp.sum(piece * piece, axis=-1, keepdims=True)
            energy = e_t if energy is None else energy + e_t
    power = re * re + im * im
    spec = power if use_power else jnp.sqrt(power)
    feats = jnp.dot(
        spec, w_ref[:], preferred_element_type=jnp.float32, precision=prec
    )
    if use_log:
        feats = xlog(jnp.maximum(feats, log_floor))
    if include_energy:
        energy = energy / frame_length
        if not use_power:
            energy = jnp.sqrt(energy)
        if use_log:
            energy = xlog(jnp.maximum(energy, log_floor))
        feats = jnp.concatenate([energy, feats], axis=-1)
    return feats


def _rows_kernel(
    rows_ref,
    cos_ref,
    sin_ref,
    w_ref,
    out_ref,
    *,
    block_frames: int,
    frame_shift: int,
    frame_length: int,
    use_log: bool,
    use_power: bool,
    include_energy: bool,
    log_floor: float,
    prec,
):
    rows = rows_ref[0]  # (seg_rows, frame_shift); frame k = rows k..k+q
    q_full, rem = divmod(frame_length, frame_shift)
    pieces = [
        (
            jax.lax.slice(rows, (r, 0), (r + block_frames, frame_shift)),
            r,
            frame_shift,
        )
        for r in range(q_full)
    ]
    if rem:
        pieces.append(
            (
                jax.lax.slice(rows, (q_full, 0), (q_full + block_frames, rem)),
                q_full,
                rem,
            )
        )
    out_ref[0] = _feats_from_pieces(
        pieces,
        cos_ref,
        sin_ref,
        w_ref,
        frame_shift=frame_shift,
        frame_length=frame_length,
        use_log=use_log,
        use_power=use_power,
        include_energy=include_energy,
        log_floor=log_floor,
        prec=prec,
    )


def _frames_kernel(
    frames_ref,
    cos_ref,
    sin_ref,
    w_ref,
    out_ref,
    *,
    frame_length: int,
    use_log: bool,
    use_power: bool,
    include_energy: bool,
    log_floor: float,
    prec,
):
    frames = frames_ref[0]
    out_ref[0] = _feats_from_pieces(
        [(frames, 0, frame_length)],
        cos_ref,
        sin_ref,
        w_ref,
        frame_shift=frame_length,  # single full-width band
        frame_length=frame_length,
        use_log=use_log,
        use_power=use_power,
        include_energy=include_energy,
        log_floor=log_floor,
        prec=prec,
    )


def _consts(params):
    return (
        jnp.asarray(params["dft_cos"], jnp.float32),
        jnp.asarray(params["dft_sin"], jnp.float32),
        jnp.asarray(params["weights"], jnp.float32),
    )


def stft_feats_pallas_from_frames(
    frames,
    params,
    *,
    use_log: bool,
    use_power: bool,
    include_energy: bool,
    log_floor: float,
    block_frames: int = 512,
    interpret: bool = False,
    precision: Optional[str] = None,
):
    """Fused features for raw frames ``(batch, num_frames, frame_length)``."""
    frames = jnp.asarray(frames, jnp.float32)
    batch, num_frames, frame_length = frames.shape
    cos, sin, weights = _consts(params)
    num_coeffs = weights.shape[1] + int(include_energy)
    blocks = -(-num_frames // block_frames)
    grid_frames = blocks * block_frames
    if grid_frames != num_frames:
        frames = jnp.pad(
            frames, ((0, 0), (0, grid_frames - num_frames), (0, 0))
        )
    kernel = functools.partial(
        _frames_kernel,
        frame_length=frame_length,
        use_log=use_log,
        use_power=use_power,
        include_energy=include_energy,
        log_floor=log_floor,
        prec=_resolve_precision(precision),
    )
    out = pl.pallas_call(
        kernel,
        grid=(batch, blocks),
        in_specs=[
            pl.BlockSpec(
                (1, block_frames, frame_length),
                lambda b, j: (b, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_frames, num_coeffs),
            lambda b, j: (b, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (batch, grid_frames, num_coeffs), jnp.float32
        ),
        interpret=interpret,
    )(frames, cos, sin, weights)
    return out[:, :num_frames]


def _double_rows_kernel(
    rows_ref,
    mats_ref,
    mscale_ref,
    mask_ref,
    whi_ref,
    wlo_ref,
    wnyq_ref,
    out_ref,
    *,
    block_frames: int,
    frame_shift: int,
    frame_length: int,
    n_x: int,
    base: float,
    pairs,
    cos_scale: float,
    use_log: bool,
    use_power: bool,
    include_energy: bool,
    log_floor: float,
):
    """Fused exact digit tier: the whole ``precision="double"`` pipeline
    in VMEM — per-frame power-of-two scaling, digitization, the exact
    pair matmuls, and the spectrum->features tail.  Frames and digit
    planes never touch HBM.

    Same construction as the XLA digit path (ops/stft.py
    ``_digit_feats``) but with the coarser base-256 kernel config: every
    dot multiplies integer digits (exact in bf16) and accumulates
    integers below 2^24 (exact in f32); the one-bit scale margin keeps
    |x digits| <= base/2 so cross-piece f32 integer adds stay exact
    too.  Pair terms are added ascending in magnitude under power-of-two
    weights (``pairs``: static (i, j, weight) triples).
    """
    rows = rows_ref[0]  # (seg_rows, frame_shift); frame k = rows k..k+q
    q_full, rem = divmod(frame_length, frame_shift)
    pieces = [
        (
            jax.lax.slice(rows, (r, 0), (r + block_frames, frame_shift)),
            r,
            frame_shift,
        )
        for r in range(q_full)
    ]
    if rem:
        pieces.append(
            (
                jax.lax.slice(rows, (q_full, 0), (q_full + block_frames, rem)),
                q_full,
                rem,
            )
        )

    m = energy = None
    for piece, _, _ in pieces:
        pm = jnp.max(jnp.abs(piece), axis=-1, keepdims=True)
        m = pm if m is None else jnp.maximum(m, pm)
        if include_energy:
            e_t = jnp.sum(piece * piece, axis=-1, keepdims=True)
            energy = e_t if energy is None else energy + e_t
    # scale = 2 * the jnp.frexp scale: frexp puts the significand in
    # [0.5, 1), i.e. 2^(E+1) with E the biased exponent field; the extra
    # margin bit makes |first digit| <= base/2.  One integer add on the
    # bit pattern (Mosaic has no frexp/ldexp).
    m = jnp.maximum(m, jnp.float32(1e-30))
    bits = jax.lax.bitcast_convert_type(m, jnp.int32)
    scale = jax.lax.bitcast_convert_type(
        ((bits >> 23) + 2) << 23, jnp.float32
    )
    inv = jnp.float32(1.0) / scale  # power of two: exact

    fbase = jnp.float32(base)
    planes = []  # per piece: list of n_x digit planes (exact)
    for piece, _, _ in pieces:
        v = piece * inv
        ps = []
        for _ in range(n_x):
            d = jnp.round(v * fbase)
            v = v * fbase - d
            ps.append(d)
        planes.append(ps)

    acc = None
    for i, j, w in pairs:  # ascending magnitude, weights po2
        g = None
        for (piece, r, width), ps in zip(pieces, planes):
            lo = r * frame_shift
            t = jnp.dot(
                ps[i],
                mats_ref[j, lo : lo + width, :],
                preferred_element_type=jnp.float32,
            )  # integer digits: the bf16 pass is exact
            g = t if g is None else g + t
        term = g * jnp.float32(w)
        acc = term if acc is None else acc + term

    nb = mask_ref.shape[0]
    re = acc[:, :nb] * (scale * jnp.float32(cos_scale))
    mixed = acc[:, nb:] * (scale * mscale_ref[:])
    mask = mask_ref[:]
    im = mixed * mask  # bins 1..nb-1; DC slot (Nyquist cos) zeroed
    power = re * re + im * im
    spec = power if use_power else jnp.sqrt(power)
    nyq = mixed - im  # Nyquist X in the DC slot, zeros elsewhere
    nyq_spec = nyq * nyq if use_power else jnp.abs(nyq)
    hi = jax.lax.Precision.HIGHEST
    feats = (
        jnp.dot(spec, whi_ref[:], preferred_element_type=jnp.float32,
                precision=hi)
        + jnp.dot(spec, wlo_ref[:], preferred_element_type=jnp.float32,
                  precision=hi)
        + jnp.dot(nyq_spec, wnyq_ref[:], preferred_element_type=jnp.float32,
                  precision=hi)
    )
    if use_log:
        feats = xlog(jnp.maximum(feats, log_floor))
    if include_energy:
        energy = energy / frame_length
        if not use_power:
            energy = jnp.sqrt(energy)
        if use_log:
            energy = xlog(jnp.maximum(energy, log_floor))
        feats = jnp.concatenate([energy, feats], axis=-1)
    out_ref[0] = feats


def stft_feats_pallas_double(
    padded,
    params,
    *,
    num_frames: int,
    frame_length: int,
    frame_shift: int,
    dft_size: int,
    use_log: bool,
    use_power: bool,
    include_energy: bool,
    log_floor: float,
    block_frames: int = 512,
    interpret: bool = False,
    n_x: Optional[int] = None,
    cutoff: Optional[int] = None,
):
    """Fused Pallas digit-tier kernel for padded signals.

    Default plane config is the exact ``precision="double"`` tier
    (4 x-planes, 13 pair dots); ``n_x``/``cutoff`` select reduced-pair
    variants — ``precision="accurate"`` passes (4, 3) for 10 dots at
    <=1e-5 (plane DEPTH is not reducible: 3-plane configs measured
    2.9e-3 on tone pairs — see ops/stft.py's sweep notes; only the pair
    CUTOFF trims).  Same contract as :func:`stft_feats_pallas`; falls
    back to
    XLA framing + the XLA (exact) digit path when overlapping blocks are
    unavailable, the shift is not sublane-aligned, the DFT size is not
    lane-aligned (params carry no kernel layout), or the frame is too
    long for exact base-256 sums.
    """
    from . import stft as _stft

    if n_x is None:
        n_x = _stft._PDK_X_DIGITS
    if cutoff is None:
        cutoff = _stft._PDK_CUTOFF

    padded = jnp.asarray(padded, jnp.float32)
    # frame-wide integer sums must stay exact in f32 at the kernel's
    # base-256 digits: K * (base/2) * base <= 2^24, i.e. K <= 512
    K_exact = frame_length * int(_stft._PDK_BASE) ** 2 // 2 <= 1 << 24
    if (
        _Element is None
        or frame_shift % 8
        or "pdk_mats" not in params
        or not K_exact
    ):
        from . import framing as _framing

        frames = jax.vmap(
            lambda p: _framing.frame_padded(
                p, num_frames, frame_length, frame_shift
            )
        )(padded)
        return _stft.stft_feats_from_frames(
            frames,
            params,
            dft_size=dft_size,
            use_log=use_log,
            use_power=use_power,
            include_energy=include_energy,
            log_floor=log_floor,
            fft_mode="matmul",
            precision="double",
        )

    batch = padded.shape[0]
    mats = params["pdk_mats"]
    n_m = mats.shape[0]
    pairs = [
        (i, j, _stft._PDK_BASE ** -(i + j + 2))
        for i, j in _stft.digit_pair_schedule(n_x, n_m, cutoff)
    ]
    num_coeffs = params["pdk_w_hi"].shape[1] + int(include_energy)
    q_full, rem = divmod(frame_length, frame_shift)
    q_rows = q_full + (1 if rem else 0)
    blocks = -(-num_frames // block_frames)
    seg_rows = -(-(block_frames + q_rows) // 8) * 8
    need_rows = blocks * block_frames + (seg_rows - block_frames)
    need = need_rows * frame_shift
    if padded.shape[1] < need:
        padded = jnp.pad(padded, ((0, 0), (0, need - padded.shape[1])))
    rows = padded[:, :need].reshape(batch, need_rows, frame_shift)

    kernel = functools.partial(
        _double_rows_kernel,
        block_frames=block_frames,
        frame_shift=frame_shift,
        frame_length=frame_length,
        n_x=n_x,
        base=_stft._PDK_BASE,
        pairs=pairs,
        cos_scale=float(params["pdk_cos_scale"]),
        use_log=use_log,
        use_power=use_power,
        include_energy=include_energy,
        log_floor=log_floor,
    )
    out = pl.pallas_call(
        kernel,
        grid=(batch, blocks),
        in_specs=[
            pl.BlockSpec(
                (_Element(1), _Element(seg_rows), _Element(frame_shift)),
                lambda b, j: (b, j * block_frames, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(
            (1, block_frames, num_coeffs),
            lambda b, j: (b, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (batch, blocks * block_frames, num_coeffs), jnp.float32
        ),
        cost_estimate=pl.CostEstimate(
            flops=2
            * batch
            * blocks
            * block_frames
            * frame_length
            * mats.shape[2]
            * len(pairs),
            bytes_accessed=4 * batch * (need + num_frames * num_coeffs),
            transcendentals=batch * num_frames * num_coeffs,
        ),
        interpret=interpret,
    )(
        rows,
        mats,
        params["pdk_mixed_scale"],
        params["pdk_mask"],
        params["pdk_w_hi"],
        params["pdk_w_lo"],
        params["pdk_w_nyq"],
    )
    return out[:, :num_frames]


def _int8_rows_kernel(
    rows_ref,
    gmats_ref,
    mscale_ref,
    mask_ref,
    whi_ref,
    wlo_ref,
    wnyq_ref,
    out_ref,
    *scratch,
    block_frames: int,
    frame_shift: int,
    frame_length: int,
    n_x: int,
    base: float,
    offsets,
    cos_scale: float,
    use_log: bool,
    use_power: bool,
    include_energy: bool,
    log_floor: float,
):
    """Fused int8 digit tier (see ops/stft.py ``_I8_*``): per-frame
    power-of-two scaling, base-128 margin digitization into int8 scratch
    planes (the scratch stores also normalize the pieces' Mosaic layout
    offsets, which is what lets the planes lane-concatenate), ONE int8
    MXU dot per weight group with exact int32 accumulation, and the
    spectrum->features tail — frames and digit planes never touch HBM.
    """
    rows = rows_ref[0]
    q_full, rem = divmod(frame_length, frame_shift)
    pieces = [
        (
            jax.lax.slice(rows, (r, 0), (r + block_frames, frame_shift)),
            r,
            frame_shift,
        )
        for r in range(q_full)
    ]
    if rem:
        pieces.append(
            (
                jax.lax.slice(rows, (q_full, 0), (q_full + block_frames, rem)),
                q_full,
                rem,
            )
        )

    m = energy = None
    for piece, _, _ in pieces:
        pm = jnp.max(jnp.abs(piece), axis=-1, keepdims=True)
        m = pm if m is None else jnp.maximum(m, pm)
        if include_energy:
            e_t = jnp.sum(piece * piece, axis=-1, keepdims=True)
            energy = e_t if energy is None else energy + e_t
    # scale = 4 * frexp's scale: |x|/scale <= 1/2, so the first digit
    # (and, by the rounding residual bound, every digit) stays <= 127.
    # One integer add on the exponent bits (Mosaic has no frexp/ldexp).
    m = jnp.maximum(m, jnp.float32(1e-30))
    bits = jax.lax.bitcast_convert_type(m, jnp.int32)
    scale = jax.lax.bitcast_convert_type(
        ((bits >> 23) + 2) << 23, jnp.float32
    )
    inv = jnp.float32(1.0) / scale

    fbase = jnp.float32(base)
    for piece, r, width in pieces:
        v = piece * inv
        lo = r * frame_shift
        for i in range(n_x):
            d = jnp.round(v * fbase)
            v = v * fbase - d
            scratch[i][:, lo : lo + width] = d.astype(jnp.int8)
    wides = [s[...] for s in scratch[:n_x]]

    acc = None
    for s, xs, off, span in offsets:  # ascending weight order
        xg = (
            wides[xs[0]]
            if len(xs) == 1
            else jnp.concatenate([wides[i] for i in xs], axis=-1)
        )
        mg = gmats_ref[off : off + span, :]
        t = jnp.dot(xg, mg, preferred_element_type=jnp.int32)
        # group sums can exceed 2^24 (up to m*K*127^2), where a direct
        # int32->f32 conversion rounds — and the log amplifies that dust
        # at quiet bins (measured 1.9e-5 on real speech).  Splitting the
        # low 12 bits out makes both conversions exact; the weighted
        # f32 adds then round like any other acc-chain term.
        t_lo = jax.lax.bitwise_and(t, jnp.int32(4095))
        t_hi = t - t_lo
        w = jnp.float32(base ** -(s + 2))
        term = t_hi.astype(jnp.float32) * w + t_lo.astype(jnp.float32) * w
        acc = term if acc is None else acc + term

    nb = mask_ref.shape[0]
    re = acc[:, :nb] * (scale * jnp.float32(cos_scale))
    mixed = acc[:, nb:] * (scale * mscale_ref[:])
    mask = mask_ref[:]
    im = mixed * mask  # bins 1..nb-1; DC slot (Nyquist cos) zeroed
    power = re * re + im * im
    spec = power if use_power else jnp.sqrt(power)
    nyq = mixed - im  # Nyquist X in the DC slot, zeros elsewhere
    nyq_spec = nyq * nyq if use_power else jnp.abs(nyq)
    hi = jax.lax.Precision.HIGHEST
    # w_nyq has exactly one nonzero row (the Nyquist weights at the DC
    # slot), so its dot is rank-1: a broadcast multiply replaces the
    # third MXU pass bit-exactly (a 1-term "sum" cannot round)
    nyq_col = jax.lax.slice(
        nyq_spec, (0, 0), (nyq_spec.shape[0], 1)
    )
    feats = (
        jnp.dot(spec, whi_ref[:], preferred_element_type=jnp.float32,
                precision=hi)
        + jnp.dot(spec, wlo_ref[:], preferred_element_type=jnp.float32,
                  precision=hi)
        + nyq_col * wnyq_ref[0:1, :]
    )
    if use_log:
        feats = xlog(jnp.maximum(feats, log_floor))
    if include_energy:
        energy = energy / frame_length
        if not use_power:
            energy = jnp.sqrt(energy)
        if use_log:
            energy = xlog(jnp.maximum(energy, log_floor))
        feats = jnp.concatenate([energy, feats], axis=-1)
    out_ref[0] = feats


def stft_feats_pallas_int8(
    padded,
    params,
    *,
    num_frames: int,
    frame_length: int,
    frame_shift: int,
    dft_size: int,
    use_log: bool,
    use_power: bool,
    include_energy: bool,
    log_floor: float,
    block_frames: int = _I8_BLOCK_FRAMES,
    interpret: bool = False,
):
    """Fused int8 digit-tier kernel for padded signals.

    The round-5 successor of :func:`stft_feats_pallas_double`: base-254
    margin digits fit int8 on both operands (2x the bf16 MXU rate on
    v5e), int32 accumulation is exact without the 2^24 bound, and
    equal-weight pair groups therefore collapse into single dots — the
    kernel analog of the XLA tier's 38->8 pass grouping.  The pair
    schedule (and so the 'double' vs 'accurate' distinction) is baked
    into ``params["i8k_offsets"]`` at param-build time.  Same contract
    and fallbacks as :func:`stft_feats_pallas_double`: where the kernel
    gates fail (no Element blocks, unaligned shift, missing params, or
    the VMEM estimate exceeding the v5e budget) it falls back to the XLA
    grouped digit path.
    """
    from . import stft as _stft

    padded = jnp.asarray(padded, jnp.float32)
    q_full, rem = divmod(frame_length, frame_shift)
    q_rows = q_full + (1 if rem else 0)
    gmats = params.get("i8k_gmats")
    vmem_ok = False
    if gmats is not None:
        nb2 = gmats.shape[1]
        offsets = params["i8k_offsets"]
        m_max = max(len(xs) for _, xs, _, _ in offsets)
        est = (
            # f32 rows segment + int8 digit scratch + int8 gmats +
            # biggest lane-concat operand + int32 dot out + f32 acc
            4 * (block_frames + 8 * q_rows) * frame_shift
            + _stft._I8_X_DIGITS * block_frames * frame_length
            + gmats.shape[0] * nb2
            + m_max * block_frames * frame_length
            + 8 * block_frames * nb2
        )
        vmem_ok = est <= _I8_VMEM_BUDGET
    if (
        _Element is None
        or frame_shift % 8
        or gmats is None
        or not vmem_ok
    ):
        from . import framing as _framing

        frames = jax.vmap(
            lambda p: _framing.frame_padded(
                p, num_frames, frame_length, frame_shift
            )
        )(padded)
        return _stft.stft_feats_from_frames(
            frames,
            params,
            dft_size=dft_size,
            use_log=use_log,
            use_power=use_power,
            include_energy=include_energy,
            log_floor=log_floor,
            fft_mode="matmul",
            precision="double",
        )

    batch = padded.shape[0]
    num_coeffs = params["i8k_w_hi"].shape[1] + int(include_energy)
    blocks = -(-num_frames // block_frames)
    seg_rows = -(-(block_frames + q_rows) // 8) * 8
    need_rows = blocks * block_frames + (seg_rows - block_frames)
    need = need_rows * frame_shift
    if padded.shape[1] < need:
        padded = jnp.pad(padded, ((0, 0), (0, need - padded.shape[1])))
    rows = padded[:, :need].reshape(batch, need_rows, frame_shift)

    kernel = functools.partial(
        _int8_rows_kernel,
        block_frames=block_frames,
        frame_shift=frame_shift,
        frame_length=frame_length,
        n_x=_stft._I8_X_DIGITS,
        base=_stft._I8_BASE,
        offsets=params["i8k_offsets"],
        cos_scale=float(params["i8k_cos_scale"]),
        use_log=use_log,
        use_power=use_power,
        include_energy=include_energy,
        log_floor=log_floor,
    )
    n_pairs = sum(len(xs) for _, xs, _, _ in params["i8k_offsets"])
    out = pl.pallas_call(
        kernel,
        grid=(batch, blocks),
        in_specs=[
            pl.BlockSpec(
                (_Element(1), _Element(seg_rows), _Element(frame_shift)),
                lambda b, j: (b, j * block_frames, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=pl.BlockSpec(
            (1, block_frames, num_coeffs),
            lambda b, j: (b, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (batch, blocks * block_frames, num_coeffs), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((block_frames, frame_length), jnp.int8)
            for _ in range(_stft._I8_X_DIGITS)
        ],
        cost_estimate=pl.CostEstimate(
            flops=2
            * batch
            * blocks
            * block_frames
            * frame_length
            * gmats.shape[1]
            * n_pairs,
            bytes_accessed=4 * batch * (need + num_frames * num_coeffs),
            transcendentals=batch * num_frames * num_coeffs,
        ),
        interpret=interpret,
    )(
        rows,
        gmats,
        params["i8k_mixed_scale"],
        params["i8k_mask"],
        params["i8k_w_hi"],
        params["i8k_w_lo"],
        params["i8k_w_nyq"],
    )
    return out[:, :num_frames]


def stft_feats_pallas(
    padded,
    params,
    *,
    num_frames: int,
    frame_length: int,
    frame_shift: int,
    use_log: bool,
    use_power: bool,
    include_energy: bool,
    log_floor: float,
    block_frames: int = 512,
    interpret: bool = False,
    precision: Optional[str] = None,
):
    """Fused features for padded signals ``(batch, padded_len)``.

    Each row is laid out by :func:`speech_tpu.ops.framing.pad_signal`; rows
    past a signal's true frame count produce garbage the caller masks (same
    contract as the XLA path).  Frames never materialize in HBM: the kernel
    reads overlapping row blocks of the signal directly (Element-indexed
    BlockSpecs).  Returns ``(batch, num_frames, num_coeffs)``.
    """
    padded = jnp.asarray(padded, jnp.float32)
    if _Element is None or frame_shift % 8:
        # fall back to framing in XLA + the post-framing kernel
        from . import framing as _framing

        frames = jax.vmap(
            lambda p: _framing.frame_padded(
                p, num_frames, frame_length, frame_shift
            )
        )(padded)
        return stft_feats_pallas_from_frames(
            frames,
            params,
            use_log=use_log,
            use_power=use_power,
            include_energy=include_energy,
            log_floor=log_floor,
            block_frames=block_frames,
            interpret=interpret,
            precision=precision,
        )

    batch = padded.shape[0]
    cos, sin, weights = _consts(params)
    num_coeffs = weights.shape[1] + int(include_energy)
    q_full, rem = divmod(frame_length, frame_shift)
    q_rows = q_full + (1 if rem else 0)
    blocks = -(-num_frames // block_frames)
    # Mosaic requires Element sublane extents to be multiples of 8
    seg_rows = -(-(block_frames + q_rows) // 8) * 8
    need_rows = blocks * block_frames + (seg_rows - block_frames)
    need = need_rows * frame_shift
    if padded.shape[1] < need:
        padded = jnp.pad(padded, ((0, 0), (0, need - padded.shape[1])))
    rows = padded[:, :need].reshape(batch, need_rows, frame_shift)

    kernel = functools.partial(
        _rows_kernel,
        block_frames=block_frames,
        frame_shift=frame_shift,
        frame_length=frame_length,
        use_log=use_log,
        use_power=use_power,
        include_energy=include_energy,
        log_floor=log_floor,
        prec=_resolve_precision(precision),
    )
    out = pl.pallas_call(
        kernel,
        grid=(batch, blocks),
        in_specs=[
            pl.BlockSpec(
                (_Element(1), _Element(seg_rows), _Element(frame_shift)),
                lambda b, j: (b, j * block_frames, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_frames, num_coeffs),
            lambda b, j: (b, j, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (batch, blocks * block_frames, num_coeffs), jnp.float32
        ),
        cost_estimate=pl.CostEstimate(
            flops=2
            * batch
            * blocks
            * block_frames
            * (frame_length * cos.shape[1] * 2 + cos.shape[1] * weights.shape[1]),
            bytes_accessed=4 * batch * (need + num_frames * num_coeffs),
            transcendentals=batch * num_frames * (cos.shape[1] + num_coeffs),
        ),
        interpret=interpret,
    )(rows, cos, sin, weights)
    return out[:, :num_frames]


