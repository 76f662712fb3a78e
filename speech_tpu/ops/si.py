"""Short-integration features as a fused array program.

The reference SI computer streams overlap-save DFT blocks through a
per-filter Python loop with a two-block windowed accumulator
(reference: src/pydrobert/speech/compute.py:613-999).  Its intricate
roll/skip/borrow bookkeeping collapses to a closed form: with ``fir_f`` the
filter's impulse response rolled to start at sample 0 and clamped to the
largest support ``T`` (reference: compute.py:735-742), and
``conv[m] = sum_k fir_f[k] x[m - k]`` the plain linear convolution
(``x`` zero outside its support), the filtered stream is

    y_f[n] = conv_f[n + shift_eff]        (shift_eff = translation  for
                                           causal, translation - frame_shift
                                           for centered;
                                           reference: compute.py:869-877)

and frame ``k``'s coefficient is one dot product of the pointwise
modulus/power of ``y`` against the length-``2*frame_shift`` integration
window:

    coeff[k] = sum_{t<2s} w[t] * |y_f[k*s + t]|^p

(reference: compute.py:893-926, 982-996 — block ``b`` accumulates
``y[b*s+t] * w2d[:, t]`` and a frame reads block ``k`` under the first half
window plus block ``k+1`` under the second).  Total frame count over a
finalized signal is ``(len + shift//2) // shift``, identical to the STFT
computer (reference: compute.py:825-846).

On TPU this runs as batched real-FFT convolutions — blocked overlap-save
for long signals, all filters at once in the frequency domain — then
elementwise modulus, a strided gather of ``(num_frames, 2*shift)`` windows,
and a matvec with the window, in a single jitted program.
"""



import numpy as np

import jax
import jax.numpy as jnp

from .xmath import xlog

__all__ = [
    "block_conv_parts",
    "build_si_kernel",
    "si_feats_from_signal",
    "toeplitz_conv_blocks",
]

# block width for conv_mode="matmul" (one MXU lane tile; see
# toeplitz_conv_blocks).  FLOPs scale with (ceil(T/V) + 1) * V, so the
# smallest MXU-efficient width wins.
CONV_BLOCK = 128


def _next_pow2(n: int) -> int:
    return 1 << max(0, (int(n) - 1)).bit_length()


def build_si_kernel(
    bank,
    frame_shift: int,
    frame_style: str,
    window: np.ndarray,
    include_energy: bool,
) -> dict:
    """Host precompute: FIR matrix, alignment offsets, integration window.

    Reproduces the reference's filter preparation exactly
    (reference: compute.py:695-749): impulse responses are materialized in a
    ``dft_size`` circular buffer, rolled so that causal mode places each
    support at its true acausal alignment and centered mode recenters each
    filter's support midpoint, then clamped to the largest support ``T``.
    """
    rate = bank.sampling_rate
    if frame_style == "centered":
        max_support = max(right - left for left, right in bank.supports)
        translation = max_support // 2
    else:
        translation = 0
        max_support = 0
        for left, right in bank.supports:
            translation = max(-left, translation)
            max_support = max(max_support, right)
        max_support += translation
    min_support_hz = min(right - left for left, right in bank.supports_hz)
    frame_length = max_support + frame_shift - 1
    dft_size = max(frame_length, int(np.ceil(2 * rate / min_support_hz)))
    dft_size = _next_pow2(dft_size)

    is_real = bank.is_real
    fir_dtype = np.float64 if is_real else np.complex128
    firs = np.zeros((bank.num_filts, max_support), dtype=fir_dtype)
    for filt_idx in range(bank.num_filts):
        filt = bank.get_impulse_response(filt_idx, dft_size)
        if frame_style == "centered":
            left_samp, right_samp = bank.supports[filt_idx]
            mid_samp = (left_samp + right_samp) // 2
            filt = np.roll(filt, translation - mid_samp + 1)
        else:
            filt = np.roll(filt, translation)
        firs[filt_idx] = filt[:max_support]

    shift_eff = (
        translation - frame_shift if frame_style == "centered" else translation
    )
    return {
        "firs": firs,
        "window": np.asarray(window, dtype=np.float64),
        "shift_eff": shift_eff,
        "translation": translation,
        "max_support": max_support,
        "frame_length": frame_length,
        "frame_shift": frame_shift,
        "dft_size": dft_size,
        "is_real": is_real,
        "include_energy": include_energy,
    }


def toeplitz_conv_blocks(firs: np.ndarray, V: int = CONV_BLOCK) -> np.ndarray:
    """Banded-Toeplitz block matrices expressing linear convolution as MXU
    matmuls.

    For output block ``i`` of width ``V``,
    ``y[i*V + t] = sum_k (x_block[i - k] @ A[k])[t]`` with
    ``A[k][u, t] = fir[k*V + t - u]`` (zero outside ``[0, T)``).  Returns
    ``(K + 1, F, V, V)`` with ``K = ceil((T - 1) / V)``.  This turns the
    filter convolutions into dense block matmuls — on TPU, far faster than
    XLA's FFT or 1-D conv lowerings at speech-sized supports.
    """
    F, T = firs.shape
    K = -(-(T - 1) // V) if T > 1 else 0
    diff = np.arange(V)[None, :] - np.arange(V)[:, None]  # t - u
    blocks = np.zeros((K + 1, F, V, V), dtype=firs.dtype)
    for k in range(K + 1):
        j = diff + k * V
        mask = (j >= 0) & (j < T)
        blocks[k][:, mask] = firs[:, j[mask]]
    return blocks


def block_conv_parts(x_pad, nb: int, V: int, Kk: int, precision: str):
    """Shared banded-Toeplitz conv core for the batch AND streaming tiers.

    Returns ``part(params, name) -> (F, nb*V)``: the full linear-conv
    outputs of one FIR part (``name`` in ``conv_re``/``conv_im``) over
    the flat padded signal ``x_pad`` (length ``>= nb*V``), sharing the
    signal-side work (shifted input blocks, or the digit planes + scale
    under the digit precisions) across parts.  Exactness-critical: both
    `si_feats_from_signal` and `streaming.StreamingSI` call THIS, so the
    stream == batch accuracy contract can never desynchronize.
    """
    def shifted(flat, lo: int = 0, hi: int = None):
        Xb = flat[: nb * V].reshape(nb, V)
        # Xsh[k] = input blocks shifted down k rows (block i reads i-k)
        return jnp.stack(
            [
                jnp.pad(Xb, ((k, 0), (0, 0)))[:nb]
                for k in range(lo, Kk + 1 if hi is None else hi)
            ]
        )

    if precision not in ("double", "accurate"):
        Xsh = shifted(x_pad)
        prec = jax.lax.Precision(precision)

        def part(params, name):
            Y = jnp.einsum(
                "kbv,kfvw->fbw",
                Xsh,
                params[name + "_blocks"],
                precision=prec,
            )
            return Y.reshape(Y.shape[0], nb * V)

        return part

    # digit tiers (see ops/stft.py): the signal splits under one
    # per-signal power-of-two scale into integer digit planes, the band
    # matrices likewise; every einsum pass then multiplies and
    # accumulates integers below 2^24 — exact in f32.  'double':
    # base-64, 6 x-planes (36 bits below the signal peak), 21 pairs,
    # whole-support contractions.  'accurate': base-256, 5x5 planes
    # with one-bit scale margins on both operands (so contractions up
    # to 8 blocks stay exact with no splitting; beyond that, <=8-block
    # chunks), 15 pairs — ~70% of 'double's MXU block-passes at the
    # same measured accuracy class (see ops/stft.py _SAK_*).
    from .stft import (
        _DIGIT_BASE,
        _SAK_BASE,
        _SAK_CUTOFF,
        _SAK_KCHUNK,
        _SAK_X_DIGITS,
        _SI_PAIR_CUTOFF,
        _SI_X_DIGITS,
        digit_pair_schedule,
    )

    if precision == "accurate":
        base_f, n_x, kchunk = _SAK_BASE, _SAK_X_DIGITS, _SAK_KCHUNK
        cutoff = _SAK_CUTOFF
    else:
        base_f, n_x, kchunk = _DIGIT_BASE, _SI_X_DIGITS, None
        cutoff = _SI_PAIR_CUTOFF

    m = jnp.max(jnp.abs(x_pad))
    _, e = jnp.frexp(jnp.maximum(m, np.float32(1e-30)))
    # 'accurate' carries a one-bit margin so |digits| <= base/2 on every
    # plane (matches the A-digit margin; see ops/stft.py)
    x_scale = jnp.ldexp(
        jnp.ones_like(m), e + (1 if precision == "accurate" else 0)
    )
    v = x_pad / x_scale
    base = np.float32(base_f)
    planes = []
    for _ in range(n_x):
        d = jnp.round(v * base)
        v = v * base - d
        planes.append(d)
    plane_stack = jnp.stack(planes)  # (XD, L)

    def part(params, name):
        A_digits = params[name + "_digits"]
        A_scale = params[name + "_scale"]
        # lax.scan forces one pair in flight: the schedule's pair
        # einsums (one per (i, j) under the cutoff) are independent, and
        # letting XLA schedule them freely keeps too many
        # (batch, F, nb, V) buffers live at once (OOM on a 16 GB chip
        # at production batch sizes)
        pairs = digit_pair_schedule(n_x, A_digits.shape[0], cutoff)
        ii = jnp.asarray([i for i, _ in pairs], jnp.int32)
        jj = jnp.asarray([j for _, j in pairs], jnp.int32)
        ww = jnp.asarray(
            [base_f ** -(i + j + 2) for i, j in pairs],
            jnp.float32,
        )
        nF = A_digits.shape[2]
        if kchunk is None or Kk + 1 <= kchunk:
            chunks = [(0, Kk + 1)]
        else:
            chunks = [
                (lo, min(lo + kchunk, Kk + 1))
                for lo in range(0, Kk + 1, kchunk)
            ]

        acc = jnp.zeros((nF, nb, V), jnp.float32)
        for lo, hi in chunks:
            def step(acc, t, lo=lo, hi=hi):
                xd = shifted(
                    jax.lax.dynamic_index_in_dim(
                        plane_stack, ii[t], 0, keepdims=False
                    ),
                    lo,
                    hi,
                )
                ad = jax.lax.dynamic_index_in_dim(
                    A_digits, jj[t], 0, keepdims=False
                )[lo:hi]
                p = jnp.einsum("kbv,kfvw->fbw", xd, ad)
                return acc + p * ww[t], None

            acc, _ = jax.lax.scan(step, acc, jnp.arange(len(pairs)))
        y = acc * (x_scale * A_scale)
        return y.reshape(nF, nb * V)

    return part


def si_feats_from_signal(
    signal,
    sig_len,
    num_frames: int,
    params: dict,
    *,
    frame_shift: int,
    shift_eff: int,
    max_support: int,
    is_real: bool,
    include_energy: bool,
    use_log: bool,
    use_power: bool,
    log_floor: float,
    fft_size: int,
    energy_offset: int = 0,
    conv_mode: str = "fft",
    precision: str = "highest",
):
    """Jittable SI pipeline for one signal buffer.

    ``signal``: fixed-size zero-padded buffer; ``sig_len`` (traced) true
    length — samples at or past ``sig_len`` must already be zero.
    ``params``: device arrays ``firs_re`` (``(F, T)``; plus ``firs_im``
    for complex banks) and ``window`` ``(2*shift,)``.  Returns
    ``(num_frames, num_coeffs)``.
    """
    window = params["window"]
    firs_re = params["firs_re"]
    num_filts = firs_re.shape[0]
    # last frame k = num_frames-1 reads y up to (k*shift + 2*shift - 1)
    ny = (num_frames + 1) * frame_shift

    # linear convolution conv[m] = sum_k fir[k] x[m-k].  Two backends:
    # "fft" (real-FFT products; a complex bank decomposes into its real and
    # imaginary parts — half the transform work of a complex FFT, and the
    # TPU backend implements only the real kinds) and "direct" (the
    # convolution as one MXU matmul over stacked signal shifts — XLA's TPU
    # FFT is slow enough that brute FLOPs win at speech-sized supports).
    n_idx = jnp.arange(ny) + shift_eff
    valid = (n_idx >= 0) & (n_idx < sig_len + max_support - 1)

    if conv_mode == "direct":
        # lax.conv computes correlations: corr[q] = sum_j pad[q+j] rev[j]
        # with rev = flip(fir) gives conv[m] at q = m - T + 1 (in padded
        # coordinates).  We need conv at m = n + shift_eff for n in
        # [0, ny); left-pad so the first window starts at q >= 0.
        T = max_support
        pl = max(0, T - 1 - shift_eff)
        q0 = shift_eff + pl - T + 1
        need = q0 + ny - 1 + T
        padded = jnp.pad(signal, (pl, max(0, need - pl - signal.shape[0])))

        def _conv_part(f):
            rev = jnp.flip(f, axis=-1)[:, None, :]  # (F, 1, T)
            out = jax.lax.conv_general_dilated(
                padded[None, None, :],
                rev,
                window_strides=(1,),
                padding="VALID",
                precision=jax.lax.Precision(precision),
            )[0]  # (F, L - T + 1)
            part = jax.lax.slice_in_dim(out, q0, q0 + ny, axis=1)
            return jnp.where(valid[None, :], part, 0)
    elif conv_mode == "matmul":
        # linear convolution as banded-Toeplitz block matmuls (see
        # toeplitz_conv_blocks): pure MXU work, no FFT.  Output block i of
        # width V sums shifted input blocks against the (K+1, F, V, V)
        # band matrices in params.  The conv core — plain einsum, or the
        # exact digit-decomposition passes under the digit precisions —
        # is `block_conv_parts`, SHARED with the streaming tier so the
        # stream == batch accuracy contract cannot desynchronize.
        if precision in ("double", "accurate"):
            V = params["conv_re_digits"].shape[-1]
            Kk = params["conv_re_digits"].shape[1] - 1
        else:
            V = params["conv_re_blocks"].shape[-1]
            Kk = params["conv_re_blocks"].shape[0] - 1
        m_hi = shift_eff + ny
        pl = max(0, -shift_eff)
        nb = max(1, -(-max(m_hi, 1) // V))
        sig_pad = jnp.pad(signal, (0, max(0, nb * V - signal.shape[0])))
        _part_fn = block_conv_parts(sig_pad, nb, V, Kk, precision)

        def _conv_part_matmul(name):
            y = _part_fn(params, name)  # (F, nb*V) full conv outputs
            if pl:
                y = jnp.pad(y, ((0, 0), (pl, 0)))
            part = jax.lax.slice_in_dim(
                y, shift_eff + pl, shift_eff + pl + ny, axis=1
            )
            return jnp.where(valid[None, :], part, 0)

    elif conv_mode == "fft" and fft_size >= 4 * _next_pow2(2 * max_support):
        # blocked overlap-save: batched medium-size real FFTs run far more
        # efficiently on the TPU backend than a few huge ones.  Block i
        # produces conv outputs m in [m0 + i*V, m0 + (i+1)*V) from the
        # signal span [m_block - T + 1, m_block + V).
        T = max_support
        B = _next_pow2(2 * T)
        V = B - T + 1
        m0 = shift_eff  # first conv index needed (y[0])
        nblocks = -(-ny // V)
        pl = max(0, T - 1 - m0)
        need = m0 + pl + (nblocks - 1) * V + B
        padded = jnp.pad(signal, (pl, max(0, need - pl - signal.shape[0])))
        starts = [m0 + pl + i * V - (T - 1) for i in range(nblocks)]
        x_blocks = jnp.stack(
            [jax.lax.slice_in_dim(padded, s, s + B, axis=0) for s in starts]
        )  # (nblocks, B)
        Xb = jnp.fft.rfft(x_blocks, axis=-1)

        def _conv_part(f):
            H = jnp.fft.rfft(f, n=B, axis=-1)
            yb = jnp.fft.irfft(Xb[None] * H[:, None, :], n=B, axis=-1)
            y = yb[..., T - 1 :].reshape(f.shape[0], nblocks * V)[:, :ny]
            return jnp.where(valid[None, :], y, 0)
    else:
        X = jnp.fft.rfft(signal, n=fft_size)
        # the conv values needed are the contiguous run [shift_eff,
        # shift_eff + ny); pad so it is a static slice, never a gather
        pl = max(0, -shift_eff)
        pr = max(0, shift_eff + ny - fft_size)

        def _conv_part(f):
            H = jnp.fft.rfft(f, n=fft_size, axis=-1)
            conv = jnp.fft.irfft(X[None, :] * H, n=fft_size, axis=-1)
            if pl or pr:
                conv = jnp.pad(conv, ((0, 0), (pl, pr)))
            part = jax.lax.slice_in_dim(conv, shift_eff + pl, shift_eff + pl + ny, axis=1)
            return jnp.where(valid[None, :], part, 0)

    if conv_mode == "matmul":
        conv_re = lambda: _conv_part_matmul("conv_re")
        conv_im = lambda: _conv_part_matmul("conv_im")
    else:
        conv_re = lambda: _conv_part(firs_re)
        conv_im = lambda: _conv_part(params["firs_im"])
    if is_real:
        y = conv_re()
        y_mod = y * y if use_power else jnp.abs(y)
    else:
        yr = conv_re()
        yi = conv_im()
        y_mod = yr * yr + yi * yi
        if not use_power:
            y_mod = jnp.sqrt(y_mod)

    if include_energy:
        # dirac filter: y_e[n] = x[n + shift_eff - translation]; with the
        # reference's translations this is x[n] (causal) or x[n - shift]
        # (centered) (reference: compute.py:722-732).  energy_offset =
        # shift_eff - translation, passed statically — so this is a static
        # slice of the padded signal, not a gather.
        e_idx = jnp.arange(ny) + energy_offset
        e_valid = (e_idx >= 0) & (e_idx < sig_len)
        e_pl = max(0, -energy_offset)
        e_pr = max(0, energy_offset + ny - signal.shape[0])
        xe_buf = jnp.pad(signal, (e_pl, e_pr)) if (e_pl or e_pr) else signal
        xe = jax.lax.slice_in_dim(
            xe_buf, energy_offset + e_pl, energy_offset + e_pl + ny, axis=0
        )
        xe = jnp.where(e_valid, xe, 0)
        if is_real:
            e_mod = xe * xe if use_power else jnp.abs(xe)
        else:
            e_mod = (
                (xe * xe.conj()).real if use_power else jnp.abs(xe)
            )
        y_mod = jnp.concatenate([e_mod[None, :].astype(y_mod.dtype), y_mod])
        num_filts += 1

    # frame k <- dot(window, y_mod[:, k*s : k*s + 2s]).  Because
    # ny = (num_frames + 1) * shift, the overlapping windows factor into
    # non-overlapping shift-sized blocks hit by the window's two halves —
    # the reference's 2-block accumulator (reference: compute.py:982-996)
    # as a reshape plus two matvecs.  No gather (TPU gathers are ~200x
    # slower than slices at these sizes).
    blocks = y_mod.reshape(num_filts, num_frames + 1, frame_shift)
    prec = jax.lax.Precision.HIGHEST
    lo = jnp.einsum("fkt,t->fk", blocks, window[:frame_shift], precision=prec)
    hi = jnp.einsum("fkt,t->fk", blocks, window[frame_shift:], precision=prec)
    feats = (lo[:, :-1] + hi[:, 1:]).T
    if use_log:
        feats = xlog(jnp.maximum(feats, log_floor))
    return feats
