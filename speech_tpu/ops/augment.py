"""Data augmentation: SpecAugment (feature-space) and the waveform
augmentations of a Kaldi-style training pipeline (reverberation, noise
mixing at a target SNR, speed perturbation, gain perturbation).

No reference counterpart (beyond-parity training utilities; the
waveform set covers Kaldi's ``wav-reverberate`` and
``utils/perturb_data_dir_speed.sh`` roles).  Written TPU-first:
SpecAugment masks are broadcasted-iota comparisons (static shapes, no
gathers); reverberation is one banded-Toeplitz MXU matmul
(:func:`speech_tpu.ops.resample.fir_conv_matmul` — multi-block windows
handle RIRs thousands of taps long); speed perturbation is the
polyphase resampler; everything is lengths-aware so bucketed batch rows
match the solo op on each valid extent with padding kept zero.
"""

from fractions import Fraction
from typing import Optional, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

from . import resample as _resample

__all__ = [
    "spec_augment",
    "reverberate",
    "mix_noise",
    "speed_perturb",
    "random_gain",
]


def _axis_mask(key, dim: int, num_masks: int, max_width, batch_shape, limits):
    """OR of ``num_masks`` random intervals along an axis of size ``dim``.

    Returns a boolean array ``batch_shape + (dim,)``; ``limits`` (same
    batch shape, or None) caps where intervals may land (padded tails of
    a batch stay unmasked).  Width draws are uniform on [0, max_width]
    and additionally capped to the per-example limit.
    """
    kw, ks = jax.random.split(key)
    shape = tuple(batch_shape) + (num_masks,)
    lim = (
        jnp.full(shape, dim, jnp.float32)
        if limits is None
        else jnp.asarray(limits, jnp.float32).reshape(
            tuple(batch_shape) + (1,)
        )
        * jnp.ones(shape, jnp.float32)
    )
    width = jnp.minimum(
        jax.random.uniform(kw, shape, maxval=float(max_width)), lim
    )
    start = jax.random.uniform(ks, shape) * (lim - width)
    iota = jnp.arange(dim, dtype=jnp.float32)
    iota = iota.reshape((1,) * (len(batch_shape) + 1) + (dim,))
    start = start[..., None]
    hit = (iota >= start) & (iota < start + width[..., None])
    return jnp.any(hit, axis=-2)


def spec_augment(
    key,
    features,
    num_freq_masks: int = 2,
    freq_mask_param: int = 27,
    num_time_masks: int = 2,
    time_mask_param: int = 100,
    lengths=None,
    mask_value: Union[float, str] = 0.0,
    time_axis: int = -2,
    feat_axis: int = -1,
):
    """SpecAugment masking of a ``(..., time, feats)`` tensor.

    Draws ``num_freq_masks`` frequency bands (width uniform on
    ``[0, freq_mask_param]``) and ``num_time_masks`` time spans (width
    uniform on ``[0, time_mask_param]``) independently per example
    (leading batch dims), and replaces the masked cells with
    ``mask_value`` (a float, or ``"mean"`` for the per-example feature
    mean — appropriate for log-compressed features whose silence floor
    is not 0).  ``lengths`` (int array over the batch dims, optional)
    confines time masks to each example's valid frames, so padded rows
    of a bucketed batch are never the thing being "augmented".

    Time warping is intentionally omitted (the SpecAugment ablations
    attribute it the least gain, and it needs gather-based
    interpolation — the one lowering this package keeps off the TPU hot
    path).
    """
    features = jnp.asarray(features)
    ndim = features.ndim
    time_axis = time_axis % ndim
    feat_axis = feat_axis % ndim
    if time_axis == feat_axis:
        raise ValueError(f"time and feature axes are the same ({time_axis})")
    if {time_axis, feat_axis} != {ndim - 2, ndim - 1}:
        # normalize to (..., time, feats) once; undo at the end
        perm = [i for i in range(ndim) if i not in (time_axis, feat_axis)]
        perm += [time_axis, feat_axis]
        inv = [perm.index(i) for i in range(ndim)]
        out = spec_augment(
            key,
            features.transpose(perm),
            num_freq_masks,
            freq_mask_param,
            num_time_masks,
            time_mask_param,
            lengths,
            mask_value,
        )
        return out.transpose(inv)
    if time_axis != ndim - 2:  # (..., feats, time): swap, recurse, swap
        return jnp.swapaxes(
            spec_augment(
                key,
                jnp.swapaxes(features, -1, -2),
                num_freq_masks,
                freq_mask_param,
                num_time_masks,
                time_mask_param,
                lengths,
                mask_value,
            ),
            -1,
            -2,
        )
    batch_shape = features.shape[:-2]
    T, F = features.shape[-2], features.shape[-1]
    kf, kt = jax.random.split(jnp.asarray(key))
    masked = jnp.zeros(features.shape, bool)
    valid = None
    if lengths is not None:
        # (batch..., T, 1) validity mask for the frames inside each
        # example's true length
        valid = jnp.arange(T).reshape(
            (1,) * len(batch_shape) + (T, 1)
        ) < jnp.asarray(lengths).reshape(tuple(batch_shape) + (1, 1))
    if num_freq_masks and freq_mask_param:
        fmask = _axis_mask(kf, F, num_freq_masks, freq_mask_param, batch_shape, None)
        masked = masked | fmask[..., None, :]
    if num_time_masks and time_mask_param:
        tmask = _axis_mask(
            kt, T, num_time_masks, time_mask_param, batch_shape, lengths
        )
        masked = masked | tmask[..., :, None]
    if valid is not None:
        # padded frames pass through untouched (frequency masks too): a
        # bucketed batch's padding stays bit-identical to its input
        masked = masked & valid
    if isinstance(mask_value, str):
        if mask_value != "mean":
            raise ValueError(f"mask_value must be a float or 'mean', got {mask_value!r}")
        if valid is None:
            fill = features.mean(axis=(-2, -1), keepdims=True)
        else:
            denom = jnp.maximum(
                valid.sum(axis=(-2, -1), keepdims=True) * F, 1
            )
            fill = (features * valid).sum(axis=(-2, -1), keepdims=True) / denom
        fill = fill.astype(features.dtype)
    else:
        fill = jnp.asarray(mask_value, features.dtype)
    return jnp.where(masked, fill, features)


def _valid_mask(batch_shape, N: int, lengths):
    """(batch..., N) float mask of each example's valid samples (or None)."""
    if lengths is None:
        return None
    iota = jnp.arange(N).reshape((1,) * len(batch_shape) + (N,))
    return iota < jnp.asarray(lengths).reshape(tuple(batch_shape) + (1,))


def reverberate(
    signal,
    rir,
    lengths=None,
    align: bool = True,
    power_norm: bool = True,
    precision: Union[str, jax.lax.Precision] = jax.lax.Precision.HIGHEST,
):
    """Convolve ``(..., N)`` signals with a room impulse response.

    Kaldi ``wav-reverberate`` semantics (src/featbin/wav-reverberate.cc
    behavior, re-derived): the output keeps the input's length; with
    ``align`` the convolution is shifted left by the direct-path delay
    (the RIR's peak-magnitude tap) so the dry and wet signals stay
    time-aligned; with ``power_norm`` each example is rescaled so its
    output power over the valid extent matches its input power.

    ``rir`` is a host 1-D array — it is folded into the banded-Toeplitz
    constant of :func:`speech_tpu.ops.resample.fir_conv_matmul`, so the
    whole (arbitrarily long) convolution is one MXU matmul.  One RIR per
    call: the constant is per-filter (augment batches by grouping
    examples per room, or vmap over a stacked-RIR variant at the cost of
    materializing per-example bands).

    ``lengths`` (int array over the batch dims) keeps bucketed batches
    faithful: each row equals the solo op on its valid extent and the
    padding tail is forced back to zero (the convolution's smear past
    the valid end is cut, so downstream lengths-aware ops see clean
    padding).
    """
    signal = jnp.asarray(signal)
    if not jnp.issubdtype(signal.dtype, jnp.floating):
        signal = signal.astype(jnp.float32)
    rir = np.asarray(rir, np.float64)
    if rir.ndim != 1 or rir.size < 1:
        raise ValueError(f"rir must be a 1-D host array, got shape {rir.shape}")
    W = rir.size
    N = signal.shape[-1]
    delay = int(np.argmax(np.abs(rir))) if align else 0
    # full convolution y[i] = sum_s rir[s] x[i - s], shifted by the
    # direct-path delay: out[i] = y[i + delay] — a correlation with the
    # reversed RIR at pad_left = W - 1 - delay
    out = _resample.fir_conv_matmul(
        signal,
        rir[::-1].copy(),
        stride=1,
        pad_left=W - 1 - delay,
        n_out=N,
        precision=precision,
        group=1024,
    )
    valid = _valid_mask(signal.shape[:-1], N, lengths)
    if valid is not None:
        out = jnp.where(valid, out, 0)
    if power_norm:
        if valid is None:
            e_in = jnp.sum(jnp.square(signal), -1, keepdims=True)
            e_out = jnp.sum(jnp.square(out), -1, keepdims=True)
        else:
            e_in = jnp.sum(jnp.square(signal) * valid, -1, keepdims=True)
            e_out = jnp.sum(jnp.square(out), -1, keepdims=True)
        scale = jnp.sqrt(e_in / jnp.maximum(e_out, jnp.finfo(signal.dtype).tiny))
        out = out * jnp.where(e_out > 0, scale, 1).astype(signal.dtype)
    return out.astype(signal.dtype)


def mix_noise(
    key,
    signal,
    noise,
    snr_db,
    lengths=None,
):
    """Add ``noise`` to ``(..., N)`` signals at a per-example target SNR.

    ``snr_db`` (scalar or broadcastable over the batch dims) fixes
    ``10*log10(E_signal / E_noise)`` over each example's valid extent;
    the noise is rescaled per example to hit it exactly (measured-energy
    definition, the Kaldi/wav-reverberate ``--snrs`` convention).

    ``noise`` may be a single 1-D buffer shared across the batch or a
    batched ``(..., Nn)`` array; buffers shorter than the signal are
    tiled.  With ``key`` given, each example reads the buffer at an
    independent uniform circular offset (decorrelating windows drawn
    from one noise recording); the per-example ``dynamic_slice`` under
    vmap lowers to a gather — acceptable for a training-time op, and
    avoidable by passing ``key=None`` (offset 0).

    Padding rows of a bucketed batch stay zero (``lengths`` masks the
    added noise), and each row's valid extent matches the solo op.
    """
    signal = jnp.asarray(signal)
    if not jnp.issubdtype(signal.dtype, jnp.floating):
        signal = signal.astype(jnp.float32)
    batch_shape = signal.shape[:-1]
    N = signal.shape[-1]
    noise = jnp.asarray(noise, signal.dtype)
    if noise.shape[-1] < N:
        noise = jnp.tile(noise, (1,) * (noise.ndim - 1) + (-(-N // noise.shape[-1]),))
    Nn = noise.shape[-1]
    if key is not None:
        offsets = jax.random.randint(key, batch_shape, 0, Nn)
        doubled = jnp.concatenate([noise, noise], axis=-1)
        doubled = jnp.broadcast_to(doubled, batch_shape + (2 * Nn,))

        def window(buf, off):
            return jax.lax.dynamic_slice(buf, (off,), (N,))

        for _ in range(len(batch_shape)):
            window = jax.vmap(window)
        noise_win = window(doubled, offsets)
    else:
        noise_win = jnp.broadcast_to(noise[..., :N], batch_shape + (N,))
    valid = _valid_mask(batch_shape, N, lengths)
    if valid is None:
        e_sig = jnp.sum(jnp.square(signal), -1, keepdims=True)
        e_noise = jnp.sum(jnp.square(noise_win), -1, keepdims=True)
    else:
        e_sig = jnp.sum(jnp.square(signal) * valid, -1, keepdims=True)
        e_noise = jnp.sum(jnp.square(noise_win) * valid, -1, keepdims=True)
    snr = jnp.asarray(snr_db, signal.dtype)
    snr = snr.reshape(snr.shape + (1,) * (signal.ndim - snr.ndim))
    # E_out_noise = E_sig * 10^(-snr/10)  =>  amplitude scale below
    scale = jnp.sqrt(
        e_sig / jnp.maximum(e_noise, jnp.finfo(signal.dtype).tiny)
    ) * jnp.exp2(-snr * (np.log2(10.0) / 20.0))
    scale = jnp.where(e_noise > 0, scale, 0).astype(signal.dtype)
    noisy = signal + scale * noise_win
    if valid is not None:
        noisy = jnp.where(valid, noisy, 0)
    return noisy


def speed_perturb(
    signal,
    factor,
    lengths=None,
    max_denominator: int = 32,
    precision: Union[str, jax.lax.Precision] = jax.lax.Precision.HIGHEST,
):
    """Speed-perturb ``(..., N)`` signals by ``factor`` (sox ``speed`` /
    Kaldi ``perturb_data_dir_speed`` semantics: factor 1.1 plays 10%
    faster, i.e. the waveform is resampled to ``N/factor`` samples at
    the unchanged nominal rate, shifting both tempo and pitch).

    ``factor`` is snapped to a reduced fraction
    (``Fraction(factor).limit_denominator(max_denominator)`` — the
    standard 0.9/1.0/1.1 set is exact) and routed through the polyphase
    resampler.  Returns the resampled ``(..., ceil(N*den/num))`` array;
    with ``lengths``, returns ``(out, new_lengths)`` where
    ``new_lengths = ceil(lengths*den/num)`` and each row is masked to
    its new valid extent (padding stays zero, rows match the solo op).
    """
    frac = Fraction(factor).limit_denominator(int(max_denominator))
    if frac <= 0:
        raise ValueError(f"factor must be positive, got {factor}")
    up, down = frac.denominator, frac.numerator
    out = _resample.resample(signal, up, down, precision=precision)
    if lengths is None:
        return out
    lengths = jnp.asarray(lengths)
    new_lengths = (lengths * up + down - 1) // down
    valid = _valid_mask(out.shape[:-1], out.shape[-1], new_lengths)
    return jnp.where(valid, out, 0), new_lengths


def random_gain(key, signal, min_gain_db: float = -6.0, max_gain_db: float = 6.0):
    """Scale each example of ``(..., N)`` by an independent uniform
    gain in ``[min_gain_db, max_gain_db]`` dB (volume perturbation).
    """
    signal = jnp.asarray(signal)
    if not jnp.issubdtype(signal.dtype, jnp.floating):
        signal = signal.astype(jnp.float32)
    db = jax.random.uniform(
        key,
        signal.shape[:-1],
        minval=float(min_gain_db),
        maxval=float(max_gain_db),
        dtype=signal.dtype,
    )
    return signal * jnp.exp2(db * (np.log2(10.0) / 20.0))[..., None]
