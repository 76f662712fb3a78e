"""Feature-space augmentation: SpecAugment (Park et al. 2019).

No reference counterpart (beyond-parity training utility).  Written
TPU-first: masks are built by comparing a broadcasted iota against drawn
start/width bounds — pure static-shape elementwise work that fuses into
the surrounding program, no dynamic slices, no data-dependent shapes —
so the op jits, vmaps, shards over a mesh, and differentiates (gradients
are zeroed under the masks, the standard straight-through behavior).
"""

from typing import Optional, Union

import jax
import jax.numpy as jnp

__all__ = ["spec_augment"]


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
