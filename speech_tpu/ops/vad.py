"""Energy-based voice activity detection (Kaldi ``compute-vad`` semantics).

No reference counterpart; included because the reference's main
deployment niche (Kaldi pipelines) pairs feature extraction with
energy VAD for speaker-id style selection.  Semantics follow Kaldi's
``compute-vad-energy``: a frame is voiced when at least
``proportion_threshold`` of its context window's log energies exceed
``energy_threshold + energy_mean_scale * mean(log_energy)``.

Pure elementwise + one box-filter correlation (expressed as a
static-shape padded matmul-free window sum), so it jits, vmaps, shards,
and composes with the computers' ``include_energy`` column.
"""

from typing import Optional

import jax.numpy as jnp
import numpy as np

__all__ = ["energy_vad", "energy_vad_np"]


def energy_vad(
    log_energy,
    energy_threshold: float = 5.0,
    energy_mean_scale: float = 0.5,
    frames_context: int = 0,
    proportion_threshold: float = 0.6,
    lengths=None,
):
    """Voiced-frame mask for ``(..., T)`` frame log energies.

    ``lengths`` (int array over the leading axes, optional) restricts
    the adaptive mean to each example's valid frames and forces padded
    frames unvoiced.  With ``energy_mean_scale=0`` the threshold is the
    fixed ``energy_threshold``.  Returns a boolean array like the input.
    """
    if frames_context < 0:
        raise ValueError(f"frames_context must be >= 0, got {frames_context}")
    if not 0.0 < proportion_threshold < 1.0:
        raise ValueError(
            f"proportion_threshold must be in (0, 1), got "
            f"{proportion_threshold}"
        )
    e = jnp.asarray(log_energy)
    T = e.shape[-1]
    valid = None
    if lengths is not None:
        lengths = jnp.asarray(lengths)
        valid = jnp.arange(T) < lengths[..., None]
    if energy_mean_scale:
        if valid is None:
            mean = e.mean(axis=-1, keepdims=True)
        else:
            denom = jnp.maximum(valid.sum(axis=-1, keepdims=True), 1)
            mean = (e * valid).sum(axis=-1, keepdims=True) / denom
        thresh = energy_threshold + energy_mean_scale * mean
    else:
        thresh = jnp.asarray(energy_threshold, e.dtype)
    above = e > thresh
    if valid is not None:
        above = above & valid
    if frames_context:
        # windowed vote: counts via a padded cumulative-sum difference
        # (static shapes, no convolution op needed); the denominator is
        # the in-bounds (and in-length) context size, matching Kaldi's
        # den_count
        w = frames_context
        ones = jnp.ones(e.shape, jnp.int32) if valid is None else valid.astype(jnp.int32)
        num = _window_sum(above.astype(jnp.int32), w)
        den = jnp.maximum(_window_sum(ones, w), 1)
        voiced = num >= proportion_threshold * den
    else:
        voiced = above
    if valid is not None:
        voiced = voiced & valid
    return voiced


def energy_vad_np(
    log_energy,
    energy_threshold: float = 5.0,
    energy_mean_scale: float = 0.5,
    frames_context: int = 0,
    proportion_threshold: float = 0.6,
):
    """Host (numpy) twin of :func:`energy_vad` for 1-D log energies.

    The CLIs trim voiced frames per utterance while the next device
    batch is in flight — a device round trip per utterance would
    serialize the pipeline on tunneled runtimes.  Matches
    :func:`energy_vad` exactly (tested) on unpadded 1-D input.
    """
    if frames_context < 0:
        raise ValueError(f"frames_context must be >= 0, got {frames_context}")
    if not 0.0 < proportion_threshold < 1.0:
        raise ValueError(
            f"proportion_threshold must be in (0, 1), got "
            f"{proportion_threshold}"
        )
    e = np.asarray(log_energy)
    if e.ndim != 1:
        raise ValueError(f"energy_vad_np expects 1-D input, got {e.shape}")
    T = e.shape[-1]
    if T == 0:
        return np.zeros(0, bool)
    if energy_mean_scale:
        thresh = energy_threshold + energy_mean_scale * e.mean()
    else:
        thresh = energy_threshold
    above = e > thresh
    if frames_context and T:
        w = frames_context
        c = np.concatenate([[0], np.cumsum(above.astype(np.int64))])
        hi = c[np.minimum(np.arange(T) + w + 1, T)]
        lo = c[np.maximum(np.arange(T) - w, 0)]
        den = np.minimum(np.arange(T) + w + 1, T) - np.maximum(
            np.arange(T) - w, 0
        )
        voiced = (hi - lo) >= proportion_threshold * den
    else:
        voiced = above
    return voiced


def _window_sum(x, w: int):
    """Sum over the centered (edge-clipped) window ``[-w, w]`` along the
    last axis — static slices of a padded prefix sum, no gathers."""
    T = x.shape[-1]
    c = jnp.cumsum(x, axis=-1)
    c = jnp.concatenate([jnp.zeros_like(c[..., :1]), c], -1)  # c[i]=sum x[:i]
    tail = jnp.repeat(c[..., -1:], w, axis=-1)  # clamp i+w+1 to T
    hi = jnp.concatenate([c, tail], -1)[..., w + 1 : w + 1 + T]
    lo = jnp.concatenate(
        [jnp.zeros_like(c[..., :w]), c], -1
    )[..., :T]  # clamp i-w to 0 (c[0] == 0)
    return hi - lo
