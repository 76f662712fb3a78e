"""Fused Pallas TPU kernel for the STFT feature pipeline.

Framing itself stays in XLA (static strided slices are nearly free — see
:func:`speech_tpu.ops.framing.frame_padded`); the kernel fuses everything
after it: window-folded DFT matmuls -> |.|^p -> filter matmul -> log, one
block of frames per grid step with standard BlockSpec double-buffering.
Versus the XLA pipeline this keeps the ``(frames, half_len)`` real and
imaginary spectra in VMEM instead of round-tripping them through HBM
(~790 MB per 128x15 s batch at 25/10 ms framing).

Numerics match :func:`speech_tpu.ops.stft.stft_feats_from_frames` in
float32 (dots run at full f32 precision on the MXU).

Mosaic notes (hard-won): vector slices must be unit-stride, 1D->2D
reshapes of loaded vectors are unsupported, and concatenating slices taken
at different sublane offsets is unsupported — hence framing outside the
kernel.
"""

import functools


import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["stft_feats_pallas", "stft_feats_pallas_from_frames"]


def _kernel(
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
):
    frames = frames_ref[0]
    # the analysis window is folded into the DFT matrices
    # (speech_tpu.ops.stft.windowed_dft_matrices)
    re = jnp.dot(frames, cos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sin_ref[:], preferred_element_type=jnp.float32)
    power = re * re + im * im
    spec = power if use_power else jnp.sqrt(power)
    feats = jnp.dot(spec, w_ref[:], preferred_element_type=jnp.float32)
    if use_log:
        feats = jnp.log(jnp.maximum(feats, log_floor))
    if include_energy:
        energy = jnp.sum(frames * frames, axis=-1, keepdims=True) / frame_length
        if not use_power:
            energy = jnp.sqrt(energy)
        if use_log:
            energy = jnp.log(jnp.maximum(energy, log_floor))
        feats = jnp.concatenate([energy, feats], axis=-1)
    out_ref[0] = feats


def stft_feats_pallas_from_frames(
    frames,
    params,
    *,
    use_log: bool,
    use_power: bool,
    include_energy: bool,
    log_floor: float,
    block_frames: int = 256,
    interpret: bool = False,
):
    """Fused features for raw frames ``(batch, num_frames, frame_length)``."""
    frames = jnp.asarray(frames, jnp.float32)
    batch, num_frames, frame_length = frames.shape
    cos = jnp.asarray(params["dft_cos"], jnp.float32)
    sin = jnp.asarray(params["dft_sin"], jnp.float32)
    weights = jnp.asarray(params["weights"], jnp.float32)
    num_filts = weights.shape[1]
    num_coeffs = num_filts + int(include_energy)
    half_len = cos.shape[1]
    blocks = -(-num_frames // block_frames)
    grid_frames = blocks * block_frames
    if grid_frames != num_frames:
        frames = jnp.pad(
            frames, ((0, 0), (0, grid_frames - num_frames), (0, 0))
        )
    kernel = functools.partial(
        _kernel,
        frame_length=frame_length,
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
        cost_estimate=pl.CostEstimate(
            flops=2 * batch * grid_frames
            * (frame_length * half_len * 2 + half_len * num_filts),
            bytes_accessed=4
            * batch
            * grid_frames
            * (frame_length + num_coeffs),
            transcendentals=batch * grid_frames * (half_len + num_coeffs),
        ),
        interpret=interpret,
    )(frames, cos, sin, weights)
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
    block_frames: int = 256,
    interpret: bool = False,
):
    """Fused features for padded signals ``(batch, padded_len)``.

    Each row is laid out by :func:`speech_tpu.ops.framing.pad_signal`; rows
    past a signal's true frame count produce garbage the caller masks (same
    contract as the XLA path).  Returns ``(batch, num_frames, num_coeffs)``.
    """
    from . import framing as _framing

    padded = jnp.asarray(padded, jnp.float32)
    frames = jax.vmap(
        lambda p: _framing.frame_padded(p, num_frames, frame_length, frame_shift)
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
    )


