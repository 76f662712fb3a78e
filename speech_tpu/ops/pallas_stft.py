"""Fused Pallas TPU kernel for the STFT feature pipeline.

One kernel per block of frames: DMA the covering signal span from HBM into
VMEM, rebuild the overlapped frames with static strided slices (the gcd
decomposition of :func:`speech_tpu.ops.framing.frame_padded`), then run
window -> DFT matmuls -> |.|^p -> filter matmul -> log entirely in VMEM.
Versus the XLA pipeline this never materializes the ``(frames,
frame_length)`` tensor (2.5x the signal at 25/10 ms framing) or the
``(frames, half_len)`` spectra in HBM — the only HBM traffic is the signal
in and the features out.

Numerics match :func:`speech_tpu.ops.stft.stft_feats_from_frames` in
float32 (dots run at full f32 precision on the MXU).
"""

import functools

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["stft_feats_pallas"]


def _kernel(
    sig_ref,
    cos_ref,
    sin_ref,
    w_ref,
    out_ref,
    seg,
    sem,
    *,
    block_frames: int,
    frame_length: int,
    frame_shift: int,
    seg_len: int,
    use_log: bool,
    use_power: bool,
    include_energy: bool,
    log_floor: float,
):
    b = pl.program_id(0)
    j = pl.program_id(1)
    # signal arrives pre-shaped (batch, rows, frame_shift); frame k is rows
    # k..k+q of the row view (last one partial) — all unit-stride slices
    dma = pltpu.make_async_copy(
        sig_ref.at[b, pl.ds(j * block_frames, seg_len // frame_shift), :],
        seg,
        sem,
    )
    dma.start()
    dma.wait()

    rows = seg[:]
    q_full, rem = divmod(frame_length, frame_shift)
    pieces = [
        (jax.lax.slice(rows, (r, 0), (r + block_frames, frame_shift)), r, frame_shift)
        for r in range(q_full)
    ]
    if rem:
        pieces.append(
            (jax.lax.slice(rows, (q_full, 0), (q_full + block_frames, rem)), q_full, rem)
        )

    # never assemble the frame matrix (Mosaic cannot concat pieces at
    # different sublane offsets): frames @ M == sum_r piece_r @ M_r where
    # M_r is the matching row band of the (window-folded) DFT matrix
    re = None
    im = None
    energy = None
    for piece, r, width in pieces:
        band = slice(r * frame_shift, r * frame_shift + width)
        re_t = jnp.dot(piece, cos_ref[band, :], preferred_element_type=jnp.float32)
        im_t = jnp.dot(piece, sin_ref[band, :], preferred_element_type=jnp.float32)
        re = re_t if re is None else re + re_t
        im = im_t if im is None else im + im_t
        if include_energy:
            e_t = jnp.sum(piece * piece, axis=-1, keepdims=True)
            energy = e_t if energy is None else energy + e_t
    power = re * re + im * im
    spec = power if use_power else jnp.sqrt(power)
    feats = jnp.dot(spec, w_ref[:], preferred_element_type=jnp.float32)
    if use_log:
        feats = jnp.log(jnp.maximum(feats, log_floor))
    if include_energy:
        energy = energy / frame_length
        if not use_power:
            energy = jnp.sqrt(energy)
        if use_log:
            energy = jnp.log(jnp.maximum(energy, log_floor))
        feats = jnp.concatenate([energy, feats], axis=-1)
    out_ref[0] = feats


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
    """Features for a batch of padded signals via the fused kernel.

    ``padded``: ``(batch, padded_len)`` — each row laid out by
    :func:`speech_tpu.ops.framing.pad_signal`; rows past a signal's true
    frame count produce garbage the caller masks (same contract as the XLA
    path).  Returns ``(batch, num_frames, num_coeffs)``.
    """
    padded = jnp.asarray(padded, dtype=jnp.float32)
    batch, padded_len = padded.shape
    num_filts = params["weights"].shape[1]
    num_coeffs = num_filts + int(include_energy)
    blocks = -(-num_frames // block_frames)
    grid_frames = blocks * block_frames
    # rows of frame_shift samples; frame k needs rows k .. k + ceil(FL/FS)
    q_rows = -(-frame_length // frame_shift)
    seg_len = (block_frames + q_rows) * frame_shift
    need = (blocks - 1) * block_frames * frame_shift + seg_len
    if padded_len < need:
        padded = jnp.pad(padded, ((0, 0), (0, need - padded_len)))
    padded = padded[:, :need].reshape(batch, need // frame_shift, frame_shift)

    cos = jnp.asarray(params["dft_cos"], jnp.float32)
    sin = jnp.asarray(params["dft_sin"], jnp.float32)
    weights = jnp.asarray(params["weights"], jnp.float32)

    kernel = functools.partial(
        _kernel,
        block_frames=block_frames,
        frame_length=frame_length,
        frame_shift=frame_shift,
        seg_len=seg_len,
        use_log=use_log,
        use_power=use_power,
        include_energy=include_energy,
        log_floor=log_floor,
    )
    half_len = cos.shape[1]
    out = pl.pallas_call(
        kernel,
        grid=(batch, blocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # signal stays in HBM
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
        scratch_shapes=[
            pltpu.VMEM((seg_len // frame_shift, frame_shift), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * batch * grid_frames
            * (frame_length * half_len * 2 + half_len * num_filts),
            bytes_accessed=4 * (batch * need + batch * grid_frames * num_coeffs),
            transcendentals=batch * grid_frames * (half_len + num_coeffs),
        ),
        interpret=interpret,
    )(padded, cos, sin, weights)
    return out[:, :num_frames]
