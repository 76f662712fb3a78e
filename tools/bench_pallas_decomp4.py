"""Round 4: kill the DMA/grid floor (see decomp3).

Round-3 findings: int8 grouped digit kernel = 9.44/10.15 ms (c=4/5),
exact; fixed-cost decomposition shows a 2.65 ms DMA+grid floor under the
Element-indexed overlapping input blocks — suspected to disable Mosaic's
automatic double-buffered pipelining (plain blocks pipeline; Element
overlap cannot).

Fix under test: pass the rows array TWICE with PLAIN BlockSpecs — a
(512, 160) main block at j and an (8, 160) halo block at j*64+64 — and
reassemble the 520-row overlapping segment through a VMEM scratch
(both stores 8-aligned).  One extra 333 KB VMEM copy per step; input
DMA becomes pipelineable.

- G0 DMA passthrough: Element vs plain+halo (isolated)
- G1 int8 c=5 with plain+halo rows scratch
- G2 int8 c=4 with plain+halo rows scratch
- G3 G1 + dimension_semantics=("parallel", "arbitrary")
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from speech_tpu.compute import STFTFrameComputer
from speech_tpu.ops import stft as _stft
from speech_tpu.ops.xmath import xlog

from jax._src.pallas.core import Element as _Element

sys.path.insert(0, "/root/repo/tools")
from bench_pallas_decomp3 import (  # noqa: E402
    BATCH,
    FRAME_LENGTH,
    FRAME_SHIFT,
    LOG_FLOOR,
    NUM_FRAMES,
    I8_BASE,
    I8_NX,
    build_inputs,
    i8_host_matrices,
    reference_feats,
    timeit,
    _sync,
)


def _i8_body(
    rows,
    gmats_ref,
    mscale_ref,
    mask_ref,
    whi_ref,
    wlo_ref,
    wnyq_ref,
    out_ref,
    scratch,
    *,
    block_frames,
    offsets,
    cos_scale,
):
    """The round-3 int8 grouped kernel body, given the assembled
    (block + q_rows, shift) rows array."""
    q_full, rem = divmod(FRAME_LENGTH, FRAME_SHIFT)
    pieces = [
        (jax.lax.slice(rows, (r, 0), (r + block_frames, FRAME_SHIFT)), r,
         FRAME_SHIFT)
        for r in range(q_full)
    ]
    if rem:
        pieces.append(
            (jax.lax.slice(rows, (q_full, 0),
                           (q_full + block_frames, rem)), q_full, rem)
        )

    m = energy = None
    for piece, _, _ in pieces:
        pm = jnp.max(jnp.abs(piece), axis=-1, keepdims=True)
        m = pm if m is None else jnp.maximum(m, pm)
        e_t = jnp.sum(piece * piece, axis=-1, keepdims=True)
        energy = e_t if energy is None else energy + e_t
    m = jnp.maximum(m, jnp.float32(1e-30))
    bits = jax.lax.bitcast_convert_type(m, jnp.int32)
    scale = jax.lax.bitcast_convert_type(((bits >> 23) + 2) << 23,
                                         jnp.float32)
    inv = jnp.float32(1.0) / scale

    fbase = jnp.float32(I8_BASE)
    for p, (piece, r, width) in enumerate(pieces):
        v = piece * inv
        lo = r * FRAME_SHIFT
        for i in range(I8_NX):
            d = jnp.round(v * fbase)
            v = v * fbase - d
            scratch[i][:, lo : lo + width] = d.astype(jnp.int8)
    wides = [s[...] for s in scratch[:I8_NX]]

    acc = None
    for s, xs, off, span in offsets:
        xg = (
            wides[xs[0]]
            if len(xs) == 1
            else jnp.concatenate([wides[i] for i in xs], axis=-1)
        )
        mg = gmats_ref[off : off + span, :]
        t = jnp.dot(xg, mg, preferred_element_type=jnp.int32)
        term = t.astype(jnp.float32) * jnp.float32(I8_BASE ** -(s + 2))
        acc = term if acc is None else acc + term

    nb = mask_ref.shape[0]
    re = acc[:, :nb] * (scale * jnp.float32(cos_scale))
    mixed = acc[:, nb:] * (scale * mscale_ref[:])
    mask = mask_ref[:]
    im = mixed * mask
    power = re * re + im * im
    nyq = mixed - im
    nyq_spec = nyq * nyq
    hi = jax.lax.Precision.HIGHEST
    feats = (
        jnp.dot(power, whi_ref[:], preferred_element_type=jnp.float32,
                precision=hi)
        + jnp.dot(power, wlo_ref[:], preferred_element_type=jnp.float32,
                  precision=hi)
        + jnp.dot(nyq_spec, wnyq_ref[:], preferred_element_type=jnp.float32,
                  precision=hi)
    )
    feats = xlog(jnp.maximum(feats, LOG_FLOOR))
    energy = energy / FRAME_LENGTH
    energy = xlog(jnp.maximum(energy, LOG_FLOOR))
    out_ref[0] = jnp.concatenate([energy, feats], axis=-1)


def _halo_kernel(
    main_ref,
    halo_ref,
    gmats_ref,
    mscale_ref,
    mask_ref,
    whi_ref,
    wlo_ref,
    wnyq_ref,
    out_ref,
    rows_scratch,
    *digit_scratch,
    block_frames,
    q_pad,
    offsets,
    cos_scale,
):
    rows_scratch[0:block_frames, :] = main_ref[0]
    rows_scratch[block_frames : block_frames + q_pad, :] = halo_ref[0]
    _i8_body(
        rows_scratch[...],
        gmats_ref,
        mscale_ref,
        mask_ref,
        whi_ref,
        wlo_ref,
        wnyq_ref,
        out_ref,
        digit_scratch,
        block_frames=block_frames,
        offsets=offsets,
        cos_scale=cos_scale,
    )


def run_i8_halo(computer, cutoff, block_frames=512, dimension_semantics=None):
    host = i8_host_matrices(computer, cutoff)
    num_coeffs = host["w_hi"].shape[1] + 1
    q_full, rem = divmod(FRAME_LENGTH, FRAME_SHIFT)
    q_rows = q_full + (1 if rem else 0)
    q_pad = 8  # halo rows, 8-aligned (>= q_rows)
    assert q_rows <= q_pad
    blocks = -(-NUM_FRAMES // block_frames)
    need_rows = blocks * block_frames + q_pad
    need = need_rows * FRAME_SHIFT

    kernel = functools.partial(
        _halo_kernel,
        block_frames=block_frames,
        q_pad=q_pad,
        offsets=host["offsets"],
        cos_scale=host["cos_scale"],
    )
    scratch_shapes = [
        pltpu.VMEM((block_frames + q_pad, FRAME_SHIFT), jnp.float32)
    ] + [
        pltpu.VMEM((block_frames, FRAME_LENGTH), jnp.int8)
        for _ in range(I8_NX)
    ]
    kwargs = {}
    if dimension_semantics is not None:
        try:
            kwargs["compiler_params"] = pltpu.TPUCompilerParams(
                dimension_semantics=dimension_semantics
            )
        except AttributeError:
            kwargs["compiler_params"] = dict(
                mosaic=dict(dimension_semantics=dimension_semantics)
            )

    @jax.jit
    def f(padded):
        p = padded
        if p.shape[1] < need:
            p = jnp.pad(p, ((0, 0), (0, need - p.shape[1])))
        rows = p[:, :need].reshape(BATCH, need_rows, FRAME_SHIFT)
        out = pl.pallas_call(
            kernel,
            grid=(BATCH, blocks),
            in_specs=[
                pl.BlockSpec(
                    (1, block_frames, FRAME_SHIFT),
                    lambda b, j: (b, j, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, q_pad, FRAME_SHIFT),
                    lambda b, j: (b, (j + 1) * (block_frames // q_pad), 0),
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
                (BATCH, blocks * block_frames, num_coeffs), jnp.float32
            ),
            scratch_shapes=scratch_shapes,
            **kwargs,
        )(
            rows,
            rows,
            host["gmats"],
            host["mixed_scale"],
            host["mask"],
            host["w_hi"],
            host["w_lo"],
            host["w_nyq"],
        )
        return out[:, :NUM_FRAMES]

    return f


# ---------------------------------------------------------------------------
# G0: DMA passthrough, Element vs plain+halo
# ---------------------------------------------------------------------------


def dma_probe(mode):
    q_pad = 8
    block = 512
    blocks = -(-NUM_FRAMES // block)
    if mode == "element":
        seg_rows = block + q_pad
        need_rows = blocks * block + q_pad
    else:
        need_rows = blocks * block + q_pad
    need = need_rows * FRAME_SHIFT
    out_lanes = 48

    if mode == "element":

        def kern(rows_ref, o_ref):
            o_ref[0] = jax.lax.slice(
                rows_ref[0], (0, 0), (block, out_lanes)
            )

        in_specs = [
            pl.BlockSpec(
                (_Element(1), _Element(block + q_pad),
                 _Element(FRAME_SHIFT)),
                lambda b, j: (b, j * block, 0),
                memory_space=pltpu.VMEM,
            )
        ]
        n_in = 1
    else:

        def kern(main_ref, halo_ref, o_ref):
            o_ref[0] = jax.lax.slice(
                main_ref[0], (0, 0), (block, out_lanes)
            ) + jnp.sum(halo_ref[0]) * jnp.float32(1e-30)

        in_specs = [
            pl.BlockSpec(
                (1, block, FRAME_SHIFT),
                lambda b, j: (b, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, q_pad, FRAME_SHIFT),
                lambda b, j: (b, (j + 1) * (block // q_pad), 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        n_in = 2

    @jax.jit
    def f(padded):
        p = padded
        if p.shape[1] < need:
            p = jnp.pad(p, ((0, 0), (0, need - p.shape[1])))
        rows = p[:, :need].reshape(BATCH, need_rows, FRAME_SHIFT)
        return pl.pallas_call(
            kern,
            grid=(BATCH, blocks),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, block, out_lanes),
                lambda b, j: (b, j, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (BATCH, blocks * block, out_lanes), jnp.float32
            ),
        )(*([rows] * n_in))

    return f


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    computer = STFTFrameComputer(
        {"name": "fbank", "num_filts": 40, "sampling_rate": 16000},
        frame_length_ms=25,
        frame_shift_ms=10,
        include_energy=True,
        dtype="float32",
        precision="double",
    )
    padded = build_inputs()
    ref_np = np.asarray(reference_feats(computer, padded))
    print("oracle computed", flush=True)

    def report(name, fn, check=True):
        try:
            out = fn(padded)
            err = (
                float(np.max(np.abs(np.asarray(out) - ref_np)))
                if check
                else float("nan")
            )
            ms = timeit(fn, padded)
            print(f"{name:34s} {ms:8.2f} ms   max_err={err:.3e}",
                  flush=True)
        except Exception as e:
            print(
                f"{name:34s} FAILED: {type(e).__name__}: "
                f"{str(e).splitlines()[0][:150]}",
                flush=True,
            )

    report("G0 dma element", dma_probe("element"), check=False)
    report("G0 dma plain+halo", dma_probe("halo"), check=False)

    report("G1 i8 halo c=5", run_i8_halo(computer, 5))
    report("G2 i8 halo c=4", run_i8_halo(computer, 4))
    report(
        "G3 i8 halo c=5 parallel",
        run_i8_halo(computer, 5,
                    dimension_semantics=("parallel", "arbitrary")),
    )
    report(
        "G3b i8 halo c=5 par/par",
        run_i8_halo(computer, 5,
                    dimension_semantics=("parallel", "parallel")),
    )


if __name__ == "__main__":
    main()
