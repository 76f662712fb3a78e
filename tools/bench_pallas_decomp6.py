"""Round 6: base-254 int8 digit kernel (see decomp5).

base-128+margin needed 5x5 planes / 19 pairs (7 bits/plane).  base-254
with margin bits on BOTH operands gives |digit| <= 127 — exactly int8 —
at ~7.99 bits/plane, reproducing the production double tier's 4x4-plane
/ 13-pair structure (truncation ~2^-40) with 5 weight-grouped int8 dots.
int32 accumulation is always exact; the int32->f32 term conversion can
round above 2^24 (groups s>=2), bounded by 1 * 254^-(s+2) of the scale^2
— 1e-10-class, far inside the <=1e-5/1e-6 contract.  'accurate' = c=3
(10 pairs, 4 dots, truncation ~2^-32 — the same class as the current
base-256 c=3 accurate tier).

- J1 base-254 c=4 / c=3 (Element input, as production)
- J2 J1 with two signals per grid step (grid 64x3: halves the 1.48 ms
  grid floor)
- J3 tone-pair adversary accuracy vs float64 (the pinned regression
  test's signal), c in {3, 4}, vs the XLA digit tiers
"""

import functools
import sys

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
    build_inputs,
    reference_feats,
    timeit,
    _sync,
)

B254 = 254.0
NX = 4
NM = 4


def host_254(computer, cutoff):
    C, S = computer._dft_cos, computer._dft_sin
    W = computer._weights
    K, half = C.shape
    nb = half - 1
    cos_planes, cos_scale = _stft.digitize_matrix(C, NM, B254, margin=True)
    sin_planes, sin_scale = _stft.digitize_matrix(S, NM, B254, margin=True)
    assert abs(cos_planes).max() <= 127 and abs(sin_planes).max() <= 127
    mats = np.zeros((NM, K, 2 * nb), np.float32)
    for j in range(NM):
        mats[j, :, :nb] = cos_planes[j][:, :nb]
        mats[j, :, nb] = cos_planes[j][:, nb]
        mats[j, :, nb + 1 :] = sin_planes[j][:, 1:nb]
    groups = []
    for s in range(NX + NM - 2, -1, -1):
        if s > cutoff:
            continue
        members = [(i, s - i) for i in range(NX) if 0 <= s - i < NM]
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
        offsets.append((s, [i for i, _ in mem], off, len(mem) * K))
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
        "gmats": jnp.asarray(gmats),
        "offsets": offsets,
        "cos_scale": float(cos_scale),
        "mixed_scale": jnp.asarray(mixed_scale),
        "mask": jnp.asarray(mask),
        "w_hi": jnp.asarray(w_hi),
        "w_lo": jnp.asarray(w_lo),
        "w_nyq": jnp.asarray(w_nyq),
    }


def _kernel254(
    rows_ref,
    gmats_ref,
    mscale_ref,
    mask_ref,
    whi_ref,
    wlo_ref,
    wnyq_ref,
    out_ref,
    *scratch,
    block_frames,
    sigs_per_step,
    offsets,
    cos_scale,
):
    q_full, rem = divmod(FRAME_LENGTH, FRAME_SHIFT)
    seg = block_frames + 8

    per_sig = []
    for g in range(sigs_per_step):
        rows = rows_ref[g]
        pieces = [
            (
                jax.lax.slice(rows, (r, 0), (r + block_frames, FRAME_SHIFT)),
                r,
                FRAME_SHIFT,
            )
            for r in range(q_full)
        ]
        if rem:
            pieces.append(
                (
                    jax.lax.slice(
                        rows, (q_full, 0), (q_full + block_frames, rem)
                    ),
                    q_full,
                    rem,
                )
            )
        m = energy = None
        for piece, _, _ in pieces:
            pm = jnp.max(jnp.abs(piece), axis=-1, keepdims=True)
            m = pm if m is None else jnp.maximum(m, pm)
            e_t = jnp.sum(piece * piece, axis=-1, keepdims=True)
            energy = e_t if energy is None else energy + e_t
        m = jnp.maximum(m, jnp.float32(1e-30))
        bits = jax.lax.bitcast_convert_type(m, jnp.int32)
        scale = jax.lax.bitcast_convert_type(
            ((bits >> 23) + 2) << 23, jnp.float32
        )
        inv = jnp.float32(1.0) / scale
        fbase = jnp.float32(B254)
        for piece, r, width in pieces:
            v = piece * inv
            lo = r * FRAME_SHIFT
            for i in range(NX):
                d = jnp.round(v * fbase)
                v = v * fbase - d
                scratch[i][
                    g * block_frames : (g + 1) * block_frames,
                    lo : lo + width,
                ] = d.astype(jnp.int8)
        per_sig.append((scale, energy))

    wides = [s[...] for s in scratch[:NX]]
    acc = None
    for s, xs, off, span in offsets:
        xg = (
            wides[xs[0]]
            if len(xs) == 1
            else jnp.concatenate([wides[i] for i in xs], axis=-1)
        )
        mg = gmats_ref[off : off + span, :]
        t = jnp.dot(xg, mg, preferred_element_type=jnp.int32)
        term = t.astype(jnp.float32) * jnp.float32(B254 ** -(s + 2))
        acc = term if acc is None else acc + term

    nb = mask_ref.shape[0]
    for g in range(sigs_per_step):
        scale, energy = per_sig[g]
        a = jax.lax.slice(
            acc, (g * block_frames, 0), ((g + 1) * block_frames, 2 * nb)
        )
        re = a[:, :nb] * (scale * jnp.float32(cos_scale))
        mixed = a[:, nb:] * (scale * mscale_ref[:])
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
            + jnp.dot(nyq_spec, wnyq_ref[:],
                      preferred_element_type=jnp.float32, precision=hi)
        )
        feats = xlog(jnp.maximum(feats, LOG_FLOOR))
        energy = energy / FRAME_LENGTH
        energy = xlog(jnp.maximum(energy, LOG_FLOOR))
        out_ref[g] = jnp.concatenate([energy, feats], axis=-1)


def run_254(computer, cutoff, block_frames=512, sigs_per_step=1):
    host = host_254(computer, cutoff)
    num_coeffs = host["w_hi"].shape[1] + 1
    q_full, rem = divmod(FRAME_LENGTH, FRAME_SHIFT)
    q_rows = q_full + (1 if rem else 0)
    blocks = -(-NUM_FRAMES // block_frames)
    seg_rows = -(-(block_frames + q_rows) // 8) * 8
    need_rows = blocks * block_frames + (seg_rows - block_frames)
    need = need_rows * FRAME_SHIFT

    kernel = functools.partial(
        _kernel254,
        block_frames=block_frames,
        sigs_per_step=sigs_per_step,
        offsets=host["offsets"],
        cos_scale=host["cos_scale"],
    )
    scratch_shapes = [
        pltpu.VMEM(
            (sigs_per_step * block_frames, FRAME_LENGTH), jnp.int8
        )
        for _ in range(NX)
    ]

    @jax.jit
    def f(padded):
        p = padded
        if p.shape[1] < need:
            p = jnp.pad(p, ((0, 0), (0, need - p.shape[1])))
        rows = p[:, :need].reshape(BATCH, need_rows, FRAME_SHIFT)
        out = pl.pallas_call(
            kernel,
            grid=(BATCH // sigs_per_step, blocks),
            in_specs=[
                pl.BlockSpec(
                    (
                        _Element(sigs_per_step),
                        _Element(seg_rows),
                        _Element(FRAME_SHIFT),
                    ),
                    lambda b, j: (b * sigs_per_step, j * block_frames, 0),
                    memory_space=pltpu.VMEM,
                ),
            ]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=pl.BlockSpec(
                (sigs_per_step, block_frames, num_coeffs),
                lambda b, j: (b, j, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (BATCH, blocks * block_frames, num_coeffs), jnp.float32
            ),
            scratch_shapes=scratch_shapes,
        )(
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


def adversary_batch():
    """The pinned adversary: near-degenerate tone pairs with a noise
    floor (tests/test_pallas.py) padded to the kernel layout."""
    rng = np.random.RandomState(5)
    rate = 16000
    t = np.arange(4 * rate) / rate
    sigs = []
    for k in range(8):
        f0 = 1000.0 + 7.3 * k
        df = 0.25 + 0.1 * k
        sig = np.sin(2 * np.pi * f0 * t) - np.sin(
            2 * np.pi * (f0 + df) * t + 1e-3
        )
        sig += 1e-4 * rng.randn(t.size)
        sigs.append(sig)
    return np.stack(sigs)


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

    def rep(name, fn, check=True):
        try:
            out = fn(padded)
            err = (
                float(np.max(np.abs(np.asarray(out) - ref_np)))
                if check
                else float("nan")
            )
            ms = timeit(fn, padded)
            print(f"{name:36s} {ms:8.2f} ms   max_err={err:.3e}",
                  flush=True)
        except Exception as e:
            print(
                f"{name:36s} FAILED: {type(e).__name__}: "
                f"{str(e).splitlines()[0][:150]}",
                flush=True,
            )

    rep("J1 b254 c=4 (13p, 5 dots)", run_254(computer, 4))
    rep("J1 b254 c=3 (10p, 4 dots)", run_254(computer, 3))
    rep("J2 b254 c=4 sigs=2", run_254(computer, 4, sigs_per_step=2))
    rep("J2 b254 c=3 sigs=2", run_254(computer, 3, sigs_per_step=2))
    rep("J2 b254 c=4 sigs=4", run_254(computer, 4, sigs_per_step=4))

    # J3: adversary accuracy on-chip vs an f64 oracle computed on CPU in
    # a subprocess-free way: use float64 XLA path? TPU rejects f64 — do
    # the oracle with the exact XLA digit path at f32 'double' instead
    # (known <= 1e-6 of f64 on this adversary), then compare kernels to
    # the TRUE f64 oracle computed on host numpy below.
    adv = adversary_batch()
    n = adv.shape[1]
    num_frames = (n + FRAME_SHIFT // 2) // FRAME_SHIFT
    pad_to = (num_frames + 4) * FRAME_SHIFT + FRAME_LENGTH
    advp = np.zeros((adv.shape[0], pad_to), np.float32)
    advp[:, :n] = adv
    # f64 oracle on host: fold window+dft in numpy float64
    C, S, W = computer._dft_cos, computer._dft_sin, computer._weights
    feats64 = []
    for b in range(adv.shape[0]):
        frames = np.stack(
            [
                np.pad(adv[b], (0, FRAME_LENGTH))[
                    k * FRAME_SHIFT : k * FRAME_SHIFT + FRAME_LENGTH
                ]
                for k in range(num_frames)
            ]
        )
        re = frames @ C
        im = frames @ S
        power = re * re + im * im
        f = power @ W
        e = (frames ** 2).sum(-1) / FRAME_LENGTH
        out = np.concatenate(
            [
                np.log(np.maximum(e, np.exp(LOG_FLOOR)))[:, None],
                np.log(np.maximum(f, np.exp(LOG_FLOOR))),
            ],
            axis=1,
        )
        feats64.append(out)
    feats64 = np.stack(feats64)

    for cutoff in (4, 3):
        saved = globals()["NUM_FRAMES"]
        try:
            globals()["NUM_FRAMES"] = num_frames
            fn = run_254_adv(computer, cutoff, advp)
            out = np.asarray(fn(jnp.asarray(advp)))
            err = np.max(np.abs(out - feats64))
            print(
                f"J3 adversary b254 c={cutoff}: max err vs f64 = "
                f"{err:.3e}",
                flush=True,
            )
        except Exception as e:
            print(f"J3 c={cutoff} FAILED: {e}", flush=True)
        finally:
            globals()["NUM_FRAMES"] = saved


def run_254_adv(computer, cutoff, advp):
    """run_254 specialized to the adversary batch shape."""
    host = host_254(computer, cutoff)
    num_coeffs = host["w_hi"].shape[1] + 1
    batch, padlen = advp.shape
    num_frames = NUM_FRAMES
    q_full, rem = divmod(FRAME_LENGTH, FRAME_SHIFT)
    q_rows = q_full + (1 if rem else 0)
    block_frames = 512
    blocks = -(-num_frames // block_frames)
    seg_rows = -(-(block_frames + q_rows) // 8) * 8
    need_rows = blocks * block_frames + (seg_rows - block_frames)
    need = need_rows * FRAME_SHIFT

    kernel = functools.partial(
        _kernel254,
        block_frames=block_frames,
        sigs_per_step=1,
        offsets=host["offsets"],
        cos_scale=host["cos_scale"],
    )
    scratch_shapes = [
        pltpu.VMEM((block_frames, FRAME_LENGTH), jnp.int8)
        for _ in range(NX)
    ]

    @jax.jit
    def f(padded):
        p = padded
        if p.shape[1] < need:
            p = jnp.pad(p, ((0, 0), (0, need - p.shape[1])))
        rows = p[:, :need].reshape(batch, need_rows, FRAME_SHIFT)
        out = pl.pallas_call(
            kernel,
            grid=(batch, blocks),
            in_specs=[
                pl.BlockSpec(
                    (_Element(1), _Element(seg_rows),
                     _Element(FRAME_SHIFT)),
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
            scratch_shapes=scratch_shapes,
        )(
            rows,
            host["gmats"],
            host["mixed_scale"],
            host["mask"],
            host["w_hi"],
            host["w_lo"],
            host["w_nyq"],
        )
        return out[:, :num_frames]

    return f


if __name__ == "__main__":
    main()
