"""Round 3: int8 digit tier + fixed-cost decomposition (see decomp/decomp2).

Round-2 findings (v5e, headline batch, grid 384):
- digitization is FREE (n_x sweep flat at 4.72-4.82 ms);
- the round-1 "raw dot floor" probes were CSE'd (identical operands per
  dot); the honest distinct-operand probe E2 runs 39 split-K dots in
  9.73 ms = ~131 TFLOP/s = ~66% of v5e bf16 peak (197) — matching the
  62.5% K=160->256 padding ceiling.  The pair dots are already near
  speed-of-light FOR BF16;
- scratch-normalized wide planes (one K=400 dot per pair) beat the
  piece dots: 12.23 vs 13.05 ms, exact;
- the tail is ~free (dotsonly with 512-lane output measured ABOVE
  baseline); ~4.2 ms of fixed cost remains unattributed.

This round:
- F1 int8 MXU probes: distinct-operand (512,400)@(400,512)
  int8 x int8 -> int32 dots (v5e int8 peak is 2x bf16) — the digit
  planes are small integers, so with base-128 margin digits (|d| <= 64)
  BOTH operands fit int8 and accumulation is exact in int32, which also
  removes the 2^24 f32 grouping bound entirely;
- F2 fixed-cost decomposition: passthrough (DMA+grid floor), + max and
  energy lane-reductions, + digitize+scratch, + tail-from-fake-acc;
- F3 full int8 grouped kernel prototype: base 128, margins both sides,
  n_x = n_m = 5 planes, weight-grouped dots (exact int32), cutoffs 4/5,
  checked against the f64-derived XLA digit oracle.
"""

import functools
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

BATCH, SECONDS, RATE = 128, 15, 16000
FRAME_LENGTH, FRAME_SHIFT, DFT = 400, 160, 512
NUM_FRAMES = (SECONDS * RATE + FRAME_SHIFT // 2) // FRAME_SHIFT
LOG_FLOOR = -23.025850929940457
NB = DFT // 2


def _sync(a):
    np.asarray(a[(0,) * a.ndim])


def timeit(fn, *args, inner=20, reps=3):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(reps):
        start = time.perf_counter()
        for _ in range(inner):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - start) / inner)
    return best * 1e3


def build_inputs():
    rng = np.random.RandomState(0)
    signals = rng.randn(BATCH, SECONDS * RATE).astype(np.float32)
    pad_to = (NUM_FRAMES + 4) * FRAME_SHIFT + FRAME_LENGTH
    padded = np.zeros((BATCH, pad_to), np.float32)
    padded[:, : signals.shape[1]] = signals
    return jnp.asarray(padded)


def reference_feats(computer, padded):
    from speech_tpu.ops import framing as _framing

    def f(p):
        frames = jax.vmap(
            lambda q: _framing.frame_padded(
                q, NUM_FRAMES, FRAME_LENGTH, FRAME_SHIFT
            )
        )(p)
        return _stft.stft_feats_from_frames(
            frames,
            computer.params,
            dft_size=DFT,
            use_log=True,
            use_power=True,
            include_energy=True,
            log_floor=LOG_FLOOR,
            fft_mode="matmul",
            precision="double",
        )

    return jax.jit(f)(padded)


# ---------------------------------------------------------------------------
# F1: int8 MXU probes
# ---------------------------------------------------------------------------


def int8_probe(n_dots, distinct=True, k=400, n=512, block=512):
    def kern(xs_ref, ms_ref, o_ref):
        acc = None
        for d in range(n_dots):
            x = xs_ref[d % xs_ref.shape[0]]
            m = ms_ref[d % ms_ref.shape[0]]
            t = jnp.dot(x, m, preferred_element_type=jnp.int32)
            acc = t if acc is None else acc + t
        o_ref[...] = acc

    rng = np.random.RandomState(0)
    nx = n_dots if distinct else 1
    xs = jnp.asarray(
        rng.randint(-64, 65, size=(nx, block, k)).astype(np.int8)
    )
    ms = jnp.asarray(
        rng.randint(-64, 65, size=(min(n_dots, 5), k, n)).astype(np.int8)
    )

    @jax.jit
    def f(xs, ms):
        return pl.pallas_call(
            kern,
            grid=(BATCH * 3,),
            in_specs=[
                pl.BlockSpec(xs.shape, lambda i: (0,) * 3,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(ms.shape, lambda i: (0,) * 3,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (block, n), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((block, n), jnp.int32),
        )(xs, ms)

    return f, xs, ms


def bf16_diverse_probe(n_dots, k=400, n=512, block=512):
    """bf16 comparison at the same shapes, distinct operands."""

    def kern(xs_ref, ms_ref, o_ref):
        acc = None
        for d in range(n_dots):
            t = jnp.dot(
                xs_ref[d % xs_ref.shape[0]],
                ms_ref[d % ms_ref.shape[0]],
                preferred_element_type=jnp.float32,
            )
            acc = t if acc is None else acc + t * jnp.float32(2.0 ** -d)
        o_ref[...] = acc

    rng = np.random.RandomState(0)
    xs = jnp.asarray(
        np.round(rng.randn(n_dots, block, k) * 30).astype(np.float32)
    )
    ms = jnp.asarray(np.round(rng.randn(5, k, n) * 30).astype(np.float32))

    @jax.jit
    def f(xs, ms):
        return pl.pallas_call(
            kern,
            grid=(BATCH * 3,),
            in_specs=[
                pl.BlockSpec(xs.shape, lambda i: (0,) * 3,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(ms.shape, lambda i: (0,) * 3,
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (block, n), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((block, n), jnp.float32),
        )(xs, ms)

    return f, xs, ms


# ---------------------------------------------------------------------------
# F2: fixed-cost decomposition
# ---------------------------------------------------------------------------


def fixed_probe(stage):
    """stage: 'dma' | 'reduce' | 'digitize' | 'tail'."""
    n_x = 5
    q_full, rem = divmod(FRAME_LENGTH, FRAME_SHIFT)
    q_rows = q_full + (1 if rem else 0)
    block = 512
    blocks = -(-NUM_FRAMES // block)
    seg_rows = -(-(block + q_rows) // 8) * 8
    need_rows = blocks * block + (seg_rows - block)
    need = need_rows * FRAME_SHIFT
    out_lanes = 48

    def kern(rows_ref, w_ref, o_ref, *scratch):
        rows = rows_ref[0]
        pieces = [
            (jax.lax.slice(rows, (r, 0), (r + block, FRAME_SHIFT)), r,
             FRAME_SHIFT)
            for r in range(q_full)
        ]
        if rem:
            pieces.append(
                (jax.lax.slice(rows, (q_full, 0), (q_full + block, rem)),
                 q_full, rem)
            )
        if stage == "dma":
            o_ref[0] = jax.lax.slice(
                pieces[0][0], (0, 0), (block, out_lanes)
            )
            return
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
        if stage == "reduce":
            o_ref[0] = (m + energy + scale) + jnp.zeros(
                (block, out_lanes), jnp.float32
            )
            return
        inv = jnp.float32(1.0) / scale
        fbase = jnp.float32(128.0)
        wides = []
        for i in range(n_x):
            wides.append(scratch[i])
        for p, (piece, r, width) in enumerate(pieces):
            v = piece * inv
            lo = r * FRAME_SHIFT
            for i in range(n_x):
                d = jnp.round(v * fbase)
                v = v * fbase - d
                wides[i][:, lo : lo + width] = d
        if stage == "digitize":
            acc = None
            for i in range(n_x):
                t = jax.lax.slice(
                    wides[i][...], (0, 0), (block, out_lanes)
                )
                acc = t if acc is None else acc + t
            o_ref[0] = acc + energy + scale
            return
        # 'tail': fake acc from one cheap slice, full tail math
        acc = jnp.concatenate(
            [wides[0][...], jax.lax.slice(wides[1][...], (0, 0),
                                          (block, NB * 2 - FRAME_LENGTH))],
            axis=-1,
        )
        re = acc[:, :NB] * scale
        mixed = acc[:, NB:] * scale
        mask = w_ref[0, :NB]
        im = mixed * mask
        power = re * re + im * im
        nyq = mixed - im
        nyq_spec = nyq * nyq
        hi = jax.lax.Precision.HIGHEST
        w1 = w_ref[:NB, :40]
        feats = (
            jnp.dot(power, w1, preferred_element_type=jnp.float32,
                    precision=hi)
            + jnp.dot(power, w1, preferred_element_type=jnp.float32,
                      precision=hi)
            + jnp.dot(nyq_spec, w1, preferred_element_type=jnp.float32,
                      precision=hi)
        )
        feats = xlog(jnp.maximum(feats, LOG_FLOOR))
        energy = xlog(jnp.maximum(energy / FRAME_LENGTH, LOG_FLOOR))
        feats = jnp.concatenate([energy, feats], axis=-1)
        o_ref[0] = jnp.pad(feats, ((0, 0), (0, out_lanes - 41)))

    w = jnp.asarray(np.random.RandomState(1).randn(NB, 40), jnp.float32)
    scratch_shapes = [
        pltpu.VMEM((block, FRAME_LENGTH), jnp.float32) for _ in range(n_x)
    ]

    @jax.jit
    def f(padded):
        p = padded
        if p.shape[1] < need:
            p = jnp.pad(p, ((0, 0), (0, need - p.shape[1])))
        rows = p[:, :need].reshape(BATCH, need_rows, FRAME_SHIFT)
        return pl.pallas_call(
            kern,
            grid=(BATCH, blocks),
            in_specs=[
                pl.BlockSpec(
                    (_Element(1), _Element(seg_rows), _Element(FRAME_SHIFT)),
                    lambda b, j: (b, j * block, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, block, out_lanes),
                lambda b, j: (b, j, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (BATCH, blocks * block, out_lanes), jnp.float32
            ),
            scratch_shapes=scratch_shapes,
        )(rows, w)

    return f


# ---------------------------------------------------------------------------
# F3: int8 grouped digit kernel (base 128, margins, int32 accumulation)
# ---------------------------------------------------------------------------

I8_BASE = 128.0
I8_NX = 5
I8_NM = 5


def i8_host_matrices(computer, cutoff):
    """Host prep: base-128 margin digit planes of the combined
    [cos 0..nb-1 | nyq-cos, sin 1..nb-1] matrix, grouped by pair weight
    s = i + j and stacked row-wise per group."""
    C, S = computer._dft_cos, computer._dft_sin
    W = computer._weights
    K, half = C.shape
    nb = half - 1
    cos_planes, cos_scale = _stft.digitize_matrix(
        C, I8_NM, I8_BASE, margin=True
    )
    sin_planes, sin_scale = _stft.digitize_matrix(
        S, I8_NM, I8_BASE, margin=True
    )
    mats = np.zeros((I8_NM, K, 2 * nb), np.float32)
    for j in range(I8_NM):
        mats[j, :, :nb] = cos_planes[j][:, :nb]
        mats[j, :, nb] = cos_planes[j][:, nb]
        mats[j, :, nb + 1 :] = sin_planes[j][:, 1:nb]
    assert np.abs(mats).max() <= 64
    # groups: s = i + j descending (ascending weight), members (i, j)
    groups = []
    for s in range(I8_NX + I8_NM - 2, -1, -1):
        if s > cutoff:
            continue
        members = [
            (i, s - i)
            for i in range(I8_NX)
            if 0 <= s - i < I8_NM
        ]
        if members:
            groups.append((s, members))
    gmats = np.concatenate(
        [
            np.concatenate([mats[j] for _, mem in [g] for (_, j) in mem],
                           axis=0)
            for g in groups
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


def _i8_kernel(
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
    offsets,
    cos_scale,
    int8_planes,
):
    rows = rows_ref[0]
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
    # digitize into wide scratch planes (normalizes layout offsets), then
    # read back for the group dots
    for p, (piece, r, width) in enumerate(pieces):
        v = piece * inv
        lo = r * FRAME_SHIFT
        for i in range(I8_NX):
            d = jnp.round(v * fbase)
            v = v * fbase - d
            scratch[i][:, lo : lo + width] = (
                d.astype(jnp.int8) if int8_planes else d
            )
    wides = [s[...] for s in scratch[:I8_NX]]

    acc = None
    base_i = I8_BASE
    for s, xs, off, span in offsets:  # ascending weight order already
        xg = (
            wides[xs[0]]
            if len(xs) == 1
            else jnp.concatenate([wides[i] for i in xs], axis=-1)
        )
        mg = gmats_ref[off : off + span, :]
        if int8_planes:
            t = jnp.dot(xg, mg, preferred_element_type=jnp.int32)
            term = t.astype(jnp.float32) * jnp.float32(base_i ** -(s + 2))
        else:
            t = jnp.dot(
                xg, mg.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            term = t * jnp.float32(base_i ** -(s + 2))
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


def run_i8(computer, cutoff, block_frames=512, int8_planes=True):
    host = i8_host_matrices(computer, cutoff)
    num_coeffs = host["w_hi"].shape[1] + 1
    q_full, rem = divmod(FRAME_LENGTH, FRAME_SHIFT)
    q_rows = q_full + (1 if rem else 0)
    blocks = -(-NUM_FRAMES // block_frames)
    seg_rows = -(-(block_frames + q_rows) // 8) * 8
    need_rows = blocks * block_frames + (seg_rows - block_frames)
    need = need_rows * FRAME_SHIFT

    gmats = host["gmats"]
    if not int8_planes:
        gmats = gmats.astype(jnp.float32)

    kernel = functools.partial(
        _i8_kernel,
        block_frames=block_frames,
        offsets=host["offsets"],
        cos_scale=host["cos_scale"],
        int8_planes=int8_planes,
    )
    scratch_shapes = [
        pltpu.VMEM(
            (block_frames, FRAME_LENGTH),
            jnp.int8 if int8_planes else jnp.float32,
        )
        for _ in range(I8_NX)
    ]

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
                    (_Element(1), _Element(seg_rows), _Element(FRAME_SHIFT)),
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
                (BATCH, blocks * block_frames, num_coeffs), jnp.float32
            ),
            scratch_shapes=scratch_shapes,
        )(
            rows,
            gmats,
            host["mixed_scale"],
            host["mask"],
            host["w_hi"],
            host["w_lo"],
            host["w_nyq"],
        )
        return out[:, :NUM_FRAMES]

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

    # F1: int8 probes
    for name, mk in [
        ("F1 int8 19 distinct dots", lambda: int8_probe(19)),
        ("F1 int8 13 distinct dots", lambda: int8_probe(13)),
        ("F1 bf16 13 distinct dots", lambda: bf16_diverse_probe(13)),
        ("F1 bf16 19 distinct dots", lambda: bf16_diverse_probe(19)),
    ]:
        try:
            f, a, b = mk()
            out = f(a, b)
            _sync(out)
            ms = timeit(f, a, b)
            print(f"{name:34s} {ms:8.2f} ms", flush=True)
        except Exception as e:
            print(
                f"{name:34s} FAILED: {type(e).__name__}: "
                f"{str(e).splitlines()[0][:150]}",
                flush=True,
            )

    # F2: fixed-cost decomposition
    for stage in ("dma", "reduce", "digitize", "tail"):
        report(f"F2 {stage}", fixed_probe(stage), check=False)

    # F3: int8 grouped kernel
    report("F3 i8 cutoff=5 (19p, 6 dots)", run_i8(computer, 5))
    report("F3 i8 cutoff=4 (15p, 5 dots)", run_i8(computer, 4))
    report("F3 i8 cutoff=6 (22p, 7 dots)", run_i8(computer, 6))
    report("F3 f32grouped cutoff=5", run_i8(computer, 5, int8_planes=False))
    report("F3 i8 cutoff=5 bf256",
           run_i8(computer, 5, block_frames=256))


if __name__ == "__main__":
    main()
