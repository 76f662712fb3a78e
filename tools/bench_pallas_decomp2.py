"""Round 2 of the fused digit kernel decomposition (see bench_pallas_decomp).

Round-1 findings (v5e, 128 x 15 s fbank, 1500 frames, block 512, grid 384):
- production double kernel 13.14 ms; cutoff sweep slope 0.695 ms/pair,
  fixed cost ~4.1-4.6 ms;
- raw Mosaic dot probe: 13 back-to-back (512,400)@(400,512) DEFAULT dots
  in the same grid = 2.31 ms (~bf16 peak), split-K (160/160/80) costs
  nothing (2.27 ms) -> the production pair dots run at ~30% of what the
  MXU does on the same shapes;
- M=2048 dots are ~59% efficient (5.53 ms for 4x(2048,400,512));
- lane-concat of pieces fails: the row slices carry mismatched
  sublane/lane layout offsets ({0,0}/{1,32}/{2,64}); sublane concat of
  digit planes works (jdots bf256 compiled, exact, but slower).

This round isolates:
- E1 digitize cost: n_x sweep at cutoff 0;
- E2 operand diversity: 39 split-K dots reading 12 DISTINCT plane arrays
  from a VMEM ref + mats slices (production dots minus the digitize
  dependency chain);
- E3 digitize+dots only (full-width f32 output, no tail/energy);
- E4 layout-normalized pieces (scratch round-trip) -> pairconcat retry;
- E5 separate per-piece BlockSpecs (aligned offsets) -> pairconcat;
- E6 bf16-stored digit planes;
- E7 block_frames 256 baseline (per-step fixed cost);
- E8 monodot (fixed n_m bug) at bf256.
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
from speech_tpu.ops import pallas_stft as _pk
from speech_tpu.ops.xmath import xlog

from jax._src.pallas.core import Element as _Element

BATCH, SECONDS, RATE = 128, 15, 16000
FRAME_LENGTH, FRAME_SHIFT, DFT = 400, 160, 512
NUM_FRAMES = (SECONDS * RATE + FRAME_SHIFT // 2) // FRAME_SHIFT
LOG_FLOOR = -23.025850929940457


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


def _tail(acc, scale, energy, params_shapes, mscale_ref, mask_ref, whi_ref,
          wlo_ref, wnyq_ref, cos_scale, frame_length):
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
    energy = energy / frame_length
    energy = xlog(jnp.maximum(energy, LOG_FLOOR))
    return jnp.concatenate([energy, feats], axis=-1)


def _kernel2(
    rows_ref,
    mats_ref,
    mscale_ref,
    mask_ref,
    whi_ref,
    wlo_ref,
    wnyq_ref,
    out_ref,
    *scratch,
    block_frames,
    n_x,
    pairs,
    cos_scale,
    variant,
    n_m_static=None,
):
    base = _stft._PDK_BASE
    rows = rows_ref[0]
    q_full, rem = divmod(FRAME_LENGTH, FRAME_SHIFT)
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
    scale = jax.lax.bitcast_convert_type(((bits >> 23) + 2) << 23, jnp.float32)
    inv = jnp.float32(1.0) / scale

    fbase = jnp.float32(base)
    planes = []
    for piece, _, _ in pieces:
        v = piece * inv
        ps = []
        for _ in range(n_x):
            d = jnp.round(v * fbase)
            v = v * fbase - d
            if variant == "bf16planes":
                d = d.astype(jnp.bfloat16)
            ps.append(d)
        planes.append(ps)

    if variant == "scratchconcat":
        # normalize each plane's layout through a scratch ref, then
        # lane-concat pieces into full (block, 400) planes -> 1 dot/pair
        norm = []
        for i in range(n_x):
            per_piece = []
            for p, (piece, r, width) in enumerate(pieces):
                ref = scratch[i * len(pieces) + p]
                ref[...] = planes[p][i]
                per_piece.append(ref[...])
            norm.append(jnp.concatenate(per_piece, axis=-1))
        acc = None
        for i, j, w in pairs:
            t = jnp.dot(norm[i], mats_ref[j],
                        preferred_element_type=jnp.float32)
            term = t * jnp.float32(w)
            acc = term if acc is None else acc + term
    elif variant == "scratchwide":
        # digitize directly into lane slices of wide scratch planes
        ok = True
        norm = []
        for i in range(n_x):
            ref = scratch[i]
            for p, (piece, r, width) in enumerate(pieces):
                lo = r * FRAME_SHIFT
                ref[:, lo : lo + width] = planes[p][i]
            norm.append(ref[...])
        acc = None
        for i, j, w in pairs:
            t = jnp.dot(norm[i], mats_ref[j],
                        preferred_element_type=jnp.float32)
            term = t * jnp.float32(w)
            acc = term if acc is None else acc + term
    elif variant == "dotsonly":
        acc = None
        for i, j, w in pairs:
            g = None
            for (piece, r, width), ps in zip(pieces, planes):
                lo = r * FRAME_SHIFT
                t = jnp.dot(
                    ps[i],
                    mats_ref[j, lo : lo + width, :],
                    preferred_element_type=jnp.float32,
                )
                g = t if g is None else g + t
            term = g * jnp.float32(w)
            acc = term if acc is None else acc + term
        out_ref[0] = acc * scale
        return
    elif variant == "monodot":
        stacked = [jnp.concatenate(ps, axis=0) for ps in planes]
        wide = jnp.concatenate(stacked, axis=-1)
        big = jnp.dot(wide, mats_ref[:], preferred_element_type=jnp.float32)
        nb2 = big.shape[1] // n_m_static
        acc = None
        for s in range(n_x + n_m_static - 2, -1, -1):
            for i in range(n_x):
                j = s - i
                if 0 <= j < n_m_static:
                    blk = jax.lax.slice(
                        big,
                        (i * block_frames, j * nb2),
                        ((i + 1) * block_frames, (j + 1) * nb2),
                    )
                    term = blk * jnp.float32(base ** -(s + 2))
                    acc = term if acc is None else acc + term
    else:  # baseline / bf16planes
        acc = None
        for i, j, w in pairs:
            g = None
            for (piece, r, width), ps in zip(pieces, planes):
                lo = r * FRAME_SHIFT
                mslice = mats_ref[j, lo : lo + width, :]
                if variant == "bf16planes":
                    mslice = mslice.astype(jnp.bfloat16)
                t = jnp.dot(
                    ps[i], mslice, preferred_element_type=jnp.float32
                )
                g = t if g is None else g + t
            term = g * jnp.float32(w)
            acc = term if acc is None else acc + term

    out_ref[0] = _tail(acc, scale, energy, None, mscale_ref, mask_ref,
                       whi_ref, wlo_ref, wnyq_ref, cos_scale, FRAME_LENGTH)


def run_variant2(params, variant, block_frames=512, cutoff=4, n_x=None):
    if n_x is None:
        n_x = _stft._PDK_X_DIGITS
    mats = params["pdk_mats"]
    n_m = mats.shape[0]
    pairs = [
        (i, j, _stft._PDK_BASE ** -(i + j + 2))
        for i, j in _stft.digit_pair_schedule(n_x, n_m, cutoff)
    ]
    num_coeffs = params["pdk_w_hi"].shape[1] + 1
    out_lanes = 2 * mats.shape[2] // 2 if variant == "dotsonly" else num_coeffs
    if variant == "dotsonly":
        out_lanes = mats.shape[2]
    q_full, rem = divmod(FRAME_LENGTH, FRAME_SHIFT)
    q_rows = q_full + (1 if rem else 0)
    n_pieces = q_rows
    blocks = -(-NUM_FRAMES // block_frames)
    seg_rows = -(-(block_frames + q_rows) // 8) * 8
    need_rows = blocks * block_frames + (seg_rows - block_frames)
    need = need_rows * FRAME_SHIFT

    mats_in = params["pdk_mats"]
    if variant == "monodot":
        m_np = np.asarray(mats_in)
        mats_in = jnp.asarray(
            np.concatenate([m_np[j] for j in range(n_m)], axis=-1)
        )

    scratch_shapes = []
    if variant == "scratchconcat":
        widths = [FRAME_SHIFT] * q_full + ([rem] if rem else [])
        for _ in range(n_x):
            for w in widths:
                scratch_shapes.append(
                    pltpu.VMEM((block_frames, w), jnp.float32)
                )
    elif variant == "scratchwide":
        for _ in range(n_x):
            scratch_shapes.append(
                pltpu.VMEM((block_frames, FRAME_LENGTH), jnp.float32)
            )

    kernel = functools.partial(
        _kernel2,
        block_frames=block_frames,
        n_x=n_x,
        pairs=pairs,
        cos_scale=float(params["pdk_cos_scale"]),
        variant=variant,
        n_m_static=n_m,
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
                    (_Element(1), _Element(seg_rows), _Element(FRAME_SHIFT)),
                    lambda b, j: (b, j * block_frames, 0),
                    memory_space=pltpu.VMEM,
                ),
            ]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
            out_specs=pl.BlockSpec(
                (1, block_frames, out_lanes),
                lambda b, j: (b, j, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (BATCH, blocks * block_frames, out_lanes), jnp.float32
            ),
            scratch_shapes=scratch_shapes,
        )(
            rows,
            mats_in,
            params["pdk_mixed_scale"],
            params["pdk_mask"],
            params["pdk_w_hi"],
            params["pdk_w_lo"],
            params["pdk_w_nyq"],
        )
        return out[:, :NUM_FRAMES]

    return f


def diversity_probe():
    """39 split-K dots reading 12 distinct plane arrays + mats slices —
    the production dot pattern without the digitize dependency."""
    n_x, n_m = 4, 4
    pairs = [
        (i, j, _stft._PDK_BASE ** -(i + j + 2))
        for i, j in _stft.digit_pair_schedule(n_x, n_m, 4)
    ]
    widths = [(0, 160), (160, 160), (320, 80)]

    def kern(planes_ref, mats_ref, o_ref):
        acc = None
        for i, j, w in pairs:
            g = None
            for p, (lo, width) in enumerate(widths):
                x = planes_ref[i * 3 + p][:, :width]
                t = jnp.dot(
                    x,
                    mats_ref[j, lo : lo + width, :],
                    preferred_element_type=jnp.float32,
                )
                g = t if g is None else g + t
            term = g * jnp.float32(w)
            acc = term if acc is None else acc + term
        o_ref[...] = acc

    rng = np.random.RandomState(0)
    planes = jnp.asarray(
        np.round(rng.randn(12, 512, 160) * 50).astype(np.float32)
    )
    mats = jnp.asarray(
        np.round(rng.randn(4, 400, 512) * 50).astype(np.float32)
    )

    @jax.jit
    def f(planes, mats):
        return pl.pallas_call(
            kern,
            grid=(BATCH * 3,),
            in_specs=[
                pl.BlockSpec((12, 512, 160), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((4, 400, 512), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (512, 512), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((512, 512), jnp.float32),
        )(planes, mats)

    return f, planes, mats


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
    params = computer.params
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
            print(f"{name:32s} {ms:8.2f} ms   max_err={err:.3e}", flush=True)
        except Exception as e:
            print(
                f"{name:32s} FAILED: {type(e).__name__}: "
                f"{str(e).splitlines()[0][:160]}",
                flush=True,
            )

    # E1: digitize slope (cutoff 0 -> 1 pair, vary plane count)
    for nx in (1, 2, 3, 4):
        fn = jax.jit(
            functools.partial(
                _pk.stft_feats_pallas_double,
                params=params,
                num_frames=NUM_FRAMES,
                frame_length=FRAME_LENGTH,
                frame_shift=FRAME_SHIFT,
                dft_size=DFT,
                use_log=True,
                use_power=True,
                include_energy=True,
                log_floor=LOG_FLOOR,
                n_x=nx,
                cutoff=0,
            )
        )
        report(f"E1 n_x={nx} cutoff=0", fn, check=False)

    # E2: operand-diversity probe
    try:
        f, a, b = diversity_probe()
        out = f(a, b)
        _sync(out)
        ms = timeit(f, a, b)
        print(f"{'E2 diversity 39 dots':32s} {ms:8.2f} ms", flush=True)
    except Exception as e:
        print(f"E2 FAILED: {type(e).__name__}: {str(e).splitlines()[0][:160]}",
              flush=True)

    # E3: digitize + dots, full-width output, no tail
    report("E3 dotsonly", run_variant2(params, "dotsonly"), check=False)

    # baseline re-run with kernel2 (sanity)
    report("baseline2 (13 pairs)", run_variant2(params, "baseline"))

    # E4/E5: layout-normalized pieces
    report("E4 scratchconcat", run_variant2(params, "scratchconcat"))
    report("E4b scratchwide", run_variant2(params, "scratchwide"))

    # E6: bf16-stored planes
    report("E6 bf16planes", run_variant2(params, "bf16planes"))

    # E7: block_frames 256 baseline
    report("E7 baseline bf256",
           run_variant2(params, "baseline", block_frames=256))

    # E8: monodot fixed
    report("E8 monodot bf256",
           run_variant2(params, "monodot", block_frames=256))
    report("E8 monodot bf512",
           run_variant2(params, "monodot", block_frames=512))


if __name__ == "__main__":
    main()
