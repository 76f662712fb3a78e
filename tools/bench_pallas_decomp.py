"""Decompose the fused digit kernel's per-pair-dot overhead on real TPU.

Round-4 verdict: the exact/accurate fused Pallas kernel spends ~1.1 ms per
pair dot (incl. overheads) vs a ~0.2-0.4 ms MXU floor, and the composition
was never measured.  This harness times, on the headline 128 x 15 s fbank
batch (frame_length 400, shift 160, dft 512 -> 3 pieces of K 160/160/80,
13 pair dots for the exact tier):

A. cutoff sweep of the production kernel (pairs 1/3/6/10/13) -> the
   per-pair marginal cost and the fixed (digitize + tail + grid) cost;
B. stage ablations (skip digitization / skip dots / skip tail) of a local
   copy of the kernel -> which stage owns the fixed cost;
C. structural variants:
   - "pairconcat": ONE dot per pair over the lane-concatenated pieces
     (K=400) — 13 dots instead of 39; tests whether small-K piece dots
     (5 K-tiles vs the ideal 4, x3 dot count) are the overhead;
   - "jdots": digit planes sublane-STACKED into (4*block, K_piece); one
     dot per (M-plane j, piece) — 12 dots, M=4*block, computes all 16
     pairs (3 extra pairs' FLOPs but 39 -> 12 dot issues); per-(i,j)
     terms recovered by sublane block slices (exactness per dot is
     unchanged: each output element still accumulates K_piece integer
     products < 2^24);
   - "onedot": jdots + pieces lane-concatenated -> one dot per M-plane j
     (4 dots of (4*block, 400, 512));
   - "monodot": onedot + the 4 M-planes lane-stacked host-side
     -> ONE (4*block, 400, 2048) dot per grid step (needs block_frames
     256 for VMEM);
D. raw Mosaic dot-cost probes: N back-to-back (512, 400) @ (400, 512)
   bf16-on-f32 dots in a trivial kernel, N in {13, 39} -> Mosaic's
   intrinsic per-dot-issue cost with no digit machinery at all.

Every variant's output is checked against the XLA grouped digit path
(fft_mode="matmul", precision="double") on the same batch before timing.

Run detached on the TPU:
  PYTHONPATH=/root/repo:/root/.axon_site nohup python -u \
      tools/bench_pallas_decomp.py > /tmp/decomp.log 2>&1 &
"""

import argparse
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

try:
    from jax._src.pallas.core import Element as _Element
except ImportError:  # pragma: no cover
    _Element = None


BATCH, SECONDS, RATE = 128, 15, 16000
FRAME_LENGTH, FRAME_SHIFT, DFT = 400, 160, 512
NUM_FRAMES = (SECONDS * RATE + FRAME_SHIFT // 2) // FRAME_SHIFT


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
    return best * 1e3  # ms


def build_inputs():
    rng = np.random.RandomState(0)
    signals = rng.randn(BATCH, SECONDS * RATE).astype(np.float32)
    # same padding layout the computer's static-pad path uses: room for
    # the kernel's row segments (the kernel pads further in-jit if short)
    pad_to = (NUM_FRAMES + 4) * FRAME_SHIFT + FRAME_LENGTH
    padded = np.zeros((BATCH, pad_to), np.float32)
    padded[:, : signals.shape[1]] = signals
    return jnp.asarray(padded)


def reference_feats(computer, padded):
    """XLA grouped digit path on the same padded rows (oracle)."""
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
            log_floor=-23.025850929940457,
            fft_mode="matmul",
            precision="double",
        )

    return jax.jit(f)(padded)


# ---------------------------------------------------------------------------
# generalized kernel (local copy of _double_rows_kernel with variant knobs)
# ---------------------------------------------------------------------------


def _gen_kernel(
    rows_ref,
    mats_ref,
    mscale_ref,
    mask_ref,
    whi_ref,
    wlo_ref,
    wnyq_ref,
    out_ref,
    *,
    block_frames,
    frame_shift,
    frame_length,
    n_x,
    base,
    pairs,
    cos_scale,
    log_floor,
    variant,
):
    rows = rows_ref[0]
    q_full, rem = divmod(frame_length, frame_shift)
    pieces = [
        (
            jax.lax.slice(rows, (r, 0), (r + block_frames, frame_shift)),
            r,
            frame_shift,
        )
        for r in range(q_full)
    ]
    if rem:
        pieces.append(
            (
                jax.lax.slice(rows, (q_full, 0), (q_full + block_frames, rem)),
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
    if variant == "nodigitize":
        # fake planes: reuse the scaled piece for every plane (wrong
        # results, identical dot shapes/FLOPs)
        planes = [[piece * inv for _ in range(n_x)] for piece, _, _ in pieces]
    else:
        planes = []
        for piece, _, _ in pieces:
            v = piece * inv
            ps = []
            for _ in range(n_x):
                d = jnp.round(v * fbase)
                v = v * fbase - d
                ps.append(d)
            planes.append(ps)

    n_m = mats_ref.shape[0]
    if variant == "nodots":
        acc = jnp.zeros(
            (block_frames, mats_ref.shape[2]), jnp.float32
        ) + planes[0][0][:, :1]
    elif variant in ("baseline", "nodigitize", "notail"):
        acc = None
        for i, j, w in pairs:
            g = None
            for (piece, r, width), ps in zip(pieces, planes):
                lo = r * frame_shift
                t = jnp.dot(
                    ps[i],
                    mats_ref[j, lo : lo + width, :],
                    preferred_element_type=jnp.float32,
                )
                g = t if g is None else g + t
            term = g * jnp.float32(w)
            acc = term if acc is None else acc + term
    elif variant == "pairconcat":
        # one dot per pair over lane-concatenated pieces (K=frame_length)
        wide = [
            jnp.concatenate([planes[p][i] for p in range(len(pieces))], axis=-1)
            for i in range(n_x)
        ]
        acc = None
        for i, j, w in pairs:
            t = jnp.dot(
                wide[i],
                mats_ref[j],
                preferred_element_type=jnp.float32,
            )
            term = t * jnp.float32(w)
            acc = term if acc is None else acc + term
    elif variant == "jdots":
        # planes sublane-stacked: one dot per (j, piece), all n_x * n_m
        # pairs computed; per-pair terms via sublane block slices.
        stacked = [
            jnp.concatenate(ps, axis=0) for ps in planes
        ]  # per piece: (n_x*block, width)
        outs = []  # per j: (n_x*block, nb2)
        for j in range(n_m):
            g = None
            for (piece, r, width), st in zip(pieces, stacked):
                lo = r * frame_shift
                t = jnp.dot(
                    st,
                    mats_ref[j, lo : lo + width, :],
                    preferred_element_type=jnp.float32,
                )
                g = t if g is None else g + t
            outs.append(g)
        acc = None
        for s in range(n_x + n_m - 2, -1, -1):  # ascending weight order
            for i in range(n_x):
                j = s - i
                if 0 <= j < n_m:
                    blockslice = jax.lax.slice(
                        outs[j],
                        (i * block_frames, 0),
                        ((i + 1) * block_frames, outs[j].shape[1]),
                    )
                    term = blockslice * jnp.float32(base ** -(s + 2))
                    acc = term if acc is None else acc + term
    elif variant == "onedot":
        stacked = [jnp.concatenate(ps, axis=0) for ps in planes]
        wide = jnp.concatenate(stacked, axis=-1)  # (n_x*block, frame_length)
        outs = [
            jnp.dot(wide, mats_ref[j], preferred_element_type=jnp.float32)
            for j in range(n_m)
        ]
        acc = None
        for s in range(n_x + n_m - 2, -1, -1):
            for i in range(n_x):
                j = s - i
                if 0 <= j < n_m:
                    blockslice = jax.lax.slice(
                        outs[j],
                        (i * block_frames, 0),
                        ((i + 1) * block_frames, outs[j].shape[1]),
                    )
                    term = blockslice * jnp.float32(base ** -(s + 2))
                    acc = term if acc is None else acc + term
    elif variant == "monodot":
        # mats_ref is host-prestacked (frame_length, n_m*nb2)
        stacked = [jnp.concatenate(ps, axis=0) for ps in planes]
        wide = jnp.concatenate(stacked, axis=-1)
        big = jnp.dot(wide, mats_ref[:], preferred_element_type=jnp.float32)
        nb2 = big.shape[1] // n_m
        acc = None
        for s in range(n_x + n_m - 2, -1, -1):
            for i in range(n_x):
                j = s - i
                if 0 <= j < n_m:
                    blockslice = jax.lax.slice(
                        big,
                        (i * block_frames, j * nb2),
                        ((i + 1) * block_frames, (j + 1) * nb2),
                    )
                    term = blockslice * jnp.float32(base ** -(s + 2))
                    acc = term if acc is None else acc + term
    else:
        raise ValueError(variant)

    nb = mask_ref.shape[0]
    if variant == "notail":
        feats = acc[:, : out_ref.shape[2]] * scale
    else:
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
        feats = xlog(jnp.maximum(feats, log_floor))
        energy = energy / frame_length
        energy = xlog(jnp.maximum(energy, log_floor))
        feats = jnp.concatenate([energy, feats], axis=-1)
    out_ref[0] = feats


def run_variant(params, padded, variant, block_frames=512, cutoff=4):
    n_x = _stft._PDK_X_DIGITS
    mats = params["pdk_mats"]
    n_m = mats.shape[0]
    pairs = [
        (i, j, _stft._PDK_BASE ** -(i + j + 2))
        for i, j in _stft.digit_pair_schedule(n_x, n_m, cutoff)
    ]
    num_coeffs = params["pdk_w_hi"].shape[1] + 1
    q_full, rem = divmod(FRAME_LENGTH, FRAME_SHIFT)
    q_rows = q_full + (1 if rem else 0)
    blocks = -(-NUM_FRAMES // block_frames)
    seg_rows = -(-(block_frames + q_rows) // 8) * 8
    need_rows = blocks * block_frames + (seg_rows - block_frames)
    need = need_rows * FRAME_SHIFT

    mats_in = params["pdk_mats"]
    if variant == "monodot":
        # host-prestack the M planes lane-wise: (K, n_m * 2nb)
        m_np = np.asarray(mats_in)
        mats_in = jnp.asarray(
            np.concatenate([m_np[j] for j in range(n_m)], axis=-1)
        )

    kernel = functools.partial(
        _gen_kernel,
        block_frames=block_frames,
        frame_shift=FRAME_SHIFT,
        frame_length=FRAME_LENGTH,
        n_x=n_x,
        base=_stft._PDK_BASE,
        pairs=pairs,
        cos_scale=float(params["pdk_cos_scale"]),
        log_floor=-23.025850929940457,
        variant=variant,
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
                (1, block_frames, num_coeffs),
                lambda b, j: (b, j, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (BATCH, blocks * block_frames, num_coeffs), jnp.float32
            ),
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


# ---------------------------------------------------------------------------
# raw Mosaic dot-cost probe
# ---------------------------------------------------------------------------


def dot_probe(n_dots, block=512, k=400, n=512, split_k=None):
    """N back-to-back dots in one trivial kernel; split_k splits each dot
    into piece-shaped chunks (160/160/80 for k=400) like the baseline."""

    def kern(x_ref, m_ref, o_ref):
        x = x_ref[...]
        acc = None
        for d in range(n_dots):
            if split_k:
                t = None
                lo = 0
                for w in split_k:
                    part = jnp.dot(
                        jax.lax.slice(x, (0, lo), (block, lo + w)),
                        jax.lax.slice(m_ref[...], (lo, 0), (lo + w, n)),
                        preferred_element_type=jnp.float32,
                    )
                    t = part if t is None else t + part
                    lo += w
            else:
                t = jnp.dot(
                    x, m_ref[...], preferred_element_type=jnp.float32
                )
            acc = t if acc is None else acc + t * jnp.float32(2.0 ** -d)
        o_ref[...] = acc

    x = jnp.asarray(np.random.RandomState(0).randn(block, k), jnp.float32)
    m = jnp.asarray(np.random.RandomState(1).randn(k, n), jnp.float32)

    # grid sized to match the batch's total frame blocks: 128 signals x
    # ceil(1500/512) = 384 grid steps
    grid = BATCH * (-(-NUM_FRAMES // block) if block == 512 else 3)

    @jax.jit
    def f(x, m):
        return pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((block, k), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, n), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (block, n), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((block, n), jnp.float32),
        )(x, m)

    return f, x, m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-sweep", action="store_true")
    args = ap.parse_args()

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
    ref = reference_feats(computer, padded)
    ref_np = np.asarray(ref)
    print("oracle computed", ref_np.shape, flush=True)

    results = {}

    def report(name, fn, check=True):
        try:
            out = fn(padded)
            if check:
                err = float(np.max(np.abs(np.asarray(out) - ref_np)))
            else:
                _sync(out)
                err = float("nan")
            ms = timeit(fn, padded)
            results[name] = (ms, err)
            print(f"{name:28s} {ms:8.2f} ms   max_err={err:.3e}", flush=True)
        except Exception as e:  # Mosaic rejections etc.
            results[name] = (float("nan"), float("nan"))
            print(f"{name:28s} FAILED: {type(e).__name__}: {e}", flush=True)

    # A. production kernel cutoff sweep (per-pair slope)
    if not args.skip_sweep:
        for cutoff, npairs in [(0, 1), (1, 3), (2, 6), (3, 10), (4, 13)]:
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
                    log_floor=-23.025850929940457,
                    cutoff=cutoff,
                )
            )
            report(
                f"prod cutoff={cutoff} ({npairs}d)", fn, check=(cutoff == 4)
            )

    # B. ablations of the local kernel copy
    report("local baseline (13 pairs)", run_variant(params, padded, "baseline"))
    report("ablate: nodigitize", run_variant(params, padded, "nodigitize"),
           check=False)
    report("ablate: nodots", run_variant(params, padded, "nodots"),
           check=False)
    report("ablate: notail", run_variant(params, padded, "notail"),
           check=False)

    # C. structural variants
    report("pairconcat (13 wide dots)",
           run_variant(params, padded, "pairconcat"))
    report("jdots (12 stacked dots)", run_variant(params, padded, "jdots"))
    report("onedot (4 dots K=400)", run_variant(params, padded, "onedot"))
    report("monodot bf512", run_variant(params, padded, "monodot",
                                        block_frames=512))
    report("monodot bf256", run_variant(params, padded, "monodot",
                                        block_frames=256))
    report("jdots bf256", run_variant(params, padded, "jdots",
                                      block_frames=256))

    # D. raw dot probes
    for name, kw in [
        ("probe 13x(512,400,512)", dict(n_dots=13)),
        ("probe 39 split-K dots", dict(n_dots=13, split_k=[160, 160, 80])),
        ("probe 4x(2048,400,512)", dict(n_dots=4, block=2048)),
        ("probe 12 split (2048)", dict(n_dots=4, block=2048,
                                       split_k=[160, 160, 80])),
    ]:
        try:
            f, x, m = dot_probe(**kw)
            out = f(x, m)
            _sync(out)
            ms = timeit(f, x, m)
            print(f"{name:28s} {ms:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:28s} FAILED: {type(e).__name__}: {e}", flush=True)

    print("\nsummary:", flush=True)
    for k, (ms, err) in results.items():
        print(f"  {k:28s} {ms:8.2f} ms  err={err:.3e}")


if __name__ == "__main__":
    main()
