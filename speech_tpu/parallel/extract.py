"""Data-parallel feature extraction over a device mesh.

Replaces the reference's one-utterance-per-worker-process model
(reference: src/pydrobert/speech/command_line.py:585-604) with a single
SPMD program: signals are padded into ``(batch, max_len)`` buckets, the
batch axis is sharded over the mesh's data axis, and each chip runs the
fused framing->DFT->filter->log pipeline on its shard.  Forward extraction
needs no collectives at all; optional postprocessing statistics reduce with
``psum`` (see :mod:`speech_tpu.parallel.stats`).
"""

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..compute import STFTFrameComputer, _as_transfer_array, _compact_transfer
from ..ops import framing as _framing
from ..ops import stft as _stft
from .mesh import named_sharding

__all__ = ["ShardedExtractor", "sharded_pitch_feats"]


def _next_pow2(n: int) -> int:
    return 1 << max(0, (int(n) - 1)).bit_length()


def sharded_pitch_feats(
    signals,
    rate: float,
    lengths,
    mesh: Mesh,
    data_axis: str = "data",
    **kwargs,
):
    """Data-parallel :func:`speech_tpu.ops.pitch.pitch_feats` over a mesh.

    The batch axis shards over ``data_axis`` (utterances are independent
    — no collectives); each chip runs the NCCF + Viterbi tracker on its
    local shard.  ``signals`` is ``(batch, max_len)`` with ``batch`` a
    multiple of the axis size; ``lengths`` marks valid extents.  Returns
    ``(feats, valid_counts)`` like ``pitch_feats(..., return_valid=True)``.
    """
    from jax.sharding import PartitionSpec as P

    from ..ops.pitch import pitch_feats

    n = mesh.shape[data_axis]
    if signals.shape[0] % n:
        raise ValueError(
            f"batch ({signals.shape[0]}) must divide by the '{data_axis}' "
            f"axis size ({n})"
        )
    fn = jax.shard_map(
        lambda x, l: pitch_feats(
            x, rate, lengths=l, return_valid=True, **kwargs
        ),
        mesh=mesh,
        in_specs=(P(data_axis), P(data_axis)),
        out_specs=(P(data_axis), P(data_axis)),
    )
    return fn(signals, lengths)


class ShardedExtractor:
    """Batched, bucketed, mesh-sharded feature extraction.

    Parameters
    ----------
    computer
        A host :class:`~speech_tpu.compute.STFTFrameComputer`.
    mesh
        The device mesh.  ``None`` runs unsharded on the default device.
    data_axis
        Mesh axis name carrying the utterance batch.
    bucket
        Length-bucket granularity for :meth:`extract`'s padding:
        ``"pow2"`` (default) pads to the next power of two; ``"fine"``
        pads to the next of ``{2**k, 3 * 2**(k-1)}`` — worst-case pad
        waste drops from 2x to 4/3x (transfer bytes and device FLOPs
        both follow the padded length) at the cost of up to twice as
        many compiled programs over a corpus.
    postprocessors
        Optional host :mod:`speech_tpu.post` instances fused into the
        device program as their lengths-aware functional twins
        (:func:`speech_tpu.ops.postops.device_post_chain`): deltas,
        splice, stack, PCEN, sliding CMVN, DCT, PLP, global CMVN all
        run on-device per batch, with each row's edge handling at its
        own valid extent.  Time-axis (Kaldi) semantics — equivalent to
        applying each post-processor per utterance along time, not the
        reference CLI's ``axis=-1`` quirk.  Frame counts reflect any
        count-changing op (stack).
    """

    def __init__(
        self,
        computer: STFTFrameComputer,
        mesh: Optional[Mesh] = None,
        data_axis: str = "data",
        bucket: str = "pow2",
        postprocessors=(),
        aot_dir: Optional[str] = None,
    ):
        from ..ops.postops import device_post_chain

        if bucket not in ("pow2", "fine"):
            raise ValueError(f"bucket must be 'pow2' or 'fine', got {bucket!r}")
        self._computer = computer
        self._mesh = mesh
        self._data_axis = data_axis
        self._bucket = bucket
        self._post = (
            device_post_chain(postprocessors) if postprocessors else None
        )
        self._post_jit = None
        self._fns = {}
        from ..aot import as_cache

        self.aot = as_cache(aot_dir)  # path, AOTCache, or None
        if self.aot is not None:
            # the unsharded SI / fused-Pallas paths defer to the
            # computer's own compute_batch programs — share the store so
            # those cold-start-free too
            computer.enable_aot(self.aot)

    def bucket_len(self, n: int) -> int:
        """The padded signal length :meth:`extract` uses for length ``n``."""
        n = max(int(n), self._computer.frame_length)
        p = _next_pow2(n)
        if self._bucket == "fine" and 3 * (p // 4) >= n:
            return 3 * (p // 4)
        return p

    @property
    def batch_multiple(self) -> int:
        """Batch sizes must be a multiple of this (the data-axis size)."""
        if self._mesh is None:
            return 1
        return self._mesh.shape[self._data_axis]

    def _fn(self, batch: int, max_len: int, full: bool = False):
        key = (batch, max_len, full)
        fn = self._fns.get(key)
        if fn is not None:
            return fn
        c = self._computer
        if isinstance(c, STFTFrameComputer):
            params = c.params
            spec = c._static_spec
            frame_length, frame_shift, pad_left = (
                c._frame_length,
                c._frame_shift,
                c._pad_left,
            )
            max_frames = _framing.frame_count_np(
                max_len, frame_length, frame_shift
            )
            use_pallas = c._use_pallas()
            dtype = c._dtype
            pallas_min_len = 0
            if use_pallas:
                # pad to the fused kernels' rows layout in the same
                # concat, saving their internal whole-buffer pad copy
                # (see compute._batch_full_fn)
                from ..ops import pallas_stft as _pallas

                bf = (
                    _pallas._I8_BLOCK_FRAMES
                    if c._precision in ("double", "accurate")
                    else _pallas._BLOCK_FRAMES
                )
                pallas_min_len = _pallas.padded_need(
                    max_frames, frame_length, frame_shift, bf
                )

            def run(signals, lengths):
                signals = signals.astype(dtype)
                if full:
                    # host-known all-full bucket: fully static symmetric
                    # padding — pad_signal's small traced-offset ops lower
                    # to scatters/gathers under vmap (~2.5 ms on the v5e
                    # headline batch; see compute.compute_batch)
                    def pad_one(signal, length):
                        return _framing.pad_signal_full(
                            signal, frame_length, pad_left,
                            min_len=pallas_min_len,
                        )

                else:
                    def pad_one(signal, length):
                        return _framing.pad_signal(
                            signal, length, frame_length, frame_shift, pad_left
                        )

                if use_pallas:
                    padded = jax.vmap(pad_one)(signals, lengths)
                    feats = c._pallas_feats(padded, max_frames)
                else:
                    def one(signal, length):
                        frames = _framing.frame_padded(
                            pad_one(signal, length),
                            max_frames,
                            frame_length,
                            frame_shift,
                        )
                        return _stft.stft_feats_from_frames(
                            frames, params, **spec
                        )

                    feats = jax.vmap(one)(signals, lengths)
                if full:
                    counts = jnp.full((signals.shape[0],), max_frames, jnp.int32)
                else:
                    counts = _framing.frame_count(
                        lengths, frame_length, frame_shift
                    )
                if self._post is not None:
                    feats, counts = self._post(feats, counts)
                return feats, counts

            if use_pallas and self._mesh is not None:
                # pallas_call doesn't partition under pjit; run it
                # shard-locally — the pipeline is embarrassingly parallel
                # over the batch axis
                from jax.sharding import PartitionSpec as P

                run = jax.shard_map(
                    run,
                    mesh=self._mesh,
                    in_specs=(P(self._data_axis), P(self._data_axis)),
                    out_specs=(P(self._data_axis), P(self._data_axis)),
                    check_vma=False,  # pallas_call outputs carry no vma
                )

        else:  # SI computer: its own fused conv pipeline, same sharding
            from ..ops import si as _si

            shift = c._frame_shift
            T = c._kernel["max_support"]
            shift_eff = c._shift_eff
            max_frames = (max_len + shift // 2) // shift
            fft_size = _next_pow2(max_len + T)
            spec = c._spec(fft_size)
            params = c._params_for(spec)
            dtype = c._dtype

            def run(signals, lengths):
                feats = jax.vmap(
                    lambda s, l: _si.si_feats_from_signal(
                        s, l, max_frames, params, **spec
                    )
                )(signals.astype(dtype), lengths)
                # traced twin of SIFrameComputer.frame_counts_np
                target = (lengths + shift // 2) // shift
                after_pad = (target * shift + T - 1 - shift_eff) // shift - 1
                counts = jnp.maximum(0, jnp.minimum(target, after_pad))
                if self._post is not None:
                    feats, counts = self._post(feats, counts)
                return feats, counts

        if self._mesh is None:
            fn = jax.jit(run)
        else:
            dp = named_sharding(self._mesh, self._data_axis)
            fn = jax.jit(
                run,
                in_shardings=(
                    named_sharding(self._mesh, self._data_axis, None),
                    dp,
                ),
                out_shardings=(
                    named_sharding(self._mesh, self._data_axis, None, None),
                    dp,
                ),
            )
        if self.aot is not None:
            fn = self.aot.wrap(fn)
        self._fns[key] = fn
        return fn

    def extract_batch(self, signals, lengths) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Features for a device-ready padded batch.

        ``signals``: ``(batch, max_len)``; ``lengths``: ``(batch,)``.
        Returns ``(feats, frame_counts)`` with feats
        ``(batch, max_frames, num_coeffs)``; rows past a signal's count are
        garbage to be masked.
        """
        if self._mesh is None and (
            not isinstance(self._computer, STFTFrameComputer)
            or self._computer._use_pallas()
        ):
            # unsharded: defer to the computer's own batched path (the SI
            # pipeline / the fused Pallas tier); the post chain runs as
            # its own (jitted, async) program on the device outputs
            feats, counts = self._computer.compute_batch(signals, lengths)
            if self._post is not None:
                if self._post_jit is None:
                    fn = jax.jit(self._post)
                    # the post-chain program must ride the AOT store too,
                    # or this (SI / fused-Pallas) serving path pays a cold
                    # compile despite a warmed store
                    self._post_jit = (
                        self.aot.wrap(fn) if self.aot is not None else fn
                    )
                feats, counts = self._post_jit(feats, counts)
            return feats, counts
        signals = _as_transfer_array(signals, self._computer._dtype)
        batch, max_len = signals.shape
        # host-known all-full lengths select the static-padding fast path
        # (mesh twin of compute_batch's; full buckets are the production
        # common case and must not pay the traced-offset scatter cost)
        full = (
            isinstance(self._computer, STFTFrameComputer)
            and not isinstance(lengths, jax.Array)
            and max_len >= self._computer._frame_length
            and (np.asarray(lengths) == max_len).all()
        )
        lengths = jnp.asarray(lengths, dtype=jnp.int32)
        if batch % self.batch_multiple:
            raise ValueError(
                f"batch ({batch}) must be a multiple of {self.batch_multiple}"
            )
        return self._fn(batch, max_len, full)(signals, lengths)

    def extract_iter(self, batches, min_batch: int = 0, timer=None):
        """Double-buffered extraction over an iterable of signal lists.

        Dispatches batch ``i+1``'s (asynchronous) device computation before
        materializing batch ``i``'s results, so host IO/padding overlaps
        device compute.  Yields one ``[(num_frames_j, num_coeffs)]`` list
        per input batch.  ``min_batch`` pads the batch dimension so a
        trailing partial batch reuses the full batches' compiled program.
        ``timer`` (anything with a ``stage(name)`` context manager, e.g.
        :class:`speech_tpu.profiling.StageTimer`) attributes host
        padding + async enqueue to ``"dispatch"`` and the device wait +
        readback to ``"collect"``.
        """
        import contextlib

        stage = (
            timer.stage if timer is not None
            else (lambda name: contextlib.nullcontext())
        )
        pending = None  # (feats, counts, n)
        for signals in batches:
            with stage("dispatch"):
                nxt = self._dispatch(signals, min_batch)
            if pending is not None:
                with stage("collect"):
                    out = self._collect(*pending)
                yield out
            pending = nxt
        if pending is not None:
            with stage("collect"):
                out = self._collect(*pending)
            yield out

    def _dispatch(self, signals: Sequence[np.ndarray], min_batch: int = 0):
        """Start a batch asynchronously; ``min_batch`` pads the batch
        dimension up (serving uses it to keep ONE compiled program per
        length bucket instead of one per coalesced batch size — device
        compiles are minutes on tunneled runtimes)."""
        n = len(signals)
        if n == 0:
            return None, None, 0
        lengths = np.array([len(s) for s in signals], dtype=np.int32)
        c = self._computer
        max_len = self.bucket_len(int(lengths.max()))
        batch = -(-max(n, min_batch) // self.batch_multiple) * self.batch_multiple
        # all-compact-integer inputs (int16 PCM) ship to the device as-is
        # and upcast in-program — half the tunnel/PCIe ingress of float32
        if all(_compact_transfer(np.asarray(s).dtype) for s in signals):
            buf_dtype = np.int16
        else:
            buf_dtype = np.dtype(c._dtype.name)
        buf = np.zeros((batch, max_len), dtype=buf_dtype)
        for i, s in enumerate(signals):
            buf[i, : len(s)] = s
        pad_lengths = np.ones(batch, dtype=np.int32) * c.frame_length
        pad_lengths[:n] = lengths
        feats, counts = self.extract_batch(buf, pad_lengths)
        return feats, counts, n

    @staticmethod
    def _collect(feats, counts, n):
        if n == 0:
            return []
        feats = np.asarray(feats)
        counts = np.asarray(counts)
        return [feats[i, : counts[i]] for i in range(n)]

    def extract(self, signals: Sequence[np.ndarray], min_batch: int = 0):
        """Features for a list of host 1-D signals of any lengths.

        Pads to a length bucket (``bucket_len``; bounds recompilation), rounds the
        batch up to the mesh multiple (and at least ``min_batch``), and
        returns a list of ``(num_frames_i, num_coeffs)`` arrays.
        """
        return self._collect(*self._dispatch(signals, min_batch))
