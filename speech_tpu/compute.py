"""Frame computers: signals -> feature matrices.

The STFT computer collapses the reference's per-frame/per-filter Python loops
(reference: src/pydrobert/speech/compute.py:388-607) into a single jitted
array program: gather-framing -> windowed rDFT (as MXU matmuls or XLA FFT) ->
|.|^p -> one matmul against folded filter weights -> log.  All filter math is
precomputed on the host at construction (see :mod:`speech_tpu.ops.stft`).

Streaming (`compute_chunk`/`finalize`) keeps the reference's exact frame
boundary and symmetric-padding semantics: a signal chunked arbitrarily
assembles the identical virtual sample stream as `compute_full`.  In
``float64`` the two paths agree to machine noise; in ``float32`` (the TPU
production dtype) they agree to ~2e-5 absolute on log features (the
gather-framing and frame-batch programs are separately compiled, so f32
reduction orders differ), and to ~1e-6 under ``precision='double'`` —
exact matmuls are reduction-order invariant.
"""

import abc

from typing import Mapping, Optional, Union

import numpy as np

import jax
import jax.numpy as jnp

from . import config
from .alias import AliasedFactory, alias_factory_subclass_from_arg
from .filters import GammaWindow, HannWindow, LinearFilterBank, WindowFunction
from .ops import framing as _framing
from .ops import si as _si
from .ops import stft as _stft

__all__ = [
    "frame_by_frame_calculation",
    "FrameComputer",
    "LinearFilterBankFrameComputer",
    "ShortIntegrationFrameComputer",
    "ShortTimeFourierTransformFrameComputer",
    "SIFrameComputer",
    "STFTFrameComputer",
]


def _next_pow2(n: int) -> int:
    return 1 << max(0, (int(n) - 1)).bit_length()


def _compact_transfer(dtype) -> bool:
    """Whether an input dtype should cross host->device as-is.

    Small-integer PCM (int16/int8/uint8) transfers at half (or quarter)
    the float32 width and upcasts exactly inside the jitted program — on
    tunneled/bandwidth-bound runtimes the ingress copy is the dominant
    cost of the batch path, so this halves it for the common
    integer-audio case.  Everything else is cast to the compute dtype on
    host (float64 would otherwise transfer at double width).
    """
    dt = np.dtype(dtype)
    return (dt.kind == "i" and dt.itemsize <= 2) or (
        dt.kind == "u" and dt.itemsize == 1
    )


def _as_transfer_array(signals, dtype):
    """Device-ready signals: host-cast to ``dtype``, except compact
    integer arrays, which ship as-is (the batch programs upcast them as
    their first traced op — exact, and fused for free by XLA)."""
    if not isinstance(signals, jax.Array):
        signals = np.asarray(signals)
    if _compact_transfer(signals.dtype):
        return jnp.asarray(signals)
    return jnp.asarray(signals, dtype=dtype)


class FrameComputer(AliasedFactory):
    """Construct features from a signal in fixed-length frames.

    A signal is treated as a (possibly overlapping) time series of frames,
    each transformed into a fixed-length coefficient vector.  Features can be
    computed chunk-by-chunk in a stream (`compute_chunk` then `finalize`) or
    all at once (`compute_full`); the two agree for any chunking.

    Frame ``k`` is roughly located at ``signal[k * frame_shift]``; the exact
    region of influence is dictated by `frame_style`
    (reference: compute.py:48-178).
    """

    _aot = None  # optional AOT executable store (see enable_aot)

    def enable_aot(self, store) -> None:
        """Back this computer's jitted batch programs with an AOT store.

        ``store`` is a directory path or a :class:`speech_tpu.aot.AOTCache`.
        Programs a previous process compiled deserialize instead of
        recompiling — the cold-start answer for the SI / fused-Pallas
        ``compute_batch`` paths that don't route through
        :class:`~speech_tpu.parallel.ShardedExtractor`'s own programs.
        Any programs this computer already jitted *before* the call are
        dropped so they re-enter through the store — otherwise a bucket
        exercised pre-wiring would silently never be serialized.
        """
        from .aot import as_cache

        self._aot = as_cache(store)
        for attr in ("_full_fns", "_frames_fns", "_fns"):
            cached = getattr(self, attr, None)
            if cached:
                cached.clear()

    def _jit(self, run):
        fn = jax.jit(run)
        return self._aot.wrap(fn) if self._aot is not None else fn

    @property
    @abc.abstractmethod
    def frame_style(self) -> str:
        """'causal' or 'centered'.

        Causal: frame ``k`` covers ``signal[k*shift : k*shift+length]``.
        Centered: frame ``k`` covers
        ``signal[k*shift - (length+1)//2 + 1 : k*shift + length//2 + 1]``
        (reference: compute.py:76-84); out-of-range samples are generated in
        an implementation-specific way (symmetric reflection here).
        """
        ...

    @property
    @abc.abstractmethod
    def sampling_rate(self) -> float:
        """Samples per second of the target recording."""
        ...

    @property
    @abc.abstractmethod
    def frame_length(self) -> int:
        """Number of samples dictating a feature vector."""
        ...

    @property
    def frame_length_ms(self) -> float:
        """Milliseconds of audio dictating a feature vector."""
        return self.frame_length * 1000 / self.sampling_rate

    @property
    @abc.abstractmethod
    def frame_shift(self) -> int:
        """Samples absorbed between successive frame computations."""
        ...

    @property
    def frame_shift_ms(self) -> float:
        """Milliseconds between successive frame computations."""
        return self.frame_shift * 1000 / self.sampling_rate

    @property
    @abc.abstractmethod
    def num_coeffs(self) -> int:
        """Number of coefficients per frame."""
        ...

    @property
    @abc.abstractmethod
    def started(self) -> bool:
        """Whether a stream is in progress (chunk seen, not finalized)."""
        ...

    @abc.abstractmethod
    def compute_chunk(self, chunk: np.ndarray) -> np.ndarray:
        """Compute some feature frames given the next chunk of audio.

        Returns a ``(num_frames, num_coeffs)`` array (num_frames may be 0).
        """
        ...

    @abc.abstractmethod
    def finalize(self) -> np.ndarray:
        """Conclude a stream, flushing any buffered samples into frames."""
        ...

    def compute_full(self, signal: np.ndarray) -> np.ndarray:
        """Compute an entire signal's feature matrix at once."""
        return frame_by_frame_calculation(self, signal)


class LinearFilterBankFrameComputer(FrameComputer):
    """Frame computers whose features derive from a linear filter bank.

    ``num_coeffs == bank.num_filts + int(include_energy)``; the energy
    coefficient, if present, sits at index 0 (reference: compute.py:181-218).

    Parameters
    ----------
    bank
        A :class:`LinearFilterBank`, alias string, or config mapping.
    include_energy
        Whether to prepend a frame-energy coefficient.
    """

    def __init__(
        self,
        bank: Union[LinearFilterBank, Mapping, str],
        include_energy: bool = False,
    ):
        self._bank = alias_factory_subclass_from_arg(LinearFilterBank, bank)
        self._include_energy = bool(include_energy)

    @property
    def bank(self) -> LinearFilterBank:
        """The filter bank features derive from."""
        return self._bank

    @property
    def includes_energy(self) -> bool:
        """Whether the first coefficient is a frame-energy coefficient."""
        return self._include_energy

    @property
    def num_coeffs(self) -> int:
        return self._bank.num_filts + int(self._include_energy)


class ShortTimeFourierTransformFrameComputer(LinearFilterBankFrameComputer):
    """Features by integrating filtered short-time Fourier transforms.

    Per frame: window -> DFT -> per-filter multiply -> sum of pointwise
    power or magnitude -> optional log.  Matches the reference computer
    (reference: compute.py:229-607), including its documented departures
    from Kaldi/HTK: the sum happens after filtering, runs over the full
    spectrum (doubling values for real banks), and frame boundaries differ.

    Parameters
    ----------
    bank
        A :class:`LinearFilterBank`, alias string, or config mapping.
    frame_length_ms
        Frame length in ms; defaults to the largest filter support.
    frame_shift_ms
        Offset between successive frames in ms.
    frame_style
        'causal' or 'centered'; defaults to 'centered' for zero-phase banks.
    include_energy
        Prepend a frame-energy coefficient.
    pad_to_nearest_power_of_two
        Pad the DFT size to a power of two.
    window_function
        Analysis window; defaults to :class:`GammaWindow` (causal) or
        :class:`HannWindow` (centered).
    use_log
        Take the log of each sum.
    use_power
        Sum the power spectrum rather than the magnitude spectrum.
    kaldi_shift
        Use Kaldi's frame centering (reference: compute.py:280-285).
    dtype
        Device compute dtype ('float32' default; 'float64' needs jax x64).
    fft_mode
        'fft', 'matmul', 'pallas', or None to follow
        ``speech_tpu.config.FFT_MODE``.
    precision
        Matmul precision tier:

        - 'highest' (default): full f32.  Max abs log-feature error vs
          float64, measured v5e: ~8e-7 on noise-like signals, up to
          ~1e-4 at the few highest-cancellation DFT bins of long real
          speech (the f32 MXU accumulator's rounding floor).
        - 'double': exact digit-decomposition matmuls
          (:mod:`speech_tpu.ops.stft`) — ~7e-7 max on any signal; on
          real TPUs it runs as one fused int8 Pallas kernel (base-128
          margin digits, power-of-two pair weights, exact int32
          accumulation) at ~183,000x real time (~1.55x the 'highest'
          cost); float32 dtype only.
        - 'accurate': the reduced-pair schedule of the same int8
          kernel (15 pairs / 5 grouped dots vs 19/6) — measured
          <=7e-7 on speech and 1.45e-6 on the pinned tonal adversary
          (truncation class 2^-35 vs 'double's 2^-42), ~196,000x real
          time; where the kernel gate fails both tiers fall back to
          the exact XLA digit path; float32 dtype only.
        - 'default': single-pass bf16 MXU — ~25% faster than 'highest'
          but a clearly reduced-precision tier at ~1.5e-2 max abs error.
        - 'high': three-pass bf16 (bf16x3) MXU.  Accepted for
          :class:`jax.lax.Precision` completeness but NOT an accuracy
          tier on TPU: measured ~1e-2 max abs log-feature error on real
          speech (the feature log amplifies the passes' residual
          cancellation error), i.e. no better than 'default' here while
          costing three passes.  Prefer 'highest' (same cost class,
          ~1e-4 worst case) or the digit tiers.
    """

    aliases = {"stft"}

    def __init__(
        self,
        bank: Union[LinearFilterBank, Mapping, str],
        frame_length_ms: Optional[float] = None,
        frame_shift_ms: Optional[float] = 10,
        frame_style: Optional[str] = None,
        include_energy: bool = False,
        pad_to_nearest_power_of_two: bool = True,
        window_function: Optional[Union[WindowFunction, Mapping, str]] = None,
        use_log: bool = True,
        use_power: bool = False,
        kaldi_shift: bool = False,
        dtype: str = "float32",
        fft_mode: Optional[str] = None,
        precision: str = "highest",
    ):
        if precision not in ("highest", "high", "default", "double", "accurate"):
            raise ValueError(f"Invalid precision: {precision!r}")
        self._precision = precision
        bank = alias_factory_subclass_from_arg(LinearFilterBank, bank)
        self._rate = bank.sampling_rate
        self._frame_shift = int(0.001 * frame_shift_ms * self._rate)
        self._log = use_log
        self._power = use_power
        self._real = bank.is_real
        self._kaldi_shift = kaldi_shift
        self._dtype = jnp.dtype(dtype)
        if precision in ("double", "accurate") and self._dtype != jnp.float32:
            raise ValueError(
                f"precision='{precision}' is a float32 digit-matmul tier; "
                "use dtype='float64' with the default precision instead"
            )
        self._fft_mode = fft_mode
        if frame_style is None:
            frame_style = "centered" if bank.is_zero_phase else "causal"
        elif frame_style not in ("centered", "causal"):
            raise ValueError('Invalid frame style: "{}"'.format(frame_style))
        self._frame_style = frame_style
        if frame_length_ms is None:
            self._frame_length = max(
                max(right - left for left, right in bank.supports),
                # ensure at least one DFT bin is nonzero per filter
                int(
                    np.ceil(
                        2
                        * self._rate
                        / min(right - left for left, right in bank.supports_hz)
                    )
                ),
            )
        else:
            self._frame_length = int(0.001 * frame_length_ms * bank.sampling_rate)
        if window_function is None:
            window_function = (
                GammaWindow() if frame_style == "causal" else HannWindow()
            )
        else:
            window_function = alias_factory_subclass_from_arg(
                WindowFunction, window_function
            )
        self._window = window_function.get_impulse_response(self._frame_length)
        if pad_to_nearest_power_of_two:
            self._dft_size = int(2 ** np.ceil(np.log2(self._frame_length)))
        else:
            self._dft_size = self._frame_length
        # fold every truncated filter response (incl. conjugate wrap and the
        # x2-for-real-banks factor) into one dense half-spectrum weight matrix
        self._weights = _stft.fold_bank_to_weights(bank, self._dft_size, use_power)
        self._dft_cos, self._dft_sin = _stft.windowed_dft_matrices(
            self._window, self._dft_size
        )
        self._pad_left = _framing.left_pad_width(
            frame_style, self._frame_length, self._frame_shift, kaldi_shift
        )
        # first centered frame consumes fewer fresh samples; its left side is
        # reflected (reference: compute.py:469-517)
        if frame_style == "centered":
            if kaldi_shift:
                self._first_frame_len = (
                    self._frame_length + 1
                ) // 2 + self._frame_shift // 2
            else:
                self._first_frame_len = self._frame_length // 2 + 1
        else:
            self._first_frame_len = self._frame_length
        # streaming state
        self._tail = np.zeros(0, dtype=np.float64)
        self._skip = 0
        self._first_frame = True
        self._started = False
        self._chunk_dtype = np.float64
        # jit caches
        self._device_params = None
        self._full_fns = {}
        self._frames_fns = {}
        super().__init__(bank, include_energy=include_energy)

    # ------------------------------------------------------------------
    # properties
    # ------------------------------------------------------------------

    @property
    def frame_style(self) -> str:
        return self._frame_style

    @property
    def sampling_rate(self) -> float:
        return self._rate

    @property
    def frame_length(self) -> int:
        return self._frame_length

    @property
    def frame_shift(self) -> int:
        return self._frame_shift

    @property
    def started(self) -> bool:
        return self._started

    @property
    def kaldi_shift(self) -> bool:
        return self._kaldi_shift

    @property
    def dft_size(self) -> int:
        return self._dft_size

    # ------------------------------------------------------------------
    # device plumbing
    # ------------------------------------------------------------------

    @property
    def params(self):
        """Device arrays consumed by the jitted pipeline (a pytree).

        Safe to touch inside a jit trace: construction runs under
        ``ensure_compile_time_eval`` so the cache holds concrete arrays,
        never tracers (a first access inside someone else's jit used to
        poison the cache and leak tracers into later programs).
        """
        if self._device_params is None:
            with jax.ensure_compile_time_eval():
                self._build_device_params()
        return self._device_params

    def _build_device_params(self):
        self._device_params = {
            "window": jnp.asarray(self._window, dtype=self._dtype),
            "weights": jnp.asarray(self._weights, dtype=self._dtype),
            "dft_cos": jnp.asarray(self._dft_cos, dtype=self._dtype),
            "dft_sin": jnp.asarray(self._dft_sin, dtype=self._dtype),
        }
        if self._precision in ("double", "accurate"):
            # grouped digit-pair matrices for the exact-matmul tier
            # (ops/stft.py digit_group_matrices) — also the XLA
            # fallback for 'accurate' where the kernel gate fails
            mats, gw, cs, ss, _ = _stft.digit_group_matrices(
                self._dft_cos, self._dft_sin
            )
            self._device_params["dft_group_mats"] = jnp.asarray(
                mats, dtype=jnp.bfloat16  # integer digits: exact
            )
            self._device_params["dft_group_weights"] = jnp.asarray(gw)
            self._device_params["dft_cos_scale"] = jnp.float32(cs)
            self._device_params["dft_sin_scale"] = jnp.float32(ss)
            if self._dft_size % 4 == 0:
                # layout for the fused Pallas digit kernels: the
                # combined matrix needs the sin DC slot free and both
                # lane blocks equal (half odd <=> dft % 4 == 0).
                # Non-128-aligned nb lane splits compile and match
                # the XLA digit path on real v5e hardware (dft 384:
                # 2.5e-7) — the gate was dft % 256 until that was
                # validated
                pdk = _stft.digit_kernel_matrices(
                    self._dft_cos,
                    self._dft_sin,
                    self._weights,
                    ndig=(
                        _stft._PAK_M_DIGITS
                        if self._precision == "accurate"
                        else _stft._PDK_M_DIGITS
                    ),
                )
                self._device_params["pdk_cos_scale"] = pdk.pop(
                    "cos_scale"
                )  # host scalar: baked statically into the kernel
                for name, arr in pdk.items():
                    self._device_params["pdk_" + name] = jnp.asarray(arr)
                # int8 grouped layout (the round-5 kernel; see
                # ops/stft.py _I8_* and ops/pallas_stft.py): the pair
                # schedule bakes the tier's cutoff in
                i8 = _stft.int8_kernel_matrices(
                    self._dft_cos,
                    self._dft_sin,
                    self._weights,
                    cutoff=(
                        _stft._I8_ACC_CUTOFF
                        if self._precision == "accurate"
                        else _stft._I8_CUTOFF
                    ),
                )
                self._device_params["i8k_cos_scale"] = i8.pop("cos_scale")
                self._device_params["i8k_offsets"] = i8.pop("offsets")
                for name, arr in i8.items():
                    self._device_params["i8k_" + name] = jnp.asarray(arr)
            self._device_params["weights_lo"] = jnp.asarray(
                (
                    self._weights
                    - self._weights.astype(np.float32).astype(np.float64)
                ).astype(np.float32)
            )

    @property
    def _static_spec(self) -> dict:
        return dict(
            dft_size=self._dft_size,
            use_log=self._log,
            use_power=self._power,
            include_energy=self._include_energy,
            log_floor=config.LOG_FLOOR_VALUE,
            fft_mode=self._fft_mode,
            precision=self._precision,
        )

    def _use_pallas(self) -> bool:
        mode = self._fft_mode or config.FFT_MODE
        if self._precision in ("double", "accurate"):
            # the fused digit kernels need the cos|sin combined layout
            # (half odd <=> dft % 4 == 0; hardware-validated including
            # non-128-aligned lane splits); other sizes stay on the XLA
            # digit path.  Unlike the reduced-precision pallas tier they
            # meet their accuracy contracts either way, so "auto"
            # selects them on real TPUs (34 -> 10.5 ms on the v5e
            # headline batch for the exact tier via the int8 kernel).
            if self._dft_size % 4:
                return False
            if mode == "pallas":
                return True
            return mode == "auto" and jax.default_backend() == "tpu"
        return mode == "pallas"

    def _pallas_feats(self, padded, max_frames: int):
        from .ops import pallas_stft as _pallas

        if self._precision in ("double", "accurate"):
            # the int8 grouped kernel (round 5) carries both tiers; its
            # pair schedule (cutoff 4 = 'double' class, 3 = 'accurate')
            # was baked into the i8k_* params at build time
            return _pallas.stft_feats_pallas_int8(
                padded,
                self.params,
                num_frames=max_frames,
                frame_length=self._frame_length,
                frame_shift=self._frame_shift,
                dft_size=self._dft_size,
                use_log=self._log,
                use_power=self._power,
                include_energy=self._include_energy,
                log_floor=config.LOG_FLOOR_VALUE,
                interpret=jax.default_backend() != "tpu",
            )
        return _pallas.stft_feats_pallas(
            padded,
            self.params,
            num_frames=max_frames,
            frame_length=self._frame_length,
            frame_shift=self._frame_shift,
            use_log=self._log,
            use_power=self._power,
            include_energy=self._include_energy,
            log_floor=config.LOG_FLOOR_VALUE,
            interpret=jax.default_backend() != "tpu",
            precision=self._precision,
        )

    def _full_fn(self, bucket_len: int, max_frames: int):
        key = (bucket_len, max_frames)
        fn = self._full_fns.get(key)
        if fn is None:
            params = self.params
            spec = self._static_spec
            frame_length = self._frame_length
            frame_shift = self._frame_shift
            pad_left = self._pad_left
            use_pallas = self._use_pallas()

            def run(buf, sig_len):
                padded = _framing.pad_signal(
                    buf, sig_len, frame_length, frame_shift, pad_left
                )
                if use_pallas:
                    return self._pallas_feats(padded[None], max_frames)[0]
                frames = _framing.frame_padded(
                    padded, max_frames, frame_length, frame_shift
                )
                return _stft.stft_feats_from_frames(frames, params, **spec)

            fn = self._jit(run)
            self._full_fns[key] = fn
        return fn

    def _frames_fn(self, bucket_rows: int):
        fn = self._frames_fns.get(bucket_rows)
        if fn is None:
            params = self.params
            spec = self._static_spec

            def run(frames):
                return _stft.stft_feats_from_frames(frames, params, **spec)

            fn = self._jit(run)
            self._frames_fns[bucket_rows] = fn
        return fn

    def _feats_for_frames(self, frames: np.ndarray) -> np.ndarray:
        """Run host-assembled frames through the jitted pipeline."""
        n = frames.shape[0]
        if n == 0:
            return np.empty((0, self.num_coeffs), dtype=self._chunk_dtype)
        bucket = _next_pow2(n)
        buf = np.zeros((bucket, self._frame_length), dtype=self._dtype)
        buf[:n] = frames
        feats = self._frames_fn(bucket)(jnp.asarray(buf))
        return np.asarray(feats[:n], dtype=self._chunk_dtype)

    # ------------------------------------------------------------------
    # batch API
    # ------------------------------------------------------------------

    def compute_full(self, signal: np.ndarray) -> np.ndarray:
        """Compute a full signal's feature matrix in one jitted call.

        Same output as the reference batch path (reference:
        compute.py:574-607): ``(len + shift//2) // shift`` frames, symmetric
        padding on both edges.
        """
        if self.started:
            raise ValueError("Already started computing frames")
        signal = np.asarray(signal)
        ret_dtype = signal.dtype
        sig_len = signal.shape[0]
        num_frames = _framing.frame_count_np(
            sig_len, self._frame_length, self._frame_shift
        )
        if num_frames == 0:
            return np.empty((0, self.num_coeffs), dtype=ret_dtype)
        bucket_len = _next_pow2(max(sig_len, self._frame_length))
        max_frames = _framing.frame_count_np(
            bucket_len, self._frame_length, self._frame_shift
        )
        buf = np.zeros(bucket_len, dtype=self._dtype)
        buf[:sig_len] = signal
        feats = self._full_fn(bucket_len, max_frames)(jnp.asarray(buf), sig_len)
        return np.asarray(feats[:num_frames], dtype=ret_dtype)

    def compute_batch(self, signals, lengths):
        """Batched computation over padded signals (the production hot path).

        Parameters
        ----------
        signals
            ``(batch, max_len)`` float array (padding values are ignored).
        lengths
            ``(batch,)`` int array of true lengths.

        Returns
        -------
        feats, frame_counts
            ``(batch, max_frames, num_coeffs)`` features and ``(batch,)``
            valid frame counts; rows at or beyond a signal's count are
            garbage and must be masked by the caller.
        """
        signals = _as_transfer_array(signals, self._dtype)
        max_len = signals.shape[-1]
        max_frames = _framing.frame_count_np(
            max_len, self._frame_length, self._frame_shift
        )
        # host-known all-full lengths (the bucketed production case): the
        # symmetric padding is fully static, skipping pad_signal's
        # traced-offset ops (~2.5 ms on the v5e headline batch)
        if (
            not isinstance(lengths, jax.Array)
            and max_len >= self._frame_length
            and (np.asarray(lengths) == max_len).all()
        ):
            feats = self._batch_full_fn(max_len, max_frames)(signals)
            counts = jnp.full((signals.shape[0],), max_frames, jnp.int32)
            return feats, counts
        fn = self._batch_fn(max_len, max_frames)
        return fn(signals, jnp.asarray(lengths))

    def _batch_full_fn(self, max_len: int, max_frames: int):
        key = ("batchfull", max_len, max_frames)
        fn = self._full_fns.get(key)
        if fn is None:
            params = self.params
            spec = self._static_spec
            frame_length = self._frame_length
            frame_shift = self._frame_shift
            pad_left = self._pad_left
            use_pallas = self._use_pallas()
            dtype = self._dtype
            pallas_min_len = 0
            if use_pallas:
                # pad to the kernel's rows layout here, in pad_signal_
                # full's single concat — the kernel's own pad then
                # no-ops (saves one whole-buffer copy per batch)
                from .ops import pallas_stft as _pallas

                bf = (
                    _pallas._I8_BLOCK_FRAMES
                    if self._precision in ("double", "accurate")
                    else _pallas._BLOCK_FRAMES
                )
                pallas_min_len = _pallas.padded_need(
                    max_frames, frame_length, frame_shift, bf
                )

            def one(signal):
                padded = _framing.pad_signal_full(
                    signal, frame_length, pad_left,
                    min_len=pallas_min_len,
                )
                if use_pallas:
                    return padded
                frames = _framing.frame_padded(
                    padded, max_frames, frame_length, frame_shift
                )
                return _stft.stft_feats_from_frames(frames, params, **spec)

            def run(signals):
                feats = jax.vmap(one)(signals.astype(dtype))
                if use_pallas:
                    feats = self._pallas_feats(feats, max_frames)
                return feats

            fn = self._jit(run)
            self._full_fns[key] = fn
        return fn

    def _batch_fn(self, max_len: int, max_frames: int):
        key = ("batch", max_len, max_frames)
        fn = self._full_fns.get(key)
        if fn is None:
            params = self.params
            spec = self._static_spec
            frame_length = self._frame_length
            frame_shift = self._frame_shift
            pad_left = self._pad_left

            use_pallas = self._use_pallas()
            dtype = self._dtype

            def one(signal, length):
                padded = _framing.pad_signal(
                    signal, length, frame_length, frame_shift, pad_left
                )
                if use_pallas:
                    return padded
                frames = _framing.frame_padded(
                    padded, max_frames, frame_length, frame_shift
                )
                return _stft.stft_feats_from_frames(frames, params, **spec)

            def run(signals, lengths):
                feats = jax.vmap(one)(signals.astype(dtype), lengths)
                if use_pallas:
                    feats = self._pallas_feats(feats, max_frames)
                counts = _framing.frame_count(
                    lengths, frame_length, frame_shift
                )
                return feats, counts

            fn = self._jit(run)
            self._full_fns[key] = fn
        return fn

    # ------------------------------------------------------------------
    # streaming API
    # ------------------------------------------------------------------
    #
    # Equivalent formulation of the reference's ring-buffer streaming
    # (reference: compute.py:462-572): once the first centered frame's
    # samples are available, its reflected left side is *prepended to the
    # stream*, after which streaming is a plain causal sliding window over
    # the virtual stream [reflection | signal].  State is the stream's
    # unconsumed tail (or a count of future samples to skip when
    # frame_shift > frame_length).

    def compute_chunk(self, chunk: np.ndarray) -> np.ndarray:
        chunk = np.asarray(chunk)
        self._chunk_dtype = chunk.dtype
        self._started = True
        chunk = chunk.astype(np.float64, copy=False)
        frame_length = self._frame_length
        frame_shift = self._frame_shift
        if self._first_frame and self._frame_style == "centered":
            stream = np.concatenate([self._tail, chunk])
            if len(stream) < self._first_frame_len:
                self._tail = stream
                return np.empty((0, self.num_coeffs), dtype=self._chunk_dtype)
            head = stream[: self._first_frame_len]
            prefix = np.pad(head, (self._pad_left, 0), "symmetric")
            stream = np.concatenate([prefix, stream[self._first_frame_len :]])
        else:
            if self._skip:
                consumed = min(self._skip, len(chunk))
                self._skip -= consumed
                chunk = chunk[consumed:]
            stream = np.concatenate([self._tail, chunk])
        num_frames = max(0, (len(stream) - frame_length) // frame_shift + 1)
        if num_frames:
            starts = np.arange(num_frames) * frame_shift
            frames = stream[starts[:, None] + np.arange(frame_length)[None, :]]
            feats = self._feats_for_frames(frames)
            self._first_frame = False
        else:
            feats = np.empty((0, self.num_coeffs), dtype=self._chunk_dtype)
        rem = len(stream) - num_frames * frame_shift
        if rem > 0:
            self._tail = stream[len(stream) - rem :]
            self._skip = 0
        else:
            self._tail = np.zeros(0, dtype=np.float64)
            self._skip = -rem
        return feats

    def finalize(self) -> np.ndarray:
        frame_length = self._frame_length
        frame_shift = self._frame_shift
        buf_len = len(self._tail) - self._skip
        if self._frame_style == "causal":
            pad_left = 0
        else:
            pad_left = self._pad_left
        num_frames = buf_len + frame_shift // 2
        if not self._first_frame:
            num_frames -= pad_left
            pad_left = 0
        num_frames //= frame_shift
        if num_frames >= 1:
            pad_right = (num_frames - 1) * frame_shift + frame_length - buf_len
            pad_right -= pad_left
            stream = np.pad(self._tail, (pad_left, pad_right), "symmetric")
            starts = np.arange(num_frames) * frame_shift
            frames = stream[starts[:, None] + np.arange(frame_length)[None, :]]
            feats = self._feats_for_frames(frames)
        else:
            feats = np.empty((0, self.num_coeffs), dtype=self._chunk_dtype)
        self._tail = np.zeros(0, dtype=np.float64)
        self._skip = 0
        self._first_frame = True
        self._started = False
        return feats


STFTFrameComputer = ShortTimeFourierTransformFrameComputer


class ShortIntegrationFrameComputer(LinearFilterBankFrameComputer):
    """Features by windowed short-time integration of filtered signals.

    Each filter is convolved with the whole signal, a pointwise modulus or
    power squashes the band to baseband, and a window of ``2*frame_shift``
    samples integrates it per frame.  Matches the reference SI computer
    (reference: compute.py:613-999); see :mod:`speech_tpu.ops.si` for the
    closed form its overlap-save/accumulator machinery reduces to and for
    the fused TPU program used here.

    Parameters
    ----------
    bank
        A :class:`LinearFilterBank`, alias string, or config mapping.
    frame_shift_ms
        Offset between successive frames (also the integration length) in
        milliseconds.
    frame_style
        'causal' or 'centered'; defaults to 'centered' for zero-phase
        banks.  Centered mode recenters each filter's support.
    include_energy
        Prepend an energy coefficient (a Dirac filter's integration).
    pad_to_nearest_power_of_two
        Pad internal DFT sizes to powers of two.
    window_function
        Integration window; defaults to :class:`GammaWindow` (causal) or
        :class:`HannWindow` (centered).
    use_power
        Pointwise power instead of magnitude.
    use_log
        Log the integrations.
    dtype
        Device compute dtype ('float32' default; 'float64' needs jax x64).
    conv_mode
        How the filter convolutions run: 'matmul' (banded-Toeplitz block
        matmuls on the MXU; see
        :func:`speech_tpu.ops.si.toeplitz_conv_blocks`), 'fft' (real-FFT
        products, overlap-save blocked for long signals), 'direct'
        (``lax.conv``; measured slower on TPU — XLA lowers long 1D
        convolutions poorly), or 'auto' ('matmul' up to supports of
        ``16 * CONV_BLOCK`` samples, then 'fft').
    precision
        'highest' (default), 'double', 'accurate', 'default', or 'high'.
        'default' (single-pass bf16) and 'high' (bf16x3) are
        reduced-precision conv tiers accepted for
        :class:`jax.lax.Precision` completeness — like the STFT
        computer's, they are NOT accuracy tiers on TPU (the feature log
        amplifies their conv rounding; see
        :class:`ShortTimeFourierTransformFrameComputer`).  'double' runs the
        convolution as exact base-64 digit-decomposition matmuls
        (float32 only, implies conv_mode='matmul'; see
        :class:`ShortTimeFourierTransformFrameComputer`): <=1e-5 max abs
        log-feature error vs float64 on any signal, where the plain f32
        conv's MXU rounding floor reaches ~2e-5 (gammatone) to ~2e-4
        (fbank) on real speech.  'accurate' is the base-256 variant with
        margin-bit digits (full contractions stay exact to ~1000-tap
        supports; beyond that they split into chunked scans) — the same
        accuracy class (~6e-7 measured on hostile signals) at ~70% of
        the MXU block-passes (see ``speech_tpu.ops.stft`` ``_SAK_*``).
        Caveat for both digit tiers: they force the matmul convolution,
        whose banded digit planes scale with the support squared —
        designed for gammatone/gabor-class supports (hundreds of taps,
        100-150 MiB of planes).  Banks with very long supports
        (fbank-class SI is ~7000 taps = 700-850 MiB of planes plus the
        live einsum buffers) are rejected at construction with a
        descriptive error; see
        :data:`speech_tpu.config.SI_DIGIT_PARAM_BYTE_LIMIT`.
    """

    aliases = {"si"}

    def __init__(
        self,
        bank: Union[LinearFilterBank, Mapping, str],
        frame_shift_ms: float = 10,
        frame_style: Optional[str] = None,
        include_energy: bool = False,
        pad_to_nearest_power_of_two: bool = True,
        window_function: Optional[Union[WindowFunction, Mapping, str]] = None,
        use_power: bool = False,
        use_log: bool = True,
        dtype: str = "float32",
        conv_mode: str = "auto",
        precision: str = "highest",
    ):
        if conv_mode not in ("auto", "fft", "direct", "matmul"):
            raise ValueError(f"Invalid conv_mode: {conv_mode}")
        if precision not in ("highest", "high", "default", "double", "accurate"):
            raise ValueError(f"Invalid SI precision: {precision!r}")
        if precision in ("double", "accurate"):
            if jnp.dtype(dtype) != jnp.float32:
                raise ValueError(
                    f"precision='{precision}' is a float32 digit-matmul "
                    "tier; use dtype='float64' with the default precision "
                    "instead"
                )
            if conv_mode == "fft" or conv_mode == "direct":
                raise ValueError(
                    f"precision='{precision}' requires the matmul "
                    "convolution"
                )
            conv_mode = "matmul"
        self._precision = precision
        self._conv_mode = conv_mode
        bank = alias_factory_subclass_from_arg(LinearFilterBank, bank)
        self._rate = bank.sampling_rate
        self._frame_shift = int(0.001 * frame_shift_ms * self._rate)
        self._log = bool(use_log)
        self._power = bool(use_power)
        self._dtype = jnp.dtype(dtype)
        if frame_style is None:
            frame_style = "centered" if bank.is_zero_phase else "causal"
        elif frame_style not in ("centered", "causal"):
            raise ValueError('Invalid frame style: "{}"'.format(frame_style))
        self._frame_style = frame_style
        if window_function is None:
            window_function = (
                GammaWindow() if frame_style == "causal" else HannWindow()
            )
        else:
            window_function = alias_factory_subclass_from_arg(
                WindowFunction, window_function
            )
        window = window_function.get_impulse_response(2 * self._frame_shift)
        self._kernel = _si.build_si_kernel(
            bank, self._frame_shift, frame_style, window, include_energy
        )
        if precision in ("double", "accurate"):
            # the digit tiers' parameter planes scale with the SQUARED
            # filter support; estimate them now so an fbank-class config
            # fails with guidance instead of an opaque multi-GB OOM deep
            # inside jit (see config.SI_DIGIT_PARAM_BYTE_LIMIT)
            T = self._kernel["max_support"]
            V = _si.CONV_BLOCK
            Kb = (-(-(T - 1) // V) if T > 1 else 0) + 1
            ndig = (
                _stft._SAK_M_DIGITS
                if precision == "accurate"
                else _stft._M_DIGITS
            )
            parts = 1 if self._kernel["is_real"] else 2
            est = ndig * parts * Kb * bank.num_filts * V * V * 4
            limit = config.SI_DIGIT_PARAM_BYTE_LIMIT
            if limit and est > limit:
                raise ValueError(
                    f"SI precision={precision!r} would build "
                    f"~{est / 2**30:.1f} GiB of digit parameter planes "
                    f"(max_support={T} taps, {bank.num_filts} filters, "
                    f"{ndig} digit planes x {parts} part(s)), above "
                    f"config.SI_DIGIT_PARAM_BYTE_LIMIT="
                    f"{limit / 2**30:.1f} GiB.  The digit tiers are "
                    "designed for gammatone/gabor-class supports "
                    "(hundreds of taps); for banks with very long "
                    "supports use precision='highest' (optionally "
                    "conv_mode='fft'), or raise the limit if the device "
                    "really has the memory."
                )
        if not pad_to_nearest_power_of_two:
            # power-of-two padding only affects the reference's internal
            # block DFT size, not its output; our FFT size is independent
            pass
        # streaming state: raw samples seen and frames already emitted; the
        # history buffer holds x from global index _hist_start
        self._seen = 0
        self._frames_done = 0
        self._hist = np.zeros(0, dtype=np.float64)
        self._hist_start = 0
        self._started = False
        self._chunk_dtype = np.float64
        self._device_params = None
        self._conv_block_params = None
        self._fns = {}
        super().__init__(bank, include_energy=include_energy)

    # ------------------------------------------------------------------

    @property
    def frame_style(self) -> str:
        return self._frame_style

    @property
    def sampling_rate(self) -> float:
        return self._rate

    @property
    def frame_length(self) -> int:
        return self._kernel["frame_length"]

    @property
    def frame_shift(self) -> int:
        return self._frame_shift

    @property
    def started(self) -> bool:
        return self._started

    @property
    def max_support(self) -> int:
        """Length all filters are FIR-clamped to."""
        return self._kernel["max_support"]

    @property
    def params(self):
        """Device arrays for the jitted pipeline.

        Complex FIRs are stored as separate real/imaginary float arrays —
        complex device arrays are unsupported on some TPU runtimes, and
        the pipeline only ever needs the real-FFT convolutions of the two
        parts (see :func:`speech_tpu.ops.si.si_feats_from_signal`).
        """
        if self._device_params is None:
            # ensure_compile_time_eval: a first access inside someone
            # else's jit must cache concrete arrays, not tracers
            with jax.ensure_compile_time_eval():
                firs = self._kernel["firs"]
                self._device_params = {
                    "firs_re": jnp.asarray(firs.real, dtype=self._dtype),
                    "window": jnp.asarray(
                        self._kernel["window"], dtype=self._dtype
                    ),
                }
                if not self._kernel["is_real"]:
                    self._device_params["firs_im"] = jnp.asarray(
                        firs.imag, dtype=self._dtype
                    )
        return self._device_params

    @property
    def _shift_eff(self) -> int:
        return self._kernel["shift_eff"]

    def _params_for(self, spec: dict) -> dict:
        """Device params for a pipeline spec; conv_mode='matmul' adds the
        banded-Toeplitz band matrices (precision='double': their exact
        digit planes instead).  Built once, cached."""
        params = self.params
        if spec["conv_mode"] != "matmul":
            return params
        if self._conv_block_params is None:
            with jax.ensure_compile_time_eval():
                self._build_conv_block_params()
        return {**params, **self._conv_block_params}

    def _build_conv_block_params(self):
        firs = self._kernel["firs"]
        parts = [("conv_re", np.ascontiguousarray(firs.real))]
        if not self._kernel["is_real"]:
            parts.append(("conv_im", np.ascontiguousarray(firs.imag)))
        blocks = {}
        for name, part in parts:
            band = _si.toeplitz_conv_blocks(part)
            if self._precision in ("double", "accurate"):
                if self._precision == "accurate":
                    planes, scale = _stft.digitize_matrix(
                        band,
                        _stft._SAK_M_DIGITS,
                        _stft._SAK_BASE,
                        margin=True,
                    )
                else:
                    planes, scale = _stft.digitize_matrix(band)
                blocks[name + "_digits"] = jnp.asarray(planes)
                blocks[name + "_scale"] = jnp.float32(scale)
            else:
                blocks[name + "_blocks"] = jnp.asarray(
                    band, dtype=self._dtype
                )
        self._conv_block_params = blocks

    def _spec(self, fft_size: int) -> dict:
        conv_mode = self._conv_mode
        if conv_mode == "auto":
            # measured on v5e (32x10 s gammatone-40 batch): Toeplitz block
            # matmuls run the convolution ~11x faster than blocked-FFT
            # overlap-save (35 ms vs 380 ms) — MXU FLOPs beat XLA's TPU
            # FFT until the support dwarfs the block width
            T = self._kernel["max_support"]
            conv_mode = "matmul" if T <= 16 * _si.CONV_BLOCK else "fft"
        return dict(
            frame_shift=self._frame_shift,
            shift_eff=self._shift_eff,
            max_support=self._kernel["max_support"],
            is_real=self._kernel["is_real"],
            include_energy=self._include_energy,
            use_log=self._log,
            use_power=self._power,
            log_floor=config.LOG_FLOOR_VALUE,
            fft_size=fft_size,
            energy_offset=self._shift_eff - self._kernel["translation"],
            conv_mode=conv_mode,
            precision=self._precision,
        )

    def _fn(self, buf_len: int, num_frames: int):
        key = (buf_len, num_frames)
        fn = self._fns.get(key)
        if fn is None:
            fft_size = _next_pow2(buf_len + self._kernel["max_support"])
            spec = self._spec(fft_size)
            params = self._params_for(spec)

            def run(buf, sig_len):
                return _si.si_feats_from_signal(
                    buf, sig_len, num_frames, params, **spec
                )

            fn = self._jit(run)
            self._fns[key] = fn
        return fn

    # ------------------------------------------------------------------
    # batch API
    # ------------------------------------------------------------------

    def compute_full(self, signal: np.ndarray) -> np.ndarray:
        """One-shot SI features; ``(len + shift//2) // shift`` frames."""
        if self._started:
            raise ValueError("Already started computing frames")
        signal = np.asarray(signal)
        ret_dtype = signal.dtype
        sig_len = signal.shape[0]
        shift = self._frame_shift
        T = self._kernel["max_support"]
        target = (sig_len + shift // 2) // shift
        after_pad = (target * shift + T - 1 - self._shift_eff) // shift - 1
        num_frames = max(0, min(target, after_pad))
        if num_frames == 0:
            return np.empty((0, self.num_coeffs), dtype=ret_dtype)
        bucket_len = _next_pow2(max(sig_len, 1))
        max_frames = (bucket_len + shift // 2) // shift
        buf = np.zeros(bucket_len, dtype=self._dtype)
        buf[:sig_len] = signal
        feats = self._fn(bucket_len, max_frames)(jnp.asarray(buf), sig_len)
        return np.asarray(feats[:num_frames], dtype=ret_dtype)

    def frame_counts_np(self, lengths) -> np.ndarray:
        """Valid frame counts per signal length (host math)."""
        shift = self._frame_shift
        T = self._kernel["max_support"]
        lengths = np.asarray(lengths)
        target = (lengths + shift // 2) // shift
        after_pad = (target * shift + T - 1 - self._shift_eff) // shift - 1
        return np.maximum(0, np.minimum(target, after_pad))

    def compute_batch(self, signals, lengths):
        """Batched SI features over padded signals.

        ``signals``: ``(batch, max_len)``; ``lengths``: ``(batch,)``.
        Returns ``(feats, frame_counts)``; rows at or past a signal's count
        are garbage to be masked.  Padding values in ``signals`` must be
        zero (they are traversed by the convolution).
        """
        signals = _as_transfer_array(signals, self._dtype)
        batch, max_len = signals.shape
        shift = self._frame_shift
        max_frames = (max_len + shift // 2) // shift
        if (
            not isinstance(lengths, jax.Array)
            and (np.asarray(lengths) == max_len).all()
        ):
            # host-known all-full lengths (the bucketed production case):
            # a static sig_len folds the conv-validity and energy masks
            # into compile-time constants
            feats = self._batch_full_fn(max_len, max_frames)(signals)
            counts = jnp.full(
                (batch,), int(self.frame_counts_np([max_len])[0]), jnp.int32
            )
            return feats, counts
        lengths = jnp.asarray(lengths, dtype=jnp.int32)
        key = ("batch", max_len, max_frames)
        fn = self._fns.get(key)
        if fn is None:
            fft_size = _next_pow2(max_len + self._kernel["max_support"])
            spec = self._spec(fft_size)
            params = self._params_for(spec)
            T = self._kernel["max_support"]
            shift_eff = self._shift_eff
            dtype = self._dtype

            def run(signals, lengths):
                def one(signal, length):
                    return _si.si_feats_from_signal(
                        signal, length, max_frames, params, **spec
                    )

                feats = jax.vmap(one)(signals.astype(dtype), lengths)
                # traced twin of frame_counts_np — keeping the whole call
                # on device means no per-call host sync (a single tunnel
                # readback costs ~26 ms, dwarfing the compute)
                target = (lengths + shift // 2) // shift
                after_pad = (target * shift + T - 1 - shift_eff) // shift - 1
                counts = jnp.maximum(0, jnp.minimum(target, after_pad))
                return feats, counts

            fn = self._jit(run)
            self._fns[key] = fn
        return fn(signals, lengths)

    def _batch_full_fn(self, max_len: int, max_frames: int):
        key = ("batchfull", max_len, max_frames)
        fn = self._fns.get(key)
        if fn is None:
            fft_size = _next_pow2(max_len + self._kernel["max_support"])
            spec = self._spec(fft_size)
            params = self._params_for(spec)
            dtype = self._dtype

            def run(signals):
                return jax.vmap(
                    lambda s: _si.si_feats_from_signal(
                        s, max_len, max_frames, params, **spec
                    )
                )(signals.astype(dtype))

            fn = self._jit(run)
            self._fns[key] = fn
        return fn

    # ------------------------------------------------------------------
    # streaming API
    # ------------------------------------------------------------------
    #
    # Equivalent formulation of the reference's overlap-save streaming
    # (reference: compute.py:774-891): with S raw samples seen, the counted
    # stream holds S - shift_eff samples and frame k is emittable once
    # counted >= (k + 2) * shift.  Frames are produced from a sliding
    # history window of x via the same fused conv program as compute_full.

    def _frames_avail(self) -> int:
        counted = self._seen - self._shift_eff
        return max(0, counted // self._frame_shift - 1)

    def compute_chunk(self, chunk: np.ndarray) -> np.ndarray:
        chunk = np.asarray(chunk)
        if self._started:
            if chunk.dtype != self._chunk_dtype:
                raise ValueError(
                    "Chunk does not share a type with previous chunks"
                )
        else:
            if not np.issubdtype(chunk.dtype, np.floating):
                raise ValueError("Chunk must be a float type")
            self._chunk_dtype = chunk.dtype
            self._started = True
        self._hist = np.concatenate(
            [self._hist, chunk.astype(np.float64, copy=False)]
        )
        self._seen += len(chunk)
        return self._emit(self._frames_avail())

    def _emit(self, f1: int) -> np.ndarray:
        f0, shift = self._frames_done, self._frame_shift
        T = self._kernel["max_support"]
        if f1 <= f0:
            return np.empty((0, self.num_coeffs), dtype=self._chunk_dtype)
        # x span needed for frames [f0, f1): conv taps reach back T - 1
        need_start = f0 * shift + self._shift_eff - (T - 1)
        need_end = f1 * shift + shift - 1 + self._shift_eff  # inclusive
        xw_len = need_end - need_start + 1
        bucket = _next_pow2(xw_len)
        buf = np.zeros(bucket, dtype=self._dtype)
        lo = max(0, need_start)
        hi = min(self._seen, need_end + 1)
        if hi > lo:
            buf[lo - need_start : hi - need_start] = self._hist[
                lo - self._hist_start : hi - self._hist_start
            ]
        num_frames = f1 - f0
        fft_size = _next_pow2(bucket + T)
        spec = self._spec(fft_size)
        params = self._params_for(spec)
        # shift_eff in local window coordinates: y_loc[n] corresponds to
        # global y[f0*shift + n]; x_loc[j] = x[need_start + j]
        spec["shift_eff"] = f0 * shift + self._shift_eff - need_start
        spec["energy_offset"] = spec["shift_eff"] - self._kernel["translation"]
        key = ("chunk", bucket, num_frames, spec["shift_eff"])
        fn = self._fns.get(key)
        if fn is None:

            def run(buf, valid_len):
                return _si.si_feats_from_signal(
                    buf, valid_len, num_frames, params, **spec
                )

            fn = self._jit(run)
            self._fns[key] = fn
        # right-edge masking is irrelevant here (buffer is zero-filled and
        # emitted frames never read past seen samples), so pass the bucket
        feats = np.asarray(fn(jnp.asarray(buf), bucket), dtype=self._chunk_dtype)
        self._frames_done = f1
        # trim history to what future frames can still need
        keep_from = max(0, f1 * shift + self._shift_eff - (T - 1))
        if keep_from > self._hist_start:
            self._hist = self._hist[keep_from - self._hist_start :]
            self._hist_start = keep_from
        return feats

    def finalize(self) -> np.ndarray:
        feats = np.empty((0, self.num_coeffs), dtype=self._chunk_dtype)
        if self._started:
            shift = self._frame_shift
            T = self._kernel["max_support"]
            target = (self._seen + shift // 2) // shift
            # the reference finalizes by zero-padding with
            # ``target*shift + frame_length - 1 - len`` samples and slicing
            # to at most ``target`` frames (reference: compute.py:824-846);
            # when the padded counted stream still can't cover frame
            # target-1 (banks whose right-edge support is under ~shift/2),
            # it emits fewer — reproduce that exactly
            after_pad = (
                target * shift + T - 1 - self._shift_eff
            ) // shift - 1
            total = max(self._frames_done, min(target, after_pad))
            if total > self._frames_done:
                pad = (total + 1) * shift + self._shift_eff - self._seen
                if pad > 0:
                    self._hist = np.concatenate(
                        [self._hist, np.zeros(pad, dtype=np.float64)]
                    )
                    self._seen += pad
                feats = self._emit(total)
        self._seen = 0
        self._frames_done = 0
        self._hist = np.zeros(0, dtype=np.float64)
        self._hist_start = 0
        self._started = False
        return feats


SIFrameComputer = ShortIntegrationFrameComputer


def frame_by_frame_calculation(
    computer: FrameComputer, signal: np.ndarray, chunk_size: int = 2 ** 10
) -> np.ndarray:
    """Compute an entire signal's features through successive chunk calls.

    Identical output to ``computer.compute_full(signal)`` but exercises the
    streaming path (reference: compute.py:1002-1039).
    """
    if computer.started:
        raise ValueError("Already started computing frames")
    coeffs = []
    while len(signal):
        coeffs.append(computer.compute_chunk(signal[:chunk_size]))
        signal = signal[chunk_size:]
    coeffs.append(computer.finalize())
    return np.concatenate(coeffs)
