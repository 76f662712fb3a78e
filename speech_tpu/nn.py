"""Learnable feature frontends: the STFT computer as a trainable module.

The reference's accelerator layer exposes the STFT computer's precomputed
filters and window as learnable ``torch.nn.Parameter``s
(reference: src/pydrobert/speech/torch.py:238-432, 362-366).  Here the same
idea is expressed JAX-style: a frontend is a pure ``apply(params, ...)``
function plus an ``init`` that pulls the precomputed arrays out of a host
:class:`~speech_tpu.compute.STFTFrameComputer`.  ``params`` is a plain dict
pytree, so it composes with any optimizer (optax) and any sharding
(`jax.sharding.NamedSharding` leaves).

Unlike the inference path (:mod:`speech_tpu.ops.stft`), the analysis window
is *not* folded into the DFT matrices here — it must stay a separate leaf so
its gradient exists.  The DFT cosine/sine matrices are non-learnable
constants and live in the returned ``consts`` dict.
"""

from typing import Mapping, Optional, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

from .ops.xmath import xlog

from . import config
from .compute import STFTFrameComputer
from .ops import framing as _framing
from .ops import stft as _stft

__all__ = [
    "FeatureFrontend",
    "GaborFrontend",
    "PCEN",
    "STFTFrontend",
    "SincFrontend",
]


def _dft_matrices(frame_length: int, dft_size: int):
    """Plain (windowless) real-DFT matrices ``C``, ``S``.

    ``Re X = (w * x) @ C``; ``Im X = (w * x) @ S``.
    """
    half_len = dft_size // 2 + 1
    t = np.arange(frame_length, dtype=np.float64)[:, None]
    b = np.arange(half_len, dtype=np.float64)[None, :]
    ang = 2 * np.pi * t * b / dft_size
    return np.cos(ang), -np.sin(ang)


class STFTFrontend:
    """A trainable STFT feature frontend.

    Functional module: ``params, consts = STFTFrontend.init(computer)``;
    ``feats = frontend.apply(params, consts, signals, lengths)``.  Learnable
    leaves are the analysis ``window`` and the folded half-spectrum filter
    ``weights`` — the exact analog of the reference's learnable
    ``_window``/``_filt_pack`` parameters (reference: torch.py:362-412).

    Parameters
    ----------
    computer
        A host :class:`~speech_tpu.compute.STFTFrameComputer` (or the kwargs
        to build one) whose precomputed arrays seed the parameters.
    dtype
        Parameter/computation dtype.
    """

    def __init__(
        self,
        computer: Union[STFTFrameComputer, Mapping, str],
        dtype=jnp.float32,
    ):
        if not isinstance(computer, STFTFrameComputer):
            from .alias import alias_factory_subclass_from_arg
            from .compute import FrameComputer

            computer = alias_factory_subclass_from_arg(FrameComputer, computer)
            if not isinstance(computer, STFTFrameComputer):
                raise ValueError("frontend requires an STFT computer")
        self._computer = computer
        self.dtype = dtype
        self.frame_length = computer.frame_length
        self.frame_shift = computer.frame_shift
        self.dft_size = computer.dft_size
        self.num_coeffs = computer.num_coeffs
        self.use_log = computer._log
        self.use_power = computer._power
        self.include_energy = computer.includes_energy
        self.pad_left = computer._pad_left

    def init(self) -> Tuple[dict, dict]:
        """Build ``(params, consts)`` pytrees from the host computer."""
        c = self._computer
        C, S = _dft_matrices(self.frame_length, self.dft_size)
        params = {
            "window": jnp.asarray(c._window, dtype=self.dtype),
            "weights": jnp.asarray(c._weights, dtype=self.dtype),
        }
        consts = {
            "dft_cos": jnp.asarray(C, dtype=self.dtype),
            "dft_sin": jnp.asarray(S, dtype=self.dtype),
        }
        return params, consts

    def apply_frames(self, params: dict, consts: dict, frames):
        """Features for pre-assembled raw frames ``(..., frame_length)``."""
        windowed = frames * params["window"]
        re = jnp.matmul(
            windowed, consts["dft_cos"], precision=jax.lax.Precision.HIGHEST
        )
        im = jnp.matmul(
            windowed, consts["dft_sin"], precision=jax.lax.Precision.HIGHEST
        )
        power = re * re + im * im
        if self.use_power:
            spec = power
        else:
            # safe sqrt: d(sqrt)/dp is inf at p == 0 (an all-zero padded
            # frame reaches it), which would NaN the window/weight grads;
            # the where-guard keeps the primal bit-identical and picks the
            # zero one-sided subgradient there
            pos = power > 0
            spec = jnp.where(pos, jnp.sqrt(jnp.where(pos, power, 1)), 0)
        feats = jnp.matmul(
            spec, params["weights"], precision=jax.lax.Precision.HIGHEST
        )
        if self.use_log:
            feats = xlog(jnp.maximum(feats, config.LOG_FLOOR_VALUE))
        if self.include_energy:
            energy = jnp.sum(frames * frames, axis=-1) / self.frame_length
            if not self.use_power:
                epos = energy > 0
                energy = jnp.where(
                    epos, jnp.sqrt(jnp.where(epos, energy, 1)), 0
                )
            if self.use_log:
                energy = xlog(jnp.maximum(energy, config.LOG_FLOOR_VALUE))
            feats = jnp.concatenate([energy[..., None], feats], axis=-1)
        return feats

    def apply(
        self,
        params: dict,
        consts: dict,
        signals,
        lengths=None,
        max_frames: Optional[int] = None,
    ):
        """Features for a batch of padded signals ``(batch, max_len)``.

        Returns ``(batch, max_frames, num_coeffs)``; rows past a signal's
        true frame count are reflected garbage the caller masks.
        """
        signals = jnp.asarray(signals, dtype=self.dtype)
        max_len = signals.shape[-1]
        if lengths is None:
            lengths = jnp.full(signals.shape[:-1], max_len, dtype=jnp.int32)
        if max_frames is None:
            max_frames = _framing.frame_count_np(
                max_len, self.frame_length, self.frame_shift
            )

        def one(signal, length):
            padded = _framing.pad_signal(
                signal, length, self.frame_length, self.frame_shift, self.pad_left
            )
            frames = _framing.frame_padded(
                padded, max_frames, self.frame_length, self.frame_shift
            )
            return self.apply_frames(params, consts, frames)

        return jax.vmap(one)(signals, lengths)

    def frame_counts(self, lengths):
        """Valid frame counts for true signal ``lengths``."""
        return _framing.frame_count(lengths, self.frame_length, self.frame_shift)

    def export_computer(self, params: dict) -> STFTFrameComputer:
        """Bake trained parameters into a fresh host computer.

        Closes the train->serve loop: the returned
        :class:`~speech_tpu.compute.STFTFrameComputer` carries the learned
        analysis ``window`` and half-spectrum filter ``weights`` — every
        downstream consumer (``compute_full``/``compute_batch``, the
        streaming classes, ``FeatureServer``/``StreamPool``, the CLIs,
        ``ShardedExtractor``) then runs the trained frontend unchanged,
        including the exact digit-matmul precision tiers, which re-derive
        their plane decompositions from the new weights.  The reference has
        no path back from its learnable torch parameters to the numpy
        computer (reference: torch.py:368-412 converts one way only).
        """
        import copy

        window = np.asarray(params["window"], dtype=np.float64)
        weights = np.asarray(params["weights"], dtype=np.float64)
        c = self._computer
        if window.shape != c._window.shape:
            raise ValueError(
                f"window shape {window.shape} != {c._window.shape}"
            )
        if weights.shape != c._weights.shape:
            raise ValueError(
                f"weights shape {weights.shape} != {c._weights.shape}"
            )
        # drop device/jit caches before the deep copy (they hold compiled
        # programs and device arrays tied to the OLD parameters)
        saved = (c._device_params, c._full_fns, c._frames_fns)
        c._device_params, c._full_fns, c._frames_fns = None, {}, {}
        try:
            out = copy.deepcopy(c)
        finally:
            c._device_params, c._full_fns, c._frames_fns = saved
        out._window = window
        out._weights = weights
        out._dft_cos, out._dft_sin = _stft.windowed_dft_matrices(
            window, out._dft_size
        )
        # fresh streaming state
        out._tail = np.zeros(0, dtype=np.float64)
        out._skip = 0
        out._first_frame = True
        out._started = False
        return out

    # checkpointing --------------------------------------------------------

    @staticmethod
    def save_params(wfilename: str, params: dict) -> None:
        """Checkpoint learnable parameters to an ``.npz`` file."""
        np.savez(
            wfilename, **{k: np.asarray(v) for k, v in params.items()}
        )

    def load_params(self, rfilename: str) -> dict:
        """Load a checkpoint saved by :meth:`save_params`."""
        with np.load(rfilename) as data:
            return {
                k: jnp.asarray(data[k], dtype=self.dtype) for k in data.files
            }


class GaborFrontend:
    """LEAF-style learnable Gabor filterbank frontend.

    The trainable twin of the SI computer, the way :class:`STFTFrontend` is
    of the STFT computer (the reference's torch layer only wraps SI in a
    numpy round trip: reference torch.py:475-522).  Structure follows LEAF
    (Zeghidour et al. 2021): a time-domain complex Gabor correlation,
    squared modulus, then per-channel Gaussian lowpass pooling at the frame
    shift — but every stage is parameterized for gradients:

    - per-filter center frequency ``eta`` (angular) and envelope width
      ``sigma`` (samples, learned through its log so it stays positive),
      seeded from a :class:`~speech_tpu.filters.GaborFilterBank` layout;
    - per-channel pooling width ``pool_sigma`` (learned through its log).

    Filters MATERIALIZE inside ``apply`` from ``(eta, log_sigma)`` — two
    scalars per filter — so gradients move the filters' centers/bandwidths
    rather than their taps (LEAF's key trick; a free-tap variant is just
    :class:`STFTFrontend`).  Compute is one stride-1 multi-channel
    correlation (XLA lowers it onto the MXU) followed by slice-framed
    pooling contractions — no gathers, static shapes.

    Functional module::

        frontend = GaborFrontend(bank, frame_shift_ms=10)
        params, consts = frontend.init()
        feats = frontend.apply(params, consts, signals, lengths)

    Compose with :class:`PCEN` (``use_log=False``) for the full LEAF
    recipe, or keep the default log compression for fbank-style features.
    """

    def __init__(
        self,
        bank=None,
        frame_shift_ms: float = 10.0,
        filter_size: Optional[int] = None,
        pool_size: Optional[int] = None,
        use_log: bool = True,
        dtype=jnp.float32,
    ):
        from .alias import alias_factory_subclass_from_arg
        from .filters import GaborFilterBank, LinearFilterBank

        if bank is None:
            bank = GaborFilterBank("mel")
        elif not isinstance(bank, LinearFilterBank):
            bank = alias_factory_subclass_from_arg(LinearFilterBank, bank)
        if not isinstance(bank, GaborFilterBank):
            raise ValueError(
                "GaborFrontend seeds from a GaborFilterBank layout; got "
                f"{type(bank).__name__}"
            )
        self._eta0 = np.asarray(bank._centers_ang, np.float64)
        self._sigma0 = np.asarray(bank._stds, np.float64)
        self.num_filts = bank.num_filts
        self.sampling_rate = float(bank.sampling_rate)
        self.frame_shift = max(
            1, int(0.001 * frame_shift_ms * self.sampling_rate)
        )
        if filter_size is None:
            # wide enough for the widest envelope at init (3 sigma each
            # side), in the ballpark of LEAF's 401 taps at 16 kHz
            filter_size = 2 * int(np.ceil(3 * self._sigma0.max())) + 1
            filter_size = min(filter_size, 2 * self.frame_shift * 4 + 1)
        if pool_size is None:
            pool_size = 2 * self.frame_shift + 1
        if filter_size % 2 == 0 or pool_size % 2 == 0:
            raise ValueError("filter_size and pool_size must be odd")
        self.filter_size = int(filter_size)
        self.pool_size = int(pool_size)
        self.use_log = bool(use_log)
        self.dtype = dtype

    def init(self) -> Tuple[dict, dict]:
        """Build ``(params, consts)``: LEAF seeds from the bank layout."""
        params = {
            "eta": jnp.asarray(self._eta0, dtype=self.dtype),
            "log_sigma": jnp.asarray(np.log(self._sigma0), dtype=self.dtype),
            # LEAF initializes the pooling Gaussian at 0.4 * hop
            "log_pool_sigma": jnp.full(
                (self.num_filts,),
                float(np.log(0.4 * self.frame_shift)),
                dtype=self.dtype,
            ),
        }
        half = self.filter_size // 2
        phalf = self.pool_size // 2
        consts = {
            "t": jnp.arange(-half, half + 1, dtype=self.dtype),
            "pool_t": jnp.arange(-phalf, phalf + 1, dtype=self.dtype),
        }
        return params, consts

    def filters(self, params: dict, consts: dict):
        """Materialize ``(filter_size, F)`` cosine and sine tap banks.

        Envelopes normalize to unit area so each filter's frequency
        response peaks at ~1 regardless of its width (the bank's
        peak-response convention).
        """
        t = consts["t"][:, None]
        sigma = jnp.exp(params["log_sigma"])[None, :]
        env = jnp.exp(-0.5 * (t / sigma) ** 2)
        env = env / jnp.sum(env, axis=0, keepdims=True)
        phase = params["eta"][None, :] * t
        return env * jnp.cos(phase), env * jnp.sin(phase)

    def pool_window(self, params: dict, consts: dict):
        """Materialize the ``(pool_size, F)`` unit-sum Gaussian pooling."""
        t = consts["pool_t"][:, None]
        sigma = jnp.exp(params["log_pool_sigma"])[None, :]
        win = jnp.exp(-0.5 * (t / sigma) ** 2)
        return win / jnp.sum(win, axis=0, keepdims=True)

    def frame_counts(self, lengths):
        """Valid frame counts for true signal ``lengths``."""
        shift = self.frame_shift
        return (jnp.asarray(lengths) + shift // 2) // shift

    def apply(self, params: dict, consts: dict, signals, lengths=None):
        """Features for padded signals ``(batch, max_len)``.

        Returns ``(batch, max_frames, num_filts)`` with frame ``k``
        centered at sample ``k * frame_shift`` (the computers' centered
        framing); rows past a signal's true frame count are pooled zeros
        the caller masks.  Zero-pad ``signals`` beyond each true length.
        """
        signals = jnp.asarray(signals, dtype=self.dtype)
        batch, max_len = signals.shape
        shift = self.frame_shift
        max_frames = int(frame_count_np_int(max_len, shift))
        cos_f, sin_f = self.filters(params, consts)
        # one stride-1 correlation for all 2F tap banks: (B, 1, T) x
        # (2F, 1, W) SAME -> (B, 2F, T) modulation energies
        taps = jnp.concatenate([cos_f.T, sin_f.T], axis=0)[:, None, :]
        resp = jax.lax.conv_general_dilated(
            signals[:, None, :],
            taps,
            window_strides=(1,),
            padding="SAME",
            precision=jax.lax.Precision.HIGHEST,
        )
        energy = (
            resp[:, : self.num_filts] ** 2
            + resp[:, self.num_filts :] ** 2
        )  # (B, F, T)
        # Gaussian pooling at stride `shift`, slice-framed (no gathers):
        # window p of frame k reads sample k*shift + p - P//2
        win = self.pool_window(params, consts)  # (P, F)
        strided = _pooled_windows(energy, max_frames, shift, self.pool_size)
        feats = jnp.einsum(
            "bfkp,pf->bkf",
            strided,
            win,
            precision=jax.lax.Precision.HIGHEST,
        )
        if self.use_log:
            feats = xlog(jnp.maximum(feats, config.LOG_FLOOR_VALUE))
        return feats

    # checkpointing --------------------------------------------------------

    save_params = staticmethod(STFTFrontend.save_params)

    def load_params(self, rfilename: str) -> dict:
        with np.load(rfilename) as data:
            return {
                k: jnp.asarray(data[k], dtype=self.dtype) for k in data.files
            }


def frame_count_np_int(sig_len: int, shift: int) -> int:
    """Centered frame count at pure pooling stride (window-free)."""
    return (sig_len + shift // 2) // shift


def _pooled_windows(energy, max_frames: int, shift: int, pool_size: int):
    """Slice-framed pooling windows (no gathers).

    ``energy`` is ``(B, F, T)``; returns ``(B, F, max_frames, pool_size)``
    where window position ``p`` of frame ``k`` reads sample
    ``k * shift + p - pool_size // 2`` (zero past either edge).
    """
    pad = pool_size // 2
    padded = jnp.pad(energy, ((0, 0), (0, 0), (pad, pad)))
    need = (max_frames - 1) * shift + pool_size
    if need > padded.shape[-1]:
        padded = jnp.pad(
            padded, ((0, 0), (0, 0), (0, need - padded.shape[-1]))
        )
    return jnp.stack(
        [
            jax.lax.slice_in_dim(
                padded, p, p + (max_frames - 1) * shift + 1, shift, axis=2
            )
            for p in range(pool_size)
        ],
        axis=-1,
    )


class SincFrontend:
    """SincNet-style learnable band-edge frontend (Ravanelli & Bengio 2018).

    The third point in the learnable-frontend family: where
    :class:`STFTFrontend` learns free filter taps and
    :class:`GaborFrontend` learns Gabor centers/widths, ``SincFrontend``
    learns only each band-pass filter's two *edge frequencies* — the filter
    materializes inside ``apply`` as a windowed difference of ideal-lowpass
    sincs, so gradients move band edges, never individual taps:

    .. math:: g_k[n] = 2 f_2 \\mathrm{sinc}(2 f_2 n) - 2 f_1 \\mathrm{sinc}(2 f_1 n)

    (normalized frequencies), Hamming-windowed.  Band edges are seeded
    equally spaced on a perceptual scale (mel by default) and constrained
    positive through the paper's ``min_low_hz + |low|`` / ``f1 +
    min_band_hz + |band|`` reparameterization, clipped at Nyquist.

    Compute follows the frontend convention used throughout
    (:class:`GaborFrontend`): one stride-1 multi-channel correlation on the
    MXU, squared response, pooling at the frame shift (``"avg"`` default or
    SincNet's ``"max"``), optional log compression.  Static shapes, no
    gathers.

    Functional module::

        frontend = SincFrontend(num_filts=40, sampling_rate=16000)
        params, consts = frontend.init()
        feats = frontend.apply(params, consts, signals)
    """

    def __init__(
        self,
        num_filts: int = 40,
        sampling_rate: float = 16000.0,
        scaling_function="mel",
        frame_shift_ms: float = 10.0,
        filter_size: Optional[int] = None,
        pool_size: Optional[int] = None,
        pooling: str = "avg",
        use_log: bool = True,
        min_low_hz: float = 30.0,
        min_band_hz: float = 50.0,
        dtype=jnp.float32,
    ):
        from .alias import alias_factory_subclass_from_arg
        from .scales import ScalingFunction

        if num_filts < 1:
            raise ValueError(f"num_filts must be positive, got {num_filts}")
        if pooling not in ("avg", "max"):
            raise ValueError(f"pooling must be 'avg' or 'max', got {pooling}")
        scale = alias_factory_subclass_from_arg(
            ScalingFunction, scaling_function
        )
        self.num_filts = int(num_filts)
        self.sampling_rate = float(sampling_rate)
        self.min_low_hz = float(min_low_hz)
        self.min_band_hz = float(min_band_hz)
        nyquist = self.sampling_rate / 2
        # seed: num_filts+1 edges equally spaced on the perceptual scale
        # (the SincNet initialization), leaving headroom for the
        # min_low/min_band floors the forward constraints re-add
        s_lo = scale.hertz_to_scale(self.min_low_hz)
        s_hi = scale.hertz_to_scale(
            max(nyquist - (self.min_low_hz + self.min_band_hz), self.min_low_hz + 1)
        )
        edges = np.asarray(
            [
                scale.scale_to_hertz(s)
                for s in np.linspace(s_lo, s_hi, self.num_filts + 1)
            ],
            np.float64,
        )
        self._low0 = np.maximum(edges[:-1] - self.min_low_hz, 1.0)
        self._band0 = np.maximum(np.diff(edges) - self.min_band_hz, 1.0)
        self.frame_shift = max(
            1, int(0.001 * frame_shift_ms * self.sampling_rate)
        )
        if filter_size is None:
            # ~12.5 ms of taps (SincNet's 251 at 16 kHz is ~16 ms)
            filter_size = 2 * int(0.00625 * self.sampling_rate) + 1
        if pool_size is None:
            pool_size = 2 * self.frame_shift + 1
        if filter_size % 2 == 0 or pool_size % 2 == 0:
            raise ValueError("filter_size and pool_size must be odd")
        self.filter_size = int(filter_size)
        self.pool_size = int(pool_size)
        self.pooling = pooling
        self.use_log = bool(use_log)
        self.dtype = dtype

    def init(self) -> Tuple[dict, dict]:
        """Build ``(params, consts)``: mel-spaced band edges, Hamming."""
        half = self.filter_size // 2
        n = np.arange(-half, half + 1, dtype=np.float64)
        # periodic-style Hamming over the full support (SincNet's window)
        window = 0.54 + 0.46 * np.cos(np.pi * n / max(half, 1))
        params = {
            "low_hz": jnp.asarray(self._low0, dtype=self.dtype),
            "band_hz": jnp.asarray(self._band0, dtype=self.dtype),
        }
        consts = {
            "t": jnp.asarray(n, dtype=self.dtype),
            "window": jnp.asarray(window, dtype=self.dtype),
        }
        return params, consts

    def band_edges(self, params: dict):
        """Constrained ``(f1, f2)`` band edges in Hz, each ``(F,)``."""
        f1 = self.min_low_hz + jnp.abs(params["low_hz"])
        f2 = jnp.clip(
            f1 + self.min_band_hz + jnp.abs(params["band_hz"]),
            max=self.sampling_rate / 2,
        )
        return f1, f2

    def filters(self, params: dict, consts: dict):
        """Materialize the ``(filter_size, F)`` windowed-sinc tap bank."""
        f1, f2 = self.band_edges(params)
        t = consts["t"][:, None]  # sample offsets
        g1 = 2 * (f1 / self.sampling_rate)[None, :]
        g2 = 2 * (f2 / self.sampling_rate)[None, :]
        taps = g2 * jnp.sinc(g2 * t) - g1 * jnp.sinc(g1 * t)
        return taps * consts["window"][:, None]

    def frame_counts(self, lengths):
        """Valid frame counts for true signal ``lengths``."""
        shift = self.frame_shift
        return (jnp.asarray(lengths) + shift // 2) // shift

    def apply(self, params: dict, consts: dict, signals, lengths=None):
        """Features for padded signals ``(batch, max_len)``.

        Returns ``(batch, max_frames, num_filts)`` with frame ``k``
        centered at sample ``k * frame_shift``; rows past a signal's true
        frame count pool zeros the caller masks.  Zero-pad ``signals``
        beyond each true length.
        """
        signals = jnp.asarray(signals, dtype=self.dtype)
        batch, max_len = signals.shape
        shift = self.frame_shift
        max_frames = int(frame_count_np_int(max_len, shift))
        taps = self.filters(params, consts)  # (W, F)
        resp = jax.lax.conv_general_dilated(
            signals[:, None, :],
            taps.T[:, None, :],
            window_strides=(1,),
            padding="SAME",
            precision=jax.lax.Precision.HIGHEST,
        )  # (B, F, T)
        energy = resp * resp
        windows = _pooled_windows(energy, max_frames, shift, self.pool_size)
        if self.pooling == "max":
            feats = jnp.max(windows, axis=-1).transpose(0, 2, 1)
        else:
            feats = jnp.mean(windows, axis=-1).transpose(0, 2, 1)
        if self.use_log:
            feats = xlog(jnp.maximum(feats, config.LOG_FLOOR_VALUE))
        return feats

    # checkpointing --------------------------------------------------------

    save_params = staticmethod(STFTFrontend.save_params)

    def load_params(self, rfilename: str) -> dict:
        with np.load(rfilename) as data:
            return {
                k: jnp.asarray(data[k], dtype=self.dtype) for k in data.files
            }


class FeatureFrontend:
    """Identity frontend over PRECOMPUTED features.

    The model families (:class:`~speech_tpu.models.KWSModel`,
    :class:`~speech_tpu.models.CTCModel`,
    :class:`~speech_tpu.models.SpeakerModel`) normally compute features
    from raw signals through a trainable frontend.  This frontend instead
    accepts features extracted ahead of time — the Kaldi-style "extract
    once, train many" corpus workflow (reference corpus.py:30-83 wraps
    exactly such precomputed-feature iterators) — e.g. the output of the
    ``signals-to-torch-feat-dir`` / ``compute-feats-from-kaldi-tables``
    CLIs loaded through :class:`speech_tpu.corpus.FeatureCorpus` in
    feature-file mode.

    Under the module contract the ``signals`` argument becomes a padded
    ``(batch, T, feature_dim)`` feature array and ``lengths`` are FRAME
    counts; ``apply`` zeroes rows past each utterance's count so batch
    padding cannot leak into the (masked) downstream heads, and
    ``frame_counts`` is the identity.  There are no trainable leaves.

    Optional ``mean``/``std`` (per-coefficient, e.g. from a corpus
    :class:`~speech_tpu.post.Standardize` accumulation) fold a fixed
    standardization into ``consts``.
    """

    def __init__(self, feature_dim: int, mean=None, std=None,
                 dtype=jnp.float32):
        if feature_dim < 1:
            raise ValueError(f"feature_dim must be >= 1: {feature_dim}")
        self.num_coeffs = int(feature_dim)
        self.dtype = dtype
        self._mean = None if mean is None else np.asarray(mean, np.float64)
        self._std = None if std is None else np.asarray(std, np.float64)
        for name, arr in (("mean", self._mean), ("std", self._std)):
            if arr is not None and arr.shape != (self.num_coeffs,):
                raise ValueError(
                    f"{name} must have shape ({self.num_coeffs},), got "
                    f"{arr.shape}"
                )

    def init(self) -> Tuple[dict, dict]:
        consts = {}
        if self._mean is not None:
            consts["mean"] = jnp.asarray(self._mean, dtype=self.dtype)
        if self._std is not None:
            consts["std"] = jnp.asarray(self._std, dtype=self.dtype)
        return {}, consts

    def frame_counts(self, lengths):
        return jnp.asarray(lengths, jnp.int32)

    def apply(self, params: dict, consts: dict, feats, lengths=None):
        feats = jnp.asarray(feats, dtype=self.dtype)
        if "mean" in consts:
            feats = feats - consts["mean"]
        if "std" in consts:
            feats = feats / consts["std"]
        if lengths is not None:
            t = jnp.arange(feats.shape[-2], dtype=jnp.int32)
            mask = t[None, :] < jnp.asarray(lengths, jnp.int32)[:, None]
            feats = feats * mask[..., None].astype(feats.dtype)
        return feats


class PCEN:
    """Learnable per-channel energy normalization (Wang et al. 2017).

    The trainable form of :func:`speech_tpu.ops.postops.pcen`: ``alpha``,
    ``delta``, and ``power`` are per-channel leaves learned through their
    logs (so they stay positive under gradient steps, the paper's
    parameterization), and the smoother coefficient optionally through a
    logit.  Compose after an :class:`STFTFrontend` built with
    ``use_log=False`` — PCEN replaces log compression.

    Functional module: ``params = PCEN(C).init()``;
    ``out = layer.apply(params, feats)`` (or
    ``out, state = layer.apply(params, feats, init_state=state,
    return_state=True)`` when streaming).
    """

    def __init__(
        self,
        num_channels: int,
        smooth: float = 0.025,
        alpha: float = 0.98,
        delta: float = 2.0,
        power: float = 0.5,
        eps: float = 1e-6,
        learn_smooth: bool = False,
        dtype=jnp.float32,
    ):
        if not 0.0 < smooth <= 1.0:
            raise ValueError(f"Expected smooth in (0, 1], got {smooth}")
        if learn_smooth and smooth >= 1.0:
            # the logit parameterization needs an interior point
            raise ValueError(
                "learn_smooth requires smooth < 1 (the initial logit of "
                "1.0 is infinite)"
            )
        self.num_channels = int(num_channels)
        self._smooth = float(smooth)
        self._alpha = float(alpha)
        self._delta = float(delta)
        self._power = float(power)
        self.eps = float(eps)
        self.learn_smooth = bool(learn_smooth)
        self.dtype = dtype

    def init(self) -> dict:
        """Per-channel parameter pytree at the configured initial values."""
        full = lambda v: jnp.full((self.num_channels,), v, dtype=self.dtype)
        params = {
            "log_alpha": full(np.log(self._alpha)),
            "log_delta": full(np.log(self._delta)),
            "log_power": full(np.log(self._power)),
        }
        if self.learn_smooth:
            params["smooth_logit"] = full(
                np.log(self._smooth) - np.log1p(-self._smooth)
            )
        return params

    def apply(
        self,
        params: dict,
        features,
        init_state=None,
        time_axis: int = -2,
        return_state: bool = False,
    ):
        """PCEN of linear features ``(..., time, num_channels)``."""
        from .ops.postops import pcen

        smooth = (
            jax.nn.sigmoid(params["smooth_logit"])
            if "smooth_logit" in params
            else self._smooth
        )
        return pcen(
            features,
            smooth=smooth,
            alpha=jnp.exp(params["log_alpha"]),
            delta=jnp.exp(params["log_delta"]),
            power=jnp.exp(params["log_power"]),
            eps=self.eps,
            init_state=init_state,
            time_axis=time_axis,
            return_state=return_state,
        )
