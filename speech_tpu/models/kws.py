"""Keyword-spotting model family: trainable frontend -> conv encoder -> head.

The reference stops at feature extraction: its accelerator layer exposes the
STFT computer's precomputed filters/window as learnable ``torch.nn.Parameter``
leaves (reference: src/pydrobert/speech/torch.py:238-432) but ships no
downstream model and no training recipe.  This module completes that story
TPU-style: a small utterance classifier whose first layer is any of the
learnable frontends in :mod:`speech_tpu.nn` (folded-STFT, LEAF-style Gabor,
SincNet-style band edges), expressed as pure ``init``/``apply`` pytree
modules so the whole model jits, vmaps, differentiates end to end, and
shards over a :class:`jax.sharding.Mesh` with data parallelism coming from
batch-axis sharding alone (no hand-written collectives — XLA inserts the
gradient ``psum`` under ``jit``).

Design notes (TPU-first):

- The encoder is a stack of strided 1-D convolutions over the frame axis
  (``lax.conv_general_dilated`` in ``NWC`` layout) — time-strided convs keep
  the MXU busy at every stage and shrink the frame axis geometrically, so
  the whole network is a handful of large matmul-shaped ops rather than a
  per-frame loop.
- Ragged batches stay static-shaped: padded feature rows are zero-masked
  before the encoder and the final pooling divides by the *valid*
  (stride-propagated) frame count, so padding never leaks into the logits
  and every program is fixed-shape under ``jit``.
- The frontend can be frozen (``train_frontend=False``) via
  ``lax.stop_gradient`` — the classifier then trains on fixed features
  without a second code path.
"""

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ._common import (
    SlidingWindowStream,
    he_conv_init,
    make_train_step as _make_train_step,
    masked_conv_block,
    valid_mask,
)

__all__ = [
    "ConvClassifier",
    "KWSModel",
    "StreamingKWS",
    "make_train_step",
    "save_params",
    "load_params",
]


def _frontend_dim(frontend) -> int:
    """Feature dimension produced by a :mod:`speech_tpu.nn` frontend."""
    dim = getattr(frontend, "num_coeffs", None)
    if dim is None:
        dim = getattr(frontend, "num_filts", None)
    if dim is None:
        raise ValueError(
            "frontend exposes neither num_coeffs nor num_filts; pass "
            "feature_dim explicitly"
        )
    return int(dim)


class ConvClassifier:
    """Strided 1-D conv encoder + masked mean pool + linear head.

    Functional module: ``params = clf.init(rng)``;
    ``logits = clf.apply(params, feats, num_frames)`` with ``feats``
    shaped ``(batch, max_frames, feature_dim)``.

    Parameters
    ----------
    feature_dim
        Input feature dimension (frontend coefficients per frame).
    num_classes
        Output logit count.
    channels
        Output channels of each conv block.
    kernel_width
        Temporal kernel width shared by all blocks.
    strides
        Temporal stride per block (defaults to 2 for every block).
    dtype
        Parameter / activation dtype.
    """

    def __init__(
        self,
        feature_dim: int,
        num_classes: int,
        channels: Sequence[int] = (64, 64),
        kernel_width: int = 5,
        strides: Optional[Sequence[int]] = None,
        dtype=jnp.float32,
    ):
        if num_classes < 2:
            raise ValueError(f"num_classes must be >= 2, got {num_classes}")
        if kernel_width < 1:
            raise ValueError(f"kernel_width must be >= 1, got {kernel_width}")
        self.feature_dim = int(feature_dim)
        self.num_classes = int(num_classes)
        self.channels = tuple(int(c) for c in channels)
        if strides is None:
            strides = (2,) * len(self.channels)
        self.strides = tuple(int(s) for s in strides)
        if len(self.strides) != len(self.channels):
            raise ValueError(
                f"strides ({len(self.strides)}) and channels "
                f"({len(self.channels)}) must have equal length"
            )
        if any(s < 1 for s in self.strides):
            raise ValueError(f"strides must be >= 1, got {self.strides}")
        self.kernel_width = int(kernel_width)
        self.dtype = dtype

    def init(self, rng) -> dict:
        """He-normal conv kernels, zero biases, zero head."""
        params = {}
        fan_in_dim = self.feature_dim
        for i, out_c in enumerate(self.channels):
            rng, sub = jax.random.split(rng)
            params[f"conv{i}"] = he_conv_init(
                sub, self.kernel_width, fan_in_dim, out_c, self.dtype
            )
            fan_in_dim = out_c
        # zero head: initial logits are exactly uniform, a cheap guarantee
        # that early training signal comes from the loss, not the init
        params["head"] = {
            "w": jnp.zeros((fan_in_dim, self.num_classes), dtype=self.dtype),
            "b": jnp.zeros((self.num_classes,), dtype=self.dtype),
        }
        return params

    def out_frames(self, num_frames):
        """Valid frame count after all strides (``SAME`` padding: ceil)."""
        for s in self.strides:
            num_frames = -(-num_frames // s)
        return num_frames

    def apply(self, params: dict, feats, num_frames=None):
        """Logits ``(batch, num_classes)`` for ``(batch, T, F)`` features.

        ``num_frames`` are the valid per-example frame counts; rows at or
        past a count are zeroed before the encoder and excluded from the
        mean pool, so padded rows cannot influence the logits.
        """
        feats = jnp.asarray(feats, dtype=self.dtype)
        if feats.ndim != 3:
            raise ValueError(f"feats must be (batch, T, F), got {feats.shape}")
        total = feats.shape[1]
        if num_frames is None:
            num_frames = jnp.full(feats.shape[:1], total, dtype=jnp.int32)
        x = jnp.where(valid_mask(total, num_frames)[..., None], feats, 0)
        valid = num_frames
        for i, stride in enumerate(self.strides):
            x, valid = masked_conv_block(
                x, params[f"conv{i}"], valid, stride=stride
            )
        # masked mean pool over the surviving frame axis
        denom = jnp.maximum(valid, 1).astype(x.dtype)[:, None]
        pooled = jnp.sum(x, axis=1) / denom
        head = params["head"]
        return pooled @ head["w"] + head["b"]


class KWSModel:
    """A frontend + :class:`ConvClassifier`, trained end to end.

    ``frontend`` is any :mod:`speech_tpu.nn` module with the
    ``init() -> (params, consts)`` / ``apply(params, consts, signals,
    lengths)`` / ``frame_counts(lengths)`` contract
    (:class:`~speech_tpu.nn.STFTFrontend`,
    :class:`~speech_tpu.nn.GaborFrontend`,
    :class:`~speech_tpu.nn.SincFrontend`).

    Functional module::

        model = KWSModel(frontend, num_classes=10)
        params, consts = model.init(jax.random.PRNGKey(0))
        logits = model.apply(params, consts, signals, lengths)

    ``params`` is ``{"frontend": ..., "classifier": ...}``; set
    ``train_frontend=False`` to freeze the frontend leaves (their gradient
    is exactly zero via ``stop_gradient``).
    """

    def __init__(
        self,
        frontend,
        num_classes: int,
        channels: Sequence[int] = (64, 64),
        kernel_width: int = 5,
        strides: Optional[Sequence[int]] = None,
        train_frontend: bool = True,
        dtype=None,
    ):
        self.frontend = frontend
        self.train_frontend = bool(train_frontend)
        self.dtype = dtype if dtype is not None else frontend.dtype
        self.classifier = ConvClassifier(
            _frontend_dim(frontend),
            num_classes,
            channels=channels,
            kernel_width=kernel_width,
            strides=strides,
            dtype=self.dtype,
        )

    @property
    def num_classes(self) -> int:
        return self.classifier.num_classes

    def init(self, rng) -> Tuple[dict, dict]:
        f_params, consts = self.frontend.init()
        c_params = self.classifier.init(rng)
        return {"frontend": f_params, "classifier": c_params}, consts

    def apply(self, params: dict, consts: dict, signals, lengths=None):
        """Logits ``(batch, num_classes)`` for padded ``(batch, S)`` signals."""
        signals = jnp.asarray(signals, dtype=self.dtype)
        if lengths is None:
            lengths = jnp.full(
                signals.shape[:-1], signals.shape[-1], dtype=jnp.int32
            )
        f_params = params["frontend"]
        if not self.train_frontend:
            f_params = jax.lax.stop_gradient(f_params)
        feats = self.frontend.apply(f_params, consts, signals, lengths)
        counts = self.frontend.frame_counts(lengths)
        return self.classifier.apply(params["classifier"], feats, counts)

    def loss(self, params: dict, consts: dict, signals, lengths, labels):
        """Mean softmax cross-entropy plus accuracy, as ``(loss, aux)``."""
        logits = self.apply(params, consts, signals, lengths)
        labels = jnp.asarray(labels, dtype=jnp.int32)
        log_p = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(log_p, labels[:, None], axis=-1)[:, 0]
        loss = jnp.mean(nll)
        acc = jnp.mean((jnp.argmax(logits, axis=-1) == labels).astype(log_p.dtype))
        return loss, {"accuracy": acc, "logits": logits}


class StreamingKWS(SlidingWindowStream):
    """Online sliding-window scoring of a trained :class:`KWSModel`.

    The trained STFT frontend is baked into a host computer
    (:meth:`~speech_tpu.nn.STFTFrontend.export_computer`) whose jittable
    :class:`~speech_tpu.streaming.StreamingSTFT` emits features chunk by
    chunk; a ring of the last ``window_frames`` frames is re-scored by the
    conv classifier on every tick — the standard low-latency keyword-
    spotting deployment.  Once ``window_frames`` covers the whole
    utterance the finalize-tick logits equal ``model.apply`` on the full
    signal to roundoff (the window-W and batch-T mean-pool/GEMM reductions
    group differently; ~1e-9 in f64).  See
    :class:`~speech_tpu.models._common.SlidingWindowStream` for the tick
    mechanics and the :class:`~speech_tpu.serve.StreamPool` contract
    (``StreamPool(skws, slots=N)`` serves N concurrent sessions).

    Streaming deployment requires a frontend that can be baked back into a
    host computer (``export_computer``) — i.e. :class:`~speech_tpu.nn.
    STFTFrontend`; the Gabor/Sinc frontends train in :class:`KWSModel` but
    have no streaming export.

    Example::

        skws = StreamingKWS(model, params, window_frames=100,
                            chunk_size=1600)
        state = skws.init_state()
        for chunk in chunks:                    # (1600,) each
            state, logits = skws.process(state, chunk)
        logits = skws.finalize(state)           # flushes the stream tail
    """

    def __init__(
        self,
        model: KWSModel,
        params: dict,
        *,
        window_frames: int,
        chunk_size: int,
    ):
        if not hasattr(model.frontend, "export_computer"):
            raise ValueError(
                "StreamingKWS needs a frontend with export_computer (an "
                "STFTFrontend); "
                f"{type(model.frontend).__name__} has no streaming export"
            )
        self.model = model
        self._clf_params = params["classifier"]
        super().__init__(
            model.frontend.export_computer(params["frontend"]),
            window_frames=window_frames,
            chunk_size=chunk_size,
            dtype=model.dtype,
        )
        if self.num_coeffs != model.classifier.feature_dim:
            raise ValueError(
                f"classifier expects {model.classifier.feature_dim} "
                f"coefficients, computer produces {self.num_coeffs}"
            )

    def _score(self, window, v):
        return self.model.classifier.apply(
            self._clf_params, window[None], v[None]
        )[0]


# the jitted optimizer step is generic across families; see models._common
make_train_step = _make_train_step


def _flatten(tree: dict, prefix: str = ""):
    for key, val in tree.items():
        path = f"{prefix}{key}"
        if isinstance(val, dict):
            yield from _flatten(val, path + "/")
        else:
            yield path, val


def save_params(wfilename: str, params: dict) -> None:
    """Checkpoint a (possibly nested) params dict to one ``.npz`` file."""
    np.savez(
        wfilename, **{k: np.asarray(v) for k, v in _flatten(params)}
    )


def load_params(rfilename: str, dtype=None) -> dict:
    """Load a checkpoint saved by :func:`save_params` (nested dict back)."""
    out: dict = {}
    with np.load(rfilename) as data:
        for path in data.files:
            node = out
            *parents, leaf = path.split("/")
            for part in parents:
                node = node.setdefault(part, {})
            arr = data[path]
            node[leaf] = jnp.asarray(
                arr, dtype=dtype if dtype is not None else arr.dtype
            )
    return out
