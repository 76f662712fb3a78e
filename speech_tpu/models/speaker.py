"""Speaker-embedding model family: frontend -> TDNN -> stats pool -> embed.

The reference ships feature extraction only (its torch layer exposes the
computer's weights as trainable leaves, reference torch.py:238-432, but no
downstream network).  This module adds the canonical speaker-verification
recipe on top of any :mod:`speech_tpu.nn` frontend: an x-vector-style TDNN
encoder (Snyder et al. 2018) over the frame axis, masked statistics pooling
(mean + std over valid frames), a linear embedding layer, and an
additive-angular-margin softmax (ArcFace, Deng et al. 2019) training head —
the standard modern speaker-ID objective.

Design notes (TPU-first):

- The TDNN layers are dilated stride-1 1-D convolutions in ``NWC`` layout —
  each layer is one MXU-shaped ``conv_general_dilated`` call over the whole
  padded batch; there is no per-frame or per-utterance Python loop.
- Ragged batches stay static-shaped: every layer re-zeros rows at or past
  the valid frame count, and the pooling moments divide by the valid count,
  so padding can never leak into an embedding (tested by re-padding
  invariance).  Explicit length-independent conv padding keeps
  ``out[j]`` centered at ``in[j]`` for any buffer length.
- The whole model is pure ``init``/``apply`` pytrees: it jits, vmaps,
  differentiates end to end, and data-parallelizes by batch-axis sharding
  alone (XLA inserts the gradient ``psum``).
- The AAM head's trig is computed from the cosine directly
  (``sin = sqrt(1 - cos^2)``) — no ``arccos``/``cos`` round trip, which on
  TPU would route through less-accurate transcendental approximations.
"""

import math

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ._common import (
    SlidingWindowStream,
    he_conv_init,
    make_train_step as _make_train_step,
    masked_conv_block,
    valid_mask,
)
from .kws import _frontend_dim, load_params, save_params  # noqa: F401

__all__ = [
    "TDNNEncoder",
    "SpeakerModel",
    "StreamingSpeaker",
    "aam_softmax_loss",
    "cosine_scores",
    "make_train_step",
]


class TDNNEncoder:
    """Dilated stride-1 conv stack over frames, with valid-length masking.

    Functional module: ``params = enc.init(rng)``;
    ``hidden = enc.apply(params, feats, num_frames)`` maps
    ``(batch, T, feature_dim)`` to ``(batch, T, channels[-1])``.

    Parameters
    ----------
    feature_dim
        Input feature dimension.
    channels
        Output channels per layer.
    kernel_widths
        Temporal kernel width per layer (1 = a frame-wise dense layer).
    dilations
        Temporal dilation per layer (defaults to 1 everywhere).
    """

    def __init__(
        self,
        feature_dim: int,
        channels: Sequence[int] = (128, 128, 128),
        kernel_widths: Sequence[int] = (5, 3, 1),
        dilations: Optional[Sequence[int]] = None,
        dtype=jnp.float32,
    ):
        self.feature_dim = int(feature_dim)
        self.channels = tuple(int(c) for c in channels)
        self.kernel_widths = tuple(int(k) for k in kernel_widths)
        if dilations is None:
            dilations = (1,) * len(self.channels)
        self.dilations = tuple(int(d) for d in dilations)
        if not (
            len(self.channels)
            == len(self.kernel_widths)
            == len(self.dilations)
        ):
            raise ValueError(
                "channels, kernel_widths and dilations must have equal "
                f"lengths, got {len(self.channels)}, "
                f"{len(self.kernel_widths)}, {len(self.dilations)}"
            )
        if any(k < 1 for k in self.kernel_widths):
            raise ValueError(f"kernel widths must be >= 1: {self.kernel_widths}")
        if any(d < 1 for d in self.dilations):
            raise ValueError(f"dilations must be >= 1: {self.dilations}")
        self.dtype = dtype

    def init(self, rng) -> dict:
        """He-normal conv kernels, zero biases."""
        params = {}
        fan_in_dim = self.feature_dim
        for i, (out_c, k) in enumerate(zip(self.channels, self.kernel_widths)):
            rng, sub = jax.random.split(rng)
            params[f"tdnn{i}"] = he_conv_init(
                sub, k, fan_in_dim, out_c, self.dtype
            )
            fan_in_dim = out_c
        return params

    def apply(self, params: dict, feats, num_frames=None):
        """Frame-level activations, padded rows zeroed at every layer."""
        x = jnp.asarray(feats, dtype=self.dtype)
        if x.ndim != 3:
            raise ValueError(f"feats must be (batch, T, F), got {x.shape}")
        total = x.shape[1]
        if num_frames is None:
            num_frames = jnp.full(x.shape[:1], total, dtype=jnp.int32)
        x = jnp.where(valid_mask(total, num_frames)[..., None], x, 0)
        for i, (_, d) in enumerate(zip(self.kernel_widths, self.dilations)):
            x, num_frames = masked_conv_block(
                x, params[f"tdnn{i}"], num_frames, dilation=d
            )
        return x


def _stats_pool(hidden, num_frames, eps):
    """Masked mean + std over the frame axis -> ``(batch, 2*C)``."""
    denom = jnp.maximum(num_frames, 1).astype(hidden.dtype)[:, None]
    mean = jnp.sum(hidden, axis=1) / denom
    # rows past the count are zero, so subtract the mean only on valid rows
    mask = valid_mask(hidden.shape[1], num_frames)[..., None]
    centered = jnp.where(mask, hidden - mean[:, None, :], 0)
    var = jnp.sum(centered * centered, axis=1) / denom
    std = jnp.sqrt(var + eps)
    return jnp.concatenate([mean, std], axis=-1)


class SpeakerModel:
    """A frontend + :class:`TDNNEncoder` + stats pooling + linear embedding.

    ``frontend`` is any :mod:`speech_tpu.nn` module with the
    ``init() -> (params, consts)`` / ``apply(params, consts, signals,
    lengths)`` / ``frame_counts(lengths)`` contract.

    Functional module::

        model = SpeakerModel(frontend, num_speakers=1000, embed_dim=192)
        params, consts = model.init(jax.random.PRNGKey(0))
        emb = model.embed(params, consts, signals, lengths)   # (B, 192)
        loss, aux = model.loss(params, consts, signals, lengths, labels)

    ``params`` carries ``{"frontend", "encoder", "embed", "head"}``;
    ``head`` is the AAM class-weight matrix, used only by :meth:`loss` —
    inference needs just the embedding stack.  ``train_frontend=False``
    freezes the frontend leaves via ``stop_gradient``.
    """

    def __init__(
        self,
        frontend,
        num_speakers: int,
        embed_dim: int = 192,
        channels: Sequence[int] = (128, 128, 128),
        kernel_widths: Sequence[int] = (5, 3, 1),
        dilations: Optional[Sequence[int]] = None,
        margin: float = 0.2,
        scale: float = 30.0,
        train_frontend: bool = True,
        eps: float = 1e-6,
        dtype=None,
    ):
        if num_speakers < 2:
            raise ValueError(f"num_speakers must be >= 2, got {num_speakers}")
        if embed_dim < 1:
            raise ValueError(f"embed_dim must be >= 1, got {embed_dim}")
        if not 0.0 <= margin < math.pi / 2:
            raise ValueError(f"margin must be in [0, pi/2), got {margin}")
        if scale <= 0.0:
            raise ValueError(f"scale must be positive, got {scale}")
        self.frontend = frontend
        self.train_frontend = bool(train_frontend)
        self.dtype = dtype if dtype is not None else frontend.dtype
        self.num_speakers = int(num_speakers)
        self.embed_dim = int(embed_dim)
        self.margin = float(margin)
        self.scale = float(scale)
        self.eps = float(eps)
        self.encoder = TDNNEncoder(
            _frontend_dim(frontend),
            channels=channels,
            kernel_widths=kernel_widths,
            dilations=dilations,
            dtype=self.dtype,
        )

    def init(self, rng) -> Tuple[dict, dict]:
        f_params, consts = self.frontend.init()
        rng, enc_rng, emb_rng, head_rng = jax.random.split(rng, 4)
        pooled_dim = 2 * self.encoder.channels[-1]
        emb_w = jax.random.normal(
            emb_rng, (pooled_dim, self.embed_dim), dtype=self.dtype
        ) * jnp.asarray(math.sqrt(1.0 / pooled_dim), dtype=self.dtype)
        head_w = jax.random.normal(
            head_rng, (self.embed_dim, self.num_speakers), dtype=self.dtype
        ) * jnp.asarray(math.sqrt(1.0 / self.embed_dim), dtype=self.dtype)
        params = {
            "frontend": f_params,
            "encoder": self.encoder.init(enc_rng),
            "embed": {
                "w": emb_w,
                "b": jnp.zeros((self.embed_dim,), dtype=self.dtype),
            },
            "head": {"w": head_w},
        }
        return params, consts

    def embed(self, params: dict, consts: dict, signals, lengths=None):
        """Speaker embeddings ``(batch, embed_dim)`` (not length-normalized)."""
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
        hidden = self.encoder.apply(params["encoder"], feats, counts)
        pooled = _stats_pool(hidden, counts, self.eps)
        emb = params["embed"]
        return pooled @ emb["w"] + emb["b"]

    def loss(self, params: dict, consts: dict, signals, lengths, labels):
        """Mean AAM-softmax loss plus accuracy, as ``(loss, aux)``.

        The accuracy is computed on the *unpenalized* cosine logits — the
        margin-penalized logits depress the target column, so their argmax
        underreports true classification accuracy.
        """
        embeddings = self.embed(params, consts, signals, lengths)
        labels = jnp.asarray(labels, dtype=jnp.int32)
        loss, _ = aam_softmax_loss(
            embeddings,
            params["head"]["w"],
            labels,
            margin=self.margin,
            scale=self.scale,
            eps=self.eps,
        )
        cos = _normalized_cos(embeddings, params["head"]["w"], self.eps)
        acc = jnp.mean(
            (jnp.argmax(cos, axis=-1) == labels).astype(cos.dtype)
        )
        return loss, {"accuracy": acc, "embeddings": embeddings}


class StreamingSpeaker(SlidingWindowStream):
    """Online speaker embedding over a sliding window of recent frames.

    The trained STFT frontend is exported to a host computer and streamed
    chunk by chunk; every tick re-embeds the last ``window_frames`` frames
    through the TDNN + stats pooling + embedding stack — the standard
    online speaker-tracking / diarization deployment.  Once
    ``window_frames`` covers the whole utterance the finalize-tick
    embedding equals :meth:`SpeakerModel.embed` on the full signal to
    roundoff.  See :class:`~speech_tpu.models._common.SlidingWindowStream`
    for the tick mechanics and the :class:`~speech_tpu.serve.StreamPool`
    contract (``StreamPool(stream, slots=N)`` tracks N concurrent
    sessions).

    Example::

        ss = StreamingSpeaker(model, params, window_frames=300,
                              chunk_size=1600)
        state = ss.init_state()
        for chunk in chunks:
            state, emb = ss.process(state, chunk)    # rolling embedding
        emb = ss.finalize(state)
    """

    def __init__(
        self,
        model: SpeakerModel,
        params: dict,
        *,
        window_frames: int,
        chunk_size: int,
    ):
        if not hasattr(model.frontend, "export_computer"):
            raise ValueError(
                "StreamingSpeaker needs a frontend with export_computer "
                "(an STFTFrontend); "
                f"{type(model.frontend).__name__} has no streaming export"
            )
        self.model = model
        self._params = params
        super().__init__(
            model.frontend.export_computer(params["frontend"]),
            window_frames=window_frames,
            chunk_size=chunk_size,
            dtype=model.dtype,
        )
        if self.num_coeffs != model.encoder.feature_dim:
            raise ValueError(
                f"encoder expects {model.encoder.feature_dim} "
                f"coefficients, computer produces {self.num_coeffs}"
            )

    def _score(self, window, v):
        hidden = self.model.encoder.apply(
            self._params["encoder"], window[None], v[None]
        )
        pooled = _stats_pool(hidden, v[None], self.model.eps)
        emb = self._params["embed"]
        return (pooled @ emb["w"] + emb["b"])[0]


def _normalized_cos(embeddings, class_weights, eps: float):
    """Cosine logits between L2-normalized embeddings and class columns."""
    emb_n = embeddings / jnp.maximum(
        jnp.linalg.norm(embeddings, axis=-1, keepdims=True), eps
    )
    w_n = class_weights / jnp.maximum(
        jnp.linalg.norm(class_weights, axis=0, keepdims=True), eps
    )
    return emb_n @ w_n  # (B, num_speakers)


def aam_softmax_loss(
    embeddings,
    class_weights,
    labels,
    margin: float = 0.2,
    scale: float = 30.0,
    eps: float = 1e-6,
):
    """Additive-angular-margin softmax (ArcFace) over L2-normalized vectors.

    The target class's cosine similarity is replaced by ``cos(theta + m)``
    wherever that stays monotone (``theta + m < pi``, the standard ArcFace
    guard: past it the penalized logit falls back to ``cos - m*sin(m)``,
    which is continuous and still strictly below ``cos``); all logits are
    then scaled by ``s`` and fed to softmax cross-entropy.

    Returns ``(mean_loss, penalized_logits)``.
    """
    cos = _normalized_cos(embeddings, class_weights, eps)
    labels = jnp.asarray(labels, dtype=jnp.int32)
    one_hot = jax.nn.one_hot(labels, cos.shape[-1], dtype=cos.dtype)
    # the 1e-12 floor keeps the sqrt's gradient finite when a cosine
    # rounds to exactly +/-1 (an embedding converged onto its class
    # weight): sqrt-at-0 has an infinite derivative that the where
    # branches downstream cannot mask (0 * inf = NaN in the VJP), and one
    # such example would NaN the whole batch gradient
    sin = jnp.sqrt(jnp.maximum(1.0 - cos * cos, 1e-12))
    cos_m = math.cos(margin)
    sin_m = math.sin(margin)
    phi = cos * cos_m - sin * sin_m  # cos(theta + m)
    # monotonicity guard: theta + m <= pi  <=>  cos(theta) >= cos(pi - m)
    phi = jnp.where(cos > -cos_m, phi, cos - margin * sin_m)
    logits = jnp.asarray(scale, cos.dtype) * jnp.where(one_hot > 0, phi, cos)
    log_p = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_p, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll), logits


def cosine_scores(emb_a, emb_b, eps: float = 1e-6):
    """Pairwise cosine scores ``(A, B)`` between two embedding batches."""
    emb_a = jnp.asarray(emb_a)
    emb_b = jnp.asarray(emb_b)
    a_n = emb_a / jnp.maximum(
        jnp.linalg.norm(emb_a, axis=-1, keepdims=True), eps
    )
    b_n = emb_b / jnp.maximum(
        jnp.linalg.norm(emb_b, axis=-1, keepdims=True), eps
    )
    return a_n @ b_n.T


# the jitted optimizer step is generic across families; see models._common
make_train_step = _make_train_step
