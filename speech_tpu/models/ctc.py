"""CTC acoustic-model family: frontend -> conv subsample -> transformer -> CTC.

The reference is a feature-extraction library; its docs position the output
as "suitable for feeding into acoustic models" but it ships none.  This
module closes that loop with the standard modern recipe: any
:mod:`speech_tpu.nn` trainable frontend, strided conv subsampling, a stack
of pre-LN transformer encoder blocks, and a CTC head trained with
:func:`optax.ctc_loss` (blank id 0) — i.e. a compact
conformer/transformer-CTC-style acoustic model, expressed as pure
``init``/``apply`` pytrees that jit, vmap, differentiate, and shard over a
:class:`jax.sharding.Mesh`.

Design notes (TPU-first):

- Everything is matmul-shaped: the subsampler is two strided
  ``conv_general_dilated`` calls, attention and FFN are einsums over the
  whole padded batch — no per-frame or per-utterance Python loops, and all
  shapes are static under ``jit``.
- Ragged batches stay padding-proof: the subsampler re-zeros rows past the
  stride-propagated valid count, attention adds a large negative bias on
  padded *keys* (queries at padded rows are garbage but re-zeroed), and the
  CTC loss receives explicit per-frame paddings — so logits on valid frames
  are invariant to how far the batch was padded (tested).
- Tensor parallelism is one sharding annotation away: attention heads and
  FFN hidden units are both pure feature-axis dimensions; shard
  ``wq/wk/wv`` on the head axis and ``ffn w1/w2`` on the hidden axis over a
  "model" mesh axis and XLA inserts the collectives (the multichip dryrun
  exercises exactly that).
"""

import math

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ._common import (
    he_conv_init,
    make_train_step as _make_train_step,
    masked_conv_block,
    valid_mask,
)
from .kws import _frontend_dim, load_params, save_params  # noqa: F401

__all__ = [
    "TransformerEncoder",
    "CTCModel",
    "greedy_decode",
    "beam_search_decode",
    "make_train_step",
]


def _norm(params, x, eps=1e-6):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return params["g"] * (x - mean) * jax.lax.rsqrt(var + eps) + params["b"]


def _sinusoid_posenc(max_len: int, dim: int, dtype):
    """Fixed sinusoidal positions (Vaswani et al. 2017), host-precomputed."""
    pos = np.arange(max_len)[:, None].astype(np.float64)
    half = (dim + 1) // 2
    inv = np.exp(-math.log(10000.0) * np.arange(half) / max(half - 1, 1))
    ang = pos * inv[None, :]
    enc = np.zeros((max_len, dim))
    enc[:, 0::2] = np.sin(ang)[:, : enc[:, 0::2].shape[1]]
    enc[:, 1::2] = np.cos(ang)[:, : enc[:, 1::2].shape[1]]
    return jnp.asarray(enc, dtype=dtype)


class TransformerEncoder:
    """Pre-LN transformer encoder stack with key-side padding masks.

    Functional module: ``params = enc.init(rng)``;
    ``hidden = enc.apply(params, x, num_frames)`` maps
    ``(batch, T, model_dim)`` to the same shape, with rows at or past the
    valid count zeroed on output.
    """

    def __init__(
        self,
        model_dim: int,
        num_layers: int = 2,
        num_heads: int = 4,
        ffn_dim: Optional[int] = None,
        max_len: int = 4096,
        dtype=jnp.float32,
    ):
        if model_dim % num_heads:
            raise ValueError(
                f"model_dim ({model_dim}) must divide by num_heads "
                f"({num_heads})"
            )
        if num_layers < 1:
            raise ValueError(f"num_layers must be >= 1, got {num_layers}")
        self.model_dim = int(model_dim)
        self.num_layers = int(num_layers)
        self.num_heads = int(num_heads)
        self.head_dim = self.model_dim // self.num_heads
        self.ffn_dim = int(ffn_dim) if ffn_dim is not None else 4 * model_dim
        self.max_len = int(max_len)
        self.dtype = dtype

    def init(self, rng) -> dict:
        d, h, hd, f = (
            self.model_dim,
            self.num_heads,
            self.head_dim,
            self.ffn_dim,
        )
        params = {}
        for i in range(self.num_layers):
            keys = jax.random.split(jax.random.fold_in(rng, i), 6)
            scale_d = math.sqrt(1.0 / d)
            scale_f = math.sqrt(1.0 / f)
            params[f"layer{i}"] = {
                "ln1": {
                    "g": jnp.ones((d,), self.dtype),
                    "b": jnp.zeros((d,), self.dtype),
                },
                "ln2": {
                    "g": jnp.ones((d,), self.dtype),
                    "b": jnp.zeros((d,), self.dtype),
                },
                "wq": jax.random.normal(keys[0], (d, h, hd), self.dtype)
                * scale_d,
                "wk": jax.random.normal(keys[1], (d, h, hd), self.dtype)
                * scale_d,
                "wv": jax.random.normal(keys[2], (d, h, hd), self.dtype)
                * scale_d,
                "wo": jax.random.normal(keys[3], (h, hd, d), self.dtype)
                * scale_d,
                "ffn1": {
                    "w": jax.random.normal(keys[4], (d, f), self.dtype)
                    * scale_d,
                    "b": jnp.zeros((f,), self.dtype),
                },
                "ffn2": {
                    "w": jax.random.normal(keys[5], (f, d), self.dtype)
                    * scale_f,
                    "b": jnp.zeros((d,), self.dtype),
                },
            }
        params["ln_out"] = {
            "g": jnp.ones((d,), self.dtype),
            "b": jnp.zeros((d,), self.dtype),
        }
        return params

    def apply(self, params: dict, x, num_frames=None):
        x = jnp.asarray(x, dtype=self.dtype)
        if x.ndim != 3 or x.shape[-1] != self.model_dim:
            raise ValueError(
                f"x must be (batch, T, {self.model_dim}), got {x.shape}"
            )
        total = x.shape[1]
        if total > self.max_len:
            raise ValueError(
                f"sequence length {total} exceeds max_len {self.max_len}"
            )
        if num_frames is None:
            num_frames = jnp.full(x.shape[:1], total, dtype=jnp.int32)
        frame_ok = (
            jnp.arange(total, dtype=jnp.int32)[None, :]
            < num_frames[:, None]
        )
        x = jnp.where(frame_ok[..., None], x, 0)
        x = x + _sinusoid_posenc(total, self.model_dim, self.dtype)[None]
        # additive key-side bias: padded keys never receive attention mass
        neg = jnp.asarray(-1e9 if self.dtype != jnp.float64 else -1e300,
                          self.dtype)
        key_bias = jnp.where(frame_ok, 0, neg)[:, None, None, :]
        inv_sqrt = jnp.asarray(1.0 / math.sqrt(self.head_dim), self.dtype)
        for i in range(self.num_layers):
            lyr = params[f"layer{i}"]
            h = _norm(lyr["ln1"], x)
            q = jnp.einsum("btd,dhk->bhtk", h, lyr["wq"])
            k = jnp.einsum("btd,dhk->bhtk", h, lyr["wk"])
            v = jnp.einsum("btd,dhk->bhtk", h, lyr["wv"])
            scores = jnp.einsum("bhtk,bhsk->bhts", q, k) * inv_sqrt
            attn = jax.nn.softmax(scores + key_bias, axis=-1)
            ctx = jnp.einsum("bhts,bhsk->bhtk", attn, v)
            x = x + jnp.einsum("bhtk,hkd->btd", ctx, lyr["wo"])
            h = _norm(lyr["ln2"], x)
            h = jax.nn.relu(h @ lyr["ffn1"]["w"] + lyr["ffn1"]["b"])
            x = x + (h @ lyr["ffn2"]["w"] + lyr["ffn2"]["b"])
        x = _norm(params["ln_out"], x)
        return jnp.where(frame_ok[..., None], x, 0)


class CTCModel:
    """Frontend + conv subsampling + :class:`TransformerEncoder` + CTC head.

    ``vocab_size`` counts real symbols; the blank is id 0 and the head emits
    ``vocab_size + 1`` logits.  ``frontend`` is any :mod:`speech_tpu.nn`
    module with the ``init/apply/frame_counts`` contract.

    Functional module::

        model = CTCModel(frontend, vocab_size=28, model_dim=128)
        params, consts = model.init(jax.random.PRNGKey(0))
        log_probs, counts = model.apply(params, consts, signals, lengths)
        loss, aux = model.loss(params, consts, signals, lengths,
                               labels, label_lengths)

    ``labels`` are ``(batch, max_label_len)`` int32 with ids in
    ``[1, vocab_size]`` (0 is the blank, never a label).
    """

    def __init__(
        self,
        frontend,
        vocab_size: int,
        model_dim: int = 128,
        num_layers: int = 2,
        num_heads: int = 4,
        ffn_dim: Optional[int] = None,
        subsample_strides: Sequence[int] = (2, 2),
        subsample_width: int = 3,
        max_len: int = 4096,
        train_frontend: bool = True,
        dtype=None,
    ):
        if vocab_size < 1:
            raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
        if any(s < 1 for s in subsample_strides):
            raise ValueError(
                f"subsample strides must be >= 1: {subsample_strides}"
            )
        if subsample_width < 1:
            raise ValueError(
                f"subsample_width must be >= 1, got {subsample_width}"
            )
        self.frontend = frontend
        self.train_frontend = bool(train_frontend)
        self.dtype = dtype if dtype is not None else frontend.dtype
        self.vocab_size = int(vocab_size)
        self.subsample_strides = tuple(int(s) for s in subsample_strides)
        self.subsample_width = int(subsample_width)
        self.encoder = TransformerEncoder(
            model_dim,
            num_layers=num_layers,
            num_heads=num_heads,
            ffn_dim=ffn_dim,
            max_len=max_len,
            dtype=self.dtype,
        )

    def init(self, rng) -> Tuple[dict, dict]:
        f_params, consts = self.frontend.init()
        rng, enc_rng = jax.random.split(rng)
        d = self.encoder.model_dim
        sub = {}
        fan_in_dim = _frontend_dim(self.frontend)
        for i, _ in enumerate(self.subsample_strides):
            rng, key = jax.random.split(rng)
            sub[f"conv{i}"] = he_conv_init(
                key, self.subsample_width, fan_in_dim, d, self.dtype
            )
            fan_in_dim = d
        params = {
            "frontend": f_params,
            "subsample": sub,
            "encoder": self.encoder.init(enc_rng),
            "head": {
                # zero head: initial output is the uniform distribution
                "w": jnp.zeros((d, self.vocab_size + 1), dtype=self.dtype),
                "b": jnp.zeros((self.vocab_size + 1,), dtype=self.dtype),
            },
        }
        return params, consts

    def out_frame_counts(self, lengths):
        """Valid encoder frame counts for signal sample ``lengths``."""
        counts = self.frontend.frame_counts(lengths)
        for s in self.subsample_strides:
            counts = -(-counts // s)
        return counts

    def apply(self, params: dict, consts: dict, signals, lengths=None):
        """``(log_probs, counts)``: ``(B, T', vocab+1)`` and valid frames."""
        signals = jnp.asarray(signals, dtype=self.dtype)
        if lengths is None:
            lengths = jnp.full(
                signals.shape[:-1], signals.shape[-1], dtype=jnp.int32
            )
        f_params = params["frontend"]
        if not self.train_frontend:
            f_params = jax.lax.stop_gradient(f_params)
        x = self.frontend.apply(f_params, consts, signals, lengths)
        valid = self.frontend.frame_counts(lengths)
        x = jnp.where(
            valid_mask(x.shape[1], valid)[..., None], x.astype(self.dtype), 0
        )
        for i, stride in enumerate(self.subsample_strides):
            x, valid = masked_conv_block(
                x, params["subsample"][f"conv{i}"], valid, stride=stride
            )
        x = self.encoder.apply(params["encoder"], x, valid)
        head = params["head"]
        logits = x @ head["w"] + head["b"]
        return jax.nn.log_softmax(logits, axis=-1), valid

    def loss(
        self,
        params: dict,
        consts: dict,
        signals,
        lengths,
        labels,
        label_lengths,
    ):
        """Mean per-utterance CTC loss, as ``(loss, aux)``.

        ``aux`` carries the per-example losses, the frame-level
        ``log_probs`` and the valid frame ``counts`` (for decoding).
        """
        log_probs, counts = self.apply(params, consts, signals, lengths)
        labels = jnp.asarray(labels, dtype=jnp.int32)
        label_lengths = jnp.asarray(label_lengths, dtype=jnp.int32)
        t_idx = jnp.arange(log_probs.shape[1], dtype=jnp.int32)
        logit_pad = (t_idx[None, :] >= counts[:, None]).astype(
            log_probs.dtype
        )
        u_idx = jnp.arange(labels.shape[1], dtype=jnp.int32)
        label_pad = (u_idx[None, :] >= label_lengths[:, None]).astype(
            log_probs.dtype
        )
        per_ex = optax.ctc_loss(log_probs, logit_pad, labels, label_pad)
        loss = jnp.mean(per_ex)
        return loss, {
            "per_example": per_ex,
            "log_probs": log_probs,
            "counts": counts,
        }


def greedy_decode(log_probs, counts, blank_id: int = 0):
    """Best-path CTC decode: argmax, collapse repeats, strip blanks.

    Host-side helper (decoding is inherently ragged); returns a list of
    1-D int numpy arrays, one per batch row.
    """
    log_probs = np.asarray(log_probs)
    counts = np.asarray(counts)
    out = []
    best = log_probs.argmax(axis=-1)
    for row, count in zip(best, counts):
        row = row[: int(count)]
        keep = np.ones(len(row), dtype=bool)
        keep[1:] = row[1:] != row[:-1]
        row = row[keep]
        out.append(row[row != blank_id].astype(np.int64))
    return out


def _logsumexp2(a: float, b: float) -> float:
    if a == -math.inf:
        return b
    if b == -math.inf:
        return a
    hi, lo = (a, b) if a > b else (b, a)
    return hi + math.log1p(math.exp(lo - hi))


def beam_search_decode(
    log_probs, counts, beam_width: int = 8, blank_id: int = 0
):
    """CTC prefix beam search (Hannun et al. 2014), host-side.

    Merges all alignments of each label prefix by tracking separate
    blank-ending and non-blank-ending probabilities, so a prefix reachable
    through many paths outranks a single-best path — the standard
    improvement over :func:`greedy_decode`.  Exact for
    ``beam_width >= (num_labels + 1) ** T`` (tested against exhaustive
    path enumeration).

    Returns a list of ``(labels, log_prob)`` tuples, one per batch row,
    where ``labels`` is a 1-D int numpy array and ``log_prob`` is the total
    (path-summed) log probability of that label sequence.
    """
    if beam_width < 1:
        raise ValueError(f"beam_width must be >= 1, got {beam_width}")
    log_probs = np.asarray(log_probs, dtype=np.float64)
    counts = np.asarray(counts)
    out = []
    for row, count in zip(log_probs, counts):
        # beams: prefix tuple -> [log P(ends in blank), log P(ends in label)]
        beams = {(): [0.0, -math.inf]}
        for t in range(int(count)):
            frame = row[t]
            nxt: dict = {}
            for prefix, (p_b, p_nb) in beams.items():
                total = _logsumexp2(p_b, p_nb)
                # extend with blank: prefix unchanged, now blank-ending
                cell = nxt.setdefault(prefix, [-math.inf, -math.inf])
                cell[0] = _logsumexp2(cell[0], total + frame[blank_id])
                # repeat the last label WITHOUT a separating blank:
                # prefix unchanged, stays non-blank-ending
                if prefix:
                    last = prefix[-1]
                    cell[1] = _logsumexp2(cell[1], p_nb + frame[last])
                # extend with a new label
                for s in range(len(frame)):
                    if s == blank_id:
                        continue
                    ext = prefix + (s,)
                    cell = nxt.setdefault(ext, [-math.inf, -math.inf])
                    if prefix and s == prefix[-1]:
                        # same label again needs the blank separator:
                        # only blank-ending mass extends
                        cell[1] = _logsumexp2(cell[1], p_b + frame[s])
                    else:
                        cell[1] = _logsumexp2(cell[1], total + frame[s])
            beams = dict(
                sorted(
                    nxt.items(),
                    key=lambda kv: -_logsumexp2(*kv[1]),
                )[:beam_width]
            )
        best = max(
            beams.items(), key=lambda kv: _logsumexp2(*kv[1])
        )
        out.append(
            (
                np.asarray(best[0], dtype=np.int64),
                _logsumexp2(*best[1]),
            )
        )
    return out


# the jitted optimizer step is generic across families (the CTC batch is
# signals, lengths, labels, label_lengths); see models._common
make_train_step = _make_train_step
