"""Shared building blocks for the model families.

One home for the three invariants every family relies on, so they cannot
drift across copies:

- the length-independent explicit conv padding (logits/embeddings must be
  invariant to how far a batch was padded),
- per-layer re-zeroing of rows at or past the valid count,
- the generic jitted optimizer step (``value_and_grad`` -> ``tx.update`` ->
  ``apply_updates`` with donated params/opt-state buffers).
"""

import math

import jax
import jax.numpy as jnp
import optax

__all__ = [
    "valid_mask",
    "he_conv_init",
    "masked_conv_block",
    "make_train_step",
    "SlidingWindowStream",
]


class SlidingWindowStream:
    """Chunked frontend -> ring of the last ``window_frames`` frames ->
    a per-tick score over the masked window.

    The shared machinery behind online model deployment
    (:class:`~speech_tpu.models.kws.StreamingKWS` scores classifier
    logits; :class:`~speech_tpu.models.speaker.StreamingSpeaker` scores
    embeddings).  All shapes are static under ``jit``: the ring update and
    the window re-alignment are single contiguous ``dynamic_slice`` ops
    (TPU-friendly; no gathers), and fewer-than-window frames mask exactly
    like the batch path, so once ``window_frames`` covers the whole
    utterance the finalize-tick score equals the batch model on the full
    signal to roundoff.

    Subclasses implement ``_score(window, v) -> (K,)`` over one
    left-aligned ``(window_frames, num_coeffs)`` window with ``v`` valid
    leading rows.

    Also honors the :class:`~speech_tpu.serve.StreamPool` streamer
    contract (``init_state`` / ``_process_impl`` / ``_finalize_impl``
    with valid-0 bitwise no-op steps), so ``StreamPool(stream, slots=N)``
    multiplexes N concurrent sessions through one vmapped,
    occupancy-tiered device tick — each tick emitting a single ``(1, K)``
    score row for the window after the newly consumed audio (a k-chunk
    wide drain scores once, after all k chunks).
    """

    def __init__(self, computer, *, window_frames: int, chunk_size: int,
                 dtype):
        from ..streaming import StreamingSTFT

        if window_frames < 1:
            raise ValueError(
                f"window_frames must be positive, got {window_frames}"
            )
        self.window_frames = int(window_frames)
        self._stream = StreamingSTFT(computer, chunk_size)
        self.chunk_size = self._stream.chunk_size
        self.num_coeffs = int(computer.num_coeffs)
        self._dtype = dtype
        self._tick = jax.jit(self._tick_impl)

    def _score(self, window, v):
        raise NotImplementedError  # pragma: no cover - subclass contract

    def init_state(self) -> dict:
        return {
            "stft": self._stream.init_state(),
            "ring": jnp.zeros(
                (self.window_frames, self.num_coeffs), dtype=self._dtype
            ),
            "count": jnp.zeros((), dtype=jnp.int32),
        }

    def _tick_impl(self, ring, count, feats, n):
        W = self.window_frames
        feats = feats.astype(self._dtype)
        appended = jnp.concatenate([ring, feats], axis=0)
        # rows [W + n, W + M) of `appended` are garbage emitted past the
        # valid count; the new ring slice [n, n + W) ends exactly at the
        # last valid row, and the scoring window is left-aligned so the
        # score's first-v-rows mask matches the batch semantics
        ring = jax.lax.dynamic_slice(
            appended, (n, jnp.int32(0)), (W, self.num_coeffs)
        )
        count = count + n
        v = jnp.minimum(count, W)
        # left-align the v valid rows (the ring's tail); the zero
        # extension keeps the slice in bounds for every v without clamping
        padded = jnp.concatenate([ring, jnp.zeros_like(ring)], axis=0)
        window = jax.lax.dynamic_slice(
            padded, (W - v, jnp.int32(0)), (W, self.num_coeffs)
        )
        return ring, count, self._score(window, v)

    def process(self, state: dict, chunk, valid_len=None):
        """Feed one chunk; returns ``(state, score)`` for the new window."""
        stft, feats, n = self._stream.process(state["stft"], chunk, valid_len)
        ring, count, score = self._tick(
            state["ring"], state["count"], feats, n
        )
        return {"stft": stft, "ring": ring, "count": count}, score

    def finalize(self, state: dict):
        """Flush the stream tail; returns the final-window score."""
        feats, n = self._stream.finalize(state["stft"])
        _, _, score = self._tick(state["ring"], state["count"], feats, n)
        return score

    # -- StreamPool streamer contract -----------------------------------

    def _process_impl(self, state: dict, chunk, valid_len):
        stft, feats, n = self._stream._process_impl(
            state["stft"], chunk, valid_len
        )
        ring, count, score = self._tick_impl(
            state["ring"], state["count"], feats, n
        )
        # a 0-valid step leaves ring/count bitwise unchanged (slice at
        # offset 0 returns the ring; count + 0), and emits no row
        out_n = (jnp.asarray(valid_len, jnp.int32) > 0).astype(jnp.int32)
        return (
            {"stft": stft, "ring": ring, "count": count},
            score[None],
            out_n,
        )

    def _finalize_impl(self, state: dict):
        feats, n = self._stream._finalize_impl(state["stft"])
        _, _, score = self._tick_impl(state["ring"], state["count"], feats, n)
        return score[None], jnp.int32(1)


def valid_mask(total: int, counts):
    """Boolean ``(batch, total)`` marking rows before each valid count."""
    return (
        jnp.arange(total, dtype=jnp.int32)[None, :] < counts[:, None]
    )


def he_conv_init(rng, kernel_width: int, fan_in_dim: int, out_c: int, dtype):
    """He-normal ``(W, I, O)`` conv kernel + zero bias."""
    w = jax.random.normal(
        rng, (kernel_width, fan_in_dim, out_c), dtype=dtype
    ) * jnp.asarray(
        math.sqrt(2.0 / (kernel_width * fan_in_dim)), dtype=dtype
    )
    return {"w": w, "b": jnp.zeros((out_c,), dtype=dtype)}


def masked_conv_block(x, block, counts, stride: int = 1, dilation: int = 1):
    """One ``NWC`` conv + relu(+bias) with padding-proof semantics.

    Explicit, length-independent padding keeps ``out[j]`` centered at
    ``in[j*stride]`` for any padded buffer length (``SAME``-with-stride
    pads based on the total length, which would make outputs depend on how
    far the batch was padded), and rows at or past the stride-propagated
    valid count are re-zeroed.  Returns ``(x, counts)`` for the next layer.
    """
    k = block["w"].shape[0]
    span = dilation * (k - 1)
    x = jax.lax.conv_general_dilated(
        x,
        block["w"],
        window_strides=(stride,),
        padding=[(span // 2, span - span // 2)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    x = jax.nn.relu(x + block["b"])
    counts = -(-counts // stride)
    x = jnp.where(valid_mask(x.shape[1], counts)[..., None], x, 0)
    return x, counts


def make_train_step(model, consts: dict, tx):
    """Build the jitted optimizer step for an optax transformation ``tx``.

    Generic over every model family: ``step(params, opt_state, *batch) ->
    (params, opt_state, metrics)`` where ``*batch`` is whatever
    ``model.loss(params, consts, *batch)`` takes (KWS/speaker:
    ``signals, lengths, labels``; CTC adds ``label_lengths``) and
    ``metrics`` carries ``"loss"`` plus ``"accuracy"`` when the family's
    aux provides one.  Data parallelism needs no extra code: shard the
    batch axis over a mesh and replicate ``params``; XLA inserts the
    gradient all-reduce.
    """

    def step(params, opt_state, *batch):
        (loss, aux), grads = jax.value_and_grad(model.loss, has_aux=True)(
            params, consts, *batch
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {"loss": loss}
        if "accuracy" in aux:
            metrics["accuracy"] = aux["accuracy"]
        return params, opt_state, metrics

    return jax.jit(step, donate_argnums=(0, 1))
