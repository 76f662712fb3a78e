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
]


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
