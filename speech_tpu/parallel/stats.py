"""Distributed sufficient statistics (CMVN) over a mesh.

The reference accumulates Kaldi-style CMVN statistics serially, one feature
tensor at a time (reference: src/pydrobert/speech/post.py:193-212).  On a
mesh, each chip accumulates over its shard of the utterance batch and a
single ``psum`` over the data axis produces the global ``(2, F+1)`` table —
the result is bitwise what the serial loop computes up to summation order.
"""


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["accumulate_stats", "accumulate_stats_sharded"]


def accumulate_stats(feats, counts=None, stats=None):
    """Kaldi-layout sufficient statistics for a (masked) feature batch.

    ``feats``: ``(..., frames, F)``; ``counts``: optional valid-frame counts
    of shape ``(...,)`` masking padded rows.  Returns/updates
    ``stats[(2, F+1)] = [sum x | n ; sum x^2 | 0]`` matching
    ``Standardize.accumulate`` (reference: post.py:193-212).
    """
    feats = jnp.asarray(feats)
    num_filts = feats.shape[-1]
    flat = feats.reshape(-1, feats.shape[-2], num_filts)
    if counts is None:
        mask = jnp.ones(flat.shape[:2], dtype=feats.dtype)
    else:
        counts = jnp.asarray(counts).reshape(-1)
        mask = (
            jnp.arange(flat.shape[1])[None, :] < counts[:, None]
        ).astype(feats.dtype)
    masked = flat * mask[..., None]
    new = jnp.zeros((2, num_filts + 1), dtype=feats.dtype)
    new = new.at[0, -1].set(mask.sum())
    new = new.at[0, :-1].set(masked.sum(axis=(0, 1)))
    new = new.at[1, :-1].set((masked * flat).sum(axis=(0, 1)))
    if stats is not None:
        new = new + stats
    return new


def accumulate_stats_sharded(
    feats, counts, mesh: Mesh, data_axis: str = "data", stats=None
):
    """Global CMVN statistics for a batch sharded over ``data_axis``.

    Per-chip local accumulation followed by one ``psum`` over the data axis;
    the returned ``(2, F+1)`` table is replicated.
    """

    def local(feats, counts):
        s = accumulate_stats(feats, counts)
        return jax.lax.psum(s, data_axis)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(data_axis), P(data_axis)),
        out_specs=P(),
    )
    new = fn(feats, counts)
    if stats is not None:
        new = new + stats
    return new
