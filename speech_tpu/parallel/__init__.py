"""Multi-chip scaling: device meshes, sharded extraction, halo framing.

The reference scales by forking host processes — one utterance per
DataLoader worker (reference: src/pydrobert/speech/command_line.py:594).
Here scaling is SPMD over a :class:`jax.sharding.Mesh`:

- **Data parallelism** (`extract`): the utterance batch axis is sharded
  over a ``"data"`` mesh axis; every chip runs the identical fused feature
  program on its shard.  No collectives are needed on the forward path.
- **Sequence parallelism** (`halo`): a single very long signal's time axis
  is sharded across chips; framing needs ``frame_length - 1`` neighboring
  samples, exchanged as a static halo over ICI with
  :func:`jax.lax.ppermute` inside :func:`jax.shard_map`.
- **Distributed statistics** (`stats`): CMVN sufficient statistics
  accumulate with a ``psum`` over the mesh.
"""

from .mesh import make_mesh, named_sharding  # noqa: F401
from .extract import ShardedExtractor, sharded_pitch_feats  # noqa: F401
from .halo import (  # noqa: F401
    halo_frame_signal,
    sharded_si_feats,
    sharded_stft_feats,
)
from .stats import accumulate_stats, accumulate_stats_sharded  # noqa: F401
from . import multihost  # noqa: F401

__all__ = [
    "make_mesh",
    "named_sharding",
    "ShardedExtractor",
    "halo_frame_signal",
    "sharded_pitch_feats",
    "sharded_si_feats",
    "sharded_stft_feats",
    "accumulate_stats",
    "accumulate_stats_sharded",
]
