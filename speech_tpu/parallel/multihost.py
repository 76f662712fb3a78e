"""Multi-host (multi-process) SPMD setup and data feeding.

On a multi-host TPU pod each host runs the same program against its local
chips; arrays logically span the whole mesh.  This module wraps the two
pieces a feature-extraction job needs:

- :func:`initialize` — process-group setup (`jax.distributed.initialize`),
  idempotent and a no-op for single-process runs.
- :func:`global_batch_from_host_local` — assemble a mesh-global batch from
  each host's local shard of utterances
  (`jax.make_array_from_process_local_data`), so
  :class:`~speech_tpu.parallel.extract.ShardedExtractor` batches span all
  hosts while every host reads only its own files.

The single-host CI exercises these with ``num_processes == 1``; real pod
runs only add the coordinator address/env (typically injected by the
cluster launcher).
"""

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["initialize", "global_batch_from_host_local", "process_slice"]


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> None:
    """Initialize the jax process group (no-op when single-process).

    With no arguments, relies on cluster auto-detection (GKE/Borg/SLURM
    env); explicitly pass ``coordinator_address``/``num_processes``/
    ``process_id`` otherwise.  Safe to call more than once.
    """
    if num_processes == 1 or (
        coordinator_address is None
        and num_processes is None
        and process_id is None
        and jax.process_count() == 1
    ):
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e).lower():
            raise


def process_slice(n_items: int) -> slice:
    """This process's contiguous share of ``n_items`` work items.

    Use to split a corpus manifest across hosts:
    ``items[process_slice(len(items))]``.
    """
    p, n = jax.process_index(), jax.process_count()
    per = -(-n_items // n)
    return slice(p * per, min(n_items, (p + 1) * per))


def global_batch_from_host_local(
    local_batch: np.ndarray, mesh: Mesh, data_axis: str = "data"
):
    """Build a mesh-global array whose ``data`` axis concatenates every
    host's ``local_batch`` (host-local shape ``(local_n, ...)``).

    Each host feeds only its own rows; jax assembles the logical global
    array without gathering data across hosts.
    """
    sharding = NamedSharding(
        mesh, PartitionSpec(data_axis, *([None] * (local_batch.ndim - 1)))
    )
    global_shape = (
        local_batch.shape[0] * jax.process_count(),
    ) + local_batch.shape[1:]
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_batch), global_shape
    )
