"""Worker process for the real 2-process multi-host test.

Not collected by pytest (no ``test_`` prefix) — ``tests/test_parallel.py``
spawns two of these, each configured as one jax process with 4 local CPU
devices, coordinated through ``jax.distributed`` (Gloo collectives).  The
pair assembles an 8-device global mesh and runs the multi-host data path
end to end:

- :func:`speech_tpu.parallel.multihost.initialize` (the repo wrapper)
- :func:`speech_tpu.parallel.multihost.process_slice` corpus splitting
- :func:`speech_tpu.parallel.multihost.global_batch_from_host_local`
  global batch assembly (each host feeds only its own rows)
- one :class:`speech_tpu.parallel.ShardedExtractor` batch over the mesh
- :func:`speech_tpu.parallel.stats.accumulate_stats_sharded` psum CMVN

Process 0 writes the replicated results to ``<outdir>/result.npz``; the
parent pytest process compares them against a single-process oracle.

Usage: python multihost_worker.py <pid> <nprocs> <port> <outdir>
"""

import sys


def main(pid: int, nprocs: int, port: int, outdir: str) -> None:
    import numpy as np

    import jax

    # per-process backend config BEFORE any backend init: 4 local CPU
    # devices -> 8 global over 2 processes (mirrors one-host-per-4-chips)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.config.update("jax_enable_x64", True)

    from speech_tpu.compute import STFTFrameComputer
    from speech_tpu.parallel import ShardedExtractor, multihost
    from speech_tpu.parallel.stats import accumulate_stats_sharded

    multihost.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs,
        process_id=pid,
    )
    assert jax.process_count() == nprocs, jax.process_count()
    assert len(jax.local_devices()) == 4
    assert len(jax.devices()) == 4 * nprocs

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))

    # deterministic corpus, identical on every host; each host keeps only
    # its process_slice — the multi-host manifest-splitting contract
    rng = np.random.RandomState(1234)
    n_utts, max_len = 8, 2048
    corpus = rng.randn(n_utts, max_len)
    lengths = rng.randint(max_len // 2, max_len + 1, size=n_utts).astype(
        np.int32
    )
    for i in range(n_utts):
        corpus[i, lengths[i]:] = 0.0

    sl = multihost.process_slice(n_utts)
    local_signals = corpus[sl]
    local_lengths = lengths[sl]
    assert len(local_signals) == n_utts // nprocs

    # global batch: each host feeds only its own rows
    gsignals = multihost.global_batch_from_host_local(local_signals, mesh)
    glengths = multihost.global_batch_from_host_local(local_lengths, mesh)
    assert gsignals.shape == (n_utts, max_len)
    assert not gsignals.is_fully_addressable  # genuinely multi-host

    computer = STFTFrameComputer(
        {"name": "fbank", "num_filts": 10, "sampling_rate": 8000},
        frame_length_ms=25,
        frame_shift_ms=10,
        dtype="float64",
    )
    extractor = ShardedExtractor(computer, mesh=mesh)
    feats, counts = extractor.extract_batch(gsignals, glengths)

    stats = accumulate_stats_sharded(feats, counts, mesh)

    # replicate the sharded outputs so any process can read them whole
    rep = jax.jit(
        lambda a, b: (a, b),
        out_shardings=NamedSharding(mesh, P()),
    )(feats, counts)
    feats_np = np.asarray(rep[0])
    counts_np = np.asarray(rep[1])
    stats_np = np.asarray(stats)

    if pid == 0:
        np.savez(
            f"{outdir}/result.npz",
            feats=feats_np,
            counts=counts_np,
            stats=stats_np,
            sl0_start=sl.start,
            sl0_stop=sl.stop,
        )
    print(f"[worker {pid}] OK", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
