"""Ahead-of-time compiled-executable store (cold-start elimination).

TPU compiles of the big feature programs take 1-8 minutes through a
tunneled runtime, and jax's built-in persistent compilation cache keys on
internal compile options that do not always reproduce across processes.
This module provides the production answer: a content-addressed on-disk
store of *serialized XLA executables* keyed by the program's own StableHLO
text (plus the backend fingerprint), so a fresh process loads the bytes
and runs — **zero compiles** — for any program a previous process (or an
explicit ``--precompile`` pass) already built.

The reference needs nothing like this (NumPy has no compile step); it is
a TPU-native obligation.  Design points:

- The cache key is ``sha256(StableHLO || platform || device kind ||
  device count || jax/jaxlib versions || backend platform version)``.
  The StableHLO text embeds the folded filter-bank weights as constants,
  so a config change automatically changes the key — there is no way to
  serve stale weights; the compiler-version components keep a jaxlib or
  TPU-plugin upgrade from serving stale codegen.
- Executables are stored via :mod:`jax.experimental.serialize_executable`
  (validated on both the CPU and the ``axon`` TPU backends: a second
  process deserializes and runs in under a second, bit-identical output).
- Writes are atomic (tempfile + rename), safe under concurrent
  processes; a corrupt or incompatible entry falls back to a normal
  compile and is rewritten.
- **Trust boundary**: entries are Python pickles — anyone who can write
  to the store directory can execute code in every process that reads
  it.  The directory is created mode ``0o700``; point ``aot_dir`` only
  at paths owned by the serving user, never world-writable scratch.

Wiring: ``ShardedExtractor(..., aot_dir=...)``,
``FeatureServer(..., aot_dir=...)``, ``StreamPool``/``StreamServer``,
``FrameComputer.enable_aot``, and the CLIs' ``--aot-dir`` /
``--precompile`` flags all route through :class:`AOTCache`.  Every
``aot_dir`` parameter accepts a path *or* an existing :class:`AOTCache`,
so serving objects can share one store and one stats block.
"""

import hashlib
import os
import pickle
import tempfile
import threading
from typing import Sequence, Union

import numpy as np

import jax

__all__ = ["AOTCache", "as_cache", "precompile_extractor"]


def as_cache(store: Union[str, "AOTCache", None]):
    """Normalize an ``aot_dir`` argument: path -> :class:`AOTCache`,
    cache -> itself, None -> None.  The shared entry point for every
    ``aot_dir=`` parameter in the package."""
    if store is None or isinstance(store, AOTCache):
        return store
    return AOTCache(store)


class AOTCache:
    """Content-addressed store of compiled XLA executables in ``directory``.

    ``stats`` counts ``hits`` (deserialized, no compile), ``misses``
    (compiled and stored), ``errors`` (corrupt/incompatible entries that
    fell back to compiling), and ``fallbacks`` (calls that had to re-route
    through the original jit because the AOT executable rejected the
    arguments).  A test asserting cold-start health checks
    ``stats["misses"] == 0`` after a warmed run.
    """

    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, mode=0o700, exist_ok=True)
        self.stats = {"hits": 0, "misses": 0, "errors": 0, "fallbacks": 0}
        self._lock = threading.Lock()

    # -- keying --------------------------------------------------------

    @staticmethod
    def _fingerprint() -> str:
        devs = jax.devices()
        try:
            jaxlib_version = jax.lib.__version__
        except AttributeError:  # pragma: no cover - very old jax
            jaxlib_version = "?"
        try:
            # compiler build (libtpu / plugin / XLA:CPU) — an upgrade
            # here invalidates stored codegen even if jax didn't move
            platform_version = devs[0].client.platform_version
        except Exception:  # pragma: no cover - plugin-dependent
            platform_version = "?"
        return (
            f"{devs[0].platform}|{devs[0].device_kind}|{len(devs)}|"
            f"{jax.__version__}|{jaxlib_version}|{platform_version}"
        )

    def _key(self, lowered) -> str:
        h = hashlib.sha256()
        h.update(lowered.as_text().encode())
        h.update(self._fingerprint().encode())
        return h.hexdigest()

    def _path(self, key: str) -> str:
        return os.path.join(self.directory, f"{key}.jaxexe")

    # -- core ----------------------------------------------------------

    def load_or_compile(self, lowered):
        """A compiled executable for ``lowered`` — deserialized from the
        store when present, else compiled and stored."""
        from jax.experimental import serialize_executable as se

        key = self._key(lowered)
        path = self._path(key)
        if os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    payload, device_ids = pickle.loads(f.read())
                # jax's deserialize_and_load defaults execution_devices to
                # EVERY backend device — a 1-device program restored on an
                # 8-device host would demand 8 input shards; rebind to the
                # executable's original device assignment
                by_id = {d.id: d for d in jax.devices()}
                devices = [by_id[i] for i in device_ids]
                compiled = se.deserialize_and_load(
                    *payload, execution_devices=devices
                )
                with self._lock:
                    self.stats["hits"] += 1
                return compiled
            except Exception:
                with self._lock:
                    self.stats["errors"] += 1
        compiled = lowered.compile()
        tmp = None
        try:
            device_ids = [
                d.id for d in compiled.runtime_executable().local_devices()
            ]
            blob = pickle.dumps((se.serialize(compiled), device_ids))
            fd, tmp = tempfile.mkstemp(dir=self.directory, suffix=".tmp")
            with os.fdopen(fd, "wb") as f:
                f.write(blob)
            os.replace(tmp, path)  # atomic under concurrent writers
        except Exception:
            if tmp is not None:
                try:
                    os.unlink(tmp)  # don't leak temp files on ENOSPC etc.
                except OSError:
                    pass
            with self._lock:
                self.stats["errors"] += 1
        with self._lock:
            self.stats["misses"] += 1
        return compiled

    def wrap(self, jitted):
        """An AOT-backed callable around a ``jax.jit`` function.

        Per argument signature (pytree structure + shapes/dtypes/weak
        types), the first call lowers the program (fast — tracing only),
        consults the store, and pins the executable; later calls run it
        directly.  Arguments the compiled executable rejects (e.g.
        committed arrays on mismatched shardings) permanently demote that
        signature to the original jit path (counted in
        ``stats["fallbacks"]``) — genuine runtime errors then surface
        from the jit execution rather than being masked.

        Intended for jitted functions whose arguments are all arrays (or
        pytrees of arrays): the signature does not capture static-arg
        *values*, so functions with ``static_argnums`` whose static
        values vary would thrash the fallback path (correct, but
        uncached).
        """
        return _AOTFunction(jitted, self)


class _AOTFunction:
    #: sentinel pinned for signatures whose AOT executable rejected its
    #: arguments — later calls skip straight to the jit path
    _FALLBACK = object()

    def __init__(self, jitted, cache: AOTCache):
        self._jitted = jitted
        self._cache = cache
        self._compiled = {}
        self._lock = threading.Lock()

    @staticmethod
    def _sig(args):
        leaves, treedef = jax.tree_util.tree_flatten(args)
        sig = []
        for leaf in leaves:
            if isinstance(leaf, jax.Array):
                sig.append(
                    (tuple(leaf.shape), leaf.dtype.str, leaf.weak_type)
                )
            else:
                sig.append(
                    (
                        tuple(np.shape(leaf)),
                        np.asarray(leaf).dtype.str,
                        type(leaf).__name__,
                    )
                )
        return (str(treedef), tuple(sig))

    def __call__(self, *args):
        sig = self._sig(args)
        compiled = self._compiled.get(sig)
        if compiled is self._FALLBACK:
            return self._jitted(*args)
        if compiled is None:
            # the miss path holds the lock: two threads racing the same
            # cold signature would otherwise both pay a device compile
            with self._lock:
                compiled = self._compiled.get(sig)
                if compiled is None:
                    compiled = self._cache.load_or_compile(
                        self._jitted.lower(*args)
                    )
                    self._compiled[sig] = compiled
                elif compiled is self._FALLBACK:
                    return self._jitted(*args)
        try:
            return compiled(*args)
        except Exception:
            # demote this signature permanently: re-raising through the
            # jit path keeps results (and genuine errors) correct without
            # paying raise + re-dispatch on every future call
            self._compiled[sig] = self._FALLBACK
            with self._cache._lock:
                self._cache.stats["fallbacks"] += 1
            return self._jitted(*args)


def precompile_extractor(
    extractor,
    lengths: Sequence[int],
    batches: Sequence[int],
    dtypes=(np.float32,),
    progress=None,
) -> int:
    """Build (and store) every bucket program an extraction run will need.

    For each length bucket covering ``lengths``, each (deduplicated,
    mesh-rounded) batch size in ``batches``, and each input ``dtype``,
    runs one zero batch through ``extractor`` — both the static all-full
    program and the traced-ragged-lengths program — so they land in its
    AOT store.  Returns the number of programs exercised (store hits
    included).  ``progress`` (optional callable taking a message) reports
    per-program activity — device compiles can take minutes each on
    tunneled runtimes, silence reads as a hang.
    """
    buckets = sorted({extractor.bucket_len(max(int(n), 1)) for n in lengths})
    rounded = sorted(
        {
            -(-int(b) // extractor.batch_multiple) * extractor.batch_multiple
            for b in batches
        }
    )
    count = 0
    for dtype in dtypes:
        for b in rounded:
            for n in buckets:
                count += 2  # static all-full + traced-ragged programs
                if progress is not None:
                    progress(
                        f"precompile bucket={n} batch={b} "
                        f"dtype={np.dtype(dtype).name}"
                    )
                signals = np.zeros((b, n), dtype=dtype)
                lengths_np = np.full((b,), n, dtype=np.int32)
                extractor.extract_batch(signals, lengths_np)
                # the ragged-lengths program (traced counts) — real
                # batches are rarely all-full
                extractor.extract_batch(
                    signals, jax.numpy.asarray(lengths_np)
                )
    return count
