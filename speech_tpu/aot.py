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
  device count || jax/jaxlib versions || backend platform version ||
  XLA_FLAGS || LIBTPU_INIT_ARGS)``.
  The StableHLO text embeds the folded filter-bank weights as constants,
  so a config change automatically changes the key — there is no way to
  serve stale weights; the compiler-version and compile-flag components
  keep a jaxlib/TPU-plugin upgrade or a flags change from serving stale
  codegen.
- Lifecycle: entries live under a per-fingerprint subdirectory; a
  fingerprint change (upgrade, flag change) orphans the old
  subdirectory, which :meth:`AOTCache.prune` sweeps.  ``prune`` also
  evicts least-recently-used entries past a byte cap (``max_bytes`` on
  the constructor auto-prunes after each store write; hits touch
  entries so LRU survives noatime mounts).  CLI: ``--aot-prune``.
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
import logging
import os
import pickle
import stat as _stat
import tempfile
import threading
from typing import Optional, Sequence, Union

import numpy as np

import jax

__all__ = ["AOTCache", "as_cache", "precompile_extractor"]

logger = logging.getLogger(__name__)


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

    def __init__(self, directory: str, max_bytes: Optional[int] = None):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, mode=0o700, exist_ok=True)
        # mode= above only applies on CREATION (and is narrowed by the
        # umask): a pre-existing group/other-writable directory would
        # silently cross the documented pickle trust boundary.  Tighten
        # it if we own it; refuse it otherwise.
        st = os.stat(self.directory)
        if st.st_mode & (_stat.S_IWGRP | _stat.S_IWOTH):
            if st.st_uid == os.getuid():
                os.chmod(self.directory, 0o700)
                logger.warning(
                    "AOT store %s was group/other-writable; tightened to "
                    "0700 (entries are pickles — writers can execute code "
                    "in every reader)",
                    self.directory,
                )
            else:
                raise ValueError(
                    f"AOT store {self.directory!r} is group/other-writable "
                    "and not owned by this user: entries are pickles, so "
                    "any writer can execute code in every process that "
                    "reads the store.  Point aot_dir at a directory owned "
                    "by the serving user."
                )
        #: evict least-recently-used entries past this many bytes (the
        #: current fingerprint's entries only; ``None`` = unbounded).
        #: Checked after every store write; see :meth:`prune`.
        self.max_bytes = max_bytes
        self.stats = {
            "hits": 0,
            "misses": 0,
            "errors": 0,
            "fallbacks": 0,
            "evicted": 0,
            "orphans_removed": 0,
        }
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
        # compile-affecting environment: two processes with different
        # XLA/libtpu flags must not serve each other's codegen
        env_flags = "|".join(
            f"{k}={os.environ.get(k, '')}"
            for k in ("XLA_FLAGS", "LIBTPU_INIT_ARGS")
        )
        return (
            f"{devs[0].platform}|{devs[0].device_kind}|{len(devs)}|"
            f"{jax.__version__}|{jaxlib_version}|{platform_version}|"
            f"{env_flags}"
        )

    def _key(self, lowered) -> str:
        h = hashlib.sha256()
        h.update(lowered.as_text().encode())
        h.update(self._fingerprint().encode())
        return h.hexdigest()

    def _fp_dir(self) -> str:
        """Entries live under a per-fingerprint subdirectory so a jax /
        plugin / flag change leaves identifiable orphans :meth:`prune`
        can sweep (the flat key is a hash — unattributable)."""
        fp = hashlib.sha256(self._fingerprint().encode()).hexdigest()[:16]
        return os.path.join(self.directory, f"fp-{fp}")

    def _path(self, key: str) -> str:
        return os.path.join(self._fp_dir(), f"{key}.jaxexe")

    # -- lifecycle -----------------------------------------------------

    def size_bytes(self) -> int:
        """Total bytes of stored executables (all fingerprints)."""
        total = 0
        for root, _, files in os.walk(self.directory):
            for name in files:
                if name.endswith(".jaxexe"):
                    try:
                        total += os.path.getsize(os.path.join(root, name))
                    except OSError:
                        pass
        return total

    def prune(self, max_bytes: Optional[int] = None) -> dict:
        """Bound the store: sweep stale-fingerprint orphans, then evict
        least-recently-used current entries past ``max_bytes``.

        Orphans are every entry under a ``fp-*`` subdirectory other than
        the current fingerprint's — they can never be served again in
        this environment (a jax/jaxlib/plugin/flag change moved the
        fingerprint).  Eviction order is by last use (hits ``os.utime``
        each entry, so LRU survives ``noatime`` mounts); newest survive.
        ``max_bytes=None`` uses ``self.max_bytes``; if both are None only
        the orphan sweep runs.  Returns ``{"orphans_removed", "evicted",
        "kept", "bytes"}`` and accumulates the first two into ``stats``.
        """
        if max_bytes is None:
            max_bytes = self.max_bytes
        cur = self._fp_dir()
        orphans = evicted = 0
        with os.scandir(self.directory) as it:
            dirs = [
                e.path
                for e in it
                if e.is_dir() and e.name.startswith("fp-")
            ]
        for d in dirs:
            if os.path.abspath(d) == os.path.abspath(cur):
                continue
            with os.scandir(d) as it:
                for e in it:
                    if e.name.endswith((".jaxexe", ".tmp")):
                        try:
                            os.unlink(e.path)
                            orphans += 1
                        except OSError:
                            pass
            try:
                os.rmdir(d)
            except OSError:
                pass
        entries = []
        if os.path.isdir(cur):
            with os.scandir(cur) as it:
                for e in it:
                    if e.name.endswith(".jaxexe"):
                        try:
                            st = e.stat()
                        except OSError:
                            continue
                        entries.append(
                            (max(st.st_atime, st.st_mtime), st.st_size,
                             e.path)
                        )
        total = sum(size for _, size, _ in entries)
        if max_bytes is not None and total > max_bytes:
            for _, size, path in sorted(entries):  # oldest first
                if total <= max_bytes:
                    break
                try:
                    os.unlink(path)
                    total -= size
                    evicted += 1
                except OSError:
                    pass
        with self._lock:
            self.stats["orphans_removed"] += orphans
            self.stats["evicted"] += evicted
        return {
            "orphans_removed": orphans,
            "evicted": evicted,
            "kept": len(entries) - evicted,
            "bytes": total,
        }

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
                try:
                    os.utime(path)  # LRU clock for prune(), noatime-proof
                except OSError:
                    pass
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
            fp_dir = os.path.dirname(path)
            os.makedirs(fp_dir, mode=0o700, exist_ok=True)
            fd, tmp = tempfile.mkstemp(dir=fp_dir, suffix=".tmp")
            with os.fdopen(fd, "wb") as f:
                f.write(blob)
            os.replace(tmp, path)  # atomic under concurrent writers
            if self.max_bytes is not None:
                self.prune()
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
        except Exception as aot_err:
            # re-run through the original jit.  If that ALSO fails, the
            # error is genuine (bad input, device fault): propagate from
            # the jit path and do NOT demote — a transient device error
            # must not silently cost this signature its AOT executable
            # for the process lifetime.  If the jit path succeeds, the
            # AOT executable itself rejected the arguments (committed
            # arrays on mismatched shardings etc.): demote permanently,
            # and say so with the triggering exception.
            result = self._jitted(*args)
            logger.warning(
                "AOT executable rejected arguments (signature demoted to "
                "the jit path for this process): %r",
                aot_err,
            )
            self._compiled[sig] = self._FALLBACK
            with self._cache._lock:
                self._cache.stats["fallbacks"] += 1
            return result


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
