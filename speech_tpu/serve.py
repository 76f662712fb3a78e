"""Serving runtime: micro-batched extraction and concurrent streams.

The reference library has no serving story — extraction is a synchronous
per-utterance loop (reference: command_line.py:468-607).  On TPU the
economics invert: one chip runs the fused pipeline tens of thousands of
times faster than real time, so the serving problem is *keeping the chip
fed* from many concurrent, individually tiny requests.  Two runtime
pieces cover it:

- :class:`FeatureServer` — offline/online request batching.  Callers
  submit whole signals from any thread and get a
  :class:`concurrent.futures.Future`; a background dispatcher coalesces
  requests into latency-bounded micro-batches and runs them through the
  bucketed batched pipeline (:class:`~speech_tpu.parallel.ShardedExtractor`
  — power-of-two length buckets bound recompilation, and a mesh shards
  the batch axis across chips).
- :class:`StreamPool` — a fixed pool of concurrent streaming sessions
  multiplexed through ONE jitted program: per-slot explicit-carry states
  are stacked into a batched pytree and every tick runs
  ``vmap(process)`` with per-slot valid lengths (idle slots pass 0 and
  are exact no-ops).  Opening, feeding, and closing sessions never
  recompiles.
- :class:`StreamServer` — the thread-safe loop around a
  :class:`StreamPool`: callers open/feed/close sessions from any thread;
  a background loop coalesces feeds, ticks the pool, and delivers
  feature blocks to per-session queues.
"""

import queue
import threading
from concurrent.futures import Future
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from .parallel import ShardedExtractor
from .streaming import StreamingSI, StreamingSTFT

__all__ = ["FeatureServer", "StreamPool", "StreamServer"]


class FeatureServer:
    """Thread-safe micro-batching front end for whole-signal extraction.

    Parameters
    ----------
    computer
        A host frame computer (STFT or SI).
    mesh
        Optional device mesh; shards each micro-batch over its
        ``data_axis``.
    max_batch
        Largest micro-batch dispatched to the device at once.
    max_wait_ms
        How long the dispatcher waits to fill a batch after the first
        pending request before running a partial one.  The latency floor
        for a lone request is roughly this plus one device dispatch.
    pad_batches
        ``True`` (default): pad every micro-batch to ``max_batch`` rows
        so each length bucket compiles exactly ONE program regardless of
        load level — the right choice when compiles are expensive (on
        tunneled runtimes they take minutes) and the device is otherwise
        idle.  ``"pow2"``: pad to the next power of two instead, so
        device time follows the load level at the cost of up to
        ``log2(max_batch)+1`` programs per bucket (pre-build them with
        :meth:`warmup`).  ``False``: no padding — every distinct batch
        size compiles its own program.
    max_pending
        Admission control: with more than this many requests enqueued,
        ``submit`` raises RuntimeError instead of growing the queue
        without bound (a stalled device would otherwise buffer every
        caller's audio in host memory).  None (default) disables the
        limit.
    bucket
        Signal-length bucket granularity, forwarded to
        :class:`~speech_tpu.parallel.ShardedExtractor`: ``"pow2"``
        (default) or ``"fine"`` (``{2**k, 3*2**(k-1)}`` buckets — less
        pad waste, up to 2x the programs; ``warmup`` covers whichever
        grid is active).
    postprocessors
        Optional host post-processor instances fused into the device
        program (forwarded to the extractor; see
        :func:`speech_tpu.ops.postops.device_post_chain`) — served
        features come back with deltas/CMVN/DCT/… already applied.
    aot_dir
        Optional on-disk AOT executable store
        (:class:`speech_tpu.aot.AOTCache`): bucket programs a previous
        process already built (e.g. via the CLI ``--precompile`` pass)
        deserialize in under a second instead of recompiling — a fresh
        server's :meth:`warmup` on a warmed store performs **zero**
        compiles.

    Attributes
    ----------
    stats
        Monotonic counters: ``submitted``, ``completed``, ``failed``,
        ``rejected`` (admission control), ``batches`` (device
        dispatches).
    """

    def __init__(
        self,
        computer,
        mesh=None,
        max_batch: int = 64,
        max_wait_ms: float = 2.0,
        pad_batches: bool = True,
        max_pending: int = None,
        bucket: str = "pow2",
        postprocessors=(),
        aot_dir: str = None,
    ):
        self._extractor = ShardedExtractor(
            computer,
            mesh,
            bucket=bucket,
            postprocessors=postprocessors,
            aot_dir=aot_dir,
        )
        self._max_batch = int(max_batch)
        if pad_batches not in (True, False, "pow2"):
            raise ValueError(
                f"pad_batches must be True, False, or 'pow2'; "
                f"got {pad_batches!r}"
            )
        self._pad_batches = pad_batches
        self._max_wait = float(max_wait_ms) / 1e3
        self._max_pending = None if max_pending is None else int(max_pending)
        self._pending = 0  # requests submitted but not yet resolved
        self._queue = queue.SimpleQueue()
        self._closed = False
        self._lock = threading.Lock()  # makes submit's check+put atomic
        # with close's sentinel, so no request can slip behind the stop
        self.stats = {
            "submitted": 0,
            "completed": 0,
            "failed": 0,
            "rejected": 0,
            "batches": 0,
        }
        self._worker = threading.Thread(
            target=self._run, name="speech-tpu-serve", daemon=True
        )
        self._worker.start()

    # -- client side ---------------------------------------------------

    def submit(self, signal: np.ndarray) -> Future:
        """Enqueue one 1-D signal; resolves to ``(num_frames, C)``.

        Malformed requests raise *here*, to the submitting caller — a bad
        signal must never poison the unrelated requests it would have
        coalesced with in a micro-batch.
        """
        signal = np.asarray(signal)
        if signal.ndim != 1:
            raise ValueError(
                f"signal must be 1-D, got shape {signal.shape}"
            )
        if not np.issubdtype(signal.dtype, np.number):
            raise TypeError(f"signal must be numeric, got {signal.dtype}")
        fut = Future()
        with self._lock:
            if self._closed:
                raise RuntimeError("server is closed")
            if (
                self._max_pending is not None
                and self._pending >= self._max_pending
            ):
                self.stats["rejected"] += 1
                raise RuntimeError(
                    f"server overloaded: {self._pending} requests pending "
                    f"(max_pending={self._max_pending})"
                )
            self._pending += 1
            self.stats["submitted"] += 1
            self._queue.put((signal, fut))
        return fut

    def extract(self, signal: np.ndarray) -> np.ndarray:
        """Blocking single-signal convenience wrapper."""
        return self.submit(signal).result()

    def extract_many(self, signals: Sequence[np.ndarray]):
        """Submit a burst and wait for all results (in order)."""
        futs = [self.submit(s) for s in signals]
        return [f.result() for f in futs]

    def warmup(
        self, lengths: Sequence[int], batch: int = None, dtype=np.float32
    ) -> None:
        """Pre-compile the bucket programs for expected signal lengths.

        Device compiles can take minutes on tunneled runtimes and would
        otherwise land on the first unlucky request.  Runs a zero batch
        through each distinct power-of-two bucket covering ``lengths``,
        blocking until the programs are built.  With ``pad_batches=True``
        (the default) every micro-batch shares one program per bucket,
        so a single warm-up signal per bucket covers all load levels;
        under ``"pow2"`` every power-of-two batch tier per bucket is
        warmed.  Warm-up batches go straight to the extractor (not
        through the dispatcher queue), so each tier's program is built
        deterministically — the dispatcher might otherwise split a
        warm-up burst across micro-batches and skip a tier.

        ``dtype`` must match what clients will submit: programs
        specialize on the input dtype (``np.int16`` signals ship to the
        device at half width and upcast in-program — warm that dtype if
        clients send integer PCM).
        """
        if batch is not None:
            tiers = [int(batch)]
        elif self._pad_batches == "pow2":
            tiers = []
            t = 1
            while t < self._max_batch:
                tiers.append(t)
                t <<= 1
            tiers.append(self._max_batch)
        elif self._pad_batches:
            tiers = [1]
        else:
            tiers = [self._max_batch]
        done = set()
        for n in lengths:
            n = max(int(n), 1)
            key = self._extractor.bucket_len(n)
            if key in done:
                continue
            done.add(key)
            for t in tiers:
                self._extractor.extract(
                    [np.zeros(n, dtype)] * t,
                    min_batch=self._min_batch(t),
                )

    def _min_batch(self, n: int) -> int:
        """Batch-dim padding target for an ``n``-request micro-batch."""
        if self._pad_batches == "pow2":
            return min(self._max_batch, 1 << max(0, n - 1).bit_length())
        return self._max_batch if self._pad_batches else 0

    def close(self) -> None:
        """Drain pending requests and stop the dispatcher.

        Requests submitted before the close are served; the lock makes a
        racing submit either land before the stop sentinel or raise.  As
        a belt-and-braces measure, any item somehow found behind the
        sentinel after the dispatcher exits gets a RuntimeError rather
        than a future that never resolves.
        """
        with self._lock:
            if self._closed:
                return
            self._closed = True
            self._queue.put(None)
        self._worker.join()
        while True:
            try:
                item = self._queue.get_nowait()
            except queue.Empty:
                return
            if item is not None:
                self._done(item[1], exc=RuntimeError("server is closed"))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- dispatcher ----------------------------------------------------

    def _run(self) -> None:
        """Dispatcher loop, double-buffered under sustained load.

        Device dispatch is asynchronous (``ShardedExtractor._dispatch``),
        while materializing results (``_collect``) blocks on the device.
        Holding one in-flight batch lets host padding/IO of batch ``i+1``
        overlap device compute of batch ``i``; with an empty queue the
        in-flight batch materializes immediately so a lone request never
        waits on a successor that may not come.
        """
        import time

        pending = None  # (batch, dispatch-result) awaiting materialization
        while True:
            item = self._queue.get()
            if item is None:
                if pending is not None:
                    self._resolve(pending)
                return
            batch = [item]
            deadline = time.monotonic() + self._max_wait
            stop = False
            while len(batch) < self._max_batch:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    nxt = self._queue.get(timeout=timeout)
                except queue.Empty:
                    break
                if nxt is None:
                    stop = True
                    break
                batch.append(nxt)
            pending, prev = (batch, self._dispatch(batch)), pending
            if prev is not None:
                self._resolve(prev)
            if stop or self._queue.empty():
                self._resolve(pending)
                pending = None
            if stop:
                return

    def _dispatch(self, batch):
        """Asynchronously dispatch one micro-batch; None on failure (the
        batch's futures are then already resolved via individual retry)."""
        try:
            disp = self._extractor._dispatch(
                [s for s, _ in batch], min_batch=self._min_batch(len(batch))
            )
        except Exception:  # noqa: BLE001 — isolate the bad request(s)
            self._retry_individually(batch)
            return None
        with self._lock:
            self.stats["batches"] += 1
        return disp

    def _resolve(self, entry) -> None:
        batch, disp = entry
        if disp is None:
            return  # dispatch already failed; futures resolved
        try:
            outs = self._extractor._collect(*disp)
        except Exception:  # noqa: BLE001 — isolate the bad request(s)
            self._retry_individually(batch)
            return
        for (_, fut), out in zip(batch, outs):
            self._done(fut, out)

    def _retry_individually(self, batch) -> None:
        # submit() pre-validates shape/dtype, so batch failures here are
        # rare; retry individually so only the offending request sees the
        # error instead of the whole micro-batch.
        for sig, fut in batch:
            try:
                out = self._extractor.extract([sig])[0]
            except Exception as e:  # noqa: BLE001 — to the caller
                self._done(fut, exc=e)
            else:
                self._done(fut, out)

    def _done(self, fut, result=None, exc=None) -> None:
        with self._lock:
            self._pending -= 1
            self.stats["failed" if exc is not None else "completed"] += 1
        if exc is not None:
            fut.set_exception(exc)
        else:
            fut.set_result(result)


class _Session:
    __slots__ = ("slot", "pending", "open")

    def __init__(self, slot: int):
        self.slot = slot
        self.pending = np.zeros((0,), np.float32)
        self.open = True


class StreamPool:
    """Fixed pool of concurrent streaming sessions on one device or a mesh.

    Works with either computer (the STFT and SI streaming tiers share
    the explicit-carry contract).  Sessions advance together through
    one jitted ``vmap(process)`` call per :meth:`step`; partial chunks
    are consumed immediately as masked chunks — no waiting for a full
    chunk.  On a single device the tick is **occupancy-tiered**: only
    the slots with pending samples are gathered into a power-of-two
    sub-batch, stepped, and scattered back (all in one program), so tick
    cost follows the number of active sessions, not the pool capacity.
    With a ``mesh``, the slot axis shards over ``data_axis`` — sessions
    are independent, so the tick needs no collectives and throughput
    scales with the chip count (every slot computes; an idle slot's
    ``valid_len == 0`` step is an exact no-op on its carry state).
    Not thread-safe: drive it from one serving loop.

    ``aot_dir`` (path or :class:`speech_tpu.aot.AOTCache`) backs the tick
    and finalize programs with the AOT executable store, so a fresh
    process's :meth:`warmup` over a warmed store performs zero compiles
    (the ``stats`` live on ``pool.aot``).

    Typical loop::

        pool = StreamPool(computer, slots=8, chunk_size=1600)
        h = pool.open()
        pool.feed(h, samples)          # any-length append
        for h2, feats in pool.step():  # one vmapped device tick
            deliver(h2, feats)
        pool.feed(h, more)
        ...
        for h2, feats in pool.close(h):
            deliver(h2, feats)
    """

    def __init__(
        self,
        computer,
        slots: int = 8,
        chunk_size: int = 1600,
        mesh=None,
        data_axis: str = "data",
        aot_dir=None,
    ):
        from .compute import ShortIntegrationFrameComputer

        from .aot import as_cache

        self.aot = as_cache(aot_dir)  # path, AOTCache, or None
        if self.aot is not None:
            _jit = lambda fn, **kw: self.aot.wrap(jax.jit(fn, **kw))
        else:
            _jit = jax.jit

        if hasattr(computer, "init_state") and hasattr(
            computer, "_process_impl"
        ):
            # a pre-built streamer (e.g. streaming.StreamingPitch) —
            # anything honoring the (state, feats, n_valid) process /
            # (feats, n_valid) finalize contract with valid-0 no-op
            # steps pools directly; its own chunk size governs
            self._stream = computer
            chunk_size = computer.chunk_size
        else:
            cls = (
                StreamingSI
                if isinstance(computer, ShortIntegrationFrameComputer)
                else StreamingSTFT
            )
            self._stream = cls(computer, chunk_size)
        self._slots = int(slots)
        self._chunk = int(chunk_size)
        self._dtype = np.dtype(self._stream._dtype)
        if mesh is not None and self._slots % mesh.shape[data_axis]:
            raise ValueError(
                f"slots ({self._slots}) must be a multiple of the mesh's "
                f"'{data_axis}' axis ({mesh.shape[data_axis]})"
            )
        init = self._stream.init_state()
        self._states = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x, (self._slots,) + x.shape), init
        )
        self._init_single = init
        self._sessions = {}
        self._free = list(range(self._slots))
        self._next_handle = 0
        # one WIDE masked chunk per slot per tick: a k-chunk backlog is a
        # single (k*chunk_size,) process call, so all its frames batch
        # into one matmul instead of k sequential scan steps (measured
        # ~5x over the lax.scan formulation on v5e)
        vstep = jax.vmap(self._stream._process_impl)
        vfin = jax.vmap(self._stream._finalize_impl)
        if mesh is None:
            self._vstep = _jit(vstep)
            self._vfin = _jit(vfin)

            # slot-tiered tick: when only m of the slots have pending
            # samples, gather those m states into a pow2-sized sub-batch,
            # step it, and scatter the states back — all inside ONE
            # jitted program, so tick cost follows OCCUPANCY rather than
            # pool capacity (a mostly-idle 256-slot pool would otherwise
            # pay the full 256-slot program every tick).  The state
            # gather/scatter moves only the small carry pytree.
            # Single-device only: on a mesh the slot axis is sharded and
            # a compacting gather would need collectives.
            def tiered_step(states, idx, chunks_sub, valids_sub):
                sub = jax.tree_util.tree_map(lambda a: a[idx], states)
                sub, feats, nfs = vstep(sub, chunks_sub, valids_sub)
                states = jax.tree_util.tree_map(
                    lambda full, s: full.at[idx].set(s), states, sub
                )
                return states, feats, nfs

            self._tiered_step = _jit(tiered_step)
        else:
            from .parallel import named_sharding

            # every array in play (states, chunks, valids, feats, counts)
            # carries the slot axis first; a leading-axis spec shards it
            # and leaves the rest replicated-per-shard
            dp = named_sharding(mesh, data_axis)
            state_sh = jax.tree_util.tree_map(lambda _: dp, self._states)
            self._states = jax.device_put(self._states, state_sh)
            self._vstep = _jit(
                vstep,
                in_shardings=(state_sh, dp, dp),
                out_shardings=(state_sh, dp, dp),
            )
            self._vfin = _jit(
                vfin, in_shardings=(state_sh,), out_shardings=(dp, dp)
            )
            self._tiered_step = None

    @property
    def capacity(self) -> int:
        return len(self._free)

    def warmup(
        self, depths: Sequence[int] = (1,), occupancies: Sequence[int] = ()
    ) -> None:
        """Pre-compile the vmapped tick programs for the given chunk
        depths (each pads to its power-of-two tier) plus the finalize
        program, before any session opens.  ``occupancies`` additionally
        pre-compiles the occupancy-tiered programs for those active-slot
        counts (each pads to its power-of-two tier; ignored on a mesh).
        The warm-up ticks carry ``valid_len 0`` everywhere — exact
        no-ops on the slot states."""
        for d in depths:
            k = 1 << max(0, int(d) - 1).bit_length()
            chunks = jnp.zeros((self._slots, k * self._chunk), self._dtype)
            valids = jnp.zeros((self._slots,), jnp.int32)
            self._vstep(self._states, chunks, valids)
            if self._tiered_step is not None:
                for occ in occupancies:
                    tier = 1 << max(0, int(occ) - 1).bit_length()
                    if tier >= self._slots:
                        continue
                    self._tiered_step(
                        self._states,
                        jnp.zeros((tier,), jnp.int32),
                        jnp.zeros((tier, k * self._chunk), self._dtype),
                        jnp.zeros((tier,), jnp.int32),
                    )
        self._vfin(self._states)

    # -- session management --------------------------------------------

    def open(self) -> int:
        """Claim a slot; returns a session handle."""
        if not self._free:
            raise RuntimeError("no free stream slots")
        slot = self._free.pop()
        self._set_slot(slot, self._init_single)
        handle = self._next_handle
        self._next_handle += 1
        self._sessions[handle] = _Session(slot)
        return handle

    def feed(self, handle: int, samples: np.ndarray) -> None:
        """Append samples to a session (no device work until step())."""
        s = self._session(handle)
        samples = np.asarray(samples, self._dtype).ravel()
        s.pending = np.concatenate([s.pending.astype(samples.dtype), samples])

    def step(self, only: int = None, max_chunks: int = 1):
        """One vmapped device tick: consume up to ``max_chunks`` chunks per
        session in a single dispatch.

        Returns ``[(handle, feats)]`` for sessions that emitted frames.
        With ``max_chunks > 1`` each session's backlog runs as ONE wide
        masked chunk — all its frames batch into a single device matmul
        (and the dispatch amortizes over the whole backlog, which on
        tunneled runtimes is the larger effect).  The width pads to a
        power of two so the program recompiles only per depth tier.
        ``only`` restricts consumption to one session or a set of
        sessions (other sessions' states are untouched exact no-ops) —
        used by :meth:`close` / :meth:`close_many` so draining never
        swallows other sessions' output.
        """
        C = self._chunk
        if only is not None and not isinstance(only, (set, frozenset)):
            only = {only}
        plan = {}
        kmax = 0
        for handle, s in self._sessions.items():
            if only is not None and handle not in only:
                continue
            n = len(s.pending)
            if n == 0:
                continue
            nchunks = min(int(max_chunks), -(-n // C))
            plan[handle] = min(n, nchunks * C)
            kmax = max(kmax, nchunks)
        if not plan:
            return []
        k = 1 << max(0, kmax - 1).bit_length()  # pow2 width tiers
        m = len(plan)
        tier = 1 << max(0, m - 1).bit_length()  # pow2 slot tiers
        if self._tiered_step is not None and tier < self._slots:
            # occupancy-tiered tick: gather only the active slots (plus
            # pad duplicates of ONE idle slot — its valid-0 step writes
            # back bitwise exactly the value already there, so duplicate
            # scatter rows cannot disagree), step the sub-batch, scatter
            # the states back.  Compiles once per (tier, depth) pair.
            active = [self._sessions[h].slot for h in plan]
            active_set = set(active)
            pad = next(i for i in range(self._slots) if i not in active_set)
            idx = np.asarray(active + [pad] * (tier - m), np.int32)
            chunks = np.zeros((tier, k * C), self._dtype)
            valids = np.zeros((tier,), np.int32)
            for pos, (handle, take) in enumerate(plan.items()):
                chunks[pos, :take] = self._sessions[handle].pending[:take]
                valids[pos] = take
            self._states, feats, nfs = self._tiered_step(
                self._states,
                jnp.asarray(idx),
                jnp.asarray(chunks),
                jnp.asarray(valids),
            )
            rows = {h: pos for pos, h in enumerate(plan)}
        else:
            chunks = np.zeros((self._slots, k * C), self._dtype)
            valids = np.zeros((self._slots,), np.int32)
            for handle, take in plan.items():
                s = self._sessions[handle]
                chunks[s.slot, :take] = s.pending[:take]
                valids[s.slot] = take
            self._states, feats, nfs = self._vstep(
                self._states, jnp.asarray(chunks), jnp.asarray(valids)
            )
            rows = {h: self._sessions[h].slot for h in plan}
        # one batched fetch: separate np.asarray calls pay a tunnel
        # round trip EACH on remote runtimes (~26 ms/RTT)
        feats, nfs = jax.device_get((feats, nfs))
        out = []
        for handle, take in plan.items():
            s = self._sessions[handle]
            s.pending = s.pending[take:]
            row = rows[handle]
            nf = int(nfs[row])
            if nf:
                out.append((handle, feats[row, :nf]))
        return out

    def close(self, handle: int):
        """Drain, finalize, and release a session.

        Returns ``[(handle, feats)]`` segments in stream order (possibly
        several from draining, then the finalize flush).
        """
        return self.close_many([handle])

    def close_many(self, handles):
        """Drain, finalize, and release several sessions at once.

        One finalize dispatch + one readback covers every closing
        session (the vmapped finalize computes all slots anyway) — on
        tunneled runtimes a per-session close pays a full round trip
        each, so batch closes are the serving-side drain lever.  Returns
        ``[(handle, feats)]`` segments, drained chunks first, then each
        session's finalize flush in ``handles`` order.
        """
        handles = list(dict.fromkeys(handles))  # dedupe, order-preserving
        sessions = {h: self._session(h) for h in handles}
        out = []
        while any(len(s.pending) for s in sessions.values()):
            backlog = max(
                -(-len(s.pending) // self._chunk)
                for s in sessions.values()
                if len(s.pending)
            )
            out.extend(self.step(only=set(handles), max_chunks=backlog))
        fin_feats, fin_ns = jax.device_get(self._vfin(self._states))
        for handle in handles:
            s = sessions[handle]
            nf = int(fin_ns[s.slot])
            if nf:
                out.append((handle, fin_feats[s.slot, :nf]))
            s.open = False
            del self._sessions[handle]
            self._free.append(s.slot)
        return out

    # -- internals -----------------------------------------------------

    def _session(self, handle: int) -> _Session:
        try:
            return self._sessions[handle]
        except KeyError:
            raise KeyError(f"no open session {handle}") from None

    def _set_slot(self, slot: int, state) -> None:
        self._states = jax.tree_util.tree_map(
            lambda batched, single: batched.at[slot].set(single),
            self._states,
            state,
        )


class StreamServer:
    """Thread-safe streaming front end around a :class:`StreamPool`.

    The pool itself is single-loop by design; this class owns that loop:
    callers open, feed, and close sessions from any thread, a background
    thread coalesces feeds for up to ``max_wait_ms``, ticks the pool
    (backlogs drain as wide chunks, bounded by ``tick_chunks``), and
    delivers feature blocks to per-session queues.

    Typical use::

        with StreamServer(computer, slots=16, chunk_size=1600) as server:
            h = server.open_session()
            server.feed(h, samples)          # from any thread
            server.close_session(h)          # flush; marks the stream done
            for feats in server.iter_results(h):
                deliver(feats)

    ``iter_results`` may also run concurrently with feeding (it blocks
    until blocks arrive and stops after ``close_session``'s flush).

    Parameters
    ----------
    computer, slots, chunk_size, mesh
        Forwarded to :class:`StreamPool`.
    tick_chunks
        Largest per-session backlog consumed per device tick (wide
        masked chunks; pads to power-of-two tiers).
    max_wait_ms
        How long the loop waits for more feeds before ticking with what
        it has — the added latency ceiling under light load.
    """

    def __init__(
        self,
        computer,
        slots: int = 8,
        chunk_size: int = 1600,
        mesh=None,
        tick_chunks: int = 16,
        max_wait_ms: float = 2.0,
        aot_dir=None,
    ):
        self._pool = StreamPool(
            computer,
            slots=slots,
            chunk_size=chunk_size,
            mesh=mesh,
            aot_dir=aot_dir,
        )
        self._tick_chunks = int(tick_chunks)
        self._wait = float(max_wait_ms) / 1e3
        self._cmds = queue.SimpleQueue()
        self._results = {}
        self._closed = False
        self._lock = threading.Lock()
        self._worker = threading.Thread(
            target=self._run, name="speech-tpu-stream-serve", daemon=True
        )
        self._worker.start()

    # -- client side (any thread) --------------------------------------

    def warmup(self, depths=None, occupancies=()) -> None:
        """Pre-compile the tick programs before traffic arrives
        (blocking; runs inside the loop thread — the pool is not
        thread-safe).  ``depths`` defaults to the power-of-two tiers up
        to ``tick_chunks``; ``occupancies`` forwards to
        :meth:`StreamPool.warmup` (device compiles can take minutes on
        tunneled runtimes, and the occupancy-tiered ticks compile one
        program per (slot-tier, depth) pair)."""
        if depths is None:
            depths = []
            d = 1
            while d < self._tick_chunks:
                depths.append(d)
                d <<= 1
            depths.append(self._tick_chunks)
        fut = Future()
        self._submit(("warmup", tuple(depths), tuple(occupancies), fut))
        fut.result()

    def open_session(self) -> int:
        """Claim a pool slot; returns a session handle (blocking).

        Raises RuntimeError when no slot is free — admission control is
        the pool size.
        """
        fut = Future()
        self._submit(("open", fut))
        return fut.result()

    def feed(self, handle: int, samples) -> None:
        """Append samples to a session (returns immediately).

        Malformed input raises *here*, to the caller — it must never
        reach the loop thread (a dead loop would hang every session).
        """
        samples = np.asarray(samples)
        if samples.ndim != 1:
            raise ValueError(
                f"samples must be 1-D, got shape {samples.shape}"
            )
        if not np.issubdtype(samples.dtype, np.number) or np.issubdtype(
            samples.dtype, np.complexfloating
        ):
            raise TypeError(
                f"samples must be real numeric, got {samples.dtype}"
            )
        self._submit(("feed", handle, samples))

    def close_session(self, handle: int) -> None:
        """Drain + finalize a session (blocking until flushed); its
        result queue then ends."""
        fut = Future()
        self._submit(("close", handle, fut))
        fut.result()

    def iter_results(self, handle: int):
        """Yield feature blocks for a session until its close flush.

        Safe to run concurrently with :meth:`feed`; re-raises any device
        error that failed the session.
        """
        with self._lock:
            q = self._results.get(handle)
        if q is None:
            raise KeyError(f"no session {handle}")
        while True:
            item = q.get()
            if item is None:
                with self._lock:
                    self._results.pop(handle, None)
                return
            if isinstance(item, BaseException):
                # an error ends this result stream: drop the queue so a
                # retry raises KeyError instead of blocking forever on a
                # queue nothing will feed again
                with self._lock:
                    self._results.pop(handle, None)
                raise item
            yield item

    def close(self) -> None:
        """Stop the loop; unclosed sessions' queues end with an error."""
        with self._lock:
            if self._closed:
                return
            self._closed = True
        self._cmds.put(None)
        self._worker.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- loop thread ---------------------------------------------------

    def _submit(self, cmd) -> None:
        with self._lock:
            if self._closed:
                raise RuntimeError("server is closed")
            self._cmds.put(cmd)

    def _handle(self, cmd) -> None:
        kind = cmd[0]
        if kind == "warmup":
            _, depths, occupancies, fut = cmd
            try:
                self._pool.warmup(depths, occupancies)
            except Exception as e:  # noqa: BLE001 — to the caller
                fut.set_exception(e)
                return
            fut.set_result(None)
        elif kind == "open":
            fut = cmd[1]
            try:
                handle = self._pool.open()
            except Exception as e:  # noqa: BLE001 — to the caller
                fut.set_exception(e)
                return
            with self._lock:
                self._results[handle] = queue.SimpleQueue()
            fut.set_result(handle)
        elif kind == "feed":
            _, handle, samples = cmd
            try:
                self._pool.feed(handle, samples)
            except KeyError:
                pass  # fed after close: drop (the stream already ended)
            except Exception as e:  # noqa: BLE001 — fail the one session
                # feed() pre-validates, so this is unexpected — but it
                # must never kill the loop thread (every other session
                # would hang); deliver it to the session instead
                q = self._results.get(handle)
                if q is not None:
                    q.put(e)
        elif kind == "close":
            # queues may already be gone (iter_results drops a session's
            # queue on a delivered error) — never index unconditionally
            # in the loop thread
            _, handle, fut = cmd
            try:
                for h, feats in self._pool.close_many([handle]):
                    q = self._results.get(h)
                    if q is not None:
                        q.put(feats)
            except Exception as e:  # noqa: BLE001 — to the caller
                q = self._results.get(handle)
                if q is not None:
                    q.put(e)
                fut.set_exception(e)
                return
            q = self._results.get(handle)
            if q is not None:
                q.put(None)
            fut.set_result(None)

    def _run(self) -> None:
        pending_sessions = self._pool._sessions  # loop-thread only
        while True:
            have_pending = any(
                len(s.pending) for s in pending_sessions.values()
            )
            try:
                cmd = self._cmds.get(
                    timeout=self._wait if have_pending else None
                )
            except queue.Empty:
                cmd = False  # timeout: tick with what we have
            if cmd is None:
                for handle, q in list(self._results.items()):
                    if handle in pending_sessions:
                        q.put(RuntimeError("server is closed"))
                return
            if cmd is not False:
                self._handle(cmd)
                # drain any further queued commands before device work
                while True:
                    try:
                        nxt = self._cmds.get_nowait()
                    except queue.Empty:
                        break
                    if nxt is None:
                        self._cmds.put(None)  # re-queue the stop
                        break
                    self._handle(nxt)
            try:
                outs = self._pool.step(max_chunks=self._tick_chunks)
            except Exception as e:  # noqa: BLE001 — fail live sessions
                # a failed tick fails the sessions involved TERMINALLY:
                # deliver the exception once and drop their backlogs —
                # retrying the same backlog would re-raise every
                # max_wait_ms forever (an unbounded queue flood).  The
                # sessions stay open: close_session still finalizes from
                # the last good state.
                for handle, sess in list(pending_sessions.items()):
                    if not len(sess.pending):
                        continue
                    sess.pending = sess.pending[:0]
                    q = self._results.get(handle)
                    if q is not None:
                        q.put(e)
                continue
            for handle, feats in outs:
                q = self._results.get(handle)
                if q is not None:
                    q.put(feats)
