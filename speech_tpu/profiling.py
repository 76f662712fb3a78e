"""Tracing and per-stage timing.

The reference has no profiling subsystem (plain logging only;
reference: command_line.py:255-257, 352-356).  Here, two small tools fit
the TPU workflow:

- :class:`StageTimer` — wall-clock timers for host-visible pipeline stages
  (read, pad, device compute, write), reportable as one summary line.
- :func:`trace` — context manager around :func:`jax.profiler.trace` that
  captures a TensorBoard-loadable device trace for the enclosed region.

The CLI exposes these via ``--profile [DIR]``.
"""

import contextlib
import logging
import time

from collections import defaultdict
from typing import Optional

__all__ = ["StageTimer", "trace"]

logger = logging.getLogger("speech_tpu.profiling")


class StageTimer:
    """Accumulate wall-clock time per named pipeline stage.

    Use as ``with timer.stage("read"): ...``; ``summary()`` returns a
    one-line report, ``report()`` logs it.
    """

    def __init__(self):
        self._totals = defaultdict(float)
        self._counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        start = time.perf_counter()
        try:
            yield self
        finally:
            self._totals[name] += time.perf_counter() - start
            self._counts[name] += 1

    @property
    def totals(self) -> dict:
        """Seconds per stage."""
        return dict(self._totals)

    def summary(self) -> str:
        total = sum(self._totals.values())
        parts = [
            f"{name}: {secs:.3f}s/{self._counts[name]}x"
            for name, secs in sorted(
                self._totals.items(), key=lambda kv: -kv[1]
            )
        ]
        return f"stages ({total:.3f}s total): " + ", ".join(parts)

    def report(self, level: int = logging.INFO) -> None:
        if self._totals:
            logger.log(level, self.summary())


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Capture a device trace into ``log_dir`` (TensorBoard format).

    No-op when ``log_dir`` is None or the profiler is unavailable.
    """
    if not log_dir:
        yield
        return
    # Only profiler setup/teardown is guarded; exceptions raised by the
    # traced body itself must propagate untouched (a guarded second yield
    # would turn them into a RuntimeError from contextlib).
    ctx = None
    try:
        import jax

        ctx = jax.profiler.trace(log_dir)
        ctx.__enter__()
    except Exception as e:  # pragma: no cover - profiler quirks
        logger.warning("device trace unavailable: %s", e)
        ctx = None
    try:
        yield
    finally:
        if ctx is not None:
            try:
                ctx.__exit__(None, None, None)
            except Exception as e:  # pragma: no cover - profiler quirks
                logger.warning("device trace teardown failed: %s", e)
