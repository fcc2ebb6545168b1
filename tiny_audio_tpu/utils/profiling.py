"""Profiling & timing observability.

The reference's performance observability is wall-clock timing inside
evaluators (SURVEY.md §5 "Tracing/profiling: none").  The TPU rebuild gets a
strict upgrade: ``jax.profiler`` trace capture (viewable in XProf/
TensorBoard) plus a lightweight stage timer that is safe in production code.
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: str | Path = "outputs/traces") -> Iterator[None]:
    """Capture a jax.profiler trace of the enclosed block."""
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulates wall-clock per named stage; JSON-serializable summary.

    >>> timer = StageTimer()
    >>> with timer.stage("mel"): ...
    >>> with timer.stage("decode"): ...
    >>> timer.summary()  # {"mel": {...}, "decode": {...}}
    """

    def __init__(self):
        self._stats: dict[str, list[float]] = {}

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._stats.setdefault(name, []).append(time.perf_counter() - t0)

    def summary(self) -> dict:
        import numpy as np

        out = {}
        for name, times in self._stats.items():
            arr = np.asarray(times)
            out[name] = {
                "count": len(times),
                "total_s": float(arr.sum()),
                "mean_s": float(arr.mean()),
                "p50_s": float(np.percentile(arr, 50)),
                "max_s": float(arr.max()),
            }
        return out

    def dump(self, path: str | Path) -> None:
        Path(path).write_text(json.dumps(self.summary(), indent=2))


def block_until_ready_via_host(x) -> None:
    """Force completion including through async-dispatch plugins where
    ``block_until_ready`` can return early: touch one scalar on the host.

    EVERY leaf is touched — leaves can come from separate dispatches, and
    syncing only the first let later kernels still run when a timing
    measurement stopped (undercounting the stage)."""
    import jax
    import numpy as np

    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf)
