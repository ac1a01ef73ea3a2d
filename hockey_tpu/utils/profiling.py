"""Device tracing hooks (SURVEY.md §5: the reference has only tqdm; we add
jax.profiler traces + the per-stage wall clocks in utils/metrics.py)."""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace (TensorBoard format) around a block.
    No-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the device trace (shows in the profiler timeline)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
