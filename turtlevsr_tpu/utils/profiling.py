"""Profiling / tracing hooks.

The reference has only manual wall-clock timers (SURVEY.md §5); here the
equivalents plus real device traces:

  * ``trace(logdir)`` — jax.profiler trace context (view in TensorBoard /
    Perfetto),
  * ``annotate(name)`` — named trace span,
  * ``Timer`` — the train loop's iter/data wall-clock timer,
  * ``device_sync(x)`` — an honest device sync (fetches a few elements to
    host; ``block_until_ready`` can return early through remote TPU
    transports).
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


def device_sync(tree) -> None:
    import jax

    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "ravel"):
            np.asarray(leaf.ravel()[:1])
            break


class Timer:
    def __init__(self):
        self.t = time.perf_counter()

    def lap(self) -> float:
        now = time.perf_counter()
        dt, self.t = now - self.t, now
        return dt
