"""Profiling hooks.

The reference's profiling is ``thread_profiler`` scopes around each hot
routine producing a Chrome trace (SURVEY.md §5). The TPU-native equivalent
is the XLA profiler: the whole compiled solve shows up as one annotated
program with per-fusion timing.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def profile(trace_dir: str):
    """Capture an XLA/TPU profiler trace around a block::

        with ida_tpu.utils.profiling.profile("/tmp/ida_trace"):
            ens.solve(400.0)

    View with TensorBoard (or xprof). On backends without profiler support
    this degrades to a no-op with a warning.
    """
    try:
        with jax.profiler.trace(trace_dir):
            yield
    except Exception as e:  # pragma: no cover - backend dependent
        import warnings

        warnings.warn(f"ida_tpu: profiler unavailable ({e}); running unprofiled")
        yield
