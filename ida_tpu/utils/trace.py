"""Numerical data-trace: per-step-attempt state dumps for divergence hunting.

Behavioural spec: the reference's ``data_trace`` feature serializes the
entire ``Ida`` struct to JSON every step attempt (reference
src/lib.rs:635-639, analyzed against an instrumented C run in
scripts/data_trace.ipynb). SURVEY.md §4 calls this the tool that made
C-parity achievable; here it is a first-class debug mode.

TPU-first design: inside jit we can't write files, so the step-attempt loop
emits the trace via ``jax.debug.callback`` (ordered side effect) into a
host-side collector when ``IdaOptions.debug_trace`` is on. Works under jit;
under vmap every lane is dumped (the record carries whatever batch shape
the lanes have).
"""

from __future__ import annotations

import json
import threading
from typing import Any, Optional

import numpy as np

_lock = threading.Lock()
_collector: Optional["DataTrace"] = None

TRACE_FIELDS = (
    # mirrors the fields the reference serializes per attempt
    "tn", "hh", "hused", "rr", "kk", "kused", "knew", "ns", "phase",
    "cj", "cjlast", "cjold", "cjratio", "ss",
    "psi", "alpha", "beta", "sigma", "gamma", "phi", "ee",
    "nst", "nre", "nni", "netf", "ncfn",
)


class DataTrace:
    """Host-side collector; use as a context manager around solve calls."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self.records: list[dict] = []
        self._fh = None

    def __enter__(self):
        global _collector
        with _lock:
            _collector = self
        if self.path:
            self._fh = open(self.path, "w")
        return self

    def __exit__(self, *exc):
        global _collector
        with _lock:
            _collector = None
        if self._fh:
            self._fh.close()
            self._fh = None
        return False

    def emit(self, record: dict):
        rec = {
            k: (np.asarray(v).tolist() if np.asarray(v).ndim else float(np.asarray(v)))
            for k, v in record.items()
        }
        self.records.append(rec)
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")


def trace_sink(**record: Any) -> None:
    """The jax.debug.callback target; drops records when no collector is
    active (so debug_trace=True costs little outside a DataTrace block)."""
    c = _collector
    if c is not None:
        c.emit(record)
