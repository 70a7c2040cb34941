"""Checkpoint / resume: persist and restore integrator state.

The reference has no checkpointing (SURVEY.md §5); the nearest artifact is
its full-state serialization under ``data_trace``. Here the carry pytree IS
the checkpoint by construction: every field needed to resume — the phi
history, coefficients, counters, root brackets — lives in ``IdaState``.
These helpers write/read it as an .npz archive (self-contained, no orbax
dependency for small states; ensembles of any batch shape round-trip).
"""

from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

from ..core.state import IdaState

_META_KEY = "__ida_tpu_meta__"


def save_state(path: str, state: IdaState) -> None:
    """Write an IdaState (single or batched) to ``path`` (.npz)."""
    arrays = {}
    pdata_leaves = []
    for name, value in state._asdict().items():
        if name == "pdata":
            if isinstance(value, tuple):
                for i, leaf in enumerate(value):
                    arrays[f"pdata_{i}"] = np.asarray(leaf)
                    pdata_leaves.append(f"pdata_{i}")
            continue
        arrays[name] = np.asarray(value)
    meta = {"version": 1, "pdata_leaves": pdata_leaves}
    arrays[_META_KEY] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_state(path: str) -> IdaState:
    """Read an IdaState written by :func:`save_state`."""
    with np.load(path) as data:
        meta = json.loads(bytes(data[_META_KEY].tobytes()).decode())
        fields = {}
        for name in IdaState._fields:
            if name == "pdata":
                fields[name] = tuple(
                    jnp.asarray(data[k]) for k in meta["pdata_leaves"]
                )
            else:
                fields[name] = jnp.asarray(data[name])
    return IdaState(**fields)
