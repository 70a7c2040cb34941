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
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import IdaState

_META_KEY = "__ida_tpu_meta__"
_PDATA_TREEDEF_KEY = "__pdata_treedef__"


def save_state(path: str, state: IdaState) -> None:
    """Write an IdaState (single or batched) to ``path`` (.npz).

    ``pdata`` (the user preconditioner workspace) may be ANY pytree of
    arrays: it is flattened and its treedef pickled into the archive, so a
    custom preconditioner's state round-trips exactly (previously non-tuple
    pdata was silently dropped — ADVICE r1)."""
    arrays = {}
    pdata_leaves, pdata_treedef = jax.tree_util.tree_flatten(state.pdata)
    for name, value in state._asdict().items():
        if name == "pdata":
            for i, leaf in enumerate(pdata_leaves):
                arrays[f"pdata_{i}"] = np.asarray(leaf)
            continue
        arrays[name] = np.asarray(value)
    meta = {
        "version": 2,
        "pdata_leaves": [f"pdata_{i}" for i in range(len(pdata_leaves))],
    }
    arrays[_META_KEY] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    arrays[_PDATA_TREEDEF_KEY] = np.frombuffer(
        pickle.dumps(pdata_treedef), dtype=np.uint8
    )
    np.savez_compressed(path, **arrays)


def load_state(path: str) -> IdaState:
    """Read an IdaState written by :func:`save_state`."""
    with np.load(path) as data:
        meta = json.loads(bytes(data[_META_KEY].tobytes()).decode())
        leaves = [jnp.asarray(data[k]) for k in meta["pdata_leaves"]]
        if _PDATA_TREEDEF_KEY in data:
            treedef = pickle.loads(bytes(data[_PDATA_TREEDEF_KEY].tobytes()))
            pdata = jax.tree_util.tree_unflatten(treedef, leaves)
        else:  # version-1 archives stored pdata as a flat tuple
            pdata = tuple(leaves)
        fields = {}
        for name in IdaState._fields:
            if name == "pdata":
                fields[name] = pdata
            else:
                fields[name] = jnp.asarray(data[name])
    return IdaState(**fields)
