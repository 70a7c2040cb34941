"""Checkpoint / resume: persist and restore integrator state.

The reference has no checkpointing (SURVEY.md §5); the nearest artifact is
its full-state serialization under ``data_trace``. Here the carry pytree IS
the checkpoint by construction: every field needed to resume — the phi
history, coefficients, counters, root brackets — lives in ``IdaState``.
These helpers write/read it as an .npz archive (self-contained, no orbax
dependency for small states; ensembles of any batch shape round-trip).

Security: the archive contains ONLY arrays and a JSON tree spec — no
pickled objects — so loading an untrusted checkpoint cannot execute code
(ADVICE r2; version-2 archives used a pickled treedef and are still
readable, but only when ``allow_pickle=True`` is passed explicitly).
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from ..core.state import IdaState

_META_KEY = "__ida_tpu_meta__"
_PDATA_TREEDEF_KEY = "__pdata_treedef__"  # version-2 pickled treedef (legacy)


def _encode_skeleton(tree, counter):
    """JSON-encodable skeleton of a pytree: leaves become {"leaf": i} in
    flatten order; containers become tagged nodes. Supports the standard
    containers (tuple/list/dict-with-str-keys/None). Namedtuples round-trip
    as plain tuples (their class cannot be reconstructed without pickle)."""
    if tree is None:
        return {"t": "none"}
    if isinstance(tree, dict):
        if not all(isinstance(k, str) for k in tree):
            raise TypeError(
                "checkpoint pdata dicts must have string keys to serialize "
                "without pickle"
            )
        keys = sorted(tree)  # JAX flattens dicts in sorted-key order
        return {"t": "dict", "k": keys,
                "v": [_encode_skeleton(tree[k], counter) for k in keys]}
    if isinstance(tree, (list, tuple)):
        tag = "list" if isinstance(tree, list) else "tuple"
        return {"t": tag, "v": [_encode_skeleton(x, counter) for x in tree]}
    # a leaf (array / scalar)
    i = counter[0]
    counter[0] += 1
    return {"t": "leaf", "i": i}


def _decode_skeleton(spec, leaves):
    t = spec["t"]
    if t == "none":
        return None
    if t == "dict":
        return {k: _decode_skeleton(v, leaves) for k, v in zip(spec["k"], spec["v"])}
    if t == "list":
        return [_decode_skeleton(v, leaves) for v in spec["v"]]
    if t == "tuple":
        return tuple(_decode_skeleton(v, leaves) for v in spec["v"])
    if t == "leaf":
        return leaves[spec["i"]]
    raise ValueError(f"unknown checkpoint tree node type {t!r}")


def save_state(path: str, state: IdaState) -> None:
    """Write an IdaState (single or batched) to ``path`` (.npz).

    ``pdata`` (the user preconditioner workspace) may be ANY pytree built
    from standard containers (tuples/lists/str-keyed dicts/None) of arrays:
    it is flattened and its structure stored as a JSON tree spec, so a
    custom preconditioner's state round-trips exactly without pickle
    (non-tuple pdata was silently dropped before ADVICE r1; the pickled
    treedef of the v2 format was an arbitrary-code-execution hazard on
    untrusted files, ADVICE r2)."""
    arrays = {}
    pdata_leaves, _ = jax.tree_util.tree_flatten(state.pdata)
    skeleton = _encode_skeleton(state.pdata, [0])
    for name, value in state._asdict().items():
        if name == "pdata":
            for i, leaf in enumerate(pdata_leaves):
                arrays[f"pdata_{i}"] = np.asarray(leaf)
            continue
        arrays[name] = np.asarray(value)
    meta = {
        "version": 3,
        "pdata_leaves": [f"pdata_{i}" for i in range(len(pdata_leaves))],
        "pdata_skeleton": skeleton,
    }
    arrays[_META_KEY] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_state(path: str, *, allow_pickle: bool = False) -> IdaState:
    """Read an IdaState written by :func:`save_state`.

    ``allow_pickle`` is required only for legacy version-2 archives (which
    stored a pickled treedef); leave it False for anything untrusted."""
    with np.load(path) as data:
        meta = json.loads(bytes(data[_META_KEY].tobytes()).decode())
        leaves = [jnp.asarray(data[k]) for k in meta["pdata_leaves"]]
        if "pdata_skeleton" in meta:  # version >= 3: structural JSON spec
            pdata = _decode_skeleton(meta["pdata_skeleton"], leaves)
        elif _PDATA_TREEDEF_KEY in data:  # version-2 pickled treedef
            if not allow_pickle:
                raise ValueError(
                    "legacy version-2 checkpoint stores a pickled treedef; "
                    "pass allow_pickle=True only if the file is trusted"
                )
            import pickle

            treedef = pickle.loads(bytes(data[_PDATA_TREEDEF_KEY].tobytes()))
            pdata = jax.tree_util.tree_unflatten(treedef, leaves)
        else:  # version-1 archives stored pdata as a flat tuple
            pdata = tuple(leaves)
        fields = {}
        for name in IdaState._fields:
            if name == "pdata":
                fields[name] = pdata
            elif name == "yQ" and name not in data:
                # archives written before the quadrature accumulator
                # existed: restore the no-quadrature default WITH the
                # archive's batch layout (else a [1] leaf breaks vmap over
                # a restored ensemble). phi is [K1,N] single, [B,K1,N]
                # batch-leading, [K1,N,B] batch-native (K1 = MXORDP1 = 6).
                phi = np.asarray(data["phi"])
                if phi.ndim == 2:
                    shape = (1,)
                elif phi.shape[0] == 6 and phi.shape[1] != 6:
                    shape = (1, phi.shape[-1])  # batch-native trailing B
                else:
                    shape = (phi.shape[0], 1)  # batch-leading
                fields[name] = jnp.zeros(shape, jnp.asarray(data["yy"]).dtype)
            elif (
                name in ("ls_tn", "ls_cj", "ls_yy", "ls_yp")
                and name not in data
            ):
                # archives written before the refined-mode lsetup point
                # existed: scalar fields take tn's batch layout, the
                # (refined-only) vectors restore empty with the batch
                # layout derived as for yQ above
                tn = jnp.asarray(data["tn"])
                if name in ("ls_tn", "ls_cj"):
                    fields[name] = jnp.zeros_like(tn)
                else:
                    phi = np.asarray(data["phi"])
                    dt = jnp.asarray(data["yy"]).dtype
                    if phi.ndim == 2:
                        shape = (0,)
                    elif phi.shape[0] == 6 and phi.shape[1] != 6:
                        shape = (0, phi.shape[-1])  # batch-native
                    else:
                        shape = (phi.shape[0], 0)  # batch-leading
                    fields[name] = jnp.zeros(shape, dt)
            else:
                fields[name] = jnp.asarray(data[name])
    return IdaState(**fields)
