"""Checkpoint/resume: the state pytree round-trips and integration resumes
bit-identically (SURVEY.md §5 checkpoint equivalent)."""

import jax.numpy as jnp
import numpy as np

from ida_tpu import IDA
from ida_tpu.models import roberts_problem, ROBERTS_YY0, ROBERTS_YP0
from ida_tpu.tol_control import tol_sv
from ida_tpu.utils.checkpoint import save_state, load_state


def test_checkpoint_resume_bit_identical(tmp_path):
    tol = tol_sv(1e-4, jnp.array([1e-8, 1e-6, 1e-6]))

    # run A: straight through two decades
    ida_a = IDA(roberts_problem(with_roots=False), ROBERTS_YY0, ROBERTS_YP0, tol)
    ida_a.solve(0.4)
    ida_a.solve(4.0)

    # run B: checkpoint after the first decade, restore into a fresh solver
    ida_b = IDA(roberts_problem(with_roots=False), ROBERTS_YY0, ROBERTS_YP0, tol)
    ida_b.solve(0.4)
    path = tmp_path / "ck.npz"
    save_state(str(path), ida_b.state)

    ida_c = IDA(roberts_problem(with_roots=False), ROBERTS_YY0, ROBERTS_YP0, tol)
    ida_c.state = load_state(str(path))
    ida_c.solve(4.0)

    np.testing.assert_array_equal(ida_c.get_yy(), ida_a.get_yy())
    assert ida_c.get_num_steps() == ida_a.get_num_steps()
    np.testing.assert_array_equal(
        np.asarray(ida_c.state.phi), np.asarray(ida_a.state.phi)
    )


def test_checkpoint_batched(tmp_path):
    from ida_tpu.models import roberts_factory, ROBERTS_PARAMS
    from ida_tpu.parallel import EnsembleIDA

    b = 4
    params = jnp.tile(jnp.asarray(ROBERTS_PARAMS), (b, 1))
    yy0 = jnp.tile(jnp.asarray(ROBERTS_YY0), (b, 1))
    yp0 = jnp.tile(jnp.asarray(ROBERTS_YP0), (b, 1))
    tol = tol_sv(1e-4, jnp.array([1e-8, 1e-6, 1e-6]))
    ens = EnsembleIDA(roberts_factory, params, yy0, yp0, tol)
    ens.solve(0.4)
    path = tmp_path / "ens.npz"
    save_state(str(path), ens.states)
    restored = load_state(str(path))
    np.testing.assert_array_equal(np.asarray(restored.phi), np.asarray(ens.states.phi))
    assert restored.nst.shape == (b,)


def test_checkpoint_legacy_no_yq_batched(tmp_path):
    """Archives written before the quadrature accumulator existed have no
    yQ entry; the fallback must reconstruct it WITH the archive's batch
    layout, or vmapped use of the restored ensemble fails with
    'inconsistent sizes for array axes to be mapped'."""
    from ida_tpu.models import roberts_factory, ROBERTS_PARAMS
    from ida_tpu.parallel import EnsembleIDA

    b = 4
    params = jnp.tile(jnp.asarray(ROBERTS_PARAMS), (b, 1))
    yy0 = jnp.tile(jnp.asarray(ROBERTS_YY0), (b, 1))
    yp0 = jnp.tile(jnp.asarray(ROBERTS_YP0), (b, 1))
    tol = tol_sv(1e-4, jnp.array([1e-8, 1e-6, 1e-6]))
    ens = EnsembleIDA(roberts_factory, params, yy0, yp0, tol)
    ens.solve(0.4)
    path = tmp_path / "ens.npz"
    save_state(str(path), ens.states)

    # simulate a pre-yQ archive: rewrite without the yQ entry
    legacy = tmp_path / "legacy.npz"
    with np.load(str(path)) as data:
        arrays = {k: data[k] for k in data.files if k != "yQ"}
    np.savez(str(legacy), **arrays)

    restored = load_state(str(legacy))
    assert restored.yQ.shape == (b, 1), restored.yQ.shape
    # and the restored ensemble actually resumes under vmap
    ens2 = EnsembleIDA(roberts_factory, params, yy0, yp0, tol)
    ens2.states = restored
    ens2.solve(4.0)
    assert np.all(np.asarray(ens2.states.nst) > 0)


def test_checkpoint_pdata_pytree(tmp_path):
    """pdata may be any pytree (dict, nested); it must round-trip exactly
    rather than being silently dropped (ADVICE r1)."""
    tol = tol_sv(1e-4, jnp.array([1e-8, 1e-6, 1e-6]))
    ida = IDA(roberts_problem(with_roots=False), ROBERTS_YY0, ROBERTS_YP0, tol)
    ida.solve(0.4)
    pdata = {"diag": jnp.arange(3.0), "nested": (jnp.ones(2), jnp.zeros((2, 2)))}
    ida.state = ida.state._replace(pdata=pdata)
    path = tmp_path / "pd.npz"
    save_state(str(path), ida.state)
    restored = load_state(str(path))
    assert isinstance(restored.pdata, dict)
    np.testing.assert_array_equal(np.asarray(restored.pdata["diag"]), np.arange(3.0))
    np.testing.assert_array_equal(
        np.asarray(restored.pdata["nested"][1]), np.zeros((2, 2))
    )


def _decade1_state():
    tol = tol_sv(1e-4, jnp.array([1e-8, 1e-6, 1e-6]))
    ida = IDA(roberts_problem(with_roots=False), ROBERTS_YY0, ROBERTS_YP0, tol)
    ida.solve(0.4)
    return ida


def _rewrite_npz(src, dst, drop=(), add=None):
    with np.load(str(src)) as data:
        arrays = {k: data[k] for k in data.files if k not in drop}
    if add:
        arrays.update(add)
    np.savez(str(dst), **arrays)


def test_checkpoint_v2_pickled_treedef_guard(tmp_path):
    """Version-2 archives stored a pickled treedef: loading must refuse by
    default (arbitrary-code-execution hazard on untrusted files, ADVICE r2)
    and round-trip only under an explicit allow_pickle=True."""
    import json as _json
    import pickle
    import pytest
    import jax

    from ida_tpu.utils.checkpoint import _META_KEY, _PDATA_TREEDEF_KEY

    ida = _decade1_state()
    pdata = (jnp.arange(3.0), jnp.ones(2))
    ida.state = ida.state._replace(pdata=pdata)
    v3 = tmp_path / "v3.npz"
    save_state(str(v3), ida.state)

    # rebuild as a v2 archive: same leaves, pickled treedef, no skeleton
    _, treedef = jax.tree_util.tree_flatten(pdata)
    meta = {"version": 2, "pdata_leaves": ["pdata_0", "pdata_1"]}
    v2 = tmp_path / "v2.npz"
    _rewrite_npz(v3, v2, drop=(_META_KEY,), add={
        _META_KEY: np.frombuffer(_json.dumps(meta).encode(), dtype=np.uint8),
        _PDATA_TREEDEF_KEY: np.frombuffer(pickle.dumps(treedef),
                                          dtype=np.uint8),
    })

    with pytest.raises(ValueError, match="pickle"):
        load_state(str(v2))
    restored = load_state(str(v2), allow_pickle=True)
    assert isinstance(restored.pdata, tuple) and len(restored.pdata) == 2
    np.testing.assert_array_equal(np.asarray(restored.pdata[0]),
                                  np.arange(3.0))


def test_checkpoint_v1_flat_tuple(tmp_path):
    """Version-1 archives had neither skeleton nor treedef: pdata restores
    as a flat tuple of the stored leaves."""
    import json as _json

    from ida_tpu.utils.checkpoint import _META_KEY

    ida = _decade1_state()
    ida.state = ida.state._replace(pdata=(jnp.arange(4.0),))
    v3 = tmp_path / "v3.npz"
    save_state(str(v3), ida.state)
    meta = {"version": 1, "pdata_leaves": ["pdata_0"]}
    v1 = tmp_path / "v1.npz"
    _rewrite_npz(v3, v1, drop=(_META_KEY,), add={
        _META_KEY: np.frombuffer(_json.dumps(meta).encode(), dtype=np.uint8),
    })
    restored = load_state(str(v1))
    assert isinstance(restored.pdata, tuple)
    np.testing.assert_array_equal(np.asarray(restored.pdata[0]),
                                  np.arange(4.0))


def test_checkpoint_pre_refined_archive(tmp_path):
    """Archives written before the ls_* (refined-mode lsetup point) fields
    existed backfill scalars with tn's layout and vectors empty — single
    instance AND batch-native layouts — and the restored state resumes."""
    ida = _decade1_state()
    path = tmp_path / "ck.npz"
    save_state(str(path), ida.state)
    legacy = tmp_path / "legacy.npz"
    _rewrite_npz(path, legacy, drop=("ls_tn", "ls_cj", "ls_yy", "ls_yp"))
    restored = load_state(str(legacy))
    assert restored.ls_tn.shape == restored.tn.shape
    assert restored.ls_yy.shape == (0,)
    ida2 = IDA(roberts_problem(with_roots=False), ROBERTS_YY0, ROBERTS_YP0,
               tol_sv(1e-4, jnp.array([1e-8, 1e-6, 1e-6])))
    ida2.state = restored
    ida2.solve(4.0)
    assert ida2.get_num_steps() > 0

    # batch-native trailing-B layout: phi is [6, N, B]
    import jax

    b = 3
    stb = jax.tree_util.tree_map(
        lambda x: jnp.moveaxis(jnp.stack([x] * b), 0, -1), ida.state
    )
    pathb = tmp_path / "ckb.npz"
    save_state(str(pathb), stb)
    legacyb = tmp_path / "legacyb.npz"
    _rewrite_npz(pathb, legacyb, drop=("ls_tn", "ls_cj", "ls_yy", "ls_yp",
                                       "yQ"))
    restb = load_state(str(legacyb))
    assert restb.ls_yy.shape == (0, b)
    assert restb.yQ.shape == (1, b)


def test_checkpoint_pre_yq_single_instance(tmp_path):
    """The pre-yQ backfill for a SINGLE instance (phi.ndim == 2)."""
    ida = _decade1_state()
    path = tmp_path / "ck.npz"
    save_state(str(path), ida.state)
    legacy = tmp_path / "legacy.npz"
    _rewrite_npz(path, legacy, drop=("yQ",))
    restored = load_state(str(legacy))
    assert restored.yQ.shape == (1,)


def test_checkpoint_skeleton_rejects_bad_input(tmp_path):
    """Non-string dict keys cannot serialize without pickle (TypeError);
    an unknown skeleton node type fails loudly (ValueError)."""
    import pytest

    from ida_tpu.utils.checkpoint import _decode_skeleton

    ida = _decade1_state()
    ida.state = ida.state._replace(pdata={1: jnp.ones(2)})
    with pytest.raises(TypeError, match="string keys"):
        save_state(str(tmp_path / "bad.npz"), ida.state)
    with pytest.raises(ValueError, match="unknown checkpoint tree node"):
        _decode_skeleton({"t": "mystery"}, [])
