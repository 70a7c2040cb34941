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
