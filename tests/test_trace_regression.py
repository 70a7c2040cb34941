"""Cross-engine per-step-attempt trace diff: JAX engine vs native C++ oracle.

The reference's decisive parity tool streams the entire solver struct every
step attempt (reference src/lib.rs:635-639) and np.allclose-diffs it
field-by-field against an instrumented C SUNDIALS run
(reference scripts/data_trace.ipynb). Here BOTH halves live in-repo:

  * JAX half: ``IdaOptions(debug_trace=True)`` + ``utils/trace.py`` emits
    every ``TRACE_FIELDS`` value at the top of every step attempt
    (core/step.py attempt_once).
  * Native half: ``Ida::dump_trace`` in ida_tpu/native/ida_oracle.cpp dumps
    the same field names at the same instant (top of the step retry loop),
    via ``oracle_solve_traced``.

The committed fixture ``tests/fixtures/roberts_decade1_trace.jsonl`` is the
NATIVE oracle's capture (an independent engine, not a snapshot of this
build), so the golden anchor is cross-engine. Regenerate it with::

    python -c "import tests.test_trace_regression as t; t.regen_fixture()"

Tolerances: primary state (phi/psi/coeffs/vectors/LU/counters/times) agrees
to <= 1e-12 relative with a 1e-14 absolute floor for ~1e-17-level FMA noise
on tiny components. The three Newton-rate diagnostics (ss, oldnrm, rr) pass
through ``rate/(1-rate)`` and ``pow(2*err+1e-4, -1/(k+1))`` which amplify
that input noise by ~1e3-1e4; they get a 1e-10 relative / 1e-12 absolute
budget (measured cross-engine agreement: ss <= 1.4e-13 abs, rr <= 1.2e-12
rel — an order of magnitude inside these bounds).
"""

import json
import pathlib
import sys

import jax.numpy as jnp
import numpy as np

from ida_tpu import IDA, IdaOptions
from ida_tpu.models import roberts_problem, ROBERTS_YY0, ROBERTS_YP0
from ida_tpu.tol_control import tol_sv
from ida_tpu.utils.trace import DataTrace

FIXTURE = pathlib.Path(__file__).parent / "fixtures" / "roberts_decade1_trace.jsonl"
REPO = pathlib.Path(__file__).resolve().parents[1]

# the cross-engine field subset dumped by Ida::dump_trace (ida_oracle.cpp);
# must stay a subset of ida_tpu.utils.trace.TRACE_FIELDS
NATIVE_TRACE_FIELDS = frozenset({
    "phi", "psi", "alpha", "beta", "sigma", "gamma",
    "ee", "yy", "yp", "yypredict", "yppredict", "ewt", "savres",
    "tn", "hh", "hused", "rr",
    "kk", "kused", "knew", "phase", "ns",
    "cj", "cjlast", "cjold", "cjratio", "ss", "oldnrm",
    "eps_newt", "toldel", "lu", "piv",
    "nst", "nre", "ncfn", "netf", "nni", "nsetups", "nje",
})
# Newton-rate diagnostics: noise-amplified derived quantities (see module
# docstring) — looser budget than primary state
RATE_FIELDS = frozenset({"ss", "oldnrm", "rr"})

RTOL, ATOL = 1e-4, np.array([1e-8, 1e-6, 1e-6])
TOUT = 0.4  # decade 1


def _np_res(t, y, yp):
    r0 = -0.04 * y[0] + 1.0e4 * y[1] * y[2]
    return np.array([r0 - yp[0], -r0 - 3.0e7 * y[1] ** 2 - yp[1],
                     y[0] + y[1] + y[2] - 1.0])


def _np_jac(t, cj, y, yp, r):
    return np.array([
        [-0.04 - cj, 1.0e4 * y[2], 1.0e4 * y[1]],
        [0.04, -1.0e4 * y[2] - 6.0e7 * y[1] - cj, -1.0e4 * y[1]],
        [1.0, 1.0, 1.0],
    ])


def _native_trace(path) -> list[dict]:
    """Run the native oracle over decade 1 with the per-attempt dump on."""
    from ida_tpu.native import oracle_solve_traced

    ret, _, _ = oracle_solve_traced(
        _np_res, _np_jac, [1.0, 0.0, 0.0], [-0.04, 0.04, 0.0], [TOUT],
        RTOL, ATOL, path,
    )
    assert ret == 0
    return [json.loads(l) for l in open(path) if l.strip()]


def regen_fixture() -> None:
    _native_trace(str(FIXTURE))
    print(f"regenerated {FIXTURE}")


def _fresh_jax_trace():
    tol = tol_sv(RTOL, jnp.asarray(ATOL))
    ida = IDA(roberts_problem(with_roots=False), ROBERTS_YY0, ROBERTS_YP0, tol,
              options=IdaOptions(debug_trace=True))
    with DataTrace() as tr:
        ida.solve(TOUT)
    return tr.records


def _assert_traces_agree(native: list[dict], jax_recs: list[dict]):
    assert len(native) == len(jax_recs), (len(native), len(jax_recs))
    for i, (ra, rb) in enumerate(zip(native, jax_recs)):
        shared = set(ra) & set(rb)
        # no silent shrinkage: every cross-engine field must be present
        assert shared == NATIVE_TRACE_FIELDS, (i, NATIVE_TRACE_FIELDS ^ shared)
        for key in sorted(shared):
            va = np.asarray(ra[key], float)
            vb = np.asarray(rb[key], float)
            assert va.shape == vb.shape, (i, key)
            rtol, atol = ((1e-10, 1e-12) if key in RATE_FIELDS
                          else (1e-12, 1e-14))
            np.testing.assert_allclose(
                vb, va, rtol=rtol, atol=atol,
                err_msg=f"attempt {i}, field {key}",
            )


def test_jax_trace_matches_native_fixture():
    """Every field of every step attempt matches the committed native-oracle
    capture — the cross-engine golden anchor."""
    golden = [json.loads(l) for l in FIXTURE.read_text().splitlines() if l.strip()]
    _assert_traces_agree(golden, _fresh_jax_trace())


def test_live_cross_engine_trace_diff(tmp_path):
    """Fixture-independent: rebuild the native trace NOW and diff — guards
    both engines and the fixture's own staleness."""
    native = _native_trace(str(tmp_path / "native.jsonl"))
    _assert_traces_agree(native, _fresh_jax_trace())


def test_compare_traces_tool_localizes_divergence(tmp_path):
    """The trace-diff CLI passes on (native fixture, fresh JAX) and localizes
    an injected divergence."""
    sys.path.insert(0, str(REPO / "scripts"))
    try:
        import compare_traces
    finally:
        sys.path.pop(0)

    fresh = _fresh_jax_trace()
    fresh_path = tmp_path / "fresh.jsonl"
    fresh_path.write_text("\n".join(json.dumps(r) for r in fresh))

    old_argv = sys.argv
    try:
        sys.argv = ["compare_traces", str(FIXTURE), str(fresh_path),
                    "--atol", "1e-12", "--rtol", "1e-10"]
        assert compare_traces.main() == 0

        bad = [dict(r) for r in fresh]
        bad[7]["hh"] = bad[7]["hh"] * (1 + 1e-6)
        bad_path = tmp_path / "bad.jsonl"
        bad_path.write_text("\n".join(json.dumps(r) for r in bad))
        sys.argv = ["compare_traces", str(FIXTURE), str(bad_path),
                    "--atol", "1e-12", "--rtol", "1e-10"]
        assert compare_traces.main() == 1
    finally:
        sys.argv = old_argv
