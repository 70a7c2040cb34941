"""Step-attempt trace regression against a committed golden fixture.

The reference diffs its per-attempt JSON trace against an instrumented-C
``serialize_c.json`` in scripts/data_trace.ipynb (SURVEY.md §4.3b). Here the
committed fixture tests/fixtures/roberts_decade1_trace.jsonl was captured
from a build whose step-for-step C parity is proven by exact statistics
(tests/test_roberts_e2e.py: nst/nre/nje/nni/netf match canonical C IDA), so
any attempt-level numerical drift in the core is caught immediately — and
scripts/compare_traces.py localizes the first diverging attempt and field.
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


def _fresh_trace():
    tol = tol_sv(1e-4, jnp.array([1e-8, 1e-6, 1e-6]))
    ida = IDA(roberts_problem(with_roots=False), ROBERTS_YY0, ROBERTS_YP0, tol,
              options=IdaOptions(debug_trace=True))
    with DataTrace() as tr:
        ida.solve(0.4)
    return tr.records


def test_attempt_trace_matches_golden_fixture(tmp_path):
    golden = [json.loads(l) for l in FIXTURE.read_text().splitlines() if l.strip()]
    fresh = _fresh_trace()
    assert len(fresh) == len(golden), (len(fresh), len(golden))
    for i, (ra, rb) in enumerate(zip(golden, fresh)):
        assert set(ra) == set(rb), f"attempt {i}: field sets differ"
        for key in sorted(ra):
            va = np.asarray(ra[key], float)
            vb = np.asarray(rb[key], float)
            assert va.shape == vb.shape, (i, key)
            # FMA/fusion differences allowed up to the parity target
            np.testing.assert_allclose(
                vb, va, rtol=1e-10, atol=1e-20,
                err_msg=f"attempt {i}, field {key}",
            )


def test_compare_traces_tool_on_fixture(tmp_path):
    """The trace-diff CLI passes on (fixture, fresh) and localizes an
    injected divergence."""
    sys.path.insert(0, str(REPO / "scripts"))
    try:
        import compare_traces
    finally:
        sys.path.pop(0)

    fresh = _fresh_trace()
    fresh_path = tmp_path / "fresh.jsonl"
    fresh_path.write_text("\n".join(json.dumps(r) for r in fresh))

    old_argv = sys.argv
    try:
        sys.argv = ["compare_traces", str(FIXTURE), str(fresh_path),
                    "--atol", "1e-18", "--rtol", "1e-10"]
        assert compare_traces.main() == 0

        bad = [dict(r) for r in fresh]
        bad[7]["hh"] = bad[7]["hh"] * (1 + 1e-6)
        bad_path = tmp_path / "bad.jsonl"
        bad_path.write_text("\n".join(json.dumps(r) for r in bad))
        sys.argv = ["compare_traces", str(FIXTURE), str(bad_path),
                    "--atol", "1e-18", "--rtol", "1e-10"]
        assert compare_traces.main() == 1
    finally:
        sys.argv = old_argv
