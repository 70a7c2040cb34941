"""The bench artifact must be CAPTURABLE by the driver (VERDICT r3 item 1).

The driver keeps only the last ~2000 bytes of combined stdout/stderr and
parses a JSON line out of that window; rounds 2 and 3 both lost their
evidence to this (overflowing single line; watchdog kill before any
print). These tests pin the two properties that make the artifact
un-losable:

  * every printed headline line is COMPACT (< 1500 bytes), and
  * the line is printed EARLY (more than once — once right after the
    headline leg, again at the end), so a later wedge cannot lose it.

Run via ``python bench.py --smoke`` (CPU, tiny batch) so this stays a
fast pure-CPU test. Reference role: the driver-facing half of
benches/dense.rs's criterion report.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def smoke_output():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["IDA_BENCH_DETAIL"] = "/tmp/BENCH_DETAIL_test.json"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--smoke"],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def _json_lines(stdout):
    recs = []
    for line in stdout.splitlines():
        if line.startswith("{"):
            recs.append(json.loads(line))
    return recs


def test_headline_lines_compact_and_repeated(smoke_output):
    recs = _json_lines(smoke_output)
    # printed at least twice: early (right after the headline leg) and
    # as the final line — a wedge between them cannot lose the record
    assert len(recs) >= 2
    for line in smoke_output.splitlines():
        if line.startswith("{"):
            assert len(line.encode()) < 1500, (
                f"headline line is {len(line.encode())} B; the driver tail "
                f"window is ~2000 B (BENCH_r02 overflowed it)"
            )


def test_headline_schema(smoke_output):
    recs = _json_lines(smoke_output)
    last = recs[-1]
    for key in ("metric", "value", "unit", "vs_baseline", "value_median"):
        assert key in last, key
    assert last["unit"] == "steps/sec"
    assert last["value"] > 0
    d = last["detail"]
    for key in ("total_steps", "wall_best_s", "pipeline", "ok_lanes",
                "oracle_best", "detail_file", "legs_err", "legs_skipped"):
        assert key in d, key
    # ADVICE r3: the wall/pipeline division is TPU-only; CPU must run
    # single-dispatch
    assert d["pipeline"] == 1
    # every smoke lane converged
    assert d["ok_lanes"] == d["lanes"]


def test_detail_file_written(smoke_output):
    with open("/tmp/BENCH_DETAIL_test.json") as f:
        detail = json.load(f)
    assert "headline" in detail
    assert "leg_errors" in detail and isinstance(detail["leg_errors"], dict)
    assert "legs_skipped" in detail
