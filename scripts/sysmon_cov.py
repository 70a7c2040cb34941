"""Line coverage for the test suite via sys.monitoring (PEP 669).

Role of the reference's kcov coverage stage (.gitlab-ci.yml:53-58): the
reference runs its test binaries under kcov and publishes line-coverage
pages. This image has no coverage/pytest-cov module and the stdlib
``trace`` tracer is ~100x overhead (unusable on a multi-hour suite), so
this module implements the same measurement with Python 3.12's
``sys.monitoring``: a LINE callback that records the first hit of each
(code, line) location and then returns ``sys.monitoring.DISABLE`` for it,
so steady-state overhead after warmup is near zero.

Usage (per process — each pytest shard writes its own file):

    IDA_TPU_COV=/tmp/cov_core.json python -m pytest tests/... -q

activation lives in tests/conftest.py. Merge + report:

    python scripts/sysmon_cov.py report /tmp/cov_*.json -o COVERAGE.md

The denominator (executable lines per file) is computed by compiling each
source under ida_tpu/ and walking the code-object tree's ``co_lines()``,
the same universe the collector sees — no heuristics on comments/blank
lines needed.
"""

from __future__ import annotations

import json
import os
import sys
import threading

# repo root = parent of this script's directory
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_PKG = os.path.join(_ROOT, "ida_tpu")

_TOOL = None  # tool id once installed
_hits: dict[str, set[int]] = {}


# _pkg/_hits/_disable bound as defaults: module globals are wiped to None
# during interpreter shutdown while late LINE events can still fire (seen
# from logging's atexit teardown).
def _line_cb(code, line, _pkg=_PKG, _hits=_hits,
             _disable=sys.monitoring.DISABLE, _norm=os.path.normpath):
    # normpath: sys.path entries like "tests/.." leak verbatim into
    # co_filename, so the raw prefix test would miss the package
    fname = _norm(code.co_filename)
    if fname.startswith(_pkg):
        _hits.setdefault(fname, set()).add(line)
    # Either way this exact location never needs to fire again: matching
    # lines are recorded, non-matching code self-prunes.
    return _disable


def start() -> None:
    """Install the LINE monitor on the COVERAGE tool id."""
    global _TOOL
    if _TOOL is not None:
        return
    mon = sys.monitoring
    tid = mon.COVERAGE_ID
    mon.use_tool_id(tid, "ida_tpu_cov")
    mon.register_callback(tid, mon.events.LINE, _line_cb)
    mon.set_events(tid, mon.events.LINE)
    _TOOL = tid


def dump(path: str) -> None:
    """Write this process's hit sets as JSON {relpath: [lines...]}."""
    out = {
        # tuple() snapshots each set first: the LINE callback can still be
        # adding lines from other threads while sorted() iterates
        os.path.relpath(f, _ROOT): sorted(tuple(lines))
        for f, lines in list(_hits.items())
    }
    # tmp name unique per writer: the periodic thread and the
    # atexit/SIGTERM paths may dump concurrently to the same target
    tmp = f"{path}.{os.getpid()}.{threading.get_ident()}.tmp"
    with open(tmp, "w") as fh:
        json.dump(out, fh)
    os.replace(tmp, path)  # atomic: readers never see a torn file


def start_from_env() -> None:
    """If IDA_TPU_COV names a file, collect and dump there at exit.

    Also dumps on SIGTERM (then re-raises the default action) so a
    `timeout`-bounded suite still yields a usable partial report, and
    every 60 s from a dump-only daemon thread so even SIGKILL loses at
    most a minute of hits.
    """
    path = os.environ.get("IDA_TPU_COV")
    if not path:
        return
    start()
    import atexit

    atexit.register(dump, path)

    import signal

    def _on_term(signum, frame):
        # try/finally: a failed dump must never swallow the SIGTERM —
        # the default action is restored and re-raised regardless
        try:
            dump(path)
        finally:
            signal.signal(signum, signal.SIG_DFL)
            signal.raise_signal(signum)

    try:
        signal.signal(signal.SIGTERM, _on_term)
    except ValueError:
        pass  # non-main thread; atexit still covers normal exit

    import threading

    def _periodic():
        import time

        while True:
            time.sleep(60)
            try:
                dump(path)
            except Exception:
                pass

    threading.Thread(target=_periodic, daemon=True).start()


# ---------------------------------------------------------------- report


def _code_lines(code) -> set[int]:
    lines = {ln for *_ , ln in code.co_lines() if ln is not None}
    for const in code.co_consts:
        if hasattr(const, "co_lines"):
            lines |= _code_lines(const)
    return lines


def executable_lines(py_path: str) -> set[int]:
    with open(py_path) as fh:
        src = fh.read()
    return _code_lines(compile(src, py_path, "exec"))


def _iter_sources():
    for dirpath, dirnames, filenames in os.walk(_PKG):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                yield os.path.join(dirpath, fn)


def report(hit_files: list[str], out_md: str | None) -> int:
    merged: dict[str, set[int]] = {}
    for hf in hit_files:
        with open(hf) as fh:
            data = json.load(fh)
        for rel, lines in data.items():
            merged.setdefault(rel, set()).update(lines)

    rows = []
    tot_exec = tot_hit = 0
    for src in _iter_sources():
        rel = os.path.relpath(src, _ROOT)
        execs = executable_lines(src)
        # a hit line not in the static set (e.g. decorator quirks) still
        # counts as executable: union stray hits into the denominator so
        # numerator and denominator stay consistent
        execs |= merged.get(rel, set())
        hits = merged.get(rel, set()) & execs if rel in merged else set()
        tot_exec += len(execs)
        tot_hit += len(hits)
        pct = 100.0 * len(hits) / len(execs) if execs else 100.0
        rows.append((rel, len(hits), len(execs), pct))

    total_pct = 100.0 * tot_hit / tot_exec if tot_exec else 100.0
    lines = [
        "# Test-suite line coverage (ida_tpu/)",
        "",
        "Collected with `scripts/sysmon_cov.py` (sys.monitoring LINE events,",
        "first-hit-then-DISABLE; see module docstring). Role of the",
        "reference's kcov CI stage.",
        "",
        f"**TOTAL: {tot_hit}/{tot_exec} executable lines = {total_pct:.1f}%**",
        "",
        "| file | hit | exec | % |",
        "|---|---|---|---|",
    ]
    for rel, h, e, pct in sorted(rows, key=lambda r: r[3]):
        lines.append(f"| {rel} | {h} | {e} | {pct:.1f} |")
    text = "\n".join(lines) + "\n"
    if out_md:
        with open(out_md, "w") as fh:
            fh.write(text)
    print(f"TOTAL {tot_hit}/{tot_exec} = {total_pct:.1f}%"
          + (f" -> {out_md}" if out_md else ""))
    return 0


def main(argv: list[str]) -> int:
    if len(argv) >= 2 and argv[0] == "report":
        args = argv[1:]
        out = None
        if "-o" in args:
            i = args.index("-o")
            out = args[i + 1]
            args = args[:i] + args[i + 2:]
        hit_files = [a for a in args if os.path.exists(a)]
        missing = [a for a in args if not os.path.exists(a)]
        for a in missing:
            # a shard that crashed before dumping must not silently
            # shrink the report to the surviving shards
            print(f"WARNING: hit file missing (shard crashed before "
                  f"dumping?): {a}", file=sys.stderr)
        if not hit_files:
            print("no hit files found", file=sys.stderr)
            return 1
        return report(hit_files, out)
    print(__doc__)
    return 2


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
