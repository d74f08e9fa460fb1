"""Stdlib line-coverage for the test suite (the pytest-cov analog).

The reference pins a coverage number in its README (86%, measured by
cargo-tarpaulin over `src/` — /root/reference/README.md:19).  This
environment is zero-egress, so pytest-cov/coverage.py cannot be
installed; this ~150-line tool provides the same gate using only the
stdlib `sys.monitoring` API (PEP 669, Python 3.12+):

- a LINE callback records (file, line) for files under ``pixo_tpu/``
  and returns ``sys.monitoring.DISABLE`` so each line fires **once per
  process** — total overhead is O(distinct executed lines), unmeasurable
  against the 2-minute suite;
- the denominator is every executable line of every ``pixo_tpu/**/*.py``
  file, collected by compiling each source and walking the code-object
  tree's ``co_lines()`` tables (the same definition coverage.py uses);
- ``python tests/support/coverage_lite.py --check N`` enforces a floor
  over the JSON report written at session end (``make ci``).

Scope: Python-line coverage of ``pixo_tpu/``.  The C++ tier
(native/core.cpp) is exercised by the same tests but not line-counted
(no gcov in the harness); subprocess-only lines (tests/test_dcn.py
workers, determinism subprocess) are not credited — the floor accounts
for both.
"""

from __future__ import annotations

import json
import os
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
PKG_ROOT = os.path.join(REPO, "pixo_tpu") + os.sep
REPORT = os.path.join(REPO, ".coverage_lite.json")

_active = None


class CoverageLite:
    def __init__(self, root: str = PKG_ROOT):
        self.root = root
        self.hits: dict[str, set[int]] = {}

    # -- collection ------------------------------------------------------
    def _on_line(self, code, line):
        fn = code.co_filename
        if fn.startswith(self.root):
            self.hits.setdefault(fn, set()).add(line)
        return sys.monitoring.DISABLE

    def start(self):
        m = sys.monitoring
        m.use_tool_id(m.COVERAGE_ID, "coverage_lite")
        m.register_callback(m.COVERAGE_ID, m.events.LINE, self._on_line)
        m.set_events(m.COVERAGE_ID, m.events.LINE)

    def stop(self):
        m = sys.monitoring
        m.set_events(m.COVERAGE_ID, 0)
        m.register_callback(m.COVERAGE_ID, m.events.LINE, None)
        m.free_tool_id(m.COVERAGE_ID)

    # -- reporting -------------------------------------------------------
    @staticmethod
    def executable_lines(path: str) -> set[int]:
        with open(path, "r", encoding="utf-8") as f:
            src = f.read()
        try:
            top = compile(src, path, "exec")
        except SyntaxError:
            return set()
        lines: set[int] = set()
        stack = [top]
        while stack:
            c = stack.pop()
            for _start, _end, ln in c.co_lines():
                if ln is not None and ln > 0:
                    lines.add(ln)
            for const in c.co_consts:
                if isinstance(const, types.CodeType):
                    stack.append(const)
        return lines

    def report(self) -> dict:
        files = {}
        total_exec = total_hit = 0
        for dirpath, _dirs, names in os.walk(self.root):
            if "__pycache__" in dirpath:
                continue
            for name in sorted(names):
                if not name.endswith(".py"):
                    continue
                path = os.path.join(dirpath, name)
                ex = self.executable_lines(path)
                if not ex:
                    continue
                hit = self.hits.get(path, set()) & ex
                rel = os.path.relpath(path, REPO)
                files[rel] = {"lines": len(ex), "hit": len(hit),
                              "pct": round(100.0 * len(hit) / len(ex), 1)}
                total_exec += len(ex)
                total_hit += len(hit)
        pct = round(100.0 * total_hit / max(total_exec, 1), 2)
        return {"total_pct": pct, "lines": total_exec, "hit": total_hit,
                "files": files}

    def write_report(self, path: str = REPORT) -> dict:
        rep = self.report()
        with open(path, "w") as f:
            json.dump(rep, f, indent=1, sort_keys=True)
        return rep


def install() -> CoverageLite:
    """Start collection (idempotent). Called from tests/conftest.py at
    import time — before pixo_tpu modules load — so module-level lines
    are credited."""
    global _active
    if _active is None:
        _active = CoverageLite()
        _active.start()
    return _active


def active() -> CoverageLite | None:
    return _active


def summarize(rep: dict, worst: int = 10) -> str:
    rows = sorted(rep["files"].items(), key=lambda kv: kv[1]["pct"])
    out = [f"coverage_lite: {rep['total_pct']}% "
           f"({rep['hit']}/{rep['lines']} lines, pixo_tpu/ Python tier)"]
    for rel, st in rows[:worst]:
        out.append(f"  {st['pct']:5.1f}%  {st['hit']:4d}/{st['lines']:<4d}  {rel}")
    return "\n".join(out)


def main(argv):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--check", type=float, default=None,
                    help="fail if total_pct is below this floor")
    ap.add_argument("--report", default=REPORT)
    ap.add_argument("--worst", type=int, default=10)
    args = ap.parse_args(argv)
    with open(args.report) as f:
        rep = json.load(f)
    print(summarize(rep, args.worst))
    if args.check is not None and rep["total_pct"] < args.check:
        print(f"FAIL: coverage {rep['total_pct']}% < floor {args.check}%")
        return 1
    if args.check is not None:
        print(f"OK: coverage {rep['total_pct']}% >= floor {args.check}%")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
