"""Minimal line-coverage via PEP 669 (sys.monitoring) — stdlib only.

The reference gates CI on coverage (test_coverage.sh:1-70 + lints.toml);
this environment has no coverage/pytest-cov packages, so this module
implements the same gate with Python 3.12's low-overhead monitoring API.

Usage: tests/conftest.py starts collection when BPPT_COVERAGE=1 and writes
`.coverage_report.json` at session end; `scripts/coverage_floor.py` asserts
per-module floors (scripts/check.sh runs both).

Executable-line universe: compiled code objects' line tables (co_lines), the
same universe coverage.py uses, so percentages are honest — docstrings,
blank lines and comments are excluded by construction.
"""

from __future__ import annotations

import json
import os
import sys

_TOOL_ID = 3  # sys.monitoring.PROFILER_ID is 2; 3 is a free slot
_covered: dict = {}
_prefix = ""


def _on_line(code, line):
    fn = code.co_filename
    if fn.startswith(_prefix):
        _covered.setdefault(fn, set()).add(line)
    else:
        return sys.monitoring.DISABLE
    return None


def start(package_dir: str) -> None:
    global _prefix
    _prefix = os.path.abspath(package_dir) + os.sep
    mon = sys.monitoring
    mon.use_tool_id(_TOOL_ID, "bppt-cov")
    mon.register_callback(_TOOL_ID, mon.events.LINE, _on_line)
    mon.set_events(_TOOL_ID, mon.events.LINE)


def _executable_lines(path: str) -> set:
    """All line numbers carrying code, from the compiled module's nested code
    objects (the coverage.py universe)."""
    with open(path, "rb") as f:
        src = f.read()
    lines: set = set()
    stack = [compile(src, path, "exec")]
    while stack:
        code = stack.pop()
        for const in code.co_consts:
            if hasattr(const, "co_lines"):
                stack.append(const)
        for _, _, line in code.co_lines():
            if line is not None and line > 0:
                lines.add(line)
    return lines


def stop_and_report(package_dir: str, out_path: str) -> dict:
    mon = sys.monitoring
    mon.set_events(_TOOL_ID, 0)
    mon.free_tool_id(_TOOL_ID)

    root = os.path.abspath(package_dir)
    # Merge with an existing report (check.sh splits the suite into several
    # pytest processes; coverage accumulates across them).
    prev = {}
    if os.path.exists(out_path):
        try:
            with open(out_path) as f:
                prev = json.load(f)
        except (OSError, ValueError):
            prev = {}
    report = {}
    for dirpath, _dirnames, filenames in os.walk(root):
        for name in filenames:
            if not name.endswith(".py"):
                continue
            path = os.path.join(dirpath, name)
            rel = os.path.relpath(path, os.path.dirname(root))
            want = _executable_lines(path)
            got = _covered.get(path, set()) & want
            old = prev.get(rel)
            if old is not None and old.get("executable") == len(want):
                got |= want - set(old.get("missing", []))
            report[rel] = {
                "covered": len(got),
                "executable": len(want),
                "pct": round(100.0 * len(got) / max(1, len(want)), 1),
                "missing": sorted(want - got),
            }
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    return report
