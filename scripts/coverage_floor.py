"""Coverage floor gate (reference: test_coverage.sh's fail-under) — reads the
`.coverage_report.json` written by the BPPT_COVERAGE=1 test run and fails if
any watched module drops below its floor.

Floors are set a few points under the measured round-3 numbers so real
regressions (a new untested API, a dead branch of the verify pipeline) fail
CI while refactors have headroom.
"""

from __future__ import annotations

import glob
import json
import os
import sys

FLOORS = {
    # the two APIs every recorded number comes from
    "bulletproofs_plus_tpu/models/range_proof.py": 75,
    "bulletproofs_plus_tpu/models/prover_device.py": 85,
    "bulletproofs_plus_tpu/models/verifier_kernels.py": 85,
    "bulletproofs_plus_tpu/models/replay_device.py": 85,
    # package-wide sanity
    "TOTAL": 75,
}


def merge_shards(path: str) -> dict:
    """Union the per-process shard reports (`<path>.<pid>.shard`, written by
    tests/conftest.py — one per xdist worker/controller) plus `path` itself
    if present.  Coverage is the union of covered lines: a line is missing
    only if every shard that saw the module missed it."""
    report: dict = {}
    sources = sorted(glob.glob(path + ".*.shard"))
    if os.path.exists(path):
        sources.insert(0, path)
    for src in sources:
        try:
            with open(src) as f:
                shard = json.load(f)
        except (OSError, ValueError):
            continue
        for mod, got in shard.items():
            prev = got if mod not in report else None
            if prev is None:
                prev = report[mod]
                if prev["executable"] != got["executable"]:
                    # module changed between shards; keep the better-covered
                    prev = max(prev, got, key=lambda g: g["pct"])
                else:
                    missing = sorted(set(prev["missing"]) & set(got["missing"]))
                    cov = got["executable"] - len(missing)
                    prev = {
                        "covered": cov,
                        "executable": got["executable"],
                        "pct": round(100.0 * cov / max(1, got["executable"]), 1),
                        "missing": missing,
                    }
            report[mod] = prev
    if report:
        with open(path, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
    return report


def main(path: str = ".coverage_report.json") -> int:
    report = merge_shards(path)
    if not report:
        print(f"FAIL: no coverage report/shards at {path}")
        return 1
    total_cov = sum(m["covered"] for m in report.values())
    total_exe = sum(m["executable"] for m in report.values())
    report = dict(report)
    report["TOTAL"] = {
        "covered": total_cov,
        "executable": total_exe,
        "pct": round(100.0 * total_cov / max(1, total_exe), 1),
    }
    failed = False
    for mod, floor in FLOORS.items():
        got = report.get(mod)
        if got is None:
            print(f"FAIL {mod}: missing from report")
            failed = True
            continue
        status = "ok  " if got["pct"] >= floor else "FAIL"
        if got["pct"] < floor:
            failed = True
        print(f"{status} {mod}: {got['pct']}% (floor {floor}%)")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
