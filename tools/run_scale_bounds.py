"""Run the `-m scale` asymptote suite and record timings as an artifact.

Run: python tools/run_scale_bounds.py [--json artifacts_rN/scale_bounds.json]

VERDICT r8 item 8: the ×4 growth-shape guards (tests/test_scale_bounds.py)
are opt-in and were run from memory, not routine. This wrapper makes the
per-round invocation one command and persists what the suite measured —
pass/fail per family plus wall seconds — so an asymptote regression shows
up in the round's artifacts even when nobody re-reads the pytest output.
"""

from __future__ import annotations

import json
import sys
import time

import pytest


class _Recorder:
    def __init__(self) -> None:
        self.results: dict[str, dict] = {}
        self._t0: dict[str, float] = {}

    def pytest_runtest_logstart(self, nodeid, location):
        self._t0[nodeid] = time.monotonic()

    def pytest_runtest_logreport(self, report):
        if report.when != "call":
            return
        self.results[report.nodeid] = {
            "outcome": report.outcome,
            "wall_s": round(report.duration, 2),
            "longrepr": str(report.longrepr)[:2000] if report.failed else None,
        }


def main() -> int:
    argv = sys.argv[1:]
    out_json = None
    if "--json" in argv:
        i = argv.index("--json")
        out_json = argv[i + 1]
        del argv[i : i + 2]

    rec = _Recorder()
    rc = pytest.main(
        ["tests/test_scale_bounds.py", "-m", "scale", "-v", *argv],
        plugins=[rec],
    )
    summary = {
        "exit_code": int(rc),
        "n_pass": sum(1 for r in rec.results.values() if r["outcome"] == "passed"),
        "n_fail": sum(1 for r in rec.results.values() if r["outcome"] == "failed"),
        "tests": rec.results,
    }
    print(json.dumps({k: v for k, v in summary.items() if k != "tests"}))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(summary, f, indent=1)
    return int(rc)


if __name__ == "__main__":
    raise SystemExit(main())
