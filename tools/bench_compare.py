"""Per-query bench regression tracking across rounds.

Usage:
    python bench.py 2>/dev/null | python tools/bench_compare.py
        compare a fresh run against the newest BENCH_r{N}.json in the repo
    python tools/bench_compare.py OLD.json NEW.json
        compare two recorded rounds

Prints one line per query: old, new, delta%; flags |delta| > 20% as
REGRESSION / improvement. Exit code 1 if any regression (so it can gate
CI), 0 otherwise. Queries present on only one side are listed as
added/removed, never flagged.
"""

from __future__ import annotations

import glob
import json
import re
import sys


def _load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    # the driver's BENCH_r{N}.json wraps bench.py's line under "parsed"
    return d["parsed"] if "parsed" in d else d


def _latest_recorded() -> tuple[str, dict] | None:
    rounds = []
    for path in glob.glob("BENCH_r*.json"):
        m = re.match(r"BENCH_r(\d+)\.json$", path)
        if m:
            rounds.append((int(m.group(1)), path))
    if not rounds:
        return None
    _, path = max(rounds)
    return path, _load(path)


def main() -> int:
    if len(sys.argv) == 3:
        old_name, old = sys.argv[1], _load(sys.argv[1])
        new_name, new = sys.argv[2], _load(sys.argv[2])
    else:
        new_name, new = "<stdin>", json.loads(sys.stdin.read().strip().splitlines()[-1])
        latest = _latest_recorded()
        if latest is None:
            print("no BENCH_r{N}.json recorded yet; nothing to compare")
            print(json.dumps(new["queries"], indent=2))
            return 0
        old_name, old = latest

    oq, nq = old.get("queries", {}), new.get("queries", {})
    print(f"# {old_name} -> {new_name} (total {old.get('value')}s -> {new.get('value')}s)")
    regressions = 0
    for name in sorted(oq.keys() | nq.keys()):
        if name not in oq:
            print(f"  {name:40s}        -> {nq[name]:7.3f}s  (added)")
            continue
        if name not in nq:
            print(f"  {name:40s} {oq[name]:7.3f}s ->          (removed)")
            continue
        a, b = oq[name], nq[name]
        pct = (b - a) / a * 100 if a else 0.0
        tag = ""
        if pct > 20:
            tag = "  REGRESSION"
            regressions += 1
        elif pct < -20:
            tag = "  improvement"
        print(f"  {name:40s} {a:7.3f}s -> {b:7.3f}s  {pct:+6.1f}%{tag}")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
