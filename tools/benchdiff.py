#!/usr/bin/env python3
"""Per-query bench regression diff between two bench JSON dumps.

Accepts either the Bench main's one-line JSON ({"metric":"total",...,
"queries":{...}}) — e.g. BENCH_DETAIL.json — or a driver BENCH_r{N}.json
whose "parsed" field wraps that object. Prints queries whose ratio
new/old exceeds the threshold (default 1.5x, with an absolute floor so
millisecond jitter on sub-100ms queries doesn't flag), plus adds/drops
and the total delta. Host noise on this box is +/-30% run-to-run —
treat single-query flags as a re-measure prompt, not a verdict.

Usage: python3 tools/benchdiff.py OLD.json NEW.json [ratio] [abs_floor_sec]
Exit code 1 if any regression was flagged (for round-close scripting).
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "queries" not in d:
        if isinstance(d.get("parsed"), dict) and "queries" in d["parsed"]:
            d = d["parsed"]
        else:
            raise SystemExit(f"{path}: no 'queries' map found")
    # post-split BENCH_DETAIL.json values are {total, setup_s, op_s} dicts;
    # compare on total so pre- and post-split dumps diff interchangeably
    d["queries"] = {k: (v["total"] if isinstance(v, dict) else v)
                    for k, v in d["queries"].items()}
    return d


def main():
    if len(sys.argv) < 3:
        raise SystemExit(
            "usage: python3 tools/benchdiff.py OLD.json NEW.json "
            "[ratio] [abs_floor_sec]")
    old_path, new_path = sys.argv[1], sys.argv[2]
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.3
    old, new = load(old_path), load(new_path)
    oq, nq = old["queries"], new["queries"]

    flagged = []
    for name in sorted(set(oq) & set(nq)):
        a, b = oq[name], nq[name]
        if b > a * ratio and b - a > floor:
            flagged.append((name, a, b))
    for name, a, b in sorted(flagged, key=lambda t: t[1] - t[2]):
        print(f"REGRESSED {name}: {a:.2f}s -> {b:.2f}s ({b / a:.2f}x)")
    for name in sorted(set(nq) - set(oq)):
        print(f"ADDED     {name}: {nq[name]:.2f}s")
    for name in sorted(set(oq) - set(nq)):
        print(f"DROPPED   {name} (was {oq[name]:.2f}s)")
    ot, nt = old.get("value"), new.get("value")
    if ot is not None and nt is not None:
        print(f"TOTAL     {ot:.1f}s ({len(oq)} queries) -> "
              f"{nt:.1f}s ({len(nq)} queries)")
    if not flagged:
        print("no per-query regressions above "
              f"{ratio}x (+{floor}s floor)")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()
