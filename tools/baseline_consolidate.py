"""Merge N same-session-protocol bench runs (BENCH_LOCAL.json copies)
into the consolidated BASELINE rows (VERDICT r10 #1): per-key median
across runs for headline keys, per-phase medians for maintenance keys,
and the calibration key's first-in-session median.

Usage: python tools/baseline_consolidate.py run1.json run2.json run3.json
Prints a markdown table body + the calibration constant to stdout.
"""

from __future__ import annotations

import json
import statistics
import sys


def main():
    runs = [json.load(open(p)) for p in sys.argv[1:]]
    if len(runs) < 2:
        raise SystemExit("need >= 2 run files")
    keys = runs[0]["queries"].keys()
    print("| query key | sf | sec/query | status |")
    print("|---|---|---|---|")
    total = 0.0
    for k in keys:
        med = round(statistics.median(r["queries"][k] for r in runs), 3)
        total += med
        print(f"| {k} | 0.1 | {med} | recorded r11 |")
    for k in runs[0]["maintenance_split"]:
        b = round(statistics.median(
            r["maintenance_split"][k]["build_sec"] for r in runs), 3)
        o = round(statistics.median(
            r["maintenance_split"][k]["op_sec"] for r in runs), 3)
        print(f"| {k} | 0.1 | {b} build + {o} op | recorded r11 "
              f"(MAINTENANCE) |")
    cal = round(statistics.median(
        r["calibration"]["sec"] for r in runs), 3)
    print(f"\nheadline_total_sec = {round(total, 3)} over {len(keys)} keys")
    print(f"CALIBRATION_ROW_SEC = {cal}  "
          f"(runs: {[r['calibration']['sec'] for r in runs]})")
    print(f"run totals: {[r['value'] for r in runs]}")


if __name__ == "__main__":
    main()
