"""Same-session A/B harness (guide §1 + BASELINE.md protocol): time a set
of registry keys under the WORKING-TREE code (NEW), under `git stash`
(OLD), and under the working tree again (NEW2, order-effect control), all
in ONE SparkSession — cross-session shift on this box reaches 1.5x, so
between-session comparisons are meaningless.

Between blocks the listed operator modules are importlib.reload-ed (the
entry module binds operators as module attributes, so a reload swaps the
implementation under every queries() wrapper).

Row parity is asserted per key across blocks (sorted collected rows must
be identical) — an A/B that changes results aborts loudly.

Usage:
    python tools/ab_swap.py --modules graph,psl,langid [--runs 5] key ...
Output: one JSON line per key {key, old, new, new2, rows_equal}.
"""

from __future__ import annotations

import importlib
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from thewhisperdb_spark.session import get_spark  # noqa: E402


def _git(*args: str) -> str:
    r = subprocess.run(["git", "-C", REPO, *args], check=True,
                       capture_output=True, text=True)
    return r.stdout


def _stash_push(msg: str) -> bool:
    """Stash the working tree (including untracked files — the OLD block
    must not import brand-new modules). Returns whether a stash was
    actually created: on a CLEAN tree `git stash push` no-ops with exit 0,
    and an unconditional later `pop` would pop some unrelated pre-existing
    stash into the tree (ADVICE r12)."""
    before = _git("stash", "list")
    _git("stash", "push", "--include-untracked", "-m", msg)
    return _git("stash", "list") != before


def _reload(mod_names: list[str]) -> None:
    import thewhisperdb_spark.operators as ops
    for name in mod_names:
        if "." in name:          # full path, e.g. thewhisperdb_spark.catalog
            importlib.reload(importlib.import_module(name))
        else:
            importlib.reload(getattr(ops, name, None)
                             or importlib.import_module(
                                 f"thewhisperdb_spark.operators.{name}"))


def _time_block(spark, qs, keys, sf_dir, runs):
    out = {}
    rows = {}
    for key in keys:
        fn = qs[key]
        spark.sparkContext._jvm.System.gc()
        spark.sparkContext.setJobDescription(f"ab:{key}")
        df = fn(spark, sf_dir)
        rows[key] = sorted(map(str, df.collect()))
        ts = []
        for _ in range(runs):
            t0 = time.time()
            fn(spark, sf_dir).count()
            ts.append(time.time() - t0)
        out[key] = round(statistics.median(ts), 3)
        print(f"#   {key}: {out[key]}s {[round(t, 3) for t in ts]}",
              file=sys.stderr, flush=True)
    return out, rows


def main() -> None:
    args = sys.argv[1:]
    mods = []
    runs = 5
    keys = []
    i = 0
    while i < len(args):
        if args[i] == "--modules":
            mods = args[i + 1].split(","); i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        else:
            keys.append(args[i]); i += 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_swap")
    spark.sparkContext.setLogLevel("ERROR")

    def qs():
        importlib.reload(entrymod)
        return entrymod.queries()

    print("# block NEW (working tree)", file=sys.stderr, flush=True)
    new, rows_new = _time_block(spark, qs(), keys, sf_dir, runs)

    stashed = _stash_push("ab_swap OLD block")
    try:
        _reload(mods)
        print("# block OLD (stashed HEAD)", file=sys.stderr, flush=True)
        old, rows_old = _time_block(spark, qs(), keys, sf_dir, runs)
    finally:
        if stashed:
            _git("stash", "pop")
    _reload(mods)

    print("# block NEW2 (working tree again, order control)",
          file=sys.stderr, flush=True)
    new2, rows_new2 = _time_block(spark, qs(), keys, sf_dir, runs)

    stashed = _stash_push("ab_swap OLD2 block")
    try:
        _reload(mods)
        print("# block OLD2 (stashed HEAD, warmest position)",
              file=sys.stderr, flush=True)
        old2, _ = _time_block(spark, qs(), keys, sf_dir, runs)
    finally:
        if stashed:
            _git("stash", "pop")
    _reload(mods)

    for key in keys:
        eq = rows_new[key] == rows_old[key] == rows_new2[key]
        print(json.dumps({"key": key, "old": old[key], "new": new[key],
                          "new2": new2[key], "old2": old2[key],
                          "rows_equal": eq}),
              flush=True)
        if not eq:
            print(f"ROW MISMATCH for {key}!", file=sys.stderr, flush=True)
            sys.exit(1)


if __name__ == "__main__":
    main()
