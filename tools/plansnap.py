"""Snapshot ``.explain('formatted')`` for registry keys into plans/<round>/
(optimization-round deliverable: the judge checks plan claims against these
files).

Usage:
    python tools/plansnap.py [--round rNN] <tag> key1 key2 ...
Writes plans/<round>/<key>_<tag>.txt for each key (default round: r13).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from thewhisperdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    rnd = "r13"
    if args and args[0] == "--round":
        rnd = args[1]
        args = args[2:]
    tag = args[0]
    keys = args[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", rnd)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plansnap")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for key in keys:
        df = qs[key](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{key}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"PLAN {key} -> {path}", flush=True)


if __name__ == "__main__":
    main()
