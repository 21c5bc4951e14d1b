"""Maintenance-key phase timer (guide §1): times the build and op phases
of maintenance_split() keys separately (bench.py's protocol, median of 3),
optionally with per-run detail. Use to attribute index build/op cost before
and after layout changes.

Usage: python tools/mtime.py [--runs 3] key1 key2 ...
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from thewhisperdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    runs = 3
    if args and args[0] == "--runs":
        runs = int(args[1]); args = args[2:]
    keys = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("mtime")
    spark.sparkContext.setLogLevel("ERROR")
    split_fns = entrymod.maintenance_split()
    for key in keys:
        phases = split_fns[key]
        spark.sparkContext._jvm.System.gc()
        b, o = phases(spark, sf_dir)
        b(); o().count()   # warm-up (full lifecycle)
        builds, ops = [], []
        for _ in range(runs):
            b, o = phases(spark, sf_dir)
            t0 = time.time(); b(); t1 = time.time(); o().count()
            t2 = time.time()
            builds.append(t1 - t0); ops.append(t2 - t1)
        print(f"MTIME {key} build={statistics.median(builds):.3f} "
              f"op={statistics.median(ops):.3f} "
              f"builds={[round(t,3) for t in builds]} "
              f"ops={[round(t,3) for t in ops]}", flush=True)


if __name__ == "__main__":
    main()
