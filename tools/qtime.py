"""Per-query isolated timer (guide §1): median-of-N timings for individual
registry keys, with the same ``.count()`` action as bench.py (so numbers are
comparable to BENCH_LOCAL rows) and optionally the noop sink (guide §1.4 —
computes every column, so it times the full result, not the count-pruned
plan).

Usage:
    python tools/qtime.py [--runs 5] [--noop] key1 key2 ...
Prints one line per key: key, action, median, all runs.
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
    args = [a for a in sys.argv[1:]]
    runs = 5
    noop = False
    keys = []
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        elif args[i] == "--noop":
            noop = True; i += 1
        else:
            keys.append(args[i]); i += 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("qtime")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    def act(df):
        if noop:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.count()

    for key in keys:
        fn = qs[key]
        spark.sparkContext._jvm.System.gc()
        spark.sparkContext.setJobDescription(f"qtime:{key}")
        act(fn(spark, sf_dir))          # warm-up
        ts = []
        for _ in range(runs):
            t0 = time.time()
            act(fn(spark, sf_dir))
            ts.append(time.time() - t0)
        med = statistics.median(ts)
        print(f"QTIME {key} {'noop' if noop else 'count'} "
              f"median={med:.3f} runs={[round(t, 3) for t in ts]}",
              flush=True)


if __name__ == "__main__":
    main()
