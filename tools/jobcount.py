"""Deterministic job/stage counter per registry key (optimization r13).

Cross-session seconds on this box drift up to 2.2x, so job and stage
COUNTS are the noise-free evidence for "fewer jobs per query" claims
(VERDICT r12 #5: every headline kernel is job-latency-bound at sf0.1).
Runs each key once warm, then counts the Spark jobs/stages of one timed
execution via the status tracker (job group scoping).

Usage:
    python tools/jobcount.py key1 key2 ...
Prints one JSON line per key: {key, jobs, stages, sec}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from thewhisperdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    keys = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("jobcount")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    sc = spark.sparkContext
    for key in keys:
        fn = qs[key]
        fn(spark, sf_dir).count()          # warm-up
        group = f"jobcount:{key}"
        sc.setJobGroup(group, key)
        t0 = time.time()
        fn(spark, sf_dir).count()
        sec = time.time() - t0
        sc.setJobGroup(None, None)
        tracker = sc.statusTracker()
        job_ids = tracker.getJobIdsForGroup(group)
        n_stages = 0
        for jid in job_ids:
            info = tracker.getJobInfo(jid)
            if info is not None:
                n_stages += len(info.stageIds)
        print(json.dumps({"key": key, "jobs": len(job_ids),
                          "stages": n_stages, "sec": round(sec, 3)}),
              flush=True)


if __name__ == "__main__":
    main()
