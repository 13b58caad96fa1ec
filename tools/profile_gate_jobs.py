"""Profile a declared gate: wall time + Spark job count/duration.

Usage: python tools/profile_gate_jobs.py <query_name> [sf_dir] [passes]

Runs the gate cold + N steady passes in one fresh session and prints,
per pass, the wall seconds and how many Spark jobs the pass submitted
(from the shared AppStatusStore — covers foreachBatch streaming jobs,
which ignore thread-local job groups). The job count is the honest
"fixed machinery" metric for the streaming lifecycles: their state
bytes are trivial (SCALE.md r12 audit), so wall = Σ per-job latency.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from healthcare_api_spark import get_spark


def job_stats(spark):
    # DAGScheduler's job-id counter: cheap, covers every job including
    # the foreachBatch streaming thread's (which ignores thread-local
    # job groups)
    return spark.sparkContext._jsc.sc().dagScheduler().nextJobId(), 0.0


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    passes = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("profile-gate")
    qs = entrymod.queries()
    for p in range(passes):
        spark.catalog.clearCache()
        n0, d0 = job_stats(spark)
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
        n1, d1 = job_stats(spark)
        print(
            f"pass={p} wall={wall:.2f}s jobs={n1 - n0} "
            f"job_time={d1 - d0:.2f}s"
        )


if __name__ == "__main__":
    main()
