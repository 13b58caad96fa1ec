"""Per-job breakdown of one gate run (r12 optimization round).

Usage: python tools/job_breakdown.py <query_name> [sf_dir]

Runs the gate ONCE (after the standard warm query) and prints every
Spark job the run submitted — id, wall ms, #tasks, and the first line
of its call site / description — sorted by submission order, plus a
by-duration top list. This answers "where do a streaming lifecycle's
~50 fixed jobs come from" at the job level, which the wall-clock
tools cannot.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from healthcare_api_spark import get_spark

SF_DIR = (
    sys.argv[2]
    if len(sys.argv) > 2
    else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
)


def main() -> None:
    name = sys.argv[1]
    spark = get_spark("job-breakdown")
    qs = entrymod.queries()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # warm the JVM (bench protocol), then mark the job-id floor
    force(qs["q6_forecast_revenue"](spark, SF_DIR))
    sc = spark.sparkContext
    store = sc._jsc.sc().statusStore()
    first_id = sc._jsc.sc().dagScheduler().nextJobId()

    import time

    t0 = time.perf_counter()
    force(qs[name](spark, SF_DIR))
    wall = time.perf_counter() - t0

    jobs = []
    it = store.jobsList(None).iterator()
    while it.hasNext():
        j = it.next()
        if j.jobId() < first_id:
            continue
        sub = j.submissionTime()
        comp = j.completionTime()
        dur = None
        if sub.isDefined() and comp.isDefined():
            dur = (
                comp.get().getTime() - sub.get().getTime()
            )
        desc = ""
        try:
            d = j.description()
            if d.isDefined():
                desc = d.get()
        except Exception:
            pass
        nm = j.name() or ""
        jobs.append(
            (
                j.jobId(),
                dur if dur is not None else -1,
                j.numTasks(),
                (desc or nm).replace("\n", " ")[:110],
            )
        )
    jobs.sort()
    total = sum(d for _, d, _, _ in jobs if d >= 0)
    print(f"gate={name} wall={wall:.2f}s jobs={len(jobs)} sum_job_ms={total}")
    for jid, dur, ntasks, desc in jobs:
        print(f"  job={jid:4d} ms={dur:6d} tasks={ntasks:4d}  {desc}")
    print("--- top by duration ---")
    for jid, dur, ntasks, desc in sorted(jobs, key=lambda x: -x[1])[:15]:
        print(f"  job={jid:4d} ms={dur:6d} tasks={ntasks:4d}  {desc}")


if __name__ == "__main__":
    main()
