"""Targeted before/after gate timing for the r12 optimization round.

Usage: python tools/time_gates_r12.py <label> <query> [query ...]

bench.py's heavy-isolated methodology on just the named gates: per
gate, a GC barrier then cold + 3 steady noop-sink passes back-to-back.
Prints one JSON line {label, sf_dir, gates: {name: [cold, s1, s2, s3]}}
so the OPTIMIZATION_r12.md before/after table can quote medians and
mins from one quiet host window.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from healthcare_api_spark import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_STEADY = 3


def main() -> None:
    label = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("time-gates-r12")
    qs = entrymod.queries()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def gc_barrier():
        import gc as _gc

        _gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(1.0)

    # warm the JVM once with the cheapest query (bench.py protocol)
    force(qs["q6_forecast_revenue"](spark, SF_DIR))
    out: dict[str, list[float]] = {}
    for name in names:
        gc_barrier()
        runs = []
        spark.sparkContext.setJobDescription(f"r12:{label}:{name}")
        for _ in range(1 + N_STEADY):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            force(qs[name](spark, SF_DIR))
            runs.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = runs
    print(json.dumps({"label": label, "sf_dir": SF_DIR, "gates": out}))


if __name__ == "__main__":
    main()
