"""x8/x9 float-boundary parity at sf1.0-equivalent volume (r8,
VERDICT r7 #8).

The r7 hardening moved the money/series sums in q1/q3/q5/q6/w8/x8/x9
to scaled-integer (cents) accumulation specifically so no
accumulation-order ulp can flip a rounded output boundary — but only
x12 had ever actually flipped one in anger, so the defense was
untested at volume. This check replicates the sf0.1 events table ×100
(same (event_type, hour) buckets, 100× the rows and 100× the per-
bucket sums — the worst case for sum magnitude and re-association
count) and runs the UNCHANGED x8/x9 gate queries against their
UNCHANGED oracles on the replicated table. A pass means the exact-
bigint quantize path holds where a double-sum would be deep into
catastrophic-ulp territory.

Run: python tools/volume_parity_check.py [replication=100]
Prints one PASS/FAIL line per query; record the result in NOTES.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from healthcare_api_spark import get_spark
from healthcare_api_spark.tables import load_table
from tools.check_oracle import frame_multiset

QUERIES = ("x8_seasonal_decompose", "x9_series_correlation",
           "x17_holt_linear", "x18_acf")


def main() -> int:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark("volume-parity")
    ev = load_table(spark, "/root/testdata/sf0.1", "events")
    n0 = ev.count()
    root = tempfile.mkdtemp(prefix="volparity_")
    rc = 0
    try:
        # ×rep with unique event_ids, identical (event_type, ts, value)
        # — every hourly bucket keeps its key but carries rep× the rows
        # and rep× the cents sum
        (
            ev.withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(rep - 1))))
            .withColumn(
                "event_id", F.col("event_id") * rep + F.col("r")
            )
            .drop("r")
            .write.mode("overwrite")
            .parquet(f"{root}/events.parquet")
        )
        print(f"replicated events: {n0} × {rep} = {n0 * rep} rows")
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{root}/events.parquet/*.parquet')"
        )
        qs, osql = entrymod.queries(), entrymod.oracle_sql()
        for name in QUERIES:
            sdf = qs[name](spark, root)
            srows, scols = sdf.collect(), sdf.columns
            res = con.execute(osql[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            ok = (
                sorted(scols) == sorted(ocols)
                and len(srows) == len(orows)
                and frame_multiset(scols, [[r[c] for c in scols] for r in srows])
                == frame_multiset(ocols, orows)
            )
            print(f"{'PASS' if ok else 'FAIL'}  {name}: "
                  f"{len(srows)} rows spark vs {len(orows)} oracle at ×{rep}")
            rc |= 0 if ok else 1
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
