"""Single-node throughput: this engine vs the reference's execution model.

The reference transforms NDJSON one row at a time in one Python process
(transform.py:154-169). This tool synthesizes a DocumentReference corpus
at TCGA-load-like scale (BASELINE.md: ~100k resources) and measures:

  (a) a faithful single-threaded row-at-a-time loop (our own minimal
      re-implementation of the same observable semantics — the
      reference's execution model, not its code), and
  (b) this engine's distributed transform on local[$SPARK_GRAFT_CPUS].

Prints one JSON line with rows/sec for both and the speedup.

Usage: python tools/throughput_compare.py [n_rows]
       python tools/throughput_compare.py --dedup [n_rows]

``--dedup`` benchmarks the OTHER throughput-critical shape: exact
content dedup (md5-of-normalized-text, keep lowest id) — a
single-threaded dict loop vs the engine's window dedup. Hash CPU
parallelizes, so this is where the engine's multiplier shows.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthesize(path: str, n: int) -> None:
    exts = [".maf", ".bed", ".vcf", ".csv", ".pdf", ""]
    with open(path, "w") as f:
        for i in range(n):
            subject = (
                f"Specimen/s{i}" if i % 10 == 0 else
                f"Group/g{i % 50}" if i % 3 == 0 else f"Patient/p{i % 537}"
            )
            row = {
                "resourceType": "DocumentReference",
                "id": f"d{i}",
                "version": str(i % 7),
                "subject": {"reference": subject},
                "content": [{
                    "attachment": {
                        "url": f"https://host/data/f{i}{exts[i % len(exts)]}",
                        "title": f"f{i}",
                        "size": 1000 + i,
                    },
                    "profile": [{"valueCoding": {"system": "s", "code": f"c{i % 9}"}}],
                }],
            }
            f.write(json.dumps(row) + "\n")


def row_at_a_time(src: str, dst: str) -> int:
    """The reference's execution model: one process, one row in flight."""
    n = 0
    with open(src) as infile, open(dst, "w") as outfile:
        for line in infile:
            resource = json.loads(line)
            resource.pop("version", None)
            for content in resource.get("content", []):
                if "profile" in content:
                    content["format"] = content.pop("profile")[0]["valueCoding"]
            subj = resource.get("subject", {}).get("reference", "")
            if "Specimen" in subj:
                continue
            outfile.write(json.dumps(resource) + "\n")
            n += 1
    return n


def spark_session():
    from healthcare_api_spark import get_spark

    # a single NDJSON file is the reference's layout; Spark splits it by
    # byte ranges — 4m split size parallelizes a ~60MB file across cores
    return get_spark(
        "throughput", extra_conf={"spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024)}
    )


def spark_engine(spark, src: str, dst: str) -> None:
    from healthcare_api_spark.operators.transforms import dispatch_transformation
    from healthcare_api_spark.schemas import SCHEMAS
    from healthcare_api_spark.sources.ndjson import read_ndjson, write_ndjson

    df = read_ndjson(spark, src, SCHEMAS["DocumentReference"])
    out = dispatch_transformation(df, "DocumentReference")
    write_ndjson(out, dst)


def synthesize_docs(path: str, n: int) -> None:
    words = ("key agg row scan slow fast table value part hash merge batch "
             "line sort window query stream group column order data").split()
    with open(path, "w") as f:
        for i in range(n):
            # every 3rd doc duplicates an earlier one's text
            seed = i // 3 * 3
            toks = [words[(seed * 7 + j * 3) % len(words)] for j in range(30)]
            f.write(json.dumps({"doc_id": i, "text": " ".join(toks)}) + "\n")


def dedup_row_at_a_time(src: str, dst: str) -> int:
    """Single process, one dict: the reference-model dedup loop."""
    import hashlib
    import re

    seen = {}
    n = 0
    with open(src) as infile, open(dst, "w") as outfile:
        for line in infile:
            d = json.loads(line)
            norm = re.sub(r"\s+", " ", d["text"].lower()).strip()
            fp = hashlib.md5(norm.encode()).hexdigest()
            canonical = seen.setdefault(fp, d["doc_id"])
            outfile.write(json.dumps({"doc_id": d["doc_id"],
                                      "canonical_id": canonical}) + "\n")
            n += 1
    return n


def dedup_spark(spark, src: str, dst: str) -> None:
    from pyspark.sql import functions as F

    from healthcare_api_spark.operators.dedup import exact_dedup_by_content

    df = spark.read.json(src)
    out = exact_dedup_by_content(df, "doc_id", "text").select(
        "doc_id", "canonical_id"
    )
    out.write.mode("overwrite").json(dst)


def main_dedup() -> None:
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    d = tempfile.mkdtemp(prefix="throughput_dedup_")
    src = os.path.join(d, "docs.ndjson")
    synthesize_docs(src, n)

    t0 = time.perf_counter()
    n_base = dedup_row_at_a_time(src, os.path.join(d, "out_base.ndjson"))
    base_sec = time.perf_counter() - t0

    spark = spark_session()
    dst = os.path.join(d, "out_spark")
    t0 = time.perf_counter()
    dedup_spark(spark, src, dst)
    spark_sec = time.perf_counter() - t0

    n_spark = spark.read.json(dst).count()
    assert n_base == n_spark == n
    print(
        json.dumps(
            {
                "mode": "dedup",
                "rows": n,
                "baseline_row_at_a_time_sec": round(base_sec, 3),
                "spark_engine_sec": round(spark_sec, 3),
                "baseline_rows_per_sec": round(n / base_sec),
                "spark_rows_per_sec": round(n / spark_sec),
                "speedup": round(base_sec / spark_sec, 2),
            }
        )
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--dedup":
        return main_dedup()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    d = tempfile.mkdtemp(prefix="throughput_")
    src = os.path.join(d, "DocumentReference.ndjson")
    synthesize(src, n)

    t0 = time.perf_counter()
    n_base = row_at_a_time(src, os.path.join(d, "out_base.ndjson"))
    base_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    spark = spark_session()
    startup_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    spark_engine(spark, src, os.path.join(d, "out_spark"))
    spark_sec = time.perf_counter() - t0

    n_spark = spark.read.json(os.path.join(d, "out_spark")).count()
    assert n_base == n_spark, f"row counts differ: {n_base} vs {n_spark}"
    print(
        json.dumps(
            {
                "rows_in": n,
                "rows_out": n_spark,
                "baseline_row_at_a_time_sec": round(base_sec, 3),
                "spark_engine_sec": round(spark_sec, 3),
                "spark_startup_sec": round(startup_sec, 3),
                "baseline_rows_per_sec": round(n / base_sec),
                "spark_rows_per_sec": round(n / spark_sec),
                "speedup": round(base_sec / spark_sec, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
