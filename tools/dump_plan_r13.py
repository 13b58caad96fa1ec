"""Dump one query's explain("formatted") to plans/r13/<name>_<tag>.txt.

Usage: python tools/dump_plan_r13.py <tag> <query> [query ...]

<tag> is "before" or "after". Streaming lifecycle gates (q_st*) run a
real 2-micro-batch job inside the gate function, so their *returned*
DataFrame is the read-side reconstruction; for those the before/after
evidence is job counts + wall (tools/profile_gate_jobs.py), and the
dumped plan covers the read side.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from healthcare_api_spark import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("dump-plan-r13")
    qs = entrymod.queries()
    os.makedirs("plans/r13", exist_ok=True)
    for name in names:
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        stdout = sys.stdout
        sys.stdout = buf
        try:
            df.explain("formatted")
        finally:
            sys.stdout = stdout
        path = f"plans/r13/{name}_{tag}.txt"
        with open(path, "w") as f:
            f.write(f"# {name} ({tag}) — sf_dir={SF_DIR}\n\n")
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
