"""CLI mirroring the reference's entry points (transform.py / assay.py
click commands) on the Spark engine.

    python -m healthcare_api_spark.cli transform \
        --input-ndjson in.ndjson --output-ndjson outdir --type Specimen
    python -m healthcare_api_spark.cli assay \
        --document-reference d.ndjson --group g.ndjson --specimen s.ndjson \
        --output outdir
    python -m healthcare_api_spark.cli count --parquet path [--where expr]

Same flags, distributed execution: the reference processes one row at a
time in one process (transform.py:154-169); this runs the identical
semantics as Spark jobs.
"""

from __future__ import annotations

import argparse
import sys

from healthcare_api_spark.session import get_spark


def _cmd_transform(args) -> int:
    from healthcare_api_spark.operators.transforms import dispatch_transformation
    from healthcare_api_spark.schemas import SCHEMAS
    from healthcare_api_spark.sources.ndjson import read_ndjson, write_ndjson
    from healthcare_api_spark.validate import structural_checks

    spark = get_spark("cli-transform")
    schema = SCHEMAS.get(args.type)
    if schema is None:
        print(f"Unsupported resourceType: {args.type}", file=sys.stderr)
        return 2
    df = read_ndjson(spark, args.input_ndjson, schema)
    out = dispatch_transformation(df, args.type)
    if args.validate:
        checked = structural_checks(out, args.type)
        bad = checked.filter(~checked["valid"])
        n_bad = bad.count()
        if n_bad:
            for r in bad.select("id", "errors").limit(20).collect():
                print(f"Validation error: {r['id']}: {list(r['errors'])}", file=sys.stderr)
            if args.stop_on_first_error:
                return 1
        out = checked.drop("valid", "errors")
    write_ndjson(out, args.output_ndjson)
    return 0


def _cmd_assay(args) -> int:
    from healthcare_api_spark.operators.assay import check_invariants, derive_assays
    from healthcare_api_spark.schemas import SCHEMAS
    from healthcare_api_spark.sources.ndjson import read_ndjson, write_ndjson

    spark = get_spark("cli-assay")
    docs = read_ndjson(spark, args.document_reference, SCHEMAS["DocumentReference"])
    groups = read_ndjson(spark, args.group, SCHEMAS["Group"])
    specimens = read_ndjson(spark, args.specimen, SCHEMAS["Specimen"])
    res = derive_assays(docs, groups, specimens)
    write_ndjson(res.assays, f"{args.output}/Assay")
    write_ndjson(res.documents, f"{args.output}/DocumentReference")
    write_ndjson(res.groups, f"{args.output}/Group")
    print(check_invariants(res))
    return 0


def _cmd_count(args) -> int:
    spark = get_spark("cli-count")
    df = spark.read.parquet(args.parquet)
    if args.where:
        df = df.filter(args.where)
    print(df.count())
    return 0


def _cmd_search(args) -> int:
    from healthcare_api_spark.plans.search import SearchConfig, SearchEngine
    from healthcare_api_spark.sources.ndjson import write_ndjson

    spark = get_spark("cli-search")
    table = spark.read.parquet(args.parquet)
    cfg = SearchConfig(
        id_col=args.id_col,
        text_search_col=args.text_col,
    )
    eng = SearchEngine(tables={args.type: table}, configs={args.type: cfg})
    params: dict[str, object] = {}
    for kv in args.param or []:
        k, _, v = kv.partition("=")
        if not _:
            print(f"bad --param (need key=value): {kv!r}", file=sys.stderr)
            return 2
        if k in params:
            # repeated --param = FHIR repeated-parameter AND semantics
            prev = params[k]
            params[k] = [*prev, v] if isinstance(prev, list) else [prev, v]
        else:
            params[k] = v
    out = eng.search(args.type, params)
    if args.output:
        write_ndjson(out, args.output)
        print(f"wrote {args.output}")
    else:
        for r in out.limit(args.limit).collect():
            print(r.asDict())
    return 0


def _cmd_dedup(args) -> int:
    from pyspark.sql import functions as F

    from healthcare_api_spark.operators import dedup
    from healthcare_api_spark.sources.ndjson import write_ndjson

    spark = get_spark("cli-dedup")
    df = spark.read.parquet(args.parquet)
    idc, txt = args.id_col, args.text_col
    if args.mode == "exact":
        out = dedup.exact_dedup_by_content(df, idc, txt)
        if not args.keep_all:
            out = out.filter(F.col(idc) == F.col("canonical_id"))
    elif args.mode == "minhash":
        pairs = dedup.lsh_candidate_pairs(
            df, idc, txt, num_hashes=args.num_hashes, rows_per_band=args.rows_per_band
        )
        clusters = dedup.cluster_pairs(
            pairs, df.select(F.col(idc).alias("id")), "id", max_iter=8
        )
        out = df.join(
            clusters.filter(F.col("id") == F.col("cluster_id")).select(
                F.col("id").alias(idc)
            ),
            idc,
        )
    elif args.mode == "sentence":
        out = dedup.sentence_dedup(df, idc, txt)
        if not args.keep_all:
            out = out.filter(F.col("n_kept") > 0)
    else:  # pragma: no cover - argparse choices guard
        raise AssertionError(args.mode)
    if args.output:
        write_ndjson(out, args.output)
        print(f"wrote {args.output}")
    else:
        print(out.count())
    return 0


def _cmd_profile(args) -> int:
    from healthcare_api_spark.operators.relational import profile_table

    spark = get_spark("cli-profile")
    df = spark.read.parquet(args.parquet)
    cols = args.columns.split(",") if args.columns else None
    for r in profile_table(df, cols, exact=args.exact).collect():
        print(
            f"{r['column']}\trows={r['n_rows']}\tnulls={r['n_nulls']}"
            f"\tdistinct={r['n_distinct']}\tmin={r['min_str']}\tmax={r['max_str']}"
        )
    return 0


def _cmd_quality(args) -> int:
    from pyspark.sql import functions as F

    from healthcare_api_spark.operators import textops
    from healthcare_api_spark.sources.ndjson import write_ndjson

    spark = get_spark("cli-quality")
    df = spark.read.parquet(args.parquet)
    idc, txt = args.id_col, args.text_col
    if args.mode == "gopher":
        out = textops.gopher_quality(df, idc, txt)
        if not args.keep_all:
            out = out.filter(F.col("keep") == 1)
    elif args.mode == "score":
        out = textops.quality_score(df, idc, txt)
    elif args.mode == "tiers":
        out = textops.perplexity_buckets(df, idc, txt)
        if not args.keep_all:
            out = out.filter(F.col("tier") != "tail")
    elif args.mode == "readability":
        out = textops.readability(df, idc, txt)
    elif args.mode == "novelty":
        out = textops.ngram_novelty(df, idc, txt)
    else:  # pragma: no cover - argparse choices guard
        raise AssertionError(args.mode)
    if args.output:
        write_ndjson(out, args.output)
        print(f"wrote {args.output}")
    else:
        print(out.count())
    return 0


def _cmd_contains(args) -> int:
    from healthcare_api_spark.operators import textops
    from healthcare_api_spark.sources.ndjson import write_ndjson

    spark = get_spark("cli-contains")
    df = spark.read.parquet(args.parquet)
    needles = [n for n in (args.needles or "").split(args.sep) if n]
    if args.needles_file:
        with open(args.needles_file) as fh:
            needles += [ln.rstrip("\n") for ln in fh if ln.strip()]
    out = textops.substring_search_multi(
        df, args.id_col, args.text_col, needles
    )
    if args.output:
        write_ndjson(out, args.output)
        print(f"wrote {args.output}")
    else:
        for r in out.orderBy("needle", args.id_col).limit(args.limit).collect():
            print(f"{r['needle']}\t{r[args.id_col]}")
        print(out.count())
    return 0


def _cmd_splits(args) -> int:
    from pyspark.sql import functions as F

    from healthcare_api_spark.operators import curation, dedup
    from healthcare_api_spark.sources.ndjson import write_ndjson

    spark = get_spark("cli-splits")
    df = spark.read.parquet(args.parquet)
    splits = {"train": args.train, "val": args.val, "test": args.test}
    if args.mode == "id":
        out = curation.assign_splits(df, args.id_col, splits, salt=args.salt)
    else:
        pairs = dedup.lsh_candidate_pairs(
            df, args.id_col, args.text_col, num_hashes=8, rows_per_band=2
        )
        out = curation.leakage_safe_splits(
            df, args.id_col, pairs, "id_a", "id_b", splits, salt=args.salt
        )
    if args.output:
        write_ndjson(out, args.output)
        print(f"wrote {args.output}")
    else:
        for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).orderBy(
            "split"
        ).collect():
            print(f"{r['split']}\t{r['n']}")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="healthcare_api_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("transform", help="R5→R4B NDJSON transform (reference transform.py)")
    t.add_argument("--input-ndjson", required=True)
    t.add_argument("--output-ndjson", required=True)
    t.add_argument("--type", required=True, help="resourceType of the input file")
    t.add_argument("--validate", action="store_true", default=True)
    t.add_argument("--no-validate", dest="validate", action="store_false")
    t.add_argument("--stop-on-first-error", action="store_true")
    t.set_defaults(fn=_cmd_transform)

    a = sub.add_parser("assay", help="Assay derivation (reference assay.py)")
    a.add_argument("--document-reference", required=True)
    a.add_argument("--group", required=True)
    a.add_argument("--specimen", required=True)
    a.add_argument("--output", required=True)
    a.set_defaults(fn=_cmd_assay)

    c = sub.add_parser("count", help="accurate count (?_total=accurate&_count=0)")
    c.add_argument("--parquet", required=True)
    c.add_argument("--where", default=None)
    c.set_defaults(fn=_cmd_count)

    pr = sub.add_parser("profile", help="one-pass column profile (approx NDV by default)")
    pr.add_argument("--parquet", required=True)
    pr.add_argument("--columns", default=None, help="comma-separated subset")
    pr.add_argument("--exact", action="store_true", help="exact COUNT(DISTINCT)")
    pr.set_defaults(fn=_cmd_profile)

    se = sub.add_parser(
        "search",
        help="FHIR-search-style query over a parquet table "
             "(token/range/modifiers/_filter/_sort/_count/_elements/"
             "_text/_page_token — the reference's delegated surface, native)",
    )
    se.add_argument("--parquet", required=True)
    se.add_argument("--type", default="Resource", help="resource type name")
    se.add_argument("--id-col", default="id")
    se.add_argument("--text-col", default=None, help="column for _text/_score")
    se.add_argument(
        "--param", action="append",
        help="search parameter key=value (repeatable), e.g. "
             "--param lang=es --param '_sort=-n_chars' --param _count=10",
    )
    se.add_argument("--output", default=None, help="NDJSON output dir (else print)")
    se.add_argument("--limit", type=int, default=20, help="print limit without --output")
    se.set_defaults(fn=_cmd_search)

    dd = sub.add_parser(
        "dedup",
        help="corpus dedup: exact (content fingerprints), minhash "
        "(LSH candidates → connected components → representatives), "
        "or sentence (corpus-wide first-occurrence sentence dedup)",
    )
    dd.add_argument("--parquet", required=True)
    dd.add_argument("--id-col", default="doc_id")
    dd.add_argument("--text-col", default="text")
    dd.add_argument("--mode", choices=["exact", "minhash", "sentence"], default="exact")
    dd.add_argument("--num-hashes", type=int, default=8)
    dd.add_argument("--rows-per-band", type=int, default=2)
    dd.add_argument(
        "--keep-all", action="store_true",
        help="keep non-survivor rows too (exact: with canonical_id; "
        "sentence: docs whose every sentence was seen earlier)",
    )
    dd.add_argument("--output", default=None, help="NDJSON output dir (else count)")
    dd.set_defaults(fn=_cmd_dedup)

    q = sub.add_parser(
        "quality",
        help="row-level quality: gopher (charter rules), score "
        "(composite 0-1), tiers (CCNet perplexity head/middle/tail)",
    )
    q.add_argument("--parquet", required=True)
    q.add_argument("--id-col", default="doc_id")
    q.add_argument("--text-col", default="text")
    q.add_argument(
        "--mode",
        choices=["gopher", "score", "tiers", "readability", "novelty"],
        default="gopher",
    )
    q.add_argument(
        "--keep-all", action="store_true",
        help="emit every row with its features/tier instead of survivors",
    )
    q.add_argument("--output", default=None, help="NDJSON output dir (else count)")
    q.set_defaults(fn=_cmd_quality)

    ct = sub.add_parser(
        "contains",
        help="exact multi-needle substring screen through one shared "
        "trigram index (decontamination: which docs contain which needle)",
    )
    ct.add_argument("--parquet", required=True)
    ct.add_argument("--id-col", default="doc_id")
    ct.add_argument("--text-col", default="text")
    ct.add_argument("--needles", default=None, help="separator-joined needles")
    ct.add_argument("--needles-file", default=None, help="one needle per line")
    ct.add_argument("--sep", default=",", help="separator for --needles")
    ct.add_argument("--limit", type=int, default=20)
    ct.add_argument("--output", default=None, help="NDJSON output dir (else print)")
    ct.set_defaults(fn=_cmd_contains)

    sp = sub.add_parser(
        "splits",
        help="train/val/test assignment — mode 'cluster' is leakage-"
        "safe: near-dup clusters (minhash bands → connected components)"
        " split atomically by the cluster canonical's hash",
    )
    sp.add_argument("--parquet", required=True)
    sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--mode", choices=["id", "cluster"], default="cluster")
    sp.add_argument("--train", type=float, default=0.9)
    sp.add_argument("--val", type=float, default=0.05)
    sp.add_argument("--test", type=float, default=0.05)
    sp.add_argument("--salt", default="splits-v1")
    sp.add_argument("--output", default=None, help="NDJSON output dir (else counts)")
    sp.set_defaults(fn=_cmd_splits)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
