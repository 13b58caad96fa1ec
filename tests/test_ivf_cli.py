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
