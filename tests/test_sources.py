"""NDJSON scan/sink + resource store tests (SURVEY.md §2.1)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from healthcare_api_spark.schemas import SCHEMAS
from healthcare_api_spark.sources.ndjson import read_ndjson, read_ndjson_raw, write_ndjson
from healthcare_api_spark.sources.store import ResourceStore, upsert_frames


def test_read_with_schema_and_corrupt_capture(spark, tmp_path):
    p = tmp_path / "g.ndjson"
    p.write_text(
        json.dumps({"resourceType": "Group", "id": "g1", "type": "person"})
        + "\n{not json\n"
    )
    df = read_ndjson(spark, str(p), SCHEMAS["Group"], keep_corrupt=True)
    rows = df.collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(good) == 1 and good[0]["id"] == "g1"
    assert len(bad) == 1 and bad[0]["_corrupt_record"].startswith("{not json")


def test_raw_passthrough(spark, tmp_path):
    p = tmp_path / "g.ndjson"
    p.write_text(json.dumps({"resourceType": "Group", "id": "g1", "untouched_field": 42}) + "\n")
    df = read_ndjson_raw(spark, str(p), SCHEMAS["Group"])
    r = df.collect()[0]
    assert r["id"] == "g1" and '"untouched_field": 42' in r["_raw"]


def test_ndjson_roundtrip_omits_nulls(spark, tmp_path, write_ndjson_file):
    src = write_ndjson_file(
        [{"resourceType": "Group", "id": "g1", "type": "person"}], "in.ndjson"
    )
    df = read_ndjson(spark, src, SCHEMAS["Group"])
    out_dir = str(tmp_path / "out")
    write_ndjson(df, out_dir)
    lines = [
        json.loads(l)
        for f in __import__("pathlib").Path(out_dir).glob("part-*.json")
        for l in f.read_text().splitlines()
    ]
    assert lines == [{"resourceType": "Group", "id": "g1", "type": "person"}]
    assert "member" not in lines[0]  # null fields omitted like json.dumps of a dict


def test_store_partitioned_import_and_counts(spark, tmp_path):
    store = ResourceStore(spark, str(tmp_path / "store"))
    store.import_resources(
        spark.createDataFrame([("p1",), ("p2",)], ["id"]), "Patient"
    )
    store.import_resources(spark.createDataFrame([("g1",)], ["id"]), "Group")
    counts = {r["resourceType"]: r["cnt"] for r in store.counts_by_type(["Patient", "Group"]).collect()}
    assert counts == {"Patient": 2, "Group": 1}


def test_upsert_last_write_wins(spark, tmp_path):
    existing = spark.createDataFrame([("a", 1, 10), ("b", 1, 20)], ["id", "v", "x"])
    updates = spark.createDataFrame([("b", 2, 99), ("c", 1, 30)], ["id", "v", "x"])
    merged = {r["id"]: r for r in upsert_frames(existing, updates, "id", "v").collect()}
    assert merged["a"]["x"] == 10
    assert merged["b"]["x"] == 99 and merged["b"]["v"] == 2  # update wins
    assert merged["c"]["x"] == 30  # create

    # without version: updates beat existing deterministically
    merged2 = {r["id"]: r for r in upsert_frames(existing, updates, "id").collect()}
    assert merged2["b"]["x"] == 99


def test_store_upsert_roundtrip(spark, tmp_path):
    store = ResourceStore(spark, str(tmp_path / "store2"))
    store.import_resources(spark.createDataFrame([("a", 1), ("b", 1)], ["id", "v"]), "Patient")
    store.upsert(spark.createDataFrame([("b", 2), ("c", 1)], ["id", "v"]), "Patient",
                 version_col="v")
    rows = {r["id"]: r["v"] for r in store.table("Patient").collect()}
    assert rows == {"a": 1, "b": 2, "c": 1}


def test_csv_corrupt_capture_and_quoting(spark, tmp_path):
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from healthcare_api_spark.sources.ndjson import read_csv, write_csv

    # RFC-4180 stress: commas, doubled quotes, embedded newline
    df = spark.createDataFrame(
        [(1, 'a,b "quoted"\nsecond line'), (2, "plain")], ["id", "text"]
    )
    out = str(tmp_path / "csv")
    write_csv(df, out)
    schema = StructType([StructField("id", LongType()), StructField("text", StringType())])
    back = {r["id"]: r["text"] for r in read_csv(spark, out, schema, multiline=True).collect()}
    assert back == {1: 'a,b "quoted"\nsecond line', 2: "plain"}

    # malformed row lands in _corrupt_record, job does not fail
    bad = tmp_path / "bad"
    bad.mkdir()
    (bad / "f.csv").write_text('id,text\n1,ok\nnot-a-long,boom\n')
    got = read_csv(spark, str(bad), schema, keep_corrupt=True).collect()
    ok = [r for r in got if r["_corrupt_record"] is None]
    corrupt = [r for r in got if r["_corrupt_record"] is not None]
    assert len(ok) == 1 and ok[0]["id"] == 1
    assert len(corrupt) == 1 and "not-a-long" in corrupt[0]["_corrupt_record"]

    # ADVICE r3: corrupt capture is only honored on the schema branch —
    # keep_corrupt without a schema is a hard error, not a silent no-op
    with pytest.raises(ValueError, match="explicit schema"):
        read_csv(spark, str(bad), schema=None, keep_corrupt=True)


def test_upsert_schema_evolution_new_column(spark, tmp_path):
    """A later batch may carry a NEW column (FHIR extensions appear over
    time): upsert_frames unions by name, old rows surface NULL for the
    new field, and the store read-back exposes the evolved schema."""
    from pyspark.sql import functions as F

    from healthcare_api_spark.sources.store import ResourceStore, upsert_frames

    store = ResourceStore(spark, str(tmp_path / "store"))
    v1 = spark.createDataFrame([("a", 1), ("b", 1)], "id string, version int")
    store.import_resources(v1, "Thing")
    v2 = spark.createDataFrame(
        [("b", 2, "new"), ("c", 1, "new")], "id string, version int, extra string"
    )
    merged = upsert_frames(store.table("Thing"), v2, version_col="version")
    rows = {r["id"]: r for r in merged.collect()}
    assert set(rows) == {"a", "b", "c"}
    assert rows["a"]["extra"] is None          # evolved: old rows null-fill
    assert rows["b"]["extra"] == "new" and rows["b"]["version"] == 2
