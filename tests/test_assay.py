"""Golden tests for the Assay derivation (reference scripts/assay.py),
covering FIXTURES.md §6 invariants and the corner cases: multi-specimen
last-wins, missing specimen, memberless group, MIME fallback chain,
byte-exact uuid5."""

from __future__ import annotations

import uuid

import pytest

from healthcare_api_spark.operators.assay import check_invariants, derive_assays
from healthcare_api_spark.schemas import SCHEMAS
from healthcare_api_spark.sources.ndjson import read_ndjson

SPECIMENS = [
    {"resourceType": "Specimen", "id": "s1", "subject": {"reference": "Patient/P1"}},
    {"resourceType": "Specimen", "id": "s2", "subject": {"reference": "Patient/P2"}},
    {"resourceType": "Specimen", "id": "s3", "subject": {"reference": "Patient/P3"}},
    {"resourceType": "Specimen", "id": "s9", "subject": {"reference": "Patient/P9"}},
]

GROUPS = [
    # two specimen members of different patients → last-wins P2 (assay.py:63-69)
    {"resourceType": "Group", "id": "g1", "member": [
        {"entity": {"reference": "Specimen/s1"}},
        {"entity": {"reference": "Specimen/s2"}},
        {"entity": {"reference": "Patient/P1"}},
    ]},
    # no specimen member → guard skip (assay.py:71-73)
    {"resourceType": "Group", "id": "g2", "member": [{"entity": {"reference": "Patient/P1"}}]},
    # specimen ref that resolves to no Specimen row → patient None → skip
    {"resourceType": "Group", "id": "g3", "member": [{"entity": {"reference": "Specimen/nope"}}]},
    # member entity without reference key (assay.py:64) → skip member
    {"resourceType": "Group", "id": "g4", "member": [{"entity": {}}]},
]

DOCS = [
    # bound to g1 via subject → rewritten to Patient/P2, mime from url path
    {"resourceType": "DocumentReference", "id": "d1", "version": "5",
     "subject": {"reference": "Group/g1"},
     "content": [{"attachment": {"url": "https://host/data/f.maf", "title": "t",
                                   "size": 10},
                  "profile": [{"valueCoding": {"system": "s", "code": "c"}}]}]},
    # subject is a Specimen → pass-2 singleton assay, uuid5 id; url path has
    # no extension → mime falls back to the title (assay.py:129-133)
    {"resourceType": "DocumentReference", "id": "d2", "version": "5",
     "subject": {"reference": "Specimen/s3"},
     "content": [{"attachment": {"url": "https://host/report", "title": "report.pdf",
                                   "size": 20},
                  "profile": [{"valueCoding": {"system": "s", "code": "c"}}]}]},
    # plain patient doc → untouched
    {"resourceType": "DocumentReference", "id": "d3", "version": "7",
     "subject": {"reference": "Patient/P1"},
     "content": [{"attachment": {"url": "https://host/x.bin", "title": "x",
                                   "size": 30}, "profile": None}]},
    # bound to a skipped group → untouched (stays non-Patient)
    {"resourceType": "DocumentReference", "id": "d4", "version": "1",
     "subject": {"reference": "Group/g2"},
     "content": [{"attachment": {"url": "https://host/y.csv", "title": "y",
                                   "size": 40}, "profile": None}]},
]


@pytest.fixture()
def result(spark, write_ndjson_file):
    docs = read_ndjson(spark, write_ndjson_file(DOCS, "docs.ndjson"),
                       SCHEMAS["DocumentReference"])
    groups = read_ndjson(spark, write_ndjson_file(GROUPS, "groups.ndjson"), SCHEMAS["Group"])
    specimens = read_ndjson(spark, write_ndjson_file(SPECIMENS, "spec.ndjson"),
                            SCHEMAS["Specimen"])
    return derive_assays(docs, groups, specimens)


def test_assay_rows(result):
    assays = {r["id"]: r.asDict(recursive=True) for r in result.assays.collect()}
    d2_id = str(uuid.uuid5(uuid.NAMESPACE_DNS, "d2-assay"))
    assert set(assays) == {"g1", d2_id}

    g1 = assays["g1"]
    assert g1["resourceType"] == "ServiceRequest"
    assert g1["status"] == "completed" and g1["intent"] == "order"
    # last matching specimen member wins the patient (assay.py:69)
    assert g1["subject"] == {"reference": "Patient/P2"}
    # ordered specimen refs, found or not (assay.py:67)
    assert [s["reference"] for s in g1["specimen"]] == ["Specimen/s1", "Specimen/s2"]
    assert g1["code"]["coding"][0]["code"] == "15220000"
    assert g1["category"][0]["coding"][0]["code"] == "108252007"

    p2 = assays[d2_id]  # byte-exact RFC-4122 v5 (assay.py:100)
    assert p2["subject"] == {"reference": "Patient/P3"}
    assert [s["reference"] for s in p2["specimen"]] == ["Specimen/s3"]


def test_document_rewrite(result):
    docs = {r["id"]: r.asDict(recursive=True) for r in result.documents.collect()}
    assert set(docs) == {"d1", "d2", "d3", "d4"}

    d1 = docs["d1"]
    assert d1["subject"] == {"reference": "Patient/P2"}
    assert d1["version"] is None  # dropped (assay.py:212)
    assert [r["reference"] for r in d1["context"]["related"]] == ["ServiceRequest/g1"]
    att = d1["content"][0]["attachment"]
    assert att["contentType"] == "text/tab-separated-values"  # .maf (assay.py:13)
    # profile nulled on element 0 (= absent in NDJSON output; assay.py:213)
    assert d1["content"][0]["profile"] is None

    d2_id = str(uuid.uuid5(uuid.NAMESPACE_DNS, "d2-assay"))
    d2 = docs["d2"]
    assert d2["subject"] == {"reference": "Patient/P3"}
    assert [r["reference"] for r in d2["context"]["related"]] == [f"ServiceRequest/{d2_id}"]
    # url path extension-less → title drives MIME (assay.py:129-133)
    assert d2["content"][0]["attachment"]["contentType"] == "application/pdf"

    # untouched docs keep their fields
    assert docs["d3"]["version"] == "7" and docs["d3"]["subject"]["reference"] == "Patient/P1"
    assert docs["d4"]["subject"]["reference"] == "Group/g2"
    assert docs["d3"]["content"][0]["attachment"]["contentType"] is None


def test_groups_anti_join(result):
    remaining = sorted(r["id"] for r in result.groups.collect())
    assert remaining == ["g2", "g3", "g4"]  # g1 consumed (assay.py:89)


def test_invariants(result):
    inv = check_invariants(result)
    # d4 still points at Group/g2 → 1 non-patient doc; 3 groups remain;
    # the reference's equality assertion (assay.py:105-106) would flag
    # this fixture — the DQ counts expose exactly that.
    assert inv["docs_with_non_patient_subject"] == 1
    assert inv["remaining_groups"] == 3
    assert inv["invalid_assays"] == 0
