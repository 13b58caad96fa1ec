"""ONE test driving the reference's actual end-to-end shape
(README.md:59-90): NDJSON scan → Assay derivation (assay.py) →
R5→R4B transforms (transform.py) → structural validation → NDJSON
sink → type-partitioned store import (upload.sh + :import) → the
FHIR-search surface — with the three assay invariants
(assay.py:105-106) holding EXACTLY (every document subject a Patient,
zero remaining groups, every assay valid) and the emitted document
NDJSON asserted byte-canonically against hand-written expected objects
(null-omitting JSON, the reference's json.dumps shape).

Unlike tests/test_assay.py's corner-case fixture (which deliberately
leaves a non-patient doc so the DQ counts have something to count),
this fixture is the CLEAN path the reference asserts on.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import functions as F

from healthcare_api_spark.operators.assay import check_invariants, derive_assays
from healthcare_api_spark.operators.transforms import dispatch_transformation
from healthcare_api_spark.plans.search import SearchConfig, SearchEngine
from healthcare_api_spark.schemas import SCHEMAS
from healthcare_api_spark.sources.ndjson import read_ndjson, write_ndjson
from healthcare_api_spark.sources.store import ResourceStore
from healthcare_api_spark.validate import structural_checks

PATIENTS = [
    {"resourceType": "Patient", "id": "P1", "gender": "male"},
    {"resourceType": "Patient", "id": "P2", "gender": "female"},
]

SPECIMENS = [
    {"resourceType": "Specimen", "id": "s1", "subject": {"reference": "Patient/P1"}},
    {"resourceType": "Specimen", "id": "s2", "subject": {"reference": "Patient/P2"}},
]

GROUPS = [
    {"resourceType": "Group", "id": "g1", "membership": "definitional",
     "type": "specimen",
     "member": [{"entity": {"reference": "Specimen/s1"}}]},
]

DOCS = [
    # group-bound → pass-1 assay g1; subject rewritten to the specimen's
    # patient; .maf extension drives the MIME table (assay.py:13)
    {"resourceType": "DocumentReference", "id": "d1", "version": "5",
     "subject": {"reference": "Group/g1"},
     "content": [{"attachment": {"url": "https://host/data/f.maf",
                                 "title": "t", "size": 10},
                  "profile": [{"valueCoding": {"system": "s", "code": "c"}}]}]},
    # specimen-bound → pass-2 singleton assay with the uuid5 id
    # (assay.py:100); extension-less url path → title drives the MIME
    {"resourceType": "DocumentReference", "id": "d2", "version": "5",
     "subject": {"reference": "Specimen/s2"},
     "content": [{"attachment": {"url": "https://host/report",
                                 "title": "report.pdf", "size": 20},
                  "profile": [{"valueCoding": {"system": "s", "code": "c"}}]}]},
    # already a patient doc → passes through untouched
    {"resourceType": "DocumentReference", "id": "d3", "version": "7",
     "subject": {"reference": "Patient/P1"},
     "content": [{"attachment": {"url": "https://host/x.csv", "title": "x",
                                 "size": 30}, "profile": None}]},
]

D2_ASSAY_ID = str(uuid.uuid5(uuid.NAMESPACE_DNS, "d2-assay"))

# the byte-canonical expectation: json.loads of every emitted NDJSON
# line must equal one of these EXACTLY — dropped fields (version,
# profile) must be ABSENT keys, not nulls, and the rewritten
# subject/context/contentType must carry the derived values
EXPECTED_DOC_NDJSON = [
    {"id": "d1", "resourceType": "DocumentReference",
     "subject": {"reference": "Patient/P1"},
     "content": [{"attachment": {
         "url": "https://host/data/f.maf", "title": "t", "size": 10,
         "contentType": "text/tab-separated-values"}}],
     "context": {"related": [{"reference": "ServiceRequest/g1"}]}},
    {"id": "d2", "resourceType": "DocumentReference",
     "subject": {"reference": "Patient/P2"},
     "content": [{"attachment": {
         "url": "https://host/report", "title": "report.pdf", "size": 20,
         "contentType": "application/pdf"}}],
     "context": {"related": [{"reference": f"ServiceRequest/{D2_ASSAY_ID}"}]}},
    {"id": "d3", "resourceType": "DocumentReference", "version": "7",
     "subject": {"reference": "Patient/P1"},
     "content": [{"attachment": {
         "url": "https://host/x.csv", "title": "x", "size": 30}}]},
]


def test_full_pipeline_end_to_end(spark, write_ndjson_file, tmp_path):
    # 1. NDJSON scan (S1)
    docs = read_ndjson(spark, write_ndjson_file(DOCS, "docs.ndjson"),
                       SCHEMAS["DocumentReference"])
    groups = read_ndjson(spark, write_ndjson_file(GROUPS, "groups.ndjson"),
                         SCHEMAS["Group"])
    specimens = read_ndjson(spark, write_ndjson_file(SPECIMENS, "spec.ndjson"),
                            SCHEMAS["Specimen"])
    patients = read_ndjson(spark, write_ndjson_file(PATIENTS, "pat.ndjson"),
                           SCHEMAS["Patient"])

    # 2. Assay derivation — the reference's assertions hold EXACTLY
    res = derive_assays(docs, groups, specimens)
    assert check_invariants(res) == {
        "docs_with_non_patient_subject": 0,
        "remaining_groups": 0,
        "invalid_assays": 0,
    }
    assays = {r["id"]: r.asDict(recursive=True) for r in res.assays.collect()}
    assert set(assays) == {"g1", D2_ASSAY_ID}
    assert assays["g1"]["subject"] == {"reference": "Patient/P1"}
    assert assays[D2_ASSAY_ID]["subject"] == {"reference": "Patient/P2"}

    # 3. R5→R4B transforms on the non-document outputs
    specimens_r4 = dispatch_transformation(specimens, "Specimen")
    groups_r4 = dispatch_transformation(res.groups, "Group")
    assert groups_r4.count() == 0  # every group consumed by pass 1

    # 4. structural validation gate (the pydantic-boundary equivalent)
    checked = structural_checks(specimens_r4, "Specimen")
    assert checked.filter(~checked["valid"]).count() == 0

    # 5. NDJSON sink (S4) — byte-canonical: parse every emitted line
    # and require EXACT object equality with the hand-written
    # expectation (absent keys stay absent; json.loads is key-order
    # insensitive, which is the canonicalization)
    out_dir = str(tmp_path / "docs_out")
    write_ndjson(res.documents, out_dir)
    lines = []
    for name in sorted(os.listdir(out_dir)):
        if name.startswith("part-") and name.endswith(".json"):
            with open(os.path.join(out_dir, name)) as f:
                lines += [json.loads(ln) for ln in f if ln.strip()]
    got = sorted(lines, key=lambda d: d["id"])
    assert got == EXPECTED_DOC_NDJSON

    # 6. store import (S7: upload.sh + FHIR-store :import equivalent)
    store = ResourceStore(spark, str(tmp_path / "store"))
    store.import_resources(patients, "Patient")
    store.import_resources(res.documents, "DocumentReference")
    store.import_resources(res.assays, "ServiceRequest")
    store.import_resources(specimens_r4, "Specimen")
    counts = {r["resourceType"]: r["cnt"] for r in store.counts_by_type(
        ["Patient", "DocumentReference", "ServiceRequest", "Specimen"]
    ).collect()}
    assert counts == {"Patient": 2, "DocumentReference": 3,
                      "ServiceRequest": 2, "Specimen": 2}

    # 7. the delegated search surface over the imported store
    engine = SearchEngine(
        {
            "Patient": store.table("Patient"),
            "DocumentReference": store.table("DocumentReference"),
        },
        {
            "Patient": SearchConfig(),
            "DocumentReference": SearchConfig(
                reference_params={"subject": ("subject.reference", "Patient")}),
        },
    )
    total = engine.search(
        "DocumentReference", {"_total": "accurate", "_count": "0"}
    ).collect()[0]["total"]
    assert total == 3
    # chained search: docs whose subject chain resolves to a female
    # patient → exactly d2 (P2)
    chained = engine.search(
        "DocumentReference", {"subject.gender": "female"}
    )
    assert [r["id"] for r in chained.collect()] == ["d2"]
