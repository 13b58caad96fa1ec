"""End-to-end demo: the complete reference workflow on this engine.

Mirrors the reference's pipeline ordering (README.md:59-60):
  1. synthesize a FHIR NDJSON drop (DocumentReference/Group/Specimen/Patient)
  2. Assay derivation (scripts/assay.py equivalent)
  3. R5→R4B transforms (scripts/transform.py equivalent)
  4. structural validation (the pydantic gate, expression-level)
  5. import into the type-partitioned Parquet store (upload.sh + FHIR
     store :import equivalent)
  6. query through the FHIR-search frontend (the delegated REST surface,
     README.md:97-105, now native)

Run: python examples/full_pipeline.py [n_patients]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from healthcare_api_spark import get_spark
from healthcare_api_spark.operators.assay import check_invariants, derive_assays
from healthcare_api_spark.operators.transforms import dispatch_transformation
from healthcare_api_spark.plans.search import SearchConfig, SearchEngine
from healthcare_api_spark.quality import observe_assay_documents
from healthcare_api_spark.schemas import SCHEMAS
from healthcare_api_spark.sources.ndjson import read_ndjson
from healthcare_api_spark.sources.store import ResourceStore
from healthcare_api_spark.validate import structural_checks


def synthesize(d: str, n_patients: int) -> dict[str, str]:
    paths = {}
    rows = {
        "Patient": [
            {"resourceType": "Patient", "id": f"p{i}",
             "gender": ["male", "female"][i % 2], "birthDate": f"19{50 + i % 50:02d}-01-01",
             "name": [{"family": f"Fam{i}", "given": [f"G{i}"]}]}
            for i in range(n_patients)
        ],
        "Specimen": [
            {"resourceType": "Specimen", "id": f"s{i}",
             "subject": {"reference": f"Patient/p{i % n_patients}"}}
            for i in range(n_patients * 4)
        ],
        "Group": [
            {"resourceType": "Group", "id": f"g{i}", "membership": "definitional",
             "type": "specimen",
             "member": [{"entity": {"reference": f"Specimen/s{(i * 4 + j) % (n_patients * 4)}"}}
                        for j in range(3)]}
            for i in range(max(n_patients // 10, 1))
        ],
        "DocumentReference": [
            {"resourceType": "DocumentReference", "id": f"d{i}", "version": "1",
             "subject": {"reference":
                         f"Group/g{i % max(n_patients // 10, 1)}" if i % 3 == 0
                         else f"Specimen/s{i % (n_patients * 4)}" if i % 7 == 0
                         else f"Patient/p{i % n_patients}"},
             "content": [{"attachment": {
                 "url": f"https://h/f{i}" + [".maf", ".vcf", ".csv", ""][i % 4],
                 "title": f"f{i}", "size": 100 + i},
                 "profile": [{"valueCoding": {"system": "s", "code": "c"}}]}]}
            for i in range(n_patients * 20)
        ],
    }
    for rtype, rs in rows.items():
        p = os.path.join(d, f"{rtype}.ndjson")
        with open(p, "w") as f:
            for r in rs:
                f.write(json.dumps(r) + "\n")
        paths[rtype] = p
    return paths


def main() -> None:
    n_patients = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    d = tempfile.mkdtemp(prefix="fhir_pipeline_")
    paths = synthesize(d, n_patients)
    spark = get_spark("full-pipeline")

    # 1-2. scan + assay derivation
    docs = read_ndjson(spark, paths["DocumentReference"], SCHEMAS["DocumentReference"])
    groups = read_ndjson(spark, paths["Group"], SCHEMAS["Group"])
    specimens = read_ndjson(spark, paths["Specimen"], SCHEMAS["Specimen"])
    res = derive_assays(docs, groups, specimens)
    print("invariants:", check_invariants(res))

    # 3. R5→R4 transforms on the remaining inputs
    groups_r4 = dispatch_transformation(res.groups, "Group")
    specimens_r4 = dispatch_transformation(specimens, "Specimen")
    patients = read_ndjson(spark, paths["Patient"], SCHEMAS["Patient"])

    # 4. validation gate + observed metrics ride the import action
    observed_docs, obs = observe_assay_documents(res.documents)
    checked = structural_checks(groups_r4, "Group")
    n_bad = checked.filter(~checked["valid"]).count()
    assert n_bad == 0, f"{n_bad} invalid groups"

    # 5. store import (≈ GCS upload + FHIR-store :import)
    store = ResourceStore(spark, os.path.join(d, "store"))
    store.import_resources(patients, "Patient")
    store.import_resources(observed_docs, "DocumentReference")
    store.import_resources(res.assays, "ServiceRequest")
    store.import_resources(specimens_r4, "Specimen")
    print("observed during import:", obs.get)
    print("store counts:", {r["resourceType"]: r["cnt"] for r in store.counts_by_type(
        ["Patient", "DocumentReference", "ServiceRequest", "Specimen"]).collect()})

    # 6. the query surface (README.md:101-103 and friends, natively)
    engine = SearchEngine(
        {
            "Patient": store.table("Patient"),
            "DocumentReference": store.table("DocumentReference"),
        },
        {
            "Patient": SearchConfig(
                array_string_params={"name": ("name", "family")}),
            "DocumentReference": SearchConfig(
                reference_params={"subject": ("subject.reference", "Patient")}),
        },
    )
    total = engine.search("Patient", {"_total": "accurate"}).collect()[0]["total"]
    print(f"GET /fhir/Patient?_total=accurate&_count=0  ->  {total}")
    females = engine.search("Patient", {"gender": "female", "_total": "accurate"})
    print("female patients:", females.collect()[0]["total"])
    chained = engine.search("DocumentReference", {"subject.gender": "female",
                                                   "_total": "accurate"})
    print("docs of female patients:", chained.collect()[0]["total"])
    named = engine.search("Patient", {"name": "fam1", "_count": "3",
                                       "_elements": "id,name"})
    print("name prefix page:", [r["id"] for r in named.collect()])


if __name__ == "__main__":
    main()
