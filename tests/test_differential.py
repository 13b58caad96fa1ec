"""Differential test: the Spark transforms vs an independent
row-at-a-time implementation of the same observable semantics
(the reference's execution model) on randomized resources.

The DuckDB oracle can't express nested FHIR transforms; this closes that
gap: both implementations consume identical NDJSON and their outputs are
compared as canonicalized JSON (null-stripped, key-sorted).
"""

from __future__ import annotations

import json
import random

import pytest

from healthcare_api_spark.operators import transforms
from healthcare_api_spark.schemas import SCHEMAS
from healthcare_api_spark.sources.ndjson import read_ndjson


# --- independent row-model implementations (semantics, not reference code) ---

def row_document_reference(r: dict) -> dict | None:
    r = json.loads(json.dumps(r))
    r.pop("version", None)
    for c in r.get("content") or []:
        if c.get("profile") is not None:
            c["format"] = c.pop("profile")[0]["valueCoding"]
    subj = (r.get("subject") or {}).get("reference")
    if subj and "Specimen" in subj:
        return None
    return r


def row_group(r: dict) -> dict:
    r = json.loads(json.dumps(r))
    r.pop("membership", None)
    r["actual"] = True
    r["type"] = "person"
    return r


def row_specimen(r: dict) -> dict:
    r = json.loads(json.dumps(r))
    for p in r.get("processing") or []:
        if p.get("method") is not None:
            p["procedure"] = p.pop("method")
    if r.get("collection") is not None:
        r["collection"].pop("procedure", None)
    return r


def row_research_subject(r: dict) -> dict:
    r = json.loads(json.dumps(r))
    r["individual"] = r.pop("subject", None)
    r["status"] = "on-study"
    return r


# ------------------------------- random resource generators -----------------

def _maybe(rng, v, p=0.3):
    return None if rng.random() < p else v


def gen_document_reference(rng: random.Random, i: int) -> dict:
    subj_type = rng.choice(["Patient", "Group", "Specimen", "Patient"])
    content = _maybe(
        rng,
        [
            {
                "attachment": _maybe(
                    rng,
                    {
                        "url": _maybe(rng, f"https://h/p/f{i}.{rng.choice(['maf','vcf','xyz',''])}"),
                        "title": _maybe(rng, f"t{i}.pdf"),
                        "size": rng.choice([None, 10, 5_000_000_000]),
                    },
                    0.2,
                ),
                "profile": _maybe(
                    rng,
                    [{"valueCoding": {"system": f"s{i}", "code": f"c{i % 5}"}}],
                    0.4,
                ),
            }
        ],
        0.2,
    )
    return {
        "resourceType": "DocumentReference",
        "id": f"d{i}",
        "version": rng.choice([None, "1", "9"]),
        "subject": _maybe(rng, {"reference": f"{subj_type}/x{i % 7}"}, 0.15),
        "content": content,
    }


def gen_group(rng: random.Random, i: int) -> dict:
    return {
        "resourceType": "Group",
        "id": f"g{i}",
        "membership": rng.choice([None, "definitional", "enumerated"]),
        "type": rng.choice(["specimen", "person", None]),
        "member": _maybe(
            rng,
            [{"entity": {"reference": f"Specimen/s{j}"}} for j in range(rng.randint(0, 3))],
        ),
    }


def gen_specimen(rng: random.Random, i: int) -> dict:
    return {
        "resourceType": "Specimen",
        "id": f"s{i}",
        "subject": {"reference": f"Patient/p{i % 5}"},
        "processing": _maybe(
            rng,
            [
                {"method": _maybe(rng, {"coding": [{"system": "s", "code": f"m{j}",
                                                     "display": None}]}, 0.4)}
                for j in range(rng.randint(1, 2))
            ],
        ),
        "collection": _maybe(
            rng,
            {
                "procedure": _maybe(rng, {"reference": f"Procedure/pr{i}"}),
                "collectedDateTime": _maybe(rng, "2024-01-01"),
            },
        ),
    }


def gen_research_subject(rng: random.Random, i: int) -> dict:
    return {
        "resourceType": "ResearchSubject",
        "id": f"r{i}",
        "subject": {"reference": f"Patient/p{i}"},
        "status": rng.choice(["active", "candidate", None]),
    }


# ---------------------------------- canonical compare ------------------------

def strip_nulls(x):
    if isinstance(x, dict):
        out = {}
        for k, v in x.items():
            if v is None:
                continue
            sv = strip_nulls(v)  # once per value — recursing in both the
            if sv != {}:         # filter and the value would be O(2^depth)
                out[k] = sv
        return out
    if isinstance(x, list):
        return [strip_nulls(v) for v in x]
    return x


def canon(rows: list[dict]) -> list[str]:
    return sorted(json.dumps(strip_nulls(r), sort_keys=True) for r in rows)


CASES = [
    ("DocumentReference", gen_document_reference, row_document_reference),
    ("Group", gen_group, row_group),
    ("Specimen", gen_specimen, row_specimen),
    ("ResearchSubject", gen_research_subject, row_research_subject),
]


@pytest.mark.parametrize("rtype,gen,row_fn", CASES, ids=[c[0] for c in CASES])
def test_spark_matches_row_model(spark, write_ndjson_file, rtype, gen, row_fn):
    rng = random.Random(42)
    rows = [gen(rng, i) for i in range(120)]
    path = write_ndjson_file([strip_nulls(r) for r in rows], f"{rtype}.ndjson")

    expected = [out for r in rows if (out := row_fn(strip_nulls(r))) is not None]

    df = read_ndjson(spark, path, SCHEMAS[rtype])
    out_df = transforms.dispatch_transformation(df, rtype)
    got = [json.loads(r) for r in out_df.toJSON().collect()]

    assert canon(got) == canon(expected)
