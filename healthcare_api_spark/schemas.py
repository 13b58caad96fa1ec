"""Explicit Spark schemas for the FHIR resource slices the pipeline
touches (SURVEY.md §1.3, FIXTURES.md).

The reference treats rows as schemaless dicts in flight and validates
against FHIR R4B pydantic models at the boundary (transform.py:8,134).
Spark inverts that: schemas are explicit at read time (`read.schema(st)
.json`) so Catalyst can prune nested columns; untouched fields ride along
in a ``_raw`` passthrough column when round-tripping full resources.

These are the *touched-field* slices, per FIXTURES.md — each field cites
the consuming reference line.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def _ref() -> StructType:
    return StructType([StructField("reference", StringType())])


def _coding() -> StructType:
    return StructType(
        [
            StructField("system", StringType()),
            StructField("code", StringType()),
            StructField("display", StringType()),
        ]
    )


def _codeable() -> StructType:
    return StructType([StructField("coding", ArrayType(_coding()))])


# transform.py:11-28; assay.py:35-36 — DocumentReference slice
DOCUMENT_REFERENCE = StructType(
    [
        StructField("id", StringType()),
        StructField("resourceType", StringType()),
        StructField("version", StringType()),  # dropped (transform.py:13)
        StructField("status", StringType()),
        StructField("subject", _ref()),  # Group/Specimen/Patient refs
        StructField(
            "content",
            ArrayType(
                StructType(
                    [
                        StructField(
                            "attachment",
                            StructType(
                                [
                                    StructField("url", StringType()),
                                    StructField("title", StringType()),
                                    StructField("size", LongType()),  # R5 integer64 (transform.py:139-141)
                                    StructField("contentType", StringType()),
                                ]
                            ),
                        ),
                        StructField(
                            "profile",
                            ArrayType(
                                StructType([StructField("valueCoding", _coding())])
                            ),  # → format (transform.py:14-17)
                        ),
                        StructField(
                            "format", _coding()
                        ),  # output field of the P9 rename
                    ]
                )
            ),
        ),
        StructField("basedOn", ArrayType(_ref())),  # appended R5 branch (assay.py:198-203)
        StructField(
            "context",
            StructType([StructField("related", ArrayType(_ref()))]),  # appended (assay.py:216-222)
        ),
    ]
)

# transform.py:50-56; assay.py:38-39 — Group slice
GROUP = StructType(
    [
        StructField("id", StringType()),
        StructField("resourceType", StringType()),
        StructField(
            "member",
            ArrayType(StructType([StructField("entity", _ref())])),  # assay.py:63-67
        ),
        StructField("membership", StringType()),  # dropped (transform.py:52)
        StructField("type", StringType()),  # → 'person' (transform.py:55)
        StructField("actual", BooleanType()),  # → True (transform.py:53)
    ]
)

# transform.py:101-109; assay.py:41-42 — Specimen slice
SPECIMEN = StructType(
    [
        StructField("id", StringType()),
        StructField("resourceType", StringType()),
        StructField("subject", _ref()),  # 'Patient/<id>' (assay.py:69,97)
        StructField(
            "processing",
            ArrayType(
                StructType(
                    [
                        StructField("method", _codeable()),  # → procedure (transform.py:103-105)
                        StructField("procedure", _codeable()),
                    ]
                )
            ),
        ),
        StructField(
            "collection",
            StructType(
                [
                    StructField("procedure", _ref()),  # dropped (transform.py:106-108)
                    StructField("collectedDateTime", StringType()),
                ]
            ),
        ),
    ]
)

PATIENT = StructType(
    [
        StructField("id", StringType()),
        StructField("resourceType", StringType()),
        StructField("gender", StringType()),
        StructField("birthDate", StringType()),
        StructField(
            "name",
            ArrayType(
                StructType(
                    [
                        StructField("family", StringType()),
                        StructField("given", ArrayType(StringType())),
                    ]
                )
            ),
        ),
    ]
)

# transform.py:38-47
ENCOUNTER = StructType(
    [
        StructField("id", StringType()),
        StructField("resourceType", StringType()),
        StructField("status", StringType()),
        StructField("reason", ArrayType(_ref())),
        StructField("class", _codeable()),
    ]
)

# transform.py:59-68
IMAGING_STUDY = StructType(
    [
        StructField("id", StringType()),
        StructField("resourceType", StringType()),
        StructField("basedOn", ArrayType(_ref())),
        StructField(
            "series",
            ArrayType(StructType([StructField("modality", _codeable())])),
        ),
    ]
)

# transform.py:71-84
MEDICATION_ADMINISTRATION = StructType(
    [
        StructField("id", StringType()),
        StructField("resourceType", StringType()),
        StructField(
            "medication",
            StructType(
                [
                    StructField("concept", _codeable()),
                    StructField("reference", _ref()),
                ]
            ),
        ),
        StructField("occurenceDateTime", StringType()),
        StructField("category", ArrayType(_codeable())),
    ]
)

# transform.py:94-98
RESEARCH_SUBJECT = StructType(
    [
        StructField("id", StringType()),
        StructField("resourceType", StringType()),
        StructField("subject", _ref()),
        StructField("status", StringType()),
    ]
)

# transform.py:87-91
RESEARCH_STUDY = StructType(
    [
        StructField("id", StringType()),
        StructField("resourceType", StringType()),
        StructField("name", StringType()),
        StructField("title", StringType()),
    ]
)

# transform.py:31-35
BODY_STRUCTURE = StructType(
    [
        StructField("id", StringType()),
        StructField("resourceType", StringType()),
        StructField(
            "includedStructure",
            ArrayType(StructType([StructField("structure", _ref())])),
        ),
        StructField("location", _ref()),
    ]
)

SCHEMAS: dict[str, StructType] = {
    "DocumentReference": DOCUMENT_REFERENCE,
    "Group": GROUP,
    "Specimen": SPECIMEN,
    "Patient": PATIENT,
    "Encounter": ENCOUNTER,
    "ImagingStudy": IMAGING_STUDY,
    "MedicationAdministration": MEDICATION_ADMINISTRATION,
    "ResearchSubject": RESEARCH_SUBJECT,
    "ResearchStudy": RESEARCH_STUDY,
    "BodyStructure": BODY_STRUCTURE,
}
