"""R5→R4B per-resource-type schema transforms (SURVEY.md §2.2, §2.8).

Mirrors the semantics of the reference's dispatch table
(transform.py:112-129) as pure DataFrame column expressions — the dict
mutations become ``withField``/``dropFields``/``transform`` on structs, so
the whole transform is one narrow projection per type: zero shuffles, full
whole-stage codegen, nested-column pruning applies.

Each function cites the reference lines whose observable behavior it
reproduces.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def transform_document_reference(df: DataFrame) -> DataFrame:
    """transform.py:11-28.

    - drop ``version`` (P1, transform.py:13)
    - content[*]: profile[0].valueCoding → format, drop profile
      (P9, transform.py:14-17)
    - drop rows whose subject references a Specimen (P15,
      transform.py:25-27)
    """
    out = df
    if "version" in df.columns:
        out = out.drop("version")
    if "content" in df.columns:
        out = out.withColumn(
            "content",
            F.transform(
                F.col("content"),
                lambda c: c.withField(
                    "format",
                    F.coalesce(c["profile"][0]["valueCoding"], c["format"]),
                ).dropFields("profile"),
            ),
        )
    return out.filter(
        F.col("subject").isNull()
        | F.col("subject.reference").isNull()
        | ~F.col("subject.reference").contains("Specimen")
    )


def transform_body_structure(df: DataFrame) -> DataFrame:
    """transform.py:31-35: includedStructure[0].structure → location (P6)."""
    if "includedStructure" not in df.columns:
        return df
    return df.withColumn(
        "location",
        F.when(
            F.col("includedStructure").isNotNull(), F.col("includedStructure")[0]["structure"]
        ).otherwise(F.col("location") if "location" in df.columns else F.lit(None)),
    ).drop("includedStructure")


def transform_encounter(df: DataFrame) -> DataFrame:
    """transform.py:38-47.

    - class := class.coding[0], defaulting to the NONAC coding when class
      is absent (P13 + P14, transform.py:42-45)
    - status := 'finished' (P14, transform.py:46)
    - NOTE transform.py:40-41 pops the (never-present) key ``reference``
      — not ``reason`` — so the observable reference behavior is:
      ``reason`` KEPT, ``reasonReference`` = [] added when ``reason`` was
      present. Reproduced faithfully, bug included.
    """
    out = df
    if "reason" in df.columns:
        out = out.withColumn(
            "reasonReference",
            F.when(F.col("reason").isNotNull(), F.array().cast("array<string>")),
        )
    default_class = F.named_struct(
        F.lit("code"), F.lit("NONAC"), F.lit("display"), F.lit("inpatient non-acute")
    )
    out = out.withColumn(
        "class",
        F.when(
            F.col("class").isNotNull(),
            F.struct(
                F.col("class.coding")[0]["code"].alias("code"),
                F.col("class.coding")[0]["display"].alias("display"),
            ),
        ).otherwise(
            F.struct(F.lit("NONAC").alias("code"), F.lit("inpatient non-acute").alias("display"))
        ),
    )
    return out.withColumn("status", F.lit("finished"))


def transform_group(df: DataFrame) -> DataFrame:
    """transform.py:50-56: drop membership (P2); actual=True, type='person'
    (P14)."""
    out = df.drop("membership") if "membership" in df.columns else df
    return out.withColumn("actual", F.lit(True)).withColumn("type", F.lit("person"))


def transform_imaging_study(df: DataFrame) -> DataFrame:
    """transform.py:59-68: basedOn → procedureReference (P7); series[*]
    .modality := modality.coding[0] with system space-stripped (P13+F1)."""
    out = df
    if "basedOn" in df.columns:
        out = out.withColumnRenamed("basedOn", "procedureReference")
    if "series" in df.columns:
        out = out.withColumn(
            "series",
            F.transform(
                F.col("series"),
                # guard like the reference's `if "modality" in series`
                # (transform.py:65): absent modality stays absent, not {}
                lambda s: s.withField(
                    "modality",
                    F.when(
                        s["modality"].isNotNull(),
                        F.struct(
                            F.regexp_replace(s["modality"]["coding"][0]["system"], " ", "").alias(
                                "system"
                            ),
                            s["modality"]["coding"][0]["code"].alias("code"),
                            s["modality"]["coding"][0]["display"].alias("display"),
                        ),
                    ),
                ),
            ),
        )
    return out


def transform_medication_administration(df: DataFrame) -> DataFrame:
    """transform.py:71-84.

    - choice type (P12): medication.concept → medicationCodeableConcept
      else medication.reference → medicationReference
    - occurenceDateTime → effectiveDateTime (P11)
    - category := category[0] (P13)
    - medicationCodeableConcept.coding[0].system quote-stripped (F2)
    """
    out = df
    if "medication" in df.columns:
        out = (
            out.withColumn(
                "medicationCodeableConcept",
                F.when(F.col("medication.concept").isNotNull(), F.col("medication.concept")),
            )
            .withColumn(
                "medicationReference",
                F.when(F.col("medication.concept").isNull(), F.col("medication.reference")),
            )
            .drop("medication")
            .withColumnRenamed("occurenceDateTime", "effectiveDateTime")
        )
        if "category" in out.columns:
            out = out.withColumn("category", F.col("category")[0])
    if "medicationCodeableConcept" in out.columns:
        out = out.withColumn(
            "medicationCodeableConcept",
            F.when(
                F.col("medicationCodeableConcept").isNotNull(),
                F.col("medicationCodeableConcept").withField(
                    "coding",
                    F.transform(
                        F.col("medicationCodeableConcept.coding"),
                        lambda c, i: F.when(
                            i == 0,
                            c.withField("system", F.regexp_replace(c["system"], "'", "")),
                        ).otherwise(c),
                    ),
                ),
            ),
        )
    return out


def transform_research_study(df: DataFrame) -> DataFrame:
    """transform.py:87-91: drop name (P3)."""
    return df.drop("name") if "name" in df.columns else df


def transform_research_subject(df: DataFrame) -> DataFrame:
    """transform.py:94-98: subject → individual (P8); status='on-study'
    (P14)."""
    return df.withColumnRenamed("subject", "individual").withColumn(
        "status", F.lit("on-study")
    )


def transform_specimen(df: DataFrame) -> DataFrame:
    """transform.py:101-109: processing[*].method → procedure (P10);
    drop collection.procedure (P4)."""
    out = df
    if "processing" in df.columns:
        out = out.withColumn(
            "processing",
            F.when(
                F.col("processing").isNotNull(),
                F.transform(
                    F.col("processing"),
                    lambda p: p.withField(
                        "procedure", F.coalesce(p["method"], p["procedure"])
                    ).dropFields("method"),
                ),
            ),
        )
    if "collection" in df.columns:
        out = out.withColumn(
            "collection",
            F.when(
                F.col("collection").isNotNull(), F.col("collection").dropFields("procedure")
            ),
        )
    return out


# transform.py:112-129 — the per-type dispatch table as a registry of
# DataFrame→DataFrame functions (SURVEY.md §2.8: no UDFs, pure exprs).
TRANSFORMERS: dict[str, Callable[[DataFrame], DataFrame]] = {
    "DocumentReference": transform_document_reference,
    "BodyStructure": transform_body_structure,
    "Encounter": transform_encounter,
    "Group": transform_group,
    "ImagingStudy": transform_imaging_study,
    "MedicationAdministration": transform_medication_administration,
    "ResearchStudy": transform_research_study,
    "ResearchSubject": transform_research_subject,
    "Specimen": transform_specimen,
}


def dispatch_transformation(df: DataFrame, resource_type: str) -> DataFrame:
    """transform.py:125-129 semantics: unknown type is an error."""
    if resource_type not in TRANSFORMERS:
        raise ValueError(f"Unsupported resourceType: {resource_type}")
    return TRANSFORMERS[resource_type](df)
