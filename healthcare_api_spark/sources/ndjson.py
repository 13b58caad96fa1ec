"""NDJSON scan/sink (SURVEY.md §2.1 S1/S2/S4/S5).

The reference line-iterates NDJSON files with json.loads/json.dumps
(transform.py:154-165, assay.py:35-42). Spark's JSON source is the native
replacement: distributed line-splittable scan, schema projection pushed
into the parser, corrupt rows captured instead of thrown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_ndjson(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    keep_corrupt: bool = False,
) -> DataFrame:
    """S1: schema-projected NDJSON scan.

    With an explicit schema the JSON parser materializes only the
    projected fields (the distributed analogue of the reference's lazy
    dict access). multiLine stays False so files split by line across
    tasks — a 100 TB NDJSON dataset scans fully parallel.
    """
    reader = spark.read.option("mode", "PERMISSIVE")
    if schema is not None:
        s = schema
        if keep_corrupt and CORRUPT_COL not in schema.fieldNames():
            s = StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])
        reader = reader.schema(s).option("columnNameOfCorruptRecord", CORRUPT_COL)
    return reader.json(path)


def read_ndjson_raw(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """S1 variant preserving full passthrough: parse the projected schema
    AND keep the original line as ``_raw`` (for byte-faithful round-trips
    of fields the pipeline never touches)."""
    lines = spark.read.text(path).withColumnRenamed("value", "_raw")
    parsed = F.from_json(F.col("_raw"), schema)
    cols = [parsed.getField(f.name).alias(f.name) for f in schema.fields]
    return lines.select(*cols, "_raw")


def write_ndjson(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S4: NDJSON sink — one JSON object per line, null fields omitted
    (matches json.dumps of a dict without the absent keys)."""
    df.write.mode(mode).option("ignoreNullFields", "true").json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    keep_corrupt: bool = False,
    header: bool = True,
    multiline: bool = False,
) -> DataFrame:
    """CSV scan with the same corrupt-capture contract as ``read_ndjson``:
    PERMISSIVE mode, malformed rows land in ``_corrupt_record`` instead
    of failing the job. ``multiline=True`` is required when quoted
    fields contain newlines — note it makes files non-splittable (one
    task per file), so at 100 TB prefer many medium files or convert to
    a splittable format at the edge.

    ``keep_corrupt`` requires an explicit ``schema``: Spark only honors
    ``columnNameOfCorruptRecord`` on the schema branch, so an
    inferred-schema read would silently drop the corrupt-capture
    contract instead of honoring it."""
    if keep_corrupt and schema is None:
        raise ValueError(
            "keep_corrupt=True requires an explicit schema — corrupt-record "
            "capture does not apply to inferred-schema CSV reads"
        )
    reader = (
        spark.read.option("mode", "PERMISSIVE")
        .option("header", str(header).lower())
        .option("multiLine", str(multiline).lower())
        .option("escape", '"')  # RFC-4180 doubled-quote escaping
    )
    if schema is not None:
        s = schema
        if keep_corrupt and CORRUPT_COL not in schema.fieldNames():
            s = StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])
        reader = reader.schema(s).option("columnNameOfCorruptRecord", CORRUPT_COL)
    return reader.csv(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    """CSV sink, RFC-4180 quoting (doubled quotes) so text fields with
    commas/newlines/quotes round-trip."""
    (
        df.write.mode(mode)
        .option("header", str(header).lower())
        .option("escape", '"')
        .csv(path)
    )
