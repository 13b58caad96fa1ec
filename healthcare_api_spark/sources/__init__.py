"""Sources & sinks (SURVEY.md §2.1, S1-S8)."""

from healthcare_api_spark.sources.ndjson import read_ndjson, write_ndjson
from healthcare_api_spark.sources.store import ResourceStore

__all__ = ["read_ndjson", "write_ndjson", "ResourceStore"]
