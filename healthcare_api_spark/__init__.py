"""healthcare_api_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference repo
(FHIR-Aggregator/healthcare-api, see /root/reference) as an idiomatic
Spark engine:

- ``sources``   : NDJSON/Parquet scans and sinks (SURVEY.md §2.1, S1-S8)
- ``operators`` : projections/filters (P*), joins (J*), aggregations (A*),
                  the Assay derivation, and LLM-data-pipeline extensions
                  (dedup, similarity, text analysis, multimodal)
- ``functions`` : scalar helpers (F*) — reference parsing, MIME inference,
                  deterministic uuid5, text hashing
- ``plans``     : the FHIR-search-parameter → Column translator (§2.7)
- ``streaming`` : incremental upsert + windowed aggregation (§2.9)

Everything is declarative DataFrame/SQL; Catalyst plans the physical
execution. Python UDFs appear only where semantics require them
(byte-exact RFC-4122 uuid5, stubbed multimodal decode).
"""

from healthcare_api_spark.session import get_spark
from healthcare_api_spark.tables import load_tables

__all__ = ["get_spark", "load_tables"]
__version__ = "0.1.0"
