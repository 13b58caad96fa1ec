"""Deterministic id generation (SURVEY.md §2.6 F7).

The reference derives stable Assay ids with
``uuid.uuid5(uuid.NAMESPACE_DNS, doc_id + '-assay')`` (assay.py:100).
RFC-4122 v5 is SHA-1 of namespace||name with version/variant bits — the
bit-twiddling isn't expressible as a single built-in, so byte-exact
reproduction uses a vectorized pandas_udf (Arrow-batched; the only
Python in this module). For pipelines that just need *a* stable id,
``stable_id`` is the pure-JVM path.
"""

from __future__ import annotations

import uuid

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


# StringType() (not a DDL string) so the decorator needs no active session
@pandas_udf(StringType())
def uuid5_udf(name: pd.Series) -> pd.Series:
    """Byte-exact ``uuid.uuid5(NAMESPACE_DNS, name)`` — vectorized."""
    ns = uuid.NAMESPACE_DNS
    return name.map(lambda s: str(uuid.uuid5(ns, s)) if s is not None else None)


def uuid5_dns(name: Column) -> Column:
    """Column wrapper for the byte-exact path (assay.py:100 parity)."""
    return uuid5_udf(name)


def stable_id(name: Column) -> Column:
    """Pure-JVM deterministic id: sha1 hex reshaped to UUID layout.

    NOT RFC-4122-v5 byte-identical (no version bits); use when the only
    requirement is determinism + uniqueness, which keeps the hot path
    inside whole-stage codegen.
    """
    h = F.sha1(name)
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.substring(h, 13, 4),
        F.substring(h, 17, 4),
        F.substring(h, 21, 12),
    )
