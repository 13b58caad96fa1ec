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


def uuid3_ns(name: Column, namespace: uuid.UUID = uuid.NAMESPACE_DNS) -> Column:
    """RFC-4122 v3 (md5-based) UUID — pure JVM, byte-exact vs CPython.

    v3 is md5(namespace_bytes || utf8(name)) with the version nibble
    forced to 3 (hex char 13) and the variant's top two bits forced to
    10 (hex char 17 → (n & 0x3) | 0x8). All of that is expressible with
    built-in md5/substring/conv, so unlike the sha1-based v5 twin
    (``uuid5_dns``, pandas_udf — DuckDB 1.0 has no sha1 either) this
    path stays inside whole-stage codegen AND is cross-engine
    hash-verifiable. Byte-exactness vs ``uuid.uuid3`` is pinned in
    tests/test_properties.py for both NAMESPACE_DNS and ASCII
    namespaces.
    """
    h = F.md5(F.concat(F.lit(namespace.bytes), F.encode(name, "UTF-8")))
    variant_nibble = F.conv(F.substring(h, 17, 1), 16, 10).cast("int")
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.concat(F.lit("3"), F.substring(h, 14, 3)),
        F.concat(
            # (n & 0x3) | 0x8 cycles with period 4 over the nibble value
            F.substring(F.lit("89ab89ab89ab89ab"), variant_nibble + 1, 1),
            F.substring(h, 18, 3),
        ),
        F.substring(h, 21, 12),
    )


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
