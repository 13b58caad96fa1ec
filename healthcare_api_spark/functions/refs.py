"""FHIR reference-string helpers (SURVEY.md §2.3 J6, §2.6 F3/F4).

The reference encodes foreign keys as ``'<Type>/<id>'`` strings and
derives join keys with ``reference.split('/')[1]`` (assay.py:47,66,95) and
type checks with ``reference.startswith('Specimen/')`` (assay.py:65,93).
Here those become reusable Column expressions so Catalyst can push them
into scans and use them as join keys.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ref_type(ref: Column | str) -> Column:
    """``'Patient/123'`` → ``'Patient'`` (the table selector)."""
    c = F.col(ref) if isinstance(ref, str) else ref
    return F.split(c, "/").getItem(0)


def ref_id(ref: Column | str) -> Column:
    """``'Patient/123'`` → ``'123'`` (the join key). assay.py:47."""
    c = F.col(ref) if isinstance(ref, str) else ref
    return F.split(c, "/").getItem(1)


def make_ref(rtype: str, id_col: Column | str) -> Column:
    """Inverse: build ``'<Type>/<id>'`` from an id column."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.concat(F.lit(rtype), F.lit("/"), c.cast("string"))


def is_ref_to(ref: Column | str, rtype: str) -> Column:
    """``reference.startswith('<Type>/')`` predicate (assay.py:65,93)."""
    c = F.col(ref) if isinstance(ref, str) else ref
    return c.startswith(f"{rtype}/")
