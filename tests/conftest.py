"""Shared fixtures: one SparkSession per test session, NDJSON writers."""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from healthcare_api_spark import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture()
def write_ndjson_file(tmp_path):
    """Write a list of dicts as an NDJSON file, return its path."""

    def _write(rows: list[dict], name: str = "data.ndjson") -> str:
        p = tmp_path / name
        with p.open("w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        return str(p)

    return _write


SF_DIR = "/root/testdata/sf0.001"
