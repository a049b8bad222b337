"""Shared fixtures: one SparkSession and one DuckDB oracle per session.

Mirrors the driver's correctness gate (sf0.01 + DuckDB side-by-side);
tests default to sf0.001 for speed — override with TEST_SF_DIR.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from mincemeatpy_spark.session import get_spark
from mincemeatpy_spark.tables import TABLES

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def spark():
    # TEST_SHUFFLE_PARTITIONS: run the whole suite under a different
    # partition layout (results must be invariant — the determinism
    # suite covers the riskiest queries every run; this knob lets CI
    # sweep all of them).
    parts = int(os.environ.get("TEST_SHUFFLE_PARTITIONS", "4"))
    spark = get_spark("mincemeatpy-tests", cores=4, shuffle_partitions=parts)
    yield spark


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    yield con
    con.close()
