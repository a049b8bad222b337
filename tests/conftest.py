"""Shared fixtures: one SparkSession and one DuckDB oracle per session.

Mirrors the driver's correctness gate (sf0.01 + DuckDB side-by-side);
tests default to sf0.001 for speed — override with TEST_SF_DIR.
"""

from __future__ import annotations

import os
import sys

# Protobuf shim (mincemeatpy_spark/pbshim): when no pip-installed
# google.protobuf exists, expose the container's public pure-Python
# runtime so the transformWithStateInPandas e2e test runs instead of
# skipping.  Must happen BEFORE the SparkSession is created: Python
# workers inherit PYTHONPATH through the JVM, and the state-server
# client imports the generated protobuf module worker-side.
_PBSHIM = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "mincemeatpy_spark",
    "pbshim",
)
try:
    import google.protobuf  # noqa: F401
except ImportError:
    if os.path.isdir(
        "/usr/lib/google-cloud-sdk/platform/google_appengine/google/protobuf"
    ) and os.path.isdir(_PBSHIM):
        sys.path.insert(0, _PBSHIM)
        os.environ["PYTHONPATH"] = (
            _PBSHIM + os.pathsep + os.environ.get("PYTHONPATH", "")
        )

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
