"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's canonical word
count, reference example.py:12-18, Spark-native) on sf0.001.
``queries()`` / ``oracle_sql()`` expose every operator registered in
``mincemeatpy_spark.registry`` (one entry per SURVEY.md §2 item).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The driver may load this file by path from any CWD; make the package
# importable regardless.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from mincemeatpy_spark.registry import load_all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    q = load_all_queries()["wordcount"]
    return q.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in load_all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every deterministic query; omitted
    for approximate/sketch ops (driver records a rows-only check)."""
    return {
        name: q.oracle for name, q in load_all_queries().items() if q.oracle is not None
    }
