"""Named query registry.

Every operator the engine implements registers here as a ``Query``: a
DataFrame builder ``fn(spark, sf_dir)`` paired (where the semantics are
deterministic and SQL-expressible) with an ANSI-SQL oracle string that
DuckDB runs on the same parquet tables.  This is the engine's analogue of
the reference's single golden smoke test (reference smoke.sh:1-10) —
except order-insensitive and per-operator (SURVEY.md §5).

Queries whose semantics are approximate (LSH bucketing, ANN) register with
``oracle=None`` and get a rows-only check.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None
    category: str = "relational"
    doc: str = ""


QUERIES: dict[str, Query] = {}

# Modules that register queries on import.
_QUERY_MODULES = (
    "mincemeatpy_spark.operators.relational",
    "mincemeatpy_spark.operators.aggregates",
    "mincemeatpy_spark.operators.joins",
    "mincemeatpy_spark.operators.windows",
    "mincemeatpy_spark.operators.setops",
    "mincemeatpy_spark.operators.sorting",
    "mincemeatpy_spark.operators.misc",
    "mincemeatpy_spark.operators.skew",
    "mincemeatpy_spark.operators.sqlapi",
    "mincemeatpy_spark.operators.behavioral",
    "mincemeatpy_spark.operators.tpch",
    "mincemeatpy_spark.operators.tpch_more",
    "mincemeatpy_spark.operators.tpch_rest",
    "mincemeatpy_spark.operators.advanced",
    "mincemeatpy_spark.operators.graph",
    "mincemeatpy_spark.functions.strings",
    "mincemeatpy_spark.sources.readers",
    "mincemeatpy_spark.sources.python_datasource",
    "mincemeatpy_spark.functions.json_array",
    "mincemeatpy_spark.functions.udfs",
    "mincemeatpy_spark.functions.vector",
    "mincemeatpy_spark.text.analysis",
    "mincemeatpy_spark.text.scoring",
    "mincemeatpy_spark.text.dedup",
    "mincemeatpy_spark.text.pipeline",
    "mincemeatpy_spark.text.html_extract",
    "mincemeatpy_spark.text.classifier",
    "mincemeatpy_spark.similarity.ann",
    "mincemeatpy_spark.similarity.kmeans",
    "mincemeatpy_spark.multimodal.binary_ops",
    "mincemeatpy_spark.multimodal.vorbis",
    "mincemeatpy_spark.multimodal.vp8",
    "mincemeatpy_spark.streaming.windows_batch",
    "mincemeatpy_spark.compat",
)


def register(
    name: str,
    oracle: str | None = None,
    category: str = "relational",
    doc: str = "",
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = Query(name, fn, oracle, category, doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_all_queries() -> dict[str, Query]:
    """Import every query module (idempotent) and return the registry."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    return QUERIES
