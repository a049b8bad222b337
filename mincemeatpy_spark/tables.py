"""Parquet catalog for the test star schema.

Mirrors the reference's only input abstraction — a dict-like keyed source
read lazily one key at a time (reference mincemeat.py:306, 314) — with the
Spark-native equivalent: columnar parquet scans with predicate pushdown and
column pruning.  At 100 TB these scans are the single biggest lever:
Catalyst prunes columns and pushes filters into the parquet reader, so a
2-column projection over a 16-column table reads 2 columns' pages.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Per-application parquet schema cache: the first read of a path infers
# the schema (one tiny footer-read job); every later read passes the
# cached schema explicitly, so re-building a query plan launches ZERO
# driver jobs.  Keyed by applicationId so a fresh session re-infers,
# and by the file set's (size, mtime) fingerprint so a fixture
# regenerated IN-PLACE during one application (the build loop does
# this; ts encodings have flipped between int64-nanos and timestamp
# across fixture writers) re-infers instead of silently misreading
# with a stale schema.
_SCHEMAS: dict[tuple, object] = {}


def _path_fingerprint(path: str) -> tuple:
    """(size, mtime_ns) over the parquet file-or-directory — cheap
    driver-local stat calls, no Spark job."""
    try:
        st = os.stat(path)
        if not os.path.isdir(path):
            return (st.st_size, st.st_mtime_ns)
        parts = []
        for f in sorted(os.listdir(path)):
            if f.startswith(("_", ".")):
                continue
            s = os.stat(os.path.join(path, f))
            parts.append((f, s.st_size, s.st_mtime_ns))
        return tuple(parts)
    except OSError:
        return ("missing",)


def _read_parquet(spark: SparkSession, path: str) -> DataFrame:
    # one entry per (app, path): the stored (fingerprint, schema) pair
    # is REPLACED when the fixture regenerates, so repeated in-place
    # regeneration during one long-lived application cannot grow the
    # cache without bound
    key = (spark.sparkContext.applicationId, path)
    fp = _path_fingerprint(path)
    hit = _SCHEMAS.get(key)
    if hit is not None and hit[0] == fp:
        return spark.read.schema(hit[1]).parquet(path)
    df = spark.read.parquet(path)
    _SCHEMAS[key] = (fp, df.schema)
    return df


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table from ``sf_dir``.

    ``events.parquet`` stores TIMESTAMP(NANOS), which Spark's parquet
    reader rejects by default; read it as long nanos and convert with
    integer division (a double division would lose precision at 1e18).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    # Engine contract (session.py): timestamp semantics are UTC.  The
    # correctness driver may call queries with its own SparkSession, so
    # pin the tz here too — NTZ→TIMESTAMP casts, window() bucketing and
    # date_trunc are all session-tz-sensitive, and the DuckDB oracles
    # assume UTC wall-clock.  Idempotent, runtime-settable conf.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = _read_parquet(spark, path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("CAST(ts DIV 1000 AS LONG)"))
            )
        elif dict(df.dtypes).get("ts") == "timestamp_ntz":
            # Driver-generated parquet may carry isAdjustedToUTC=false, which
            # Spark 4 reads as TIMESTAMP_NTZ; epoch functions (unix_micros)
            # need TIMESTAMP.  Session TZ is pinned UTC, so the cast is
            # identity on the stored microseconds.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return _read_parquet(spark, path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: t(spark, sf_dir, name) for name in TABLES}


def register_views(
    spark: SparkSession, sf_dir: str, cbo_stats: bool | None = None
) -> None:
    """Register every table as a temp view (for the SQL API surface).
    ``cbo_stats`` (default: $SPARK_GRAFT_CBO_STATS=1) additionally
    registers ANALYZE'd catalog tables so CBO join reordering can
    fire — see bootstrap_cbo_statistics."""
    for name in TABLES:
        t(spark, sf_dir, name).createOrReplaceTempView(name)
    if cbo_stats is None:
        cbo_stats = os.environ.get("SPARK_GRAFT_CBO_STATS") == "1"
    if cbo_stats:
        bootstrap_cbo_statistics(spark, sf_dir)


_ROW_GROUPS: dict[str, int] = {}


def _row_groups(path: str) -> int:
    """Row-group count of a parquet file/dir (cached driver-side footer
    read — microseconds, no Spark job)."""
    if path not in _ROW_GROUPS:
        import pyarrow.parquet as pq

        if os.path.isdir(path):
            n = sum(
                pq.ParquetFile(os.path.join(path, f)).metadata.num_row_groups
                for f in os.listdir(path)
                if f.endswith(".parquet")
            )
        else:
            n = pq.ParquetFile(path).metadata.num_row_groups
        _ROW_GROUPS[path] = n
    return _ROW_GROUPS[path]


def fan_out(
    spark: SparkSession, df: DataFrame, sf_dir: str | None = None, name: str = "documents"
) -> DataFrame:
    """Spread an under-split scan across all cores before expression-heavy
    work (shingling, tokenization, vector kernels).

    Small single-row-group files scan as one partition, serializing all
    downstream per-row compute; a round-robin repartition (one shuffle of
    the already-pruned columns) unlocks every core.  The under-split test
    reads the parquet footer's row-group count driver-side (cached) —
    parquet can't split finer than a row group, and asking the DataFrame
    itself (``df.rdd.getNumPartitions``) would re-plan the query and cost
    ~0.3 s per call.  At real scale the condition is false — a 100 TB
    table scans as thousands of row-group splits — so the shuffle is
    never added where the data is already wide.  Only correct before
    order-insensitive work (all our aggregates are), which is also the
    reference's own contract (SURVEY.md §1.3: value-list order is
    non-deterministic).
    """
    p = spark.sparkContext.defaultParallelism
    if sf_dir is not None:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if _row_groups(path) >= p:
            return df
        return df.repartition(p)
    if df.rdd.getNumPartitions() < p:
        return df.repartition(p)
    return df


def bootstrap_cbo_statistics(
    spark: SparkSession,
    sf_dir: str,
    tables: tuple = (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
    ),
) -> None:
    """Catalog + statistics bootstrap for Catalyst's cost-based
    optimizer (r8 judge task 7).  Path-based parquet reads carry no
    catalog statistics, so CBO join reordering never fires on them;
    this registers each fixture as an external table (``tpch_<name>``
    USING parquet LOCATION — no data copy) and runs ``ANALYZE TABLE
    ... COMPUTE STATISTICS FOR ALL COLUMNS`` (one scan per table).

    Behind a flag by design: the ANALYZE scan is a real cost you pay
    once per fixture, exactly as you would on a warehouse.  Enable via
    ``register_views(..., cbo_stats=True)`` or
    ``$SPARK_GRAFT_CBO_STATS=1`` (which also makes get_spark turn on
    spark.sql.cbo.enabled + joinReorder before planning).
    probes/r9/cbo_q9_sf1.py measures the effect on a deliberately
    mis-ordered Q9 at sf1."""
    for name in tables:
        path = os.path.join(sf_dir, f"{name}.parquet")
        spark.sql(f"DROP TABLE IF EXISTS tpch_{name}")
        spark.sql(
            f"CREATE TABLE tpch_{name} USING parquet LOCATION '{path}'"
        )
        spark.sql(
            f"ANALYZE TABLE tpch_{name} COMPUTE STATISTICS FOR ALL COLUMNS"
        )
