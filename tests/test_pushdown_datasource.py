"""Filter pushdown through the custom Python Data Source (Spark 4.1
``DataSourceReader.pushFilters``).

Two proofs, neither of which trusts the plan string:

1. Unit: the reader claims exactly the single-column ``grp``
   comparisons, returns everything else by reference, and prunes
   ``partitions()`` accordingly.
2. Behavioral e2e: the scan runs with ``expectonly`` set so that
   read() of any pruned-out group RAISES — the query can only succeed
   if the pruned partitions were never scheduled, i.e. the filter was
   enforced by pruning, not post-scan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mincemeatpy_spark.sources.python_datasource import (
    _make_pushdown_datasource_class,
)


def test_reader_claims_grp_filters_and_prunes_partitions():
    from pyspark.sql.datasource import EqualTo, GreaterThan, StringContains

    cls = _make_pushdown_datasource_class()
    ds = cls(options={"groups": "8", "rowsper": "10"})
    reader = ds.reader(None)
    eq_grp = EqualTo(("grp",), 3)
    eq_other = EqualTo(("val",), 5)
    contains = StringContains(("id",), "x")
    unsupported = list(reader.pushFilters([eq_grp, eq_other, contains]))
    # unsupported filters come back BY REFERENCE (API contract)
    assert unsupported == [eq_other, contains]
    assert unsupported[0] is eq_other and unsupported[1] is contains
    parts = reader.partitions()
    assert [p.gid for p in parts] == [3]

    # range predicates compose as a conjunction
    reader2 = cls(options={"groups": "8", "rowsper": "10"}).reader(None)
    assert list(reader2.pushFilters([GreaterThan(("grp",), 2)])) == []
    assert [p.gid for p in reader2.partitions()] == [3, 4, 5, 6, 7]


def test_pushdown_prunes_reads_end_to_end(spark):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(_make_pushdown_datasource_class())
    df = (
        spark.read.format("mincemeat_dict_indexed")
        .option("groups", "8")
        .option("rowsper", "100")
        .option("expectonly", "3")  # read() of any other group raises
        .load()
        .filter(F.col("grp") == 3)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("id").alias("lo"),
            F.max("id").alias("hi"),
        )
    )
    row = df.collect()[0]
    assert (row.n, row.lo, row.hi) == (100, 3000, 3099)


def test_pushdown_control_without_filter_reads_all_groups(spark):
    """Control: the same expectonly trap DOES fire when nothing is
    pushed — proving the e2e test above passes because of pruning,
    not because read() never checks."""
    import pytest

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(_make_pushdown_datasource_class())
    df = (
        spark.read.format("mincemeat_dict_indexed")
        .option("groups", "8")
        .option("rowsper", "100")
        .option("expectonly", "3")
        .load()
    )
    with pytest.raises(Exception, match="pushdown failed"):
        df.count()
