"""User-defined function surfaces: UDTF and grouped-agg UDAF.

The reference's entire API is UDFs — ``mapfn`` is a UDTF (one input row
to 0..n output rows, reference mincemeat.py:167-173) and ``reducefn``/
``collectfn`` are UDAFs (all values of a key to one value, reference
mincemeat.py:174-182).  The compat module preserves those exact
signatures on RDDs; this module shows the same two shapes as first-class
DataFrame citizens:

- a Python UDTF (Spark 4 ``@udtf``) called via LATERAL — the declarative
  ``mapfn``;
- a Pandas GROUPED_AGG UDAF over Arrow batches — the vectorized
  ``reducefn`` (contrast with the row-at-a-time marshal-shipped original).

Both stay off the row-at-a-time Python path everywhere except the UDF
body itself; at 100 TB the UDTF's lateral join and the UDAF's partial
aggregation distribute exactly like their built-in counterparts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mincemeatpy_spark.registry import register
from mincemeatpy_spark.tables import t


@register(
    "udtf_word_positions",
    oracle="""
        SELECT doc_id, word, pos
        FROM (
            SELECT doc_id,
                   unnest(words) AS word,
                   unnest(CAST(generate_series(0, len(words) - 1) AS INT[])) AS pos
            FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS words
                  FROM documents
                  WHERE doc_id < 50)
        )
        WHERE word <> ''
        """,
    category="udf",
    doc="Python UDTF (the declarative mapfn, reference mincemeat.py:"
    "167-173): one text row in, one row per token out with its position, "
    "invoked via LATERAL so it runs distributed next to the scan, "
    "Arrow-optimized (useArrow=True plans ArrowEvalPythonUDTF — batched "
    "columnar transfer, not row-pickling).  "
    "Positions are assigned before the empty-token filter so they match "
    "the regex-split oracle exactly.",
)
def udtf_word_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, pos: int", useArrow=True)
    class WordPositions:
        def eval(self, text: str):
            import re

            for i, w in enumerate(re.split(r"\s+", text)):
                yield w, i

    spark.udtf.register("word_positions", WordPositions)
    t(spark, sf_dir, "documents").createOrReplaceTempView("documents_v")
    return spark.sql(
        """
        SELECT d.doc_id, s.word, s.pos
        FROM documents_v d, LATERAL word_positions(d.text) s
        WHERE d.doc_id < 50 AND s.word <> ''
        """
    )


@register(
    "udaf_weighted_avg",
    oracle="""
        SELECT l_returnflag,
               CAST(SUM(CAST(round(l_extendedprice * l_quantity * 1000000) AS BIGINT)) AS DOUBLE)
               / CAST(SUM(CAST(round(l_quantity * 1000000) AS BIGINT)) AS DOUBLE)
               AS wavg_price
        FROM lineitem
        GROUP BY l_returnflag
        """,
    category="udf",
    doc="Pandas GROUPED_AGG UDAF (the vectorized reducefn, reference "
    "mincemeat.py:179-182): quantity-weighted average price per return "
    "flag, accumulated in int64 micro-units inside numpy so the result "
    "is order-independent and bit-identical to the SQL oracle.  Arrow "
    "ships columnar batches; no per-row Python.",
)
def udaf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # functionType passed explicitly: `from __future__ import annotations`
    # stringizes type hints, so hint-based inference can't see GROUPED_AGG.
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def wavg(price, qty):
        import numpy as np

        num = np.round(price.values * qty.values * 1e6).astype(np.int64).sum()
        den = np.round(qty.values * 1e6).astype(np.int64).sum()
        return float(num) / float(den)

    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        wavg(F.col("l_extendedprice"), F.col("l_quantity")).alias("wavg_price")
    )


@register(
    "maparrow_token_stats",
    oracle="""
        SELECT lang,
               count(*) AS n_docs,
               CAST(sum(len(list_filter(string_split_regex(text, '\\s+'),
                                        x -> x <> ''))) AS BIGINT) AS n_tokens
        FROM documents
        GROUP BY lang
        """,
    category="udf",
    doc="mapInArrow: per-batch token counting straight on pyarrow "
    "RecordBatches — the lowest-overhead Python hook (no pandas "
    "conversion at all, Arrow columns in and out).  The Python stage "
    "emits one (lang, n_tokens) row per doc; the reduction stays JVM "
    "-side.  Completes the UDF matrix: row UDF, pandas scalar, grouped "
    "agg, grouped map, mapInPandas, mapPartitions, UDTF, mapInArrow.  "
    "Tokenization semantics (ADVICE r13, intentional): RE2 \\S+ — ASCII "
    "whitespace boundaries, matching the DuckDB oracle's RE2 \\s+ split "
    "exactly; documents containing Unicode whitespace (\\x0b, \\xa0) "
    "tokenize differently than Python str.split() would.",
)
def maparrow_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from mincemeatpy_spark.tables import fan_out

    def count_tokens(batches):
        # r13 optimization round (guide §4.2): the token count runs as
        # ONE vectorized pyarrow.compute kernel per batch — counting
        # non-overlapping \S+ matches IS the nonempty-token count of a
        # whitespace split (the oracle's list_filter(string_split_regex)
        # spelling) — instead of to_pylist() + a per-row Python loop.
        import pyarrow.compute as pc

        for batch in batches:
            counts = pc.coalesce(
                pc.count_substring_regex(batch.column("text"), r"\S+"),
                pa.scalar(0, pa.int32()),
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column("lang"), pc.cast(counts, pa.int64())],
                ["lang", "n_tokens"],
            )

    docs = fan_out(spark, t(spark, sf_dir, "documents").select("lang", "text"), sf_dir)
    per_doc = docs.mapInArrow(count_tokens, "lang string, n_tokens long")
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
    )


@register(
    "cogroup_reconcile",
    oracle="""
        SELECT o.o_orderkey,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS header_cents,
               CAST(coalesce(l.line_cents, 0) AS BIGINT) AS line_cents,
               CAST(coalesce(l.n_lines, 0) AS BIGINT) AS n_lines
        FROM orders o
        LEFT JOIN (
            SELECT l_orderkey,
                   sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS line_cents,
                   count(*) AS n_lines
            FROM lineitem
            GROUP BY 1
        ) l ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderkey % 20 = 0
        """,
    category="udf",
    doc="Cogrouped applyInPandas — the two-input grouped-map hook "
    "(completes the UDF matrix alongside grouped-agg, grouped-map, "
    "mapInPandas, mapInArrow, UDTF): orders and their lineitems are "
    "co-shuffled on the order key and each key's two pandas frames are "
    "handed to one Python function, which reconciles the header amount "
    "against the exact cent-sum of its lines — the ledger-audit shape "
    "that a pure SQL join also expresses (the oracle) but which "
    "generalizes to per-key logic SQL can't (sequence alignment, "
    "per-entity model scoring).  Both sides pre-filtered to the same "
    "key residue so the shuffle carries 5% of rows; numpy int64 "
    "accumulation keeps it exact.  At 100 TB this is one co-partitioned "
    "shuffle, no driver involvement, Arrow-batched both directions.",
)
def cogroup_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    # Cogroup on a 256-way key-hash bucket, not the raw orderkey: the
    # co-shuffle still brings each order's header and lines to the same
    # python call (bucket is a function of the key), but the Arrow
    # exchange carries 256 large batches instead of one tiny call per
    # order — grouped-map overhead scales with group count (measured
    # 18.5s -> ~2s at sf0.1).
    o = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderkey") % 20 == 0)
        .withColumn("bkt", F.pmod(F.col("o_orderkey"), F.lit(256)))
    )
    li = (
        t(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") % 20 == 0)
        .withColumn("bkt", F.pmod(F.col("l_orderkey"), F.lit(256)))
    )

    def reconcile(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        if left.empty:  # lineitems with no order header: out of scope
            return pd.DataFrame(
                columns=["o_orderkey", "header_cents", "line_cents", "n_lines"]
            )
        headers = left.assign(
            header_cents=np.round(left["o_totalprice"].values * 100).astype("int64")
        ).groupby("o_orderkey", as_index=False)["header_cents"].sum()
        if right.empty:
            lines = pd.DataFrame({"o_orderkey": [], "line_cents": [], "n_lines": []})
        else:
            lines = (
                right.assign(
                    line_cents=np.round(
                        right["l_extendedprice"].values * 100
                    ).astype("int64")
                )
                .groupby("l_orderkey", as_index=False)
                .agg(line_cents=("line_cents", "sum"), n_lines=("line_cents", "size"))
                .rename(columns={"l_orderkey": "o_orderkey"})
            )
        out = headers.merge(lines, on="o_orderkey", how="left")
        out["line_cents"] = out["line_cents"].fillna(0).astype("int64")
        out["n_lines"] = out["n_lines"].fillna(0).astype("int64")
        return out

    return (
        o.select("bkt", "o_orderkey", "o_totalprice")
        .groupBy("bkt")
        .cogroup(li.select("bkt", "l_orderkey", "l_extendedprice").groupBy("bkt"))
        .applyInPandas(
            reconcile,
            "o_orderkey bigint, header_cents bigint, line_cents bigint, n_lines bigint",
        )
    )


@register(
    "udf_arrow_scalar",
    oracle="""
        SELECT upper(p_brand) || '/' || CAST(p_size * 2 + 1 AS VARCHAR) AS sku,
               CAST(count(*) AS BIGINT) AS n_parts,
               CAST(min(p_partkey) AS BIGINT) AS min_key
        FROM part
        GROUP BY 1
        """,
    category="udf",
    doc="Arrow-optimized scalar Python UDF (Spark 4 useArrow=True): the "
    "row-UDF ergonomics of the reference's mapfn with Arrow-batched "
    "transfer instead of pickled rows — the migration path for legacy "
    "per-row UDFs that can't be vectorized as pandas_udfs.  The "
    "function is deterministic string/integer work, so it is exactly "
    "oracle-checked; the aggregate stays JVM-side.  Still slower than "
    "built-ins (marked non-hot-path); the engine's rule remains: "
    "expressions first, pandas_udf second, arrow-UDF for stragglers.",
)
def udf_arrow_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udf

    @udf(returnType="string", useArrow=True)
    def make_sku(brand: str, size: int) -> str:
        return f"{brand.upper()}/{size * 2 + 1}"

    p = t(spark, sf_dir, "part")
    return (
        p.select(make_sku("p_brand", "p_size").alias("sku"), "p_partkey")
        .groupBy("sku")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.min("p_partkey").alias("min_key"),
        )
    )


@register(
    "udtf_table_argument",
    oracle="""
        SELECT event_type, event_id, value
        FROM (
            SELECT event_type, event_id, value,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY value DESC, event_id) AS rk
            FROM events
        )
        WHERE rk <= 2
        """,
    category="udf",
    doc="Polymorphic table function with a TABLE argument (Spark 4 "
    "UDTF(TABLE(...) PARTITION BY ... ORDER BY ...)): the UDTF consumes "
    "WHOLE ordered partitions — one instance per event_type, rows "
    "arriving value-descending — and keeps the top 2 per partition in "
    "O(1) state.  This is the API the reference's per-key reducefn "
    "(all values of a key, one call — mincemeat.py:327-329) maps onto "
    "when the reduction needs ordered streaming rather than a "
    "materialized list; Spark plans the PARTITION BY as the shuffle "
    "and the ORDER BY as an intra-partition sort, exactly one "
    "exchange.  Deterministic tie-break (value DESC, event_id) makes "
    "the emitted rows hash-stable.  Scale shape: a JVM-side rank<=k "
    "pre-reduction (WindowGroupLimit — map-side partial top-k, the "
    "combiner rule) runs BEFORE the UDTF, so Python sees k rows per "
    "key, never the full partition — feeding a TABLE-argument UDTF "
    "the raw fact table would stream every row through the Python "
    "worker at 0 selectivity.  The UDTF remains the final ordered "
    "per-key reduce over the pre-reduced, column-pruned input.",
)
def udtf_table_argument(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from pyspark.sql.functions import udtf

    @udtf(returnType="event_type string, event_id bigint, value double", useArrow=True)
    class Top2PerPartition:
        def __init__(self) -> None:
            self.n = 0

        def eval(self, row):
            if self.n < 2:
                self.n += 1
                yield row["event_type"], row["event_id"], row["value"]

    spark.udtf.register("top2_per_partition", Top2PerPartition)
    # Combiner: JVM partial top-k (rank<=2 → WindowGroupLimit pushes the
    # limit map-side) so the Python UDTF consumes 2 rows per key, not the
    # whole fact table.  Column-pruned to exactly the UDTF's inputs.
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), "event_id")
    (
        t(spark, sf_dir, "events")
        .select("event_type", "event_id", "value")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .drop("rk")
    ).createOrReplaceTempView("events_udtf_v")
    return spark.sql(
        """
        SELECT * FROM top2_per_partition(
            TABLE(events_udtf_v)
            PARTITION BY event_type
            ORDER BY (value DESC, event_id)
        )
        """
    )


@register(
    "udtf_dynamic_schema",
    oracle="""
        SELECT event_type,
               CAST(sum(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b0,
               CAST(sum(CASE WHEN b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS b1,
               CAST(sum(CASE WHEN b = 2 THEN 1 ELSE 0 END) AS BIGINT) AS b2,
               CAST(sum(CASE WHEN b = 3 THEN 1 ELSE 0 END) AS BIGINT) AS b3
        FROM (SELECT event_type,
                     least(greatest(CAST(floor(value / 25) AS BIGINT), 0), 3)
                         AS b
              FROM events WHERE value IS NOT NULL)
        GROUP BY event_type
        """,
    category="udf",
    doc="DYNAMIC-SCHEMA polymorphic UDTF (Spark 4 analyze()): the output "
    "schema is computed at PLAN time from a constant argument — "
    "hist_by_type(4, TABLE(...)) emits event_type plus FOUR bucket "
    "columns because analyze() read the literal 4; call it with 8 and "
    "the relation has eight, no code change.  This is the API "
    "completion of udtf_table_argument (fixed schema, ordered "
    "partitions): together they cover the full Spark 4 UDTF surface "
    "the reference's reducefn maps onto.  One instance per PARTITION "
    "BY group accumulates O(n_buckets) state and emits a single row "
    "at terminate() — counts are order-independent, so no ORDER BY "
    "and no sort.  Scale shape (r8): the raw-event counting happens "
    "in a codegen'd two-phase hash aggregate BEFORE the UDTF, which "
    "then consumes only the bounded (type, bucket, count) histogram "
    "grain — the Python row loop is O(types x buckets) at any corpus "
    "size (the raw-row form cost 12 s at sf0.1).  Bucket arithmetic "
    "(floor(value/25) clamped) is a single IEEE division identical "
    "in Python, Spark, and DuckDB.",
)
def udtf_dynamic_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    class HistByType:
        @staticmethod
        def analyze(n_arg, table_arg):
            from pyspark.sql.functions import AnalyzeResult
            from pyspark.sql.types import LongType, StringType, StructType

            k = n_arg.value
            schema = StructType().add("event_type", StringType())
            for i in range(k):
                schema = schema.add(f"b{i}", LongType())
            return AnalyzeResult(schema=schema)

        def __init__(self) -> None:
            self.counts: list[int] | None = None
            self.et = None

        def eval(self, n: int, row):
            # input is the PRE-AGGREGATED (event_type, bucket, count)
            # table — the row-at-a-time Python loop runs over the
            # bounded histogram grain (types x n rows), never the raw
            # events (r8: the raw-row form cost 12 s at sf0.1; the
            # dynamic-schema feature lives in analyze(), not in where
            # the counting happens, so counting stays in codegen)
            if self.counts is None:
                self.counts = [0] * n
            self.et = row["event_type"]
            b = min(max(int(row["b"]), 0), n - 1)
            self.counts[b] += int(row["c"])

        def terminate(self):
            if self.et is not None:
                yield (self.et, *self.counts)

    spark.udtf.register("hist_by_type", udtf(HistByType, useArrow=True))
    # The pre-aggregation clamp is derived from the SAME n passed to
    # hist_by_type below — a hardcoded lit(3) broke the dynamic-schema
    # contract for any n != 4 by folding buckets >= 4 upstream
    # (r8 ADVICE).
    n_buckets = 4
    (
        t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .groupBy(
            "event_type",
            F.least(
                F.greatest(F.floor(F.col("value") / 25).cast("bigint"), F.lit(0)),
                F.lit(n_buckets - 1),
            ).alias("b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .createOrReplaceTempView("events_hist_v")
    )
    return spark.sql(
        f"""
        SELECT * FROM hist_by_type(
            {n_buckets}, TABLE(events_hist_v) PARTITION BY event_type
        )
        """
    )


@register(
    "udf_apply_in_arrow",
    oracle="""
        SELECT c_nationkey,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS centi_bal,
               CAST(max(len(c_name)) AS BIGINT) AS max_name_len
        FROM customer
        GROUP BY c_nationkey
        """,
    category="udf",
    doc="Grouped-map applyInArrow (Spark 4): the whole-partition custom "
    "aggregation surface at the RAW ARROW level — each group arrives "
    "as one pyarrow.Table and returns one, no pandas conversion at "
    "all, which matters when the group payload is large binary/list "
    "data that pandas would copy and box (the multimodal columns "
    "case).  Per-nation count, exact centi-unit balance sum "
    "(half-up, int64 via pyarrow.compute) and max name length; "
    "hash-matched against the plain SQL aggregate.  mapInArrow "
    "(maparrow_token_stats) covers the ungrouped form; this is the "
    "groupBy().applyInArrow twin — together they bracket the Arrow "
    "fast path the way applyInPandas/mapInPandas bracket the pandas "
    "one.  At 100 TB: one shuffle on the group key, Arrow IPC both "
    "ways, columnar kernels inside — still slower than the pure-JVM "
    "aggregate (the registered scale path for THIS reduction), so "
    "the op exists for computations SQL cannot express.",
)
def udf_apply_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    def stats(table):
        import pyarrow as pa
        import pyarrow.compute as pc

        bal = table.column("c_acctbal")
        centi = pc.cast(
            pc.floor(pc.add(pc.multiply(bal, pa.scalar(100.0)), 0.5)),
            pa.int64(),
        )
        names = pc.utf8_length(table.column("c_name"))
        return pa.table(
            {
                "c_nationkey": pa.array(
                    [table.column("c_nationkey")[0].as_py()], pa.int64()
                ),
                "n": pa.array([table.num_rows], pa.int64()),
                "centi_bal": pa.array(
                    [pc.sum(centi).as_py()], pa.int64()
                ),
                "max_name_len": pa.array(
                    [pc.max(names).as_py()], pa.int64()
                ),
            }
        )

    return (
        t(spark, sf_dir, "customer")
        .select("c_nationkey", "c_acctbal", "c_name")
        .groupBy("c_nationkey")
        .applyInArrow(
            stats,
            schema="c_nationkey bigint, n bigint, centi_bal bigint, "
            "max_name_len bigint",
        )
    )
