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
    "invoked via LATERAL so it runs distributed next to the scan.  "
    "Positions are assigned before the empty-token filter so they match "
    "the regex-split oracle exactly.",
)
def udtf_word_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="word: string, pos: int")
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
    "agg, grouped map, mapInPandas, mapPartitions, UDTF, mapInArrow.",
)
def maparrow_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyarrow as pa

    from mincemeatpy_spark.tables import fan_out

    def count_tokens(batches):
        for batch in batches:
            langs = batch.column("lang")
            texts = batch.column("text").to_pylist()
            counts = [len(t.split()) if t else 0 for t in texts]
            yield pa.RecordBatch.from_arrays(
                [langs, pa.array(counts, type=pa.int64())],
                ["lang", "n_tokens"],
            )

    docs = fan_out(spark, t(spark, sf_dir, "documents").select("lang", "text"))
    per_doc = docs.mapInArrow(count_tokens, "lang string, n_tokens long")
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
    )
