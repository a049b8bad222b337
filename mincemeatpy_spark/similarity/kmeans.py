"""One Lloyd iteration of k-means over the embeddings table —
the iterative-algorithm pattern (assign → update) expressed as a
broadcast-join dataflow.

The reference can only express this as repeated one-shot jobs (one
map+reduce per iteration, reference mincemeat.py:294-297, SURVEY.md §2a
"no multi-stage chaining"); here each iteration is: broadcast the k
centroids into a map-side nearest-centroid assignment (no shuffle of the
vector table), then one hash aggregate on cluster id for the update
step.  A full k-means just loops this plan with the k-row update output
fed back as the next broadcast — per iteration the big table is scanned
once and shuffles only k-sized partials.

Determinism: distances are sequential left-to-right folds over
double-cast components (bit-identical in Spark's ``aggregate`` and
DuckDB's ``list_reduce``); ties in the argmin break on centroid id; the
inertia and mean sums use the fixed-point micro-unit trick (_util).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from mincemeatpy_spark.operators._util import decsum, oracle_decsum
from mincemeatpy_spark.registry import register
from mincemeatpy_spark.tables import t

_K = 8

_DIST_SQL = """
    list_reduce(
        list_transform(generate_series(1, len(e.embedding)),
            i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE))
               * (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE))),
        (a, b) -> a + b)
"""


@register(
    "kmeans_assign_update",
    oracle=f"""
        WITH cents AS (SELECT vec_id AS cid, embedding AS cvec
                       FROM embeddings WHERE vec_id < {_K}),
        assign AS (
            SELECT vec_id, cid, dist,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY dist, cid) AS rn
            FROM (SELECT e.vec_id, c.cid, {_DIST_SQL} AS dist
                  FROM embeddings e CROSS JOIN cents c))
        SELECT a.cid,
               count(*) AS n_members,
               {oracle_decsum('a.dist')} AS inertia,
               {oracle_decsum('CAST(e.embedding[1] AS DOUBLE)')} / count(*)
                   AS c0_mean
        FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id
        WHERE a.rn = 1
        GROUP BY a.cid
        """,
    category="similarity",
    doc="k-means, one assign+update iteration: nearest of k=8 seed "
    "centroids (rows vec_id<8) by squared L2, tie-broken on centroid "
    "id, then per-cluster size, inertia, and the first component of "
    "the updated mean.  Centroids broadcast (k rows); the vector table "
    "never shuffles until the k-sized update aggregate.",
)
def kmeans_assign_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    cents = F.broadcast(
        e.filter(F.col("vec_id") < _K).select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
        )
    )
    dist = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("cvec"),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )
    w = Window.partitionBy("vec_id").orderBy("dist", "cid")
    assign = (
        e.crossJoin(cents)
        .select("vec_id", "cid", dist.alias("dist"), "embedding")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return assign.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_members"),
        decsum(F.col("dist")).alias("inertia"),
        (
            decsum(F.element_at(F.col("embedding"), 1).cast("double"))
            / F.count(F.lit(1))
        ).alias("c0_mean"),
    )
