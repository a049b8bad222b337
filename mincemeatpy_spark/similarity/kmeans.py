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


_KQ = 8  # seed centroids for the 2-iteration loop

# Floor division that is identical in Spark (`div` truncates toward 0)
# and DuckDB (`//` floors): subtract the positive mod first, then the
# division is exact.  Needed because per-dimension sums go negative.
_FLOORDIV_SQL = "(({s}) - ((({s}) % ({n})) + ({n})) % ({n})) // ({n})"


@register(
    "kmeans_loop_2iter",
    oracle=f"""
        WITH q AS (
            SELECT vec_id,
                   list_transform(embedding,
                       x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
                       AS qe
            FROM embeddings
        ),
        c0 AS (SELECT vec_id AS cid, qe AS cv FROM q WHERE vec_id < {_KQ}),
        d1 AS (
            SELECT q.vec_id, c.cid,
                   list_sum(list_transform(generate_series(1, len(q.qe)),
                       i -> (q.qe[i] - c.cv[i]) * (q.qe[i] - c.cv[i]))) AS dist
            FROM q CROSS JOIN c0 c
        ),
        a1 AS (
            SELECT vec_id, cid
            FROM (SELECT vec_id, cid,
                         row_number() OVER (PARTITION BY vec_id
                                            ORDER BY dist, cid) AS rn
                  FROM d1)
            WHERE rn = 1
        ),
        dims AS (
            SELECT a.cid, d, sum(q.qe[d]) AS s, count(*) AS n
            FROM a1 a JOIN q USING (vec_id), generate_series(1, 64) t(d)
            GROUP BY a.cid, d
        ),
        c1 AS (
            SELECT cid,
                   list({_FLOORDIV_SQL.format(s="s", n="n")} ORDER BY d) AS cv
            FROM dims GROUP BY cid
        ),
        d2 AS (
            SELECT q.vec_id, c.cid,
                   list_sum(list_transform(generate_series(1, len(q.qe)),
                       i -> (q.qe[i] - c.cv[i]) * (q.qe[i] - c.cv[i]))) AS dist
            FROM q CROSS JOIN c1 c
        ),
        a2 AS (
            SELECT vec_id, cid
            FROM (SELECT vec_id, cid,
                         row_number() OVER (PARTITION BY vec_id
                                            ORDER BY dist, cid) AS rn
                  FROM d2)
            WHERE rn = 1
        ),
        n1 AS (SELECT cid, count(*) AS n FROM a1 GROUP BY cid),
        n2 AS (SELECT cid, count(*) AS n FROM a2 GROUP BY cid),
        shift AS (
            SELECT c0.cid,
                   CAST(list_sum(list_transform(generate_series(1, 64),
                       i -> (c1.cv[i] - c0.cv[i]) * (c1.cv[i] - c0.cv[i])))
                       AS BIGINT) AS shift_sq
            FROM c0 JOIN c1 USING (cid)
        )
        SELECT c0.cid,
               CAST(coalesce(n1.n, 0) AS BIGINT) AS n_iter1,
               CAST(coalesce(n2.n, 0) AS BIGINT) AS n_iter2,
               shift.shift_sq
        FROM c0
        LEFT JOIN n1 USING (cid)
        LEFT JOIN n2 USING (cid)
        JOIN shift USING (cid)
        """,
    category="similarity",
    doc="TWO full Lloyd iterations with UPDATED centroids — the "
    "iterative-convergence pattern kmeans_assign_update (one step) and "
    "graph_pagerank_2iter (re-keyed rank state) stop short of: "
    "iteration 2's distances are computed against centroids DERIVED "
    "from iteration 1's assignment (per-dimension integer means), so "
    "the loop state feeds back through an aggregate, exactly like "
    "production k-means.  Everything is int64 micro-units: distances "
    "are exact integer squared-L2, the centroid update is an exact "
    "floor division (sign-corrected so Spark's truncating `div` and "
    "DuckDB's flooring `//` agree on negative sums), and the reported "
    "per-centroid movement (shift_sq) is an exact integer.  Plan per "
    "iteration: broadcast k centroids → map-side argmin partial agg → "
    "per-(cluster, dim) sums (the only shuffles are k*64-sized "
    "partials) → tiny centroid table; the vector table is scanned "
    "once per iteration and never shuffled.",
)
def kmeans_loop_2iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    quant = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 1_000_000).cast("bigint"),
    )
    q = e.select("vec_id", quant.alias("qe"))
    c0 = q.filter(F.col("vec_id") < _KQ).select(
        F.col("vec_id").alias("cid"), F.col("qe").alias("cv")
    )

    def assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
        dist = F.aggregate(
            F.zip_with(F.col("qe"), F.col("cv"), lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("bigint"),
            lambda acc, d: acc + d,
        )
        return (
            vecs.crossJoin(F.broadcast(cents))
            .select("vec_id", "cid", dist.alias("dist"), "qe")
            .groupBy("vec_id")
            .agg(
                F.min(
                    F.struct(F.col("dist").alias("dist"), F.col("cid").alias("cid"))
                ).alias("b"),
                F.any_value("qe").alias("qe"),
            )
            .select("vec_id", F.col("b.cid").alias("cid"), "qe")
        )

    a1 = assign(q, c0)
    # Centroid update: per-(cluster, dim) integer sums -> exact floor
    # division -> re-packed int centroid vectors (d is unique per cid,
    # so the array_sort(collect_list(struct)) repack is deterministic).
    dims = (
        a1.select("cid", F.posexplode("qe").alias("d0", "val"))
        .groupBy("cid", (F.col("d0") + 1).alias("d"))
        .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    cval = F.expr("(s - ((s % n) + n) % n) div n")
    c1 = (
        dims.select("cid", "d", cval.alias("cval"))
        .groupBy("cid")
        .agg(
            F.array_sort(F.collect_list(F.struct("d", "cval")))
            .getField("cval")
            .alias("cv")
        )
    )
    a2 = assign(q, c1)
    n1 = a1.groupBy("cid").agg(F.count(F.lit(1)).alias("n1"))
    n2 = a2.groupBy("cid").agg(F.count(F.lit(1)).alias("n2"))
    shift = (
        c0.alias("c0")
        .join(c1.alias("c1"), "cid")
        .select(
            "cid",
            F.aggregate(
                F.zip_with(
                    F.col("c1.cv"), F.col("c0.cv"), lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0).cast("bigint"),
                lambda acc, d: acc + d,
            ).alias("shift_sq"),
        )
    )
    return (
        c0.select("cid")
        .join(n1, "cid", "left")
        .join(n2, "cid", "left")
        .join(shift, "cid")
        .select(
            "cid",
            F.coalesce("n1", F.lit(0)).cast("bigint").alias("n_iter1"),
            F.coalesce("n2", F.lit(0)).cast("bigint").alias("n_iter2"),
            "shift_sq",
        )
    )
