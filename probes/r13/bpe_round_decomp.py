"""r13 optimization round: decompose bpe_train_32merges' per-round cost.

Times, in one warmed session at sf0.1: (a) the full 3-merge and
32-merge queries (marginal = per-round cost), (b) the pieces of one
round — the eager checkpoint job (window lead + broadcast-top build +
lag/rownum rewrite), and the end-of-query per-round stats aggregates.

Run: python probes/r13/bpe_round_decomp.py
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from mincemeatpy_spark.registry import load_all_queries  # noqa: E402
from mincemeatpy_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"
K = 3


def med(fn, k=K):
    ts = []
    for _ in range(k):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 3), [round(t, 3) for t in ts]


def main() -> None:
    spark = get_spark("bpe-decomp")
    qs = load_all_queries()
    noop = lambda df: df.write.format("noop").mode("overwrite").save()  # noqa: E731
    # warmup
    noop(qs["bpe_train_3merges"].fn(spark, SF))

    out = {}
    out["train3"] = med(lambda: noop(qs["bpe_train_3merges"].fn(spark, SF)))
    out["train32"] = med(
        lambda: noop(qs["bpe_train_32merges"].fn(spark, SF)), k=3
    )
    out["marginal_per_round"] = round(
        (out["train32"][0] - out["train3"][0]) / 29, 3
    )

    # one round's pieces, mirrored from _bpe_train_stats
    from pyspark.sql import Window as Wn, functions as F

    from mincemeatpy_spark.lineage import truncate_eager
    from mincemeatpy_spark.tables import t

    docs = t(spark, SF, "documents")
    wc = (
        docs.select(F.explode(F.split("text", r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    sym0 = wc.select(
        "word",
        "cnt",
        F.posexplode(
            F.expr(
                "transform(sequence(1, length(word)), i -> substr(word, i, 1))"
            )
        ).alias("pos0", "sym"),
    ).select("word", "cnt", (F.col("pos0") + 1).alias("pos"), "sym")
    out["seed_checkpoint"] = med(
        lambda: sym0.transform(truncate_eager).count(), k=3
    )
    sym = sym0.transform(truncate_eager)
    per_word = Wn.partitionBy("word").orderBy("pos")

    def one_round(s):
        n = s.withColumn("nxt", F.lead("sym").over(per_word))
        pairs = (
            n.filter(F.col("nxt").isNotNull() & (F.col("sym") != F.col("nxt")))
            .groupBy(F.col("sym").alias("a"), F.col("nxt").alias("b"))
            .agg(F.sum("cnt").cast("bigint").alias("c"))
        )
        top = F.broadcast(pairs.orderBy(F.col("c").desc(), "a", "b").limit(1))
        marked = n.crossJoin(top).withColumn(
            "mg", (F.col("sym") == F.col("a")) & (F.col("nxt") == F.col("b"))
        )
        return (
            marked.withColumn("prev_mg", F.lag("mg").over(per_word))
            .filter(~F.coalesce(F.col("prev_mg"), F.lit(False)))
            .select(
                "word",
                "cnt",
                F.row_number().over(per_word).alias("pos"),
                F.when(F.col("mg"), F.concat(F.col("sym"), F.col("b")))
                .otherwise(F.col("sym"))
                .alias("sym"),
                "a",
                "b",
                "c",
            )
        )

    # (b1) full round incl. eager checkpoint
    out["round_checkpoint"] = med(
        lambda: one_round(sym).transform(truncate_eager).count(), k=3
    )
    # (b2) the broadcast-top build alone (pairs agg + sort-limit)
    def pairs_only():
        n = sym.withColumn("nxt", F.lead("sym").over(per_word))
        (
            n.filter(F.col("nxt").isNotNull() & (F.col("sym") != F.col("nxt")))
            .groupBy(F.col("sym").alias("a"), F.col("nxt").alias("b"))
            .agg(F.sum("cnt").cast("bigint").alias("c"))
            .orderBy(F.col("c").desc(), "a", "b")
            .limit(1)
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    out["pairs_top_only"] = med(pairs_only, k=3)
    # (b3) a per-round stats agg over the checkpointed table
    s1 = one_round(sym).transform(truncate_eager)
    def stats_only():
        (
            s1.groupBy("a", "b", "c")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_symbols_after"))
            .write.format("noop")
            .mode("overwrite")
            .save()
        )

    out["stats_agg_only"] = med(stats_only, k=3)

    print(json.dumps(out, indent=2))
    with open("/root/repo/probes/r13/bpe_round_decomp.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
