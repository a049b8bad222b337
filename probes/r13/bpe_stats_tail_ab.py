"""Interleaved A/B: BPE stats tail riding the pair aggregation vs the
committed per-round full-checkpoint stats scans.

The round report's "Not yet optimized" item 1: the 32 end-of-query
``n_symbols_after`` aggregates each rescanned a round checkpoint
(~0.09 s x 32 at sf0.1).  The new form groups the NEXT round's pair
aggregation by (a, b, c, sym, nxt) WITHOUT the self-pair filter,
carrying count(1), so the stats legs reduce the tiny cached pair table
instead.  Cross-session wall-clock comparisons on this host are noise-
dominated (r13 lesson), so this probe alternates OLD/NEW in ONE session
(same JVM, same codegen cache) and reports per-form medians.

Usage: python probes/r13/bpe_stats_tail_ab.py [iters] [k]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(
    0,
    os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ),
)

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from mincemeatpy_spark.lineage import truncate_eager  # noqa: E402
from mincemeatpy_spark.tables import t  # noqa: E402
from mincemeatpy_spark.text.analysis import _bpe_train_stats  # noqa: E402


def _old_bpe_train_stats(
    spark: SparkSession, sf_dir: str, iters: int
) -> DataFrame:
    """The committed (pre-change) form, verbatim from git HEAD."""
    docs = t(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(F.split("text", r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    sym = wc.select(
        "word",
        "cnt",
        F.posexplode(
            F.expr(
                "transform(sequence(1, length(word)), i -> substr(word, i, 1))"
            )
        ).alias("pos0", "sym"),
    ).select("word", "cnt", (F.col("pos0") + 1).alias("pos"), "sym")

    from pyspark.sql import Window as Wn

    per_word = Wn.partitionBy("word").orderBy("pos")
    sym = sym.withColumn("nxt", F.lead("sym").over(per_word)).transform(
        truncate_eager
    )
    out = []
    for step in range(1, iters + 1):
        pairs = (
            sym.filter(
                F.col("nxt").isNotNull() & (F.col("sym") != F.col("nxt"))
            )
            .groupBy(F.col("sym").alias("a"), F.col("nxt").alias("b"))
            .agg(F.sum("cnt").cast("bigint").alias("c"))
        )
        top = F.broadcast(pairs.orderBy(F.col("c").desc(), "a", "b").limit(1))
        marked = sym.crossJoin(top).withColumn(
            "mg", (F.col("sym") == F.col("a")) & (F.col("nxt") == F.col("b"))
        )
        new_sym = F.when(
            F.col("mg"), F.concat(F.col("sym"), F.col("b"))
        ).otherwise(F.col("sym"))
        sym = (
            marked.withColumn("prev_mg", F.lag("mg").over(per_word))
            .filter(~F.coalesce(F.col("prev_mg"), F.lit(False)))
            .select(
                "word",
                "cnt",
                F.row_number().over(per_word).alias("pos"),
                new_sym.alias("sym"),
                F.lead(new_sym).over(per_word).alias("nxt"),
                "a",
                "b",
                "c",
            )
            .transform(truncate_eager)
        )
        stats = sym.groupBy("a", "b", "c").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_symbols_after")
        )
        out.append(
            stats.select(
                F.lit(step).cast("int").alias("step"),
                F.col("a").alias("pair_a"),
                F.col("b").alias("pair_b"),
                F.col("c").alias("pair_weight"),
                "n_symbols_after",
            )
        )
        sym = sym.select("word", "cnt", "pos", "sym", "nxt")
    res = out[0]
    for o in out[1:]:
        res = res.unionAll(o)
    return res


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from mincemeatpy_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bpe-stats-tail-ab")
    forms = {
        "old": lambda: _old_bpe_train_stats(spark, sf_dir, iters),
        "new": lambda: _bpe_train_stats(spark, sf_dir, iters),
    }
    # warmup both codegen paths once
    for name, fn in forms.items():
        fn().write.format("noop").mode("overwrite").save()
    trials: dict[str, list[float]] = {n: [] for n in forms}
    for trial in range(k):
        for name, fn in forms.items():
            spark.sparkContext.setJobDescription(
                f"bpe-ab {name} trial {trial}"
            )
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            trials[name].append(time.perf_counter() - t0)
    for name, ts in trials.items():
        print(
            f"{name}: median {statistics.median(ts):.3f}  trials="
            + ",".join(f"{x:.3f}" for x in ts),
            flush=True,
        )


if __name__ == "__main__":
    main()
