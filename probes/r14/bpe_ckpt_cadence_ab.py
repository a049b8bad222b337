"""r14 probe (VERDICT r13 task 7, second variant): BPE checkpoint
CADENCE — materialize the symbol table every other round instead of
every round.

Trade: rounds without a checkpoint leave their window+crossJoin subtree
in the plan, so their 3 consumers (next round's pair agg, next round's
rewrite input, that round's stats leg) each recompute it; rounds with a
checkpoint amortize.  The serial materialization-job count halves.

Self-contained copy of _bpe_train_stats with a cadence parameter; the
repo function is untouched unless this wins.  Value equality asserted
at sf0.01 before timing.

Usage: python probes/r14/bpe_ckpt_cadence_ab.py [k]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from pyspark.sql import SparkSession, functions as F

from mincemeatpy_spark.lineage import truncate_eager
from mincemeatpy_spark.session import get_spark
from mincemeatpy_spark.tables import t


def bpe_train(spark: SparkSession, sf_dir: str, iters: int, cadence: int):
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
            F.expr("transform(sequence(1, length(word)), i -> substr(word, i, 1))")
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
        )
        if step % cadence == 0 or step == iters:
            sym = sym.transform(truncate_eager)
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
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bpe-cadence-ab")

    sf_small = "/root/testdata/sf0.01"
    rows_1 = sorted(map(tuple, bpe_train(spark, sf_small, 32, 1).collect()))
    rows_2 = sorted(map(tuple, bpe_train(spark, sf_small, 32, 2).collect()))
    assert rows_1 == rows_2, "cadence-2 changed the result!"
    print(f"value check: {len(rows_1)} rows identical at sf0.01", flush=True)

    def run(cadence: int) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        bpe_train(spark, sf_dir, 32, cadence).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    run(1)  # warmup
    res: dict[int, list[float]] = {1: [], 2: []}
    for i in range(k):
        for c in (1, 2) if i % 2 == 0 else (2, 1):
            sec = run(c)
            res[c].append(sec)
            print(f"cadence={c} {sec:7.2f}s", flush=True)
    for c, xs in res.items():
        print(
            f"cadence={c}: median {statistics.median(xs):.2f} "
            f"trials={[round(x, 2) for x in xs]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
