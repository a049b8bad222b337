"""Same-session A/B: dedup_simhash_pairs' pair-distinct vs first-band
emission (r13 optimization round, sf1 soak follow-up).

The r13 soak (BENCH_sf1.json r13_opt_restructured) flagged the query at
38.75x on 10x data.  Decomposition: the OUTPUT is intrinsically
quadratic (all hamming<=6 pairs; the bootstrapped same-distribution
docs collide heavily), but the plan tops that with a `.distinct()` that
shuffles every (pair, band) duplicate — up to 4 copies per pair — of
the quadratic pair set.  The banded-LSH textbook fix: emit a pair only
from its FIRST matching band (a scan-side predicate over the two
carried signatures), which makes the join output exactly the distinct
pair set and the pair-level exchange disappears.

Variant A = current registry form (lazy-truncated sigs, distinct).
Variant B = same sigs, first-band predicate, NO distinct.
Both also counted (rows must be identical) and timed best-interleaved.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from pyspark.sql import functions as F  # noqa: E402

from mincemeatpy_spark.lineage import truncate_lazy  # noqa: E402
from mincemeatpy_spark.session import get_spark  # noqa: E402
from mincemeatpy_spark.text.dedup import dedup_simhash  # noqa: E402


def build(spark, sf_dir, first_band: bool):
    sigs = dedup_simhash(spark, sf_dir).transform(truncate_lazy)
    bands = sigs.selectExpr(
        "doc_id",
        "simhash",
        "stack(4, 0, shiftright(simhash, 0) & 255,"
        "         1, shiftright(simhash, 8) & 255,"
        "         2, shiftright(simhash, 16) & 255,"
        "         3, shiftright(simhash, 24) & 255) AS (band, sig)",
    )
    ba, bb = bands.alias("ba"), bands.alias("bb")
    hamming = F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
    joined = ba.join(
        bb,
        (F.col("ba.band") == F.col("bb.band"))
        & (F.col("ba.sig") == F.col("bb.sig"))
        & (F.col("ba.doc_id") < F.col("bb.doc_id")),
    ).select(
        F.col("ba.band").alias("band"),
        F.col("ba.doc_id").alias("d1"),
        F.col("bb.doc_id").alias("d2"),
        F.col("ba.simhash").alias("h1"),
        F.col("bb.simhash").alias("h2"),
    )
    if first_band:
        def bmatch(j):
            return (
                F.shiftright(F.col("h1"), 8 * j).bitwiseAND(F.lit(255))
                == F.shiftright(F.col("h2"), 8 * j).bitwiseAND(F.lit(255))
            )

        first = (
            F.when(bmatch(0), F.lit(0))
            .when(bmatch(1), F.lit(1))
            .when(bmatch(2), F.lit(2))
            .otherwise(F.lit(3))
        )
        return (
            joined.filter(F.col("band") == first)
            .filter(hamming <= 6)
            .select("d1", "d2", hamming.alias("hamming"))
        )
    return (
        joined.filter(hamming <= 6)
        .select("d1", "d2", hamming.alias("hamming"))
        .distinct()
    )


def main() -> None:
    sf_dir = os.environ.get("AB_SF_DIR", "/tmp/sfscale/sf1")
    spark = get_spark("simhash-minband-ab")
    spark.sparkContext.setLogLevel("ERROR")

    # row-identity first (cheap relative to the timing runs)
    a = build(spark, sf_dir, first_band=False)
    b = build(spark, sf_dir, first_band=True)
    ca, cb = a.count(), b.count()
    nodup = b.groupBy("d1", "d2").count().filter("count > 1").count()
    diff = a.exceptAll(b).limit(1).count() + b.exceptAll(a).limit(1).count()
    print(f"rows A={ca} B={cb} dup_pairs_in_B={nodup} exceptAll_diff={diff}", flush=True)
    assert ca == cb and nodup == 0 and diff == 0

    for rnd in range(3):
        for name, fb in (("distinct", False), ("first_band", True)):
            t0 = time.perf_counter()
            build(spark, sf_dir, fb).write.format("noop").mode("overwrite").save()
            print(f"round {rnd} {name}: {time.perf_counter() - t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
