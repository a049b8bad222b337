"""r14: same-session interleaved A/B for the two r14 code changes.

1. text_substring_dup_spans — gram table shared via truncate_lazy (new)
   vs re-evaluated per consumer (old).  Both forms built inline from
   the same kernel; values asserted identical at sf0.01.
2. dedup_embedding_cosine — Gram matmul via float64 BLAS (new) vs the
   int64 non-BLAS fallback (old).  Same kernel, broadcast dtype is the
   only difference; values asserted identical at sf0.01.

Usage: python probes/r14/changed_queries_ab.py [k]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from pyspark.sql import Window as W, functions as F

from mincemeatpy_spark.lineage import truncate_lazy
from mincemeatpy_spark.session import get_spark
from mincemeatpy_spark.tables import fan_out, t
from mincemeatpy_spark.text.analysis import _WS


def substring_spans(spark, sf_dir, shared: bool):
    docs = fan_out(
        spark, t(spark, sf_dir, "documents").select("doc_id", "lang", "text"), sf_dir
    ).select("doc_id", "lang", F.split("text", _WS).alias("w"))
    sized = docs.filter(F.size("w") >= 10).select(
        "doc_id", "lang", F.size("w").alias("n"), "w"
    )
    gram = F.transform(
        F.sequence(F.lit(1), F.col("n") - 9),
        lambda i: F.struct(
            i.alias("pos"),
            F.md5(F.concat_ws(" ", F.slice(F.col("w"), i, 10)).cast("binary")).alias("h"),
        ),
    )
    g = sized.select("doc_id", "lang", "n", F.explode(gram).alias("ph")).select(
        "doc_id", "lang", "n", F.col("ph.pos").alias("pos"), F.col("ph.h").alias("h")
    )
    if shared:
        g = g.transform(truncate_lazy)
    dup = (
        g.groupBy("h").agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1).select("h")
    )
    hits = g.join(dup, "h", "left_semi").withColumn("e", F.col("pos") + 9)
    w_prev = W.partitionBy("doc_id").orderBy("pos").rowsBetween(W.unboundedPreceding, -1)
    w_run = W.partitionBy("doc_id").orderBy("pos").rowsBetween(W.unboundedPreceding, 0)
    new_island = F.when(
        F.col("prev_e").isNull() | (F.col("pos") > F.col("prev_e")), 1
    ).otherwise(0)
    islands = hits.withColumn("prev_e", F.max("e").over(w_prev)).withColumn(
        "isl", F.sum(new_island).over(w_run)
    )
    per_doc = (
        islands.groupBy("doc_id", "lang", "n", "isl")
        .agg((F.max("e") - F.min("pos") + 1).alias("cov"))
        .groupBy("doc_id", "lang", "n")
        .agg(F.sum("cov").cast("bigint").alias("dup_tokens"))
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs_flagged"),
        F.sum("dup_tokens").cast("bigint").alias("dup_tokens"),
        F.sum("n").cast("bigint").alias("flagged_doc_tokens"),
    )


def embedding_cosine(spark, sf_dir, blas: bool):
    import numpy as np
    import pyarrow as pa

    from mincemeatpy_spark.text.dedup import _COS_BCAP

    e = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    rows = e.filter(F.col("vec_id") < _COS_BCAP).collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)

    def _q6(x):
        y = np.asarray(x, dtype=np.float64) * 1_000_000.0
        return (np.sign(y) * np.floor(np.abs(y) + 0.5)).astype(np.int64)

    mat = _q6([r["embedding"] for r in rows])
    order = np.argsort(ids, kind="stable")
    ids, mat = ids[order], mat[order]
    nrm = np.sqrt((mat * mat).sum(axis=1).astype(np.float64))
    bmat = mat.astype(np.float64) if blas else mat
    bc = spark.sparkContext.broadcast((ids, bmat, nrm))

    def pairs(batches):
        import numpy as np

        def q6(x):
            y = np.asarray(x, dtype=np.float64) * 1_000_000.0
            return (np.sign(y) * np.floor(np.abs(y) + 0.5)).astype(np.int64)

        b_ids, b_mat, b_nrm = bc.value
        for batch in batches:
            a_ids = np.asarray(batch.column("vec_id"), dtype=np.int64)
            flat = batch.column("embedding").flatten().to_numpy(zero_copy_only=False)
            a_mat = q6(flat.astype(np.float64).reshape(-1, 64))
            a_nrm = np.sqrt((a_mat * a_mat).sum(axis=1).astype(np.float64))
            if b_mat.dtype == np.float64:
                gram = a_mat.astype(np.float64) @ b_mat.T
                cos = gram / np.outer(a_nrm, b_nrm)
            else:
                gram = a_mat @ b_mat.T
                cos = gram.astype(np.float64) / np.outer(a_nrm, b_nrm)
            ii, jj = np.nonzero((cos >= 0.4) & (a_ids[:, None] < b_ids[None, :]))
            if len(ii):
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(a_ids[ii], type=pa.int64()),
                        pa.array(b_ids[jj], type=pa.int64()),
                        pa.array(np.round(cos[ii, jj], 6), type=pa.float64()),
                    ],
                    ["id_a", "id_b", "cosine"],
                )

    return e.mapInArrow(pairs, "id_a long, id_b long, cosine double")


CASES = {
    "substr_old": lambda s, d: substring_spans(s, d, False),
    "substr_new": lambda s, d: substring_spans(s, d, True),
    "cosine_old": lambda s, d: embedding_cosine(s, d, False),
    "cosine_new": lambda s, d: embedding_cosine(s, d, True),
}


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r14-changed-ab")

    sf_small = "/root/testdata/sf0.01"
    for a, b in (("substr_old", "substr_new"), ("cosine_old", "cosine_new")):
        ra = sorted(map(tuple, CASES[a](spark, sf_small).collect()))
        rb = sorted(map(tuple, CASES[b](spark, sf_small).collect()))
        assert ra == rb, f"{a} vs {b}: results differ!"
        print(f"{a} == {b}: {len(ra)} rows identical at sf0.01", flush=True)

    CASES["substr_new"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    res = {n: [] for n in CASES}
    for i in range(k):
        order = list(CASES) if i % 2 == 0 else list(reversed(list(CASES)))
        for name in order:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            CASES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            sec = time.perf_counter() - t0
            res[name].append(sec)
            print(f"{name:12s} {sec:7.3f}s", flush=True)
    for name, xs in res.items():
        print(
            f"{name}: median {statistics.median(xs):.3f} "
            f"trials={[round(x, 3) for x in xs]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
