"""Reusable vector kernels over ``array<float>`` / ``array<double>``
columns — built-in higher-order functions only (JVM-side, codegen'd).

These are the building blocks the similarity/dedup operators compose;
registered queries exercising them live in ``functions/json_array.py``
(array_vector_norms, array_zip_dot) and ``similarity/ann.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def to_double(vec: Column) -> Column:
    """Cast an array<float> to array<double> (do this BEFORE arithmetic so
    sequential sums are bit-deterministic across engines)."""
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product via zip_with + aggregate (sequential, deterministic)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(vec: Column) -> Column:
    return F.sqrt(dot(vec, vec))


def cosine(a: Column, b: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine from precomputed norms (never recompute norms per pair)."""
    return dot(a, b) / (norm_a * norm_b)


# --- int8 scalar quantization (storage-side ANN kernel) -----------------

# Registered here (the one query this module owns) because the kernel is
# pure higher-order-function work over the embedding arrays.

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from mincemeatpy_spark.operators._util import oracle_decsum  # noqa: E402
from mincemeatpy_spark.registry import register  # noqa: E402
from mincemeatpy_spark.tables import t  # noqa: E402

_Q_ERR_SQL = """
    list_reduce(list_transform(embedding,
        x -> (CAST(x AS DOUBLE) - round(CAST(x AS DOUBLE) * scale) / scale)
           * (CAST(x AS DOUBLE) - round(CAST(x AS DOUBLE) * scale) / scale)),
        (a, b) -> a + b) / len(embedding)
"""


@register(
    "vector_quantize_int8",
    oracle=f"""
        WITH scaled AS (
            SELECT label, embedding,
                   127.0 / list_reduce(
                       list_transform(embedding, x -> abs(CAST(x AS DOUBLE))),
                       (a, b) -> greatest(a, b)) AS scale
            FROM embeddings
        )
        SELECT label,
               count(*) AS n_vecs,
               {oracle_decsum(_Q_ERR_SQL)} / count(*) AS avg_mse,
               max({_Q_ERR_SQL}) AS max_mse
        FROM scaled
        WHERE scale > 0
        GROUP BY label
        """,
    category="similarity",
    doc="Int8 scalar quantization of the embedding column (the storage "
    "kernel under every large-scale ANN index): per vector an absmax "
    "scale (127/max|c|), round-to-int8, and the dequantization MSE; "
    "per label the vector count and the mean/max MSE.  Entirely "
    "higher-order array expressions on the scan — per-vector work never "
    "leaves the executor, and only label-keyed partials shuffle.  At "
    "100 TB this is the map stage that shrinks a float32 corpus 4x "
    "before it is written to the index.",
)
def vector_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mincemeatpy_spark.operators._util import decsum

    e = t(spark, sf_dir, "embeddings")
    dv = to_double(F.col("embedding"))
    amax = F.aggregate(dv, F.lit(0.0), lambda a, x: F.greatest(a, F.abs(x)))
    scaled = e.select("label", "embedding", (F.lit(127.0) / amax).alias("scale"))
    err = lambda x: (  # noqa: E731
        x.cast("double") - F.round(x.cast("double") * F.col("scale")) / F.col("scale")
    )
    mse = (
        F.aggregate(
            F.transform(F.col("embedding"), lambda x: err(x) * err(x)),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        / F.size(F.col("embedding"))
    )
    return (
        scaled.filter(F.col("scale") > 0)
        .select("label", mse.alias("mse"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            (decsum(F.col("mse")) / F.count(F.lit(1))).alias("avg_mse"),
            F.max("mse").alias("max_mse"),
        )
    )
