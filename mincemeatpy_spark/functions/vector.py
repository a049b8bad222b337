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
