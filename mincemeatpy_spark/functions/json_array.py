"""JSON and array/nested-type functions.

MR encoding in the reference: plain Python dicts/lists inside ``mapfn``
(SURVEY.md §1.2, §2b).  Here: built-in JSON path extraction and array
lambdas — evaluated JVM-side inside whole-stage codegen, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from mincemeatpy_spark.operators._util import decsum, oracle_decsum
from mincemeatpy_spark.registry import register
from mincemeatpy_spark.tables import t


@register(
    "json_extract_agg",
    oracle="""
        SELECT event_type,
               count(k)          AS n_with_k,
               CAST(sum(k) AS BIGINT) AS sum_k,
               min(k)            AS min_k,
               max(k)            AS max_k
        FROM (
            SELECT event_type,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events
        )
        GROUP BY event_type
        """,
    category="json",
    doc="JSON path extraction (get_json_object) + typed cast + aggregate; "
    "missing paths become NULL and drop out of count/sum.",
)
def json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r13 optimization round: a fan_out repartition was MEASURED here
    # and reverted (0.312 s -> 0.317 s — the JSON parse of the fixture's
    # 100k rows does not dominate the added shuffle).
    e = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "json_from_json_filter",
    oracle="""
        SELECT event_id, k
        FROM (
            SELECT event_id,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events
        )
        WHERE k > 90
        """,
    category="json",
    doc="from_json with an explicit schema → typed struct column → filter "
    "on a struct field (the schema-on-read pattern for semi-structured "
    "columns; at scale prefer an explicit schema over schema_of_json).",
)
def json_from_json_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    parsed = e.select("event_id", F.from_json("props", schema).alias("p"))
    return parsed.select("event_id", F.col("p.k").alias("k")).filter(F.col("k") > 90)


@register(
    "array_vector_norms",
    oracle="""
        SELECT vec_id,
               len(embedding) AS dim,
               round(sqrt(list_sum(list_transform(embedding,
                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
               round(CAST(embedding[1] AS DOUBLE), 6)  AS first_dim,
               round(CAST(embedding[64] AS DOUBLE), 6) AS last_dim
        FROM embeddings
        """,
    category="array",
    doc="Array lambdas over the embedding column: size, element access, "
    "L2 norm via transform+aggregate — float32 cast to double first so "
    "the sequential sum is bit-identical cross-engine.",
)
def array_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.sqrt(sq_sum), 6).alias("l2_norm"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_dim"),
        F.round(F.element_at("embedding", 64).cast("double"), 6).alias("last_dim"),
    )


@register(
    "array_explode_pos",
    oracle="""
        SELECT doc_id, i - 1 AS pos, words[i] AS word
        FROM (
            SELECT doc_id, string_split_regex(text, '\\s+') AS words
            FROM documents
            WHERE doc_id < 5
        ), UNNEST(generate_series(1, len(words))) AS u(i)
        """,
    category="array",
    doc="posexplode: flatten with ordinal positions (the UDTF shape — one "
    "row in, n indexed rows out).",
)
def array_explode_pos(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 5)
        .select("doc_id", F.split("text", r"\s+").alias("words"))
    )
    return docs.select("doc_id", F.posexplode("words").alias("pos", "word"))


@register(
    "array_agg_sorted",
    oracle="""
        SELECT lang,
               array_to_string(list_sort(list_distinct(array_agg(source))), ',') AS sources,
               count(DISTINCT source) AS n_sources
        FROM documents
        GROUP BY lang
        """,
    category="array",
    doc="collect_set + sort_array + join-to-string: deterministic array "
    "aggregation rendered hashable.",
)
def array_agg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.array_join(F.sort_array(F.collect_set("source")), ",").alias("sources"),
        F.countDistinct("source").alias("n_sources"),
    )


@register(
    "array_zip_dot",
    oracle="""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_sum(list_transform(generate_series(1, len(a.embedding)),
                     i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))), 6)
                   AS dot
        FROM embeddings a
        JOIN embeddings b ON b.vec_id = a.vec_id + 1
        WHERE a.vec_id < 20
        """,
    category="array",
    doc="zip_with dot product between consecutive vectors — the pairwise "
    "kernel reused by the similarity operators.",
)
def array_zip_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    a = e.filter(F.col("vec_id") < 20).alias("a")
    b = e.alias("b")
    dot = F.aggregate(
        F.zip_with(
            F.col("a.embedding"),
            F.col("b.embedding"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, F.col("b.vec_id") == F.col("a.vec_id") + 1)
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round(dot, 6).alias("dot"),
        )
    )


@register(
    "json_variant_ops",
    oracle="""
        SELECT e.event_type,
               count(*) AS n,
               CAST(sum(CAST(json_extract(e.props, '$.k') AS INTEGER)) AS BIGINT)
                   AS k_sum,
               max(CAST(json_extract(e.props, '$.k') AS INTEGER)) AS k_max
        FROM events e
        GROUP BY e.event_type
        """,
    category="json",
    doc="Spark 4 VariantType path for semi-structured data: parse_json "
    "into a Variant column once, then typed variant_get extraction — "
    "the open-schema alternative to from_json's fixed StructType.  "
    "Variant stores a parsed binary form, so repeated field reads skip "
    "re-tokenizing the JSON text (the big win when one 100 TB scan "
    "feeds many extractions).  Extracted ints aggregate exactly.",
)
def json_variant_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").withColumn("v", F.parse_json(F.col("props")))
    k = F.variant_get(F.col("v"), "$.k", "int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("k_sum"),
            F.max("k").alias("k_max"),
        )
    )


@register(
    "xml_roundtrip",
    oracle="""
        SELECT event_type,
               count(*) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS value_centi_sum
        FROM events
        GROUP BY event_type
        """,
    category="json",
    doc="XML ingest path (Spark 4 to_xml/from_xml): serialize each event "
    "to an XML fragment, parse it back with an explicit schema, and "
    "aggregate the extracted typed fields — the oracle computes the "
    "same aggregate from the base columns, so the query certifies the "
    "serialize→parse roundtrip is lossless.  Both directions are "
    "built-in expressions (JVM StaxXmlParser), no Python in the loop; "
    "the centi-unit fixed-point sum keeps the double exact.",
)
def xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    xml = ev.select(
        F.to_xml(
            F.struct("event_type", "value"), {"rowTag": "ev"}
        ).alias("x")
    )
    parsed = xml.select(
        F.from_xml(
            F.col("x"), "event_type STRING, value DOUBLE", {"rowTag": "ev"}
        ).alias("s")
    ).select("s.event_type", "s.value")
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("value_centi_sum"),
    )


@register(
    "struct_nested_ops",
    oracle="""
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n,
               CAST(max(CASE WHEN o_orderstatus = 'F'
                             THEN CAST(round(o_totalprice * 100) AS BIGINT)
                        END) AS BIGINT) AS max_f_cents,
               CAST(min(o_orderkey) AS BIGINT) AS min_key
        FROM orders
        WHERE o_orderkey % 3 = 0
        GROUP BY o_orderpriority
        """,
    category="function",
    doc="Nested struct surface: rows are packed into a struct column "
    "(named_struct of key, status, exact cents), carried through a "
    "filter, navigated with dot paths, and unpacked back to scalars "
    "for the aggregate — the shape every semi-structured pipeline "
    "uses for event envelopes.  Catalyst prunes struct FIELDS like "
    "columns (nested schema pruning), so packing costs nothing at "
    "scan time; the oracle states the equivalent flat semantics, "
    "proving pack → navigate → unpack is lossless.",
)
def struct_nested_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    packed = o.select(
        "o_orderpriority",
        F.struct(
            F.col("o_orderkey").alias("key"),
            F.col("o_orderstatus").alias("status"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        ).alias("env"),
    ).where(F.col("env.key") % 3 == 0)
    return packed.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.max(
            F.when(F.col("env.status") == "F", F.col("env.cents"))
        ).alias("max_f_cents"),
        F.min("env.key").alias("min_key"),
    )


@register(
    "array_higher_order",
    oracle="""
        SELECT vec_id,
               len(m) AS n_dims,
               len(list_filter(m, x -> x > 0)) AS n_pos,
               CASE WHEN len(list_filter(m, x -> abs(x) > 900000)) > 0
                    THEN 1 ELSE 0 END AS has_extreme,
               CASE WHEN len(list_filter(m, x -> abs(x) >= 3000000)) = 0
                    THEN 1 ELSE 0 END AS all_small,
               CAST(list_sum(list_transform(m, x -> abs(x))) AS BIGINT)
                   AS l1_micros,
               CAST(list_sum(m) AS BIGINT) AS sum_micros
        FROM (
            SELECT vec_id,
                   list_transform(embedding,
                       x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))
                       AS m
            FROM embeddings
        )
        """,
    category="function",
    doc="Higher-order array functions as the declarative replacement for "
    "the reference's per-element Python loops inside mapfn (reference "
    "example.py:13, SURVEY.md §2b array fns): transform (fixed-point "
    "micro-units), filter (positive count), exists/forall (encoded as "
    "filter-length tests so the oracle matches engines without a "
    "bool_or aggregate), and aggregate (exact int64 L1/sum folds).  "
    "All lambdas run JVM-side inside codegen — no UDF, no explode, no "
    "shuffle: per-row array kernels at scan speed, which is the whole "
    "argument for HOFs over explode+groupBy at 100 TB.",
)
def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    m = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 1000000).cast("bigint"),
    )
    d = e.select("vec_id", m.alias("m"))
    zero = F.lit(0).cast("bigint")
    return d.select(
        "vec_id",
        F.size("m").alias("n_dims"),
        F.size(F.filter("m", lambda x: x > 0)).alias("n_pos"),
        F.when(
            F.size(F.filter("m", lambda x: F.abs(x) > 900000)) > 0, F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("has_extreme"),
        F.when(
            F.size(F.filter("m", lambda x: F.abs(x) >= 3000000)) == 0, F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("all_small"),
        F.aggregate("m", zero, lambda acc, x: acc + F.abs(x)).alias("l1_micros"),
        F.aggregate("m", zero, lambda acc, x: acc + x).alias("sum_micros"),
    )


@register(
    "array_explode_outer",
    oracle="""
        SELECT doc_id,
               unnest(CASE WHEN len(lw) = 0 THEN [NULL] ELSE lw END) AS long_word
        FROM (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '\\s+'),
                               x -> len(x) >= 8) AS lw
            FROM documents
        )
        """,
    category="array",
    doc="explode_outer: rows whose array is empty survive as a single "
    "NULL row instead of vanishing — the LEFT-JOIN-shaped flatten that "
    "plain explode silently breaks when a document has no qualifying "
    "tokens (here: words of >= 8 chars).  Preserving empty groups "
    "matters whenever the downstream agg counts documents, not tokens. "
    "The oracle encodes the same semantics by substituting [NULL] for "
    "empty lists before unnest.  Generate-side, no shuffle.",
)
def array_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    lw = F.filter(F.split("text", r"\s+"), lambda x: F.length(x) >= 8)
    return d.select("doc_id", F.explode_outer(lw).alias("long_word"))


@register(
    "array_set_algebra",
    oracle="""
        SELECT doc_id,
               len(list_intersect(w, ['the', 'a', 'of', 'to', 'value',
                                      'table', 'key'])) AS n_common,
               len(list_distinct(w)) AS n_distinct,
               len(list_distinct(list_concat(w, ['the', 'a', 'of', 'to',
                                                 'value', 'table', 'key'])))
                   AS n_union
        FROM (SELECT doc_id,
                     list_distinct(string_split_regex(text, '\\s+')) AS w
              FROM documents)
        """,
    category="array",
    doc="Array set algebra (array_intersect / array_union / "
    "array_distinct): per document, overlap with a fixed probe "
    "vocabulary and union cardinality — the JVM-side form of per-row "
    "set membership that the reference could only write as Python set "
    "ops inside mapfn (SURVEY.md §2b array fns).  Only cardinalities "
    "are emitted because the two engines order set results "
    "differently — sizes are order-free and exact.  Scan-side, no "
    "shuffle, codegen'd.",
)
def array_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    probe = F.array(
        *[F.lit(x) for x in ["the", "a", "of", "to", "value", "table", "key"]]
    )
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(F.split("text", r"\s+")).alias("w")
    )
    return d.select(
        "doc_id",
        F.size(F.array_intersect(F.col("w"), probe)).alias("n_common"),
        F.size("w").alias("n_distinct"),
        F.size(F.array_union(F.col("w"), probe)).alias("n_union"),
    )


@register(
    "csv_column_roundtrip",
    oracle="""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(event_id) AS BIGINT) AS id_sum,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents,
               CAST(sum(length(CAST(event_id AS VARCHAR) || ','
                               || event_type || ','
                               || CAST(CAST(round(value * 100) AS BIGINT)
                                       AS VARCHAR))) AS BIGINT)
                   AS csv_chars
        FROM events
        GROUP BY event_type
        """,
    category="json",
    doc="Embedded-CSV column surface: to_csv(struct(...)) serializes "
    "each row to a CSV line, from_csv parses it back under an "
    "explicit schema — the idiom for CSV-typed message payloads "
    "(Kafka values, legacy columns) without a detour through files.  "
    "The roundtrip is verified field-for-field: the parsed struct's "
    "id and cents re-aggregate to the same exact sums as the source "
    "columns, and the serialized line length is cross-checked "
    "character-exact against the oracle's hand-built concatenation "
    "(cents travels as an integer so no float-formatting divergence "
    "can enter the CSV text).  from_csv carries its schema in-plan — "
    "Catalyst prunes unreferenced parsed fields just like from_json.",
)
def csv_column_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    line = F.to_csv(F.struct("event_id", "event_type", "cents"))
    parsed = F.from_csv(
        line, "event_id BIGINT, event_type STRING, cents BIGINT"
    )
    d = ev.select(
        line.alias("line"),
        parsed.alias("p"),
    )
    return d.groupBy(F.col("p.event_type").alias("event_type")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("p.event_id").cast("bigint").alias("id_sum"),
        F.sum("p.cents").cast("bigint").alias("cents"),
        F.sum(F.length("line")).cast("bigint").alias("csv_chars"),
    )
