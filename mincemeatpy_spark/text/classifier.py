"""Learned quality-classifier inference at scale (VERDICT r12 task 5).

The repo's quality gates are hand-rules (Gopher/CCNet thresholds in
text/scoring.py) plus a KN language model; real training-data pipelines
also run a linear fasttext-style classifier over hashed n-gram features
(the CCNet/ RedPajama "model-based quality" stage).  This module
implements that INFERENCE op Spark-first:

* featurization — lowercase whitespace tokens + adjacent-bigram
  features, hashed into ``_N_BUCKETS`` via the first 8 hex digits of
  md5 (both engines produce identical lowercase-hex md5, so the oracle
  replays the exact hash; VERDICT r12 task 5's "same hash in DuckDB").
  Entirely JVM expressions: split / transform / aggregate inside
  whole-stage codegen — zero Python, zero shuffle at inference.
* trained weights — a linear model trained ONCE per fixture on the
  corpus itself (label: ``lang = 'en'``, the "looks like the target
  distribution" signal CCNet uses): per-bucket add-one-smoothed
  Bernoulli estimate in integer fixed-point, CENTERED ON THE CORPUS
  PRIOR so the zero threshold means "more target-like than the
  average document" rather than an absolute 50% posterior (the class
  prior is ~44% en, so prior-uncentered weights reject everything),
  ``w[b] = (1e6*(pos_b+1)) // (tot_b+2) - (1e6*(POS+1)) // (TOT+2)``.
  The D-row collect is a bounded MODEL ARTIFACT (the
  ``_bpe_merge_table`` pattern at text/analysis.py:1798): train once,
  cache per fixture, then ship into every inference task as a
  broadcast weight vector — here an in-plan array literal, the exact
  shape a production run gets from ``F.broadcast``-ing a 30k-float
  vector.
* score — per document the integer feature-weight sum (exact,
  order-independent — float dot products drift by summation order),
  a sigmoid probability rounded to 6 decimals, and an integer-exact
  class decision (``score >= 0`` ⇔ ``prob >= 0.5``, no float in the
  decision path).

Scale shape: inference is scan-side per-row CPU with the weight vector
broadcast — at 100 TB it runs at wire speed next to the other gates;
training is one explode + one bucket-keyed aggregation (2^k buckets,
bounded shuffle).  Reference parity: the reference's only scoring
hook is a user map function (reference mincemeat.py:63-75); this is
the Spark-first generalization real pipelines need.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from mincemeatpy_spark.registry import register
from mincemeatpy_spark.tables import t

_N_BUCKETS = 1024
_W_SCALE = 1_000_000  # fixed-point 1e-6 weight units


def _bucket(col: Column) -> Column:
    """Feature → bucket: first 32 md5 bits mod _N_BUCKETS.  DuckDB
    replays it as ``CAST('0x' || substring(md5(f),1,8) AS BIGINT)``."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")
        % _N_BUCKETS
    )


def _feature_cols(text: Column) -> Column:
    """Unigram + adjacent-bigram feature array from raw text (lowercase
    whitespace tokenization; empties dropped)."""
    toks = F.filter(
        F.split(F.lower(text), r"\s+", -1), lambda w: w != ""
    )
    return toks


_BIGRAM_EXPR = (
    "CASE WHEN size(toks) < 2 THEN CAST(array() AS ARRAY<STRING>) "
    "ELSE transform(sequence(1, size(toks) - 1), "
    "i -> concat(element_at(toks, i), '_', element_at(toks, i + 1))) END"
)


def _featurized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lang, feats) for every document.  fan_out (r13): the
    single-row-group fixture scan otherwise serializes tokenization +
    bigram building on one core; no-op on wide scans at scale."""
    from mincemeatpy_spark.tables import fan_out

    return (
        fan_out(
            spark,
            t(spark, sf_dir, "documents").select("doc_id", "lang", "text"),
            sf_dir,
        )
        .select("doc_id", "lang", _feature_cols(F.col("text")).alias("toks"))
        .select(
            "doc_id",
            "lang",
            F.concat(F.col("toks"), F.expr(_BIGRAM_EXPR)).alias("feats"),
        )
    )


def _clf_weights(
    spark: SparkSession, sf_dir: str, _cache: dict = {}  # noqa: B006
) -> list[int]:
    """The trained dense weight vector (index = bucket), a model
    artifact like the BPE merge table: the collect is bounded by
    _N_BUCKETS rows regardless of corpus size; at 100 TB it is trained
    once and broadcast to every inference task.  Buckets no training
    feature hashed into stay at exactly 0 (the smoothed estimate
    (1e6·1)//2 − 500000)."""
    key = str(sf_dir)
    if key not in _cache:
        rows = (
            _featurized(spark, sf_dir)
            .select(
                (F.col("lang") == "en").cast("int").alias("is_en"),
                F.explode("feats").alias("f"),
            )
            .groupBy(_bucket(F.col("f")).alias("b"))
            .agg(
                F.sum("is_en").cast("bigint").alias("pos"),
                F.count(F.lit(1)).cast("bigint").alias("tot"),
            )
            .collect()
        )
        # Corpus prior over feature occurrences — derived from the same
        # bounded rollup, no extra job.
        pos_all = sum(int(r.pos) for r in rows)
        tot_all = sum(int(r.tot) for r in rows)
        prior = _W_SCALE * (pos_all + 1) // (tot_all + 2)
        vec = [0] * _N_BUCKETS
        for r in rows:
            vec[int(r.b)] = (
                _W_SCALE * (int(r.pos) + 1) // (int(r.tot) + 2) - prior
            )
        _cache[key] = vec
    return _cache[key]


def _score_expr(feats: Column, weights: list[int]) -> Column:
    """The integer feature-weight sum over a feature-array column: an
    in-plan broadcast weight-vector literal (element_at is 1-indexed),
    md5 bucket hash per feature.  This is the EXPENSIVE inference
    expression — materialize it as its own projection column and derive
    everything else from the attribute (see _derived_cols)."""
    warr = F.lit(weights)
    return F.aggregate(
        feats,
        F.lit(0).cast("bigint"),
        lambda acc, f: acc + F.element_at(warr, (_bucket(f) + 1).cast("int")),
    )


def _derived_cols(score: Column, n_feats: Column) -> dict[str, Column]:
    """Sigmoid probability + integer-exact decision from MATERIALIZED
    score/n_feats columns — cheap scalar math, safe to embed
    repeatedly."""
    return {
        "prob": F.round(
            F.lit(1.0)
            / (
                F.lit(1.0)
                + F.exp(
                    -(
                        score.cast("double")
                        / (
                            n_feats.cast("double")
                            * F.lit(float(_W_SCALE))
                        )
                    )
                )
            ),
            6,
        ),
        "predicted_en": score >= 0,
    }


def _score_cols(feats: Column, weights: list[int]) -> dict[str, Column]:
    """Inference columns over a feature-array column: integer weight
    sum via an in-plan broadcast weight-vector literal (element_at is
    1-indexed), sigmoid probability, integer-exact decision.

    NOTE (r13 optimization round): every returned column embeds the
    full scoring aggregate, so selecting several re-evaluates the
    md5-per-feature sum per column (no runtime CSE for higher-order
    functions).  Batch consumers should materialize ``_score_expr`` as
    one projection column and use ``_derived_cols`` over the attribute;
    this dict form remains for single-column (streaming) consumers."""
    ssum = _score_expr(feats, weights)
    n = F.size(feats)
    derived = _derived_cols(ssum, n)
    return {
        "n_feats": n.cast("bigint"),
        "score_scaled": ssum,
        "prob": derived["prob"],
        "predicted_en": derived["predicted_en"],
    }


# --- shared oracle fragments (DuckDB replays hash, training, scoring) --

_ORACLE_FEAT_TMPL = """
        {name}_toks AS MATERIALIZED (
            SELECT {id_col} AS fid, {extra_sel}
                   list_filter(string_split_regex(lower({text_col}),
                                                  '\\s+'),
                               w -> w <> '') AS toks
            FROM {src}
        ),
        {name} AS MATERIALIZED (
            SELECT fid, {extra_fwd}
                   list_concat(toks,
                       CASE WHEN len(toks) >= 2 THEN
                           list_transform(range(1, len(toks)),
                               i -> toks[i] || '_' || toks[i + 1])
                       ELSE [] END) AS feats
            FROM {name}_toks
        )"""


def _oracle_feat_cte(
    name: str,
    src: str,
    id_col: str,
    text_col: str,
    extra_sel: str = "",
    extra_fwd: str = "",
) -> str:
    """``extra_sel`` computes extra columns in the tokenizing CTE;
    ``extra_fwd`` forwards them by output name in the feature CTE."""
    return _ORACLE_FEAT_TMPL.format(
        name=name,
        src=src,
        id_col=id_col,
        text_col=text_col,
        extra_sel=extra_sel,
        extra_fwd=extra_fwd,
    )


_ORACLE_BUCKET = (
    "CAST(('0x' || substring(md5(u.f), 1, 8)) AS BIGINT) % " + str(_N_BUCKETS)
)

_ORACLE_TRAIN_CTES = (
    _oracle_feat_cte(
        "train_feats", "documents", "doc_id", "text",
        extra_sel="CAST(lang = 'en' AS INT) AS is_en,",
        extra_fwd="is_en,",
    )
    + f""",
        train_ex AS MATERIALIZED (
            SELECT is_en, {_ORACLE_BUCKET} AS b
            FROM train_feats, UNNEST(feats) AS u(f)
        ),
        prior AS MATERIALIZED (
            SELECT ({_W_SCALE} * (SUM(is_en) + 1)) // (COUNT(*) + 2) AS p
            FROM train_ex
        ),
        wts AS MATERIALIZED (
            SELECT b,
                   ({_W_SCALE} * (SUM(is_en) + 1)) // (COUNT(*) + 2)
                       - (SELECT p FROM prior) AS w
            FROM train_ex GROUP BY b
        )"""
)


def _oracle_score_cte(name: str, feats_cte: str) -> str:
    """Score CTE over a featurized CTE (fid, feats): (fid, n_feats,
    score_scaled)."""
    return f"""
        {name} AS MATERIALIZED (
            SELECT fid, CAST(len(feats) AS BIGINT) AS n_feats,
                   CAST(COALESCE(sc.s, 0) AS BIGINT) AS score_scaled
            FROM {feats_cte}
            LEFT JOIN (
                SELECT e.fid AS sid, SUM(COALESCE(w.w, 0)) AS s
                FROM (SELECT fid, {_ORACLE_BUCKET} AS b
                      FROM {feats_cte}, UNNEST(feats) AS u(f)) e
                LEFT JOIN wts w ON w.b = e.b
                GROUP BY e.fid
            ) sc ON sc.sid = fid
        )"""


@register(
    "text_quality_classifier",
    oracle=f"""
        WITH {_ORACLE_TRAIN_CTES},
        {_oracle_score_cte("scored", "train_feats")}
        SELECT d.doc_id, d.lang, s.n_feats, s.score_scaled,
               round(1.0 / (1.0 + exp(-(CAST(s.score_scaled AS DOUBLE)
                     / (CAST(s.n_feats AS DOUBLE) * {_W_SCALE}.0)))), 6)
                   AS prob,
               s.score_scaled >= 0 AS predicted_en
        FROM documents d JOIN scored s ON s.fid = d.doc_id
        """,
    category="quality",
    doc="Linear fasttext-style quality-classifier inference (VERDICT "
    "r12 task 5): hashed unigram+bigram features (md5-based bucket "
    "hash, replayed bit-identically by the DuckDB oracle), a trained "
    "per-bucket integer weight vector shipped as a broadcast in-plan "
    "array literal, integer-exact feature-weight sums, sigmoid "
    "probability, and a float-free class decision (score >= 0 ⇔ "
    "prob >= 0.5).  Inference is pure JVM codegen — zero Python, zero "
    "shuffle, scan-side at 100 TB; training (the bounded model "
    "artifact, _bpe_merge_table pattern) is one explode + one "
    "bucket-keyed aggregation.",
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    weights = _clf_weights(spark, sf_dir)
    feats = _featurized(spark, sf_dir)
    # r13 optimization round: materialize the scoring aggregate ONCE
    # per row and derive prob/predicted_en from the attribute — the old
    # single-select form embedded the md5-per-feature sum in all three
    # columns (3x the per-row inference cost; guide §4.4's duplicated-
    # evaluation class, built-in-expression variant).
    scored = feats.select(
        "doc_id",
        "lang",
        F.size("feats").cast("bigint").alias("n_feats"),
        _score_expr(F.col("feats"), weights).alias("score_scaled"),
    )
    derived = _derived_cols(F.col("score_scaled"), F.col("n_feats"))
    return scored.select(
        "doc_id",
        "lang",
        "n_feats",
        "score_scaled",
        derived["prob"].alias("prob"),
        derived["predicted_en"].alias("predicted_en"),
    )


def _classified_oracle() -> str:
    from mincemeatpy_spark.text.html_extract import _web_gated_ctes

    return f"""
        WITH {_web_gated_ctes("")},
        {_ORACLE_TRAIN_CTES},
        {_oracle_feat_cte("body_feats", "gated", "doc_id", "body")},
        {_oracle_score_cte("body_scored", "body_feats")}
        SELECT g.doc_id, g.predicted_lang, g.quality,
               s.score_scaled AS clf_score_scaled, g.n_words,
               substring(sha256(g.body), 1, 16) AS body_sha
        FROM gated g JOIN body_scored s ON s.fid = g.doc_id
        WHERE s.score_scaled >= 0
        QUALIFY g.doc_id = min(g.doc_id)
                               OVER (PARTITION BY sha256(g.body))
        """


@register(
    "pipeline_web_corpus_classified",
    oracle=_classified_oracle(),
    category="text",
    doc="The CommonCrawl composite with the LEARNED gate wired in "
    "(VERDICT r12 task 5's composite twin): extract → lang-ID → "
    "rule-based quality gate → sha256 exact dedup → hashed-ngram "
    "linear-classifier score over the UNIQUE extracted bodies "
    "(weights trained once on the corpus, shipped as a broadcast "
    "in-plan vector) → keep docs the model scores positive "
    "(integer-exact decision).  The classifier is a pure function of "
    "the body, so it commutes with the digest dedup — scoring runs "
    "AFTER the exchange, which (a) scores each unique document once "
    "instead of once per duplicate and (b) materializes the body "
    "column at the shuffle boundary so Catalyst cannot re-inline the "
    "extraction expression tree into the per-feature scoring lambda "
    "(the pre-restructure plan re-derived the body regex pipeline "
    "inside the scoring projection — ~60x the per-row cost at any "
    "scale).  Shuffle count stays at ONE; the oracle keeps the "
    "filter-then-dedup spelling, identical by the commutation.",
)
def pipeline_web_corpus_classified(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    from mincemeatpy_spark.lineage import fenced_filter
    from mincemeatpy_spark.text.html_extract import (
        _HTML_SYNTH_SQL,
        _web_gated,
        extracted_df,
    )

    from mincemeatpy_spark.tables import fan_out

    weights = _clf_weights(spark, sf_dir)
    # fan_out (r13): parallelize synthesis+extraction off the
    # single-row-group fixture scan (the measured win on the inplan
    # twin; no-op on wide scans at scale).
    docs = fan_out(
        spark, t(spark, sf_dir, "documents").select("doc_id", "text"), sf_dir
    ).select("doc_id", F.expr(_HTML_SYNTH_SQL).alias("html"))
    # r13 optimization round: one extraction tree per row (extracted_df)
    # and the n_words > 0 pre-filter rides in _web_gated's fenced gate.
    extracted = extracted_df(docs).drop("n_blocks")
    gated = _web_gated(extracted)
    # Digest dedup FIRST (the composite's one shuffle) — identical
    # bodies get identical classifier scores, so dedup-then-score
    # equals the oracle's score-then-dedup while touching each unique
    # body exactly once.  The digest materializes once (window key +
    # body_sha prefix share the column).
    hashed = gated.withColumn("_sha", F.sha2(F.col("body"), 256))
    w = Window.partitionBy("_sha")
    uniq = (
        hashed.withColumn("body_sha", F.substring(F.col("_sha"), 1, 16))
        .withColumn("min_id", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("min_id"))
    )
    keep = ["doc_id", "predicted_lang", "quality", "n_words", "body_sha"]
    featd = uniq.select(
        *keep, _feature_cols(F.col("body")).alias("toks")
    ).select(
        *keep, F.concat(F.col("toks"), F.expr(_BIGRAM_EXPR)).alias("feats")
    )
    # Score ONCE per unique body, then gate through a pushdown fence —
    # the old shape's plain filter pushed below the projection and
    # re-evaluated the full scoring aggregate in the Filter on top of
    # the Project's own copy (2x per surviving document).
    scored = featd.select(
        *keep, _score_expr(F.col("feats"), weights).alias("clf_score_scaled")
    )
    return fenced_filter(
        scored, F.col("clf_score_scaled") >= 0
    ).select(
        "doc_id", "predicted_lang", "quality",
        "clf_score_scaled", "n_words", "body_sha",
    )
