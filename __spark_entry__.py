"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's canonical word
count, reference example.py:12-18, Spark-native) on sf0.001.
``queries()`` / ``oracle_sql()`` expose every operator registered in
``mincemeatpy_spark.registry`` (one entry per SURVEY.md §2 item).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# The driver may load this file by path from any CWD; make the package
# importable regardless.
_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from mincemeatpy_spark.registry import load_all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    q = load_all_queries()["wordcount"]
    return q.fn(spark, "/root/testdata/sf0.001")


# The correctness driver samples a prefix of this dict (observed: first
# 50 entries in CORRECTNESS_r01/r02).  Plain registration order front-
# loads the relational modules and never reaches text/dedup/similarity/
# streaming, so interleave categories round-robin: any prefix then spans
# the whole operator surface — one pick per family before any second
# pick.  Within a category, registration order (curated easy→hard).
_CATEGORY_PRIORITY = [
    "compat",
    "relational",
    "aggregation",
    "aggregate",
    "join",
    "window",
    "text",
    "dedup",
    "similarity",
    "streaming",
    "behavioral",
    "setop",
    "sort",
    "array",
    "source",
    "udf",
    "multimodal",
    "graph",
    "skew",
    "sampling",
    "cdc",
    "layout",
    "quality",
    "json",
    "sqlapi",
    "sql",
    "function",
    "functions",
    "approximate",
]


def _certification_history() -> tuple[dict[str, int], set[str], set[str]]:
    """Scan CORRECTNESS_r*.json beside this file and return
    ``(last_pass_round, ever_sampled, open_fail)``:

    * ``last_pass_round[name]`` — most recent round whose driver sample
      recorded a full PASS (rows+schema+hash all True, err None) for
      the query; absent = never driver-PASSED.
    * ``ever_sampled`` — names that appeared in ANY sample, pass or
      fail.
    * ``open_fail`` — names whose MOST RECENT sample was a FAIL/err
      (r12, ADVICE r11 item 2: tiering on never-passed let a
      pass-then-regress query hide in tier 2; tiering on the latest
      outcome guarantees any query whose last driver word is FAIL
      re-enters the prefix, whether or not it ever passed).

    Used to rotate queries to the front WITHIN each category in three
    tiers (VERDICT r10 task 2): latest-sample-FAILED first (a recorded
    driver FAIL must not hide behind the never-sampled queue —
    ``percentiles_approx`` / ``hll_sketch_reaggregate`` sat on an r2
    ``no_oracle`` err for eight rounds), then never-sampled, then
    least-recently-passed — so the local-pass tail retires over rounds
    (VERDICT r8 task 4) instead of the same prefix re-certifying
    forever."""
    import glob
    import json
    import re

    last_pass: dict[str, int] = {}
    last_seen: dict[str, int] = {}
    last_seen_ok: dict[str, bool] = {}
    sampled: set[str] = set()
    for p in sorted(
        glob.glob(os.path.join(_REPO_ROOT, "CORRECTNESS_r*.json"))
    ):
        m = re.search(r"r(\d+)", os.path.basename(p))
        rnd = int(m.group(1)) if m else 0
        try:
            with open(p) as f:
                doc = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(doc, dict):
            continue
        for n, rec in doc.items():
            sampled.add(n)
            ok = (
                isinstance(rec, dict)
                and rec.get("rows_match") is True
                and rec.get("schema_match") is True
                and rec.get("hash_match") is True
                and not rec.get("err")
            )
            if ok:
                last_pass[n] = max(last_pass.get(n, 0), rnd)
            if rnd >= last_seen.get(n, -1):
                last_seen[n] = rnd
                last_seen_ok[n] = ok
    open_fail = {n for n, ok in last_seen_ok.items() if not ok}
    return last_pass, sampled, open_fail


# True signature leads — the reference's canonical word count (its
# example.py workload, both the Spark-native and MapReduce-compat
# forms) and the TPC-H headline.  VERDICT r12 task 1: the 21-entry
# flagship block (all driver-sampled by r12) crowded the never-sampled
# tail out of the 50-prefix; leads are now only these standing
# signatures plus the CURRENT round's never-sampled flagships (which
# count toward the never-sampled floor, so they cost nothing).
_SIGNATURE_LEADS = (
    "wordcount",
    "compat_mapreduce_wordcount",
    "tpch_q1_pricing_summary",
    # round-13 flagships (never driver-sampled → ride the prefix free).
    "web_host_pagerank",
    "text_quality_classifier",
    "pipeline_web_corpus_classified",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so
    any driver prefix is (a) representative of every category and (b)
    dominated by never-driver-sampled queries (VERDICT r12 task 1):

    1. signature leads (``_SIGNATURE_LEADS``);
    2. tier 0 — every query whose LATEST driver sample was a FAIL/err;
    3. one representative per category in priority order (the driver's
       50-prefix must span the whole operator surface) — never-sampled
       member if the category has one, else its least-recently-passed;
    4. ALL remaining never-sampled queries, round-robin over categories
       by DESCENDING never-sampled depth (text/behavioral hold most of
       the tail; exhausted categories hold no slots here at all);
    5. everything else (already certified), category round-robin,
       least-recently-passed first.

    With 463 registered / 251 never-sampled this yields ≥35
    never-sampled in the 50-prefix vs 18 under the old
    one-slot-per-category-then-seconds scheme."""
    from itertools import zip_longest

    qs = load_all_queries()
    last_pass, sampled, open_fail = _certification_history()
    by_cat: dict[str, list[str]] = {}
    for name, q in qs.items():
        by_cat.setdefault(q.category, []).append(name)
    # Within-category rotation, three tiers (VERDICT r10 task 2, re-keyed
    # per ADVICE r11 item 2): (0) latest driver sample was a FAIL/err;
    # (1) never sampled; (2) latest sample passed, by oldest PASS round.
    # Registration order breaks ties.
    def _tier(n: str) -> int:
        if n in open_fail:
            return 0
        return 2 if n in sampled else 1

    for names in by_cat.values():
        idx = {n: i for i, n in enumerate(names)}
        names.sort(key=lambda n: (_tier(n), last_pass.get(n, 0), idx[n]))
    rank = {c: i for i, c in enumerate(_CATEGORY_PRIORITY)}
    order = sorted(by_cat, key=lambda c: (rank.get(c, len(rank)), c))
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name in _SIGNATURE_LEADS:
        if name in qs:
            out[name] = qs[name].fn
    # Tier 0: a recorded driver FAIL re-enters the sample before
    # anything else.
    for c in order:
        for n in by_cat[c]:
            if n in open_fail and n not in out:
                out[n] = qs[n].fn
    # One representative per category (span guarantee; tier-best, so a
    # category with any never-sampled member spends a never-sampled one).
    for c in order:
        for n in by_cat[c]:
            if n not in out:
                out[n] = qs[n].fn
                break
    # Never-sampled fill: deepest tails first so they retire fastest.
    never_by_cat = {
        c: [n for n in by_cat[c] if n not in sampled and n not in out]
        for c in order
    }
    depth_order = sorted(
        order, key=lambda c: (-len(never_by_cat[c]), rank.get(c, len(rank)), c)
    )
    for row in zip_longest(*(never_by_cat[c] for c in depth_order)):
        for name in row:
            if name is not None and name not in out:
                out[name] = qs[name].fn
    # Certified remainder, least-recently-passed first per category.
    for row in zip_longest(*(by_cat[c] for c in order)):
        for name in row:
            if name is not None and name not in out:
                out[name] = qs[name].fn
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every deterministic query; omitted
    for approximate/sketch ops (driver records a rows-only check)."""
    return {
        name: q.oracle for name, q in load_all_queries().items() if q.oracle is not None
    }
