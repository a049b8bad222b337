"""White-box pins for the r13 operator batch — properties the DuckDB
oracle gate cannot express (it proves Spark==oracle, not that the
shared algorithm does what the doc claims on the planted structure)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mincemeatpy_spark.registry import load_all_queries

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def qs():
    return load_all_queries()


def test_site_template_blocks_recovers_planted_chrome(spark, qs):
    """The synthesized pages plant identical nav/sidebar/footer chrome
    on every page of every site — template mining must recover exactly
    that set and never a per-doc block (titles/bodies are doc-unique)."""
    rows = qs["site_template_blocks"].fn(spark, SF).collect()
    by_site = {}
    for r in rows:
        by_site.setdefault(r.site, set()).add(r.block)
    chrome = {
        "Home", "About", "Contact",
        "Trending topic one", "Trending topic two",
        "Terms | Privacy | copyright 2026",
        "See related and more",
    }
    assert by_site, "no templates mined"
    for site, blocks in by_site.items():
        assert chrome <= blocks, (site, chrome - blocks)
        # nothing doc-unique leaks in: every extra block must also be
        # site-universal text, and 'Doc N' headings are per-doc
        assert not any(b.startswith("Doc ") for b in blocks), (site, blocks)
        # source = doc_id % 20, so doc_id % 5 is CONSTANT per site: the
        # entity paragraph (doc_id % 5 == 2) is site-universal chrome
        # exactly on src2/src7/src12/src17 and absent elsewhere — the
        # correlated-chrome case a naive global-frequency miner misses
        expect_entity = site in {"src2", "src7", "src12", "src17"}
        assert any("entities" in b for b in blocks) == expect_entity, (
            site, blocks,
        )


def test_web_frontier_priority_is_exactly_the_uncrawled_hosts(spark, qs):
    """Crawled hosts are site0-4 (doc_id % 5); outlinks reach site0-6 —
    so the frontier is exactly {site5, site6}, each with positive
    next-iteration mass and at most 5 distinct referrers."""
    rows = qs["web_frontier_priority"].fn(spark, SF).collect()
    hosts = {r.host for r in rows}
    assert hosts == {"site5.example", "site6.example"}, hosts
    for r in rows:
        assert r.priority_scaled > 0, r
        assert 1 <= r.n_referrers <= 5, r


def test_web_hits_frontier_hosts_are_pure_authorities(spark, qs):
    """Frontier hosts have no out-edges: hub score must be exactly 0
    while their authority score is positive (they are linked to)."""
    rows = {r.host: r for r in qs["web_hits_scores"].fn(spark, SF).collect()}
    for h in ("site5.example", "site6.example"):
        assert rows[h].hub_scaled == 0, rows[h]
        assert rows[h].auth_scaled > 0, rows[h]
    # crawled hosts have pages and outlinks: positive hub mass
    for h in ("site0.example", "site1.example"):
        assert rows[h].hub_scaled > 0, rows[h]


def test_dedup_segments_rewrite_agrees_with_bulk_counts(spark, qs):
    """The rewrite twin and the counting op implement the same
    first-instance rule — their per-doc n_segs/n_kept must agree, and
    the rewritten text must contain exactly n_kept segments."""
    bulk = {
        r.doc_id: r
        for r in qs["dedup_segments_bulk"].fn(spark, SF).collect()
    }
    rew = qs["dedup_segments_rewrite"].fn(spark, SF).collect()
    assert rew, "empty rewrite output"
    seen = set()
    for r in rew:
        b = bulk[r.doc_id]
        assert (r.n_segs, r.n_kept) == (b.n_segs, b.n_kept), (r, b)
        assert r.n_kept > 0
        # text_out holds exactly the surviving segments (space-joined
        # 10-token segments -> char length matches bulk's kept_chars
        # plus the inter-segment separators)
        assert len(r.text_out) == b.kept_chars + (r.n_kept - 1), (r, b)
        seen.add(r.doc_id)
    # docs missing from the rewrite are exactly the fully-deduplicated
    # ones (n_kept == 0 in bulk)
    dropped = set(bulk) - seen
    assert all(bulk[d].n_kept == 0 for d in dropped), dropped


def test_ccnet_buckets_are_ordered_and_partition_each_lang(spark, qs):
    """Within every language: each doc appears once, all three buckets
    are value-ordered (min head score >= max middle >= ... tail), and
    bucket sizes are near-terciles up to tie blocks."""
    rows = qs["ccnet_perplexity_buckets"].fn(spark, SF01).collect()
    langs = {}
    for r in rows:
        langs.setdefault(r.lang, []).append(r)
    assert len(langs) >= 3
    for lang, rs in langs.items():
        assert len({r.doc_id for r in rs}) == len(rs)
        by = {"head": [], "middle": [], "tail": []}
        for r in rs:
            by[r.ppl_bucket].append(r.mean_ppm)
        assert by["head"], lang
        if by["middle"] and by["head"]:
            assert min(by["head"]) >= max(by["middle"]), lang
        if by["tail"] and by["middle"]:
            assert min(by["middle"]) >= max(by["tail"]), lang


def test_bitext_margin_one_best_pair_per_anchor(spark, qs):
    """Every sampled anchor yields exactly one best pair; mutual pairs
    are a subset with a consistent back-edge (the dst's best anchor is
    this src — re-derivable from the pair table itself)."""
    rows = qs["bitext_margin_mining"].fn(spark, SF01).collect()
    assert rows
    srcs = [r.src_id for r in rows]
    assert len(srcs) == len(set(srcs))
    # mutual flags exist in both states on this fixture (en anchors
    # outnumber fr candidates ~3:1, so non-mutual bests must occur)
    flags = {r.is_mutual for r in rows}
    assert flags == {True, False}, flags
    # a dst can be the best of many srcs, but mutual for at most one
    mutual_dsts = [r.dst_id for r in rows if r.is_mutual]
    assert len(mutual_dsts) == len(set(mutual_dsts))


def test_sq8_recall_dominates_pq_on_average(spark, qs):
    """SQ8 keeps 64 codes/vector vs PQ's 8 — its distortion is strictly
    per-dimension rounding, so corpus-average recall@3 must be at least
    PQ's (the memory/recall tradeoff the docstring claims)."""
    sq = qs["similarity_sq8_recall"].fn(spark, SF01).collect()
    pq = qs["similarity_pq_recall"].fn(spark, SF01).collect()
    avg_sq = sum(r.recall_at_3 for r in sq) / len(sq)
    avg_pq = sum(r.recall_at_3 for r in pq) / len(pq)
    assert avg_sq >= avg_pq, (avg_sq, avg_pq)
    assert avg_sq >= 0.6, avg_sq  # near-lossless quantization floor
