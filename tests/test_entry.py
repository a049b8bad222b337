"""Smoke: the driver contract module loads and entry() produces rows."""

from __future__ import annotations

import importlib.util


def _load_entry():
    spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_smoke(spark):
    mod = _load_entry()
    df = mod.entry(spark)
    assert len(df.columns) > 0
    assert df.count() > 0


def test_queries_oracle_keys_align():
    mod = _load_entry()
    qs = mod.queries()
    os_ = mod.oracle_sql()
    assert qs, "no queries registered"
    assert set(os_) <= set(qs)


def test_queries_prefix_spans_categories():
    """The correctness driver samples the first 50 queries() entries;
    the category-interleaved ordering must keep any such prefix
    representative of the whole operator surface."""
    from mincemeatpy_spark.registry import load_all_queries

    mod = _load_entry()
    names = list(mod.queries())[:50]
    all_q = load_all_queries()
    cats_in_prefix = {all_q[n].category for n in names}
    all_cats = {q.category for q in all_q.values()}
    assert cats_in_prefix == all_cats, (
        f"missing families in driver prefix: {all_cats - cats_in_prefix}"
    )
