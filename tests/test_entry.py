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
