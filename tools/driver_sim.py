"""Registry-wide driver simulation → committed correctness artifact.

VERDICT r11 task 2: the driver's per-round CORRECTNESS_r{N}.json samples
only a 50-query prefix, so 200+ queries carry only local (pytest)
evidence and auditing them costs the judge a ~43-minute suite rerun.
This tool runs the FULL ``queries()`` surface in the driver's manner —
fresh-process module load by file path, plain SparkSession (not our
session factory), sf0.01 parquet, DuckDB oracles, sorted-column value
hashing — and writes ``CORRECTNESS_local_r{N}.json`` in the driver's
exact per-query record format:

    {"<name>": {"rows_match": bool, "schema_match": bool,
                "hash_match": bool, "spark_rows": int,
                "oracle_rows": int, "err": str|null}, ...}

Queries without an ``oracle_sql()`` entry get the driver's weaker
rows-only record (rows_match/spark_rows populated, oracle_rows null).

Usage:  cd /tmp && python /root/repo/tools/driver_sim.py [OUT.json]
(non-repo CWD is part of the test: __spark_entry__.py must self-insert
its directory into sys.path).
"""

from __future__ import annotations

import hashlib
import importlib.util
import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = os.environ.get("SPARK_GRAFT_SIM_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _value_hash(columns, rows) -> str:
    """Driver-style canonical hash: columns sorted by name, values
    normalized, row multiset ordered — mirrors tests/oracle_utils."""
    sys.path.insert(0, REPO)
    from tests.oracle_utils import normalize

    canon = normalize(list(columns), [tuple(r) for r in rows])
    h = hashlib.sha256()
    for row in canon:
        h.update(repr(row).encode())
        h.update(b"\x00")
    return h.hexdigest()


def main() -> None:
    out_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else os.path.join(REPO, "CORRECTNESS_local_latest.json")
    )

    import duckdb
    from pyspark.sql import SparkSession

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    spark = (
        SparkSession.builder.master(
            os.environ.get("SPARK_GRAFT_SIM_MASTER", "local[8]")
        )
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    n = mod.entry(spark).count()
    print(f"entry() smoke: {n} rows", flush=True)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )

    qs = mod.queries()
    osql = mod.oracle_sql()
    results: dict[str, dict] = {}
    t_start = time.time()
    for i, name in enumerate(sorted(qs), 1):
        rec = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        try:
            df = qs[name](spark, SF)
            s_cols = list(df.columns)
            s_rows = [tuple(r) for r in df.collect()]
            rec["spark_rows"] = len(s_rows)
            if name in osql:
                rel = con.execute(osql[name])
                d_cols = [c[0] for c in rel.description]
                d_rows = [tuple(r) for r in rel.fetchall()]
                rec["oracle_rows"] = len(d_rows)
                rec["rows_match"] = len(s_rows) == len(d_rows)
                rec["schema_match"] = sorted(s_cols) == sorted(d_cols)
                rec["hash_match"] = (
                    rec["rows_match"]
                    and rec["schema_match"]
                    and _value_hash(s_cols, s_rows)
                    == _value_hash(d_cols, d_rows)
                )
            else:
                rec["rows_match"] = rec["spark_rows"] is not None
                rec["schema_match"] = bool(s_cols)
                rec["hash_match"] = None  # rows-only check, like driver
        except Exception as ex:  # noqa: BLE001 — per-query isolation
            rec["err"] = f"{type(ex).__name__}: {ex}"[:500]
            traceback.print_exc(limit=3)
        results[name] = rec
        ok = rec["hash_match"] if rec["hash_match"] is not None else rec["rows_match"]
        status = "ok" if ok and not rec["err"] else "FAIL"
        print(
            f"[{i}/{len(qs)}] {status} {name} "
            f"({rec['spark_rows']} rows, {time.time() - t_start:.0f}s elapsed)",
            flush=True,
        )

    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    n_fail = sum(
        1
        for r in results.values()
        if r["err"]
        or (r["hash_match"] is False)
        or not r["rows_match"]
    )
    print(
        f"done: {len(results) - n_fail}/{len(results)} green -> {out_path} "
        f"({time.time() - t_start:.0f}s)",
        flush=True,
    )
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
