"""Physical-plan inspection: the engine's plan-IR surface.

The reference has no plan IR at all — its "plan" is opaque user bytecode
(reference mincemeat.py:284-290) and its optimizer surface is empty
(SURVEY.md §4.1).  Here the plan IR is Catalyst's, and this module is
the window into it: programmatic access to the properties the engine
promises (pushdown, pruning, broadcast, codegen), used by
tests/test_plans.py and available as a CLI for eyeballing any registered
query:

    python -m mincemeatpy_spark.plans.inspect wordcount [sf_dir]
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The executed physical plan as text (pre-execution AQE view)."""
    return df._jdf.queryExecution().executedPlan().toString()


def scan_properties(df: DataFrame) -> list[dict[str, str]]:
    """Per-scan pushdown/pruning facts: PushedFilters, PartitionFilters,
    ReadSchema — the three lines that decide how many bytes a 100 TB
    query reads."""
    plan = executed_plan(df)
    out = []
    for scan in re.finditer(r"FileScan \S+ ([^\[]*)\[[^\]]*\]([^\n]*)", plan):
        text = scan.group(0)
        props = {}
        for key in ("PushedFilters", "PartitionFilters", "ReadSchema", "SelectedBucketsCount"):
            m = re.search(rf"{key}: ?([^,]+(?:\([^)]*\))?[^,]*)", text)
            if m:
                props[key] = m.group(1).strip()
        out.append(props)
    return out


def plan_report(df: DataFrame) -> dict[str, object]:
    """Summary of the plan properties the docstrings promise."""
    plan = executed_plan(df)
    return {
        "scans": scan_properties(df),
        "joins": re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
                            r"BroadcastNestedLoopJoin)", plan),
        "n_exchanges": plan.count("Exchange hashpartitioning"),
        "has_take_ordered": "TakeOrderedAndProject" in plan,
        "aggregate_modes": re.findall(r"HashAggregate\(keys=.*?functions=\[(partial_)?", plan),
        "codegen_stages": len(set(re.findall(r"\*\((\d+)\)", plan))),
    }


def main() -> None:
    import sys

    from mincemeatpy_spark.registry import load_all_queries
    from mincemeatpy_spark.session import get_spark

    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark("plan-inspect")
    df = load_all_queries()[name].fn(spark, sf_dir)
    df.explain("formatted")
    print(plan_report(df))


if __name__ == "__main__":
    main()
