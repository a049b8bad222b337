"""SQL-API surface: spark.sql over registered views — CTEs, GROUPING
SETS, subqueries (scalar / IN / correlated-EXISTS), UNPIVOT.

Catalyst compiles spark.sql and the DataFrame API to the same plans;
these operators certify the SQL entry point itself plus the constructs
that are awkward in the fluent API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mincemeatpy_spark.operators._util import oracle_decsum
from mincemeatpy_spark.registry import register
from mincemeatpy_spark.tables import register_views


def _sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(query)


_GROUPING_SETS = f"""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n,
           {oracle_decsum('o_totalprice')} AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@register(
    "grouping_sets",
    oracle=_GROUPING_SETS,
    category="sqlapi",
    doc="Explicit GROUPING SETS (by-status, by-priority, grand total) in "
    "one pass — the general form of cube/rollup (Expand operator).",
)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _GROUPING_SETS)


_CTE_SCALAR_SUBQ = """
    WITH avg_px AS (SELECT avg(o_totalprice) AS v FROM orders)
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 2 * (SELECT v FROM avg_px)
"""


@register(
    "cte_scalar_subquery",
    oracle=_CTE_SCALAR_SUBQ,
    category="sqlapi",
    doc="CTE + scalar subquery: orders above 2x the mean price.  The "
    "scalar result broadcasts into the filter (no per-row subquery "
    "execution).",
)
def cte_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _CTE_SCALAR_SUBQ)


_IN_SUBQ = """
    SELECT p_partkey, p_brand
    FROM part
    WHERE p_partkey IN (
        SELECT l_partkey FROM lineitem WHERE l_quantity > 49
    )
"""


@register(
    "in_subquery",
    oracle=_IN_SUBQ,
    category="sqlapi",
    doc="IN subquery — planned as a left-semi join on the subquery keys.",
)
def in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _IN_SUBQ)


_CORR_EXISTS = """
    SELECT s_suppkey, s_name
    FROM supplier s
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity = 50
    )
"""


@register(
    "correlated_exists",
    oracle=_CORR_EXISTS,
    category="sqlapi",
    doc="Correlated EXISTS — decorrelated by Catalyst into a semi-join "
    "(no nested-loop re-execution per outer row).",
)
def correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _CORR_EXISTS)


_UNPIVOT_SPARK = """
    SELECT l_orderkey, l_linenumber, metric, val
    FROM (
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
        FROM lineitem WHERE l_orderkey < 100
    )
    UNPIVOT (val FOR metric IN (l_quantity AS qty, l_extendedprice AS px, l_discount AS disc))
"""

_UNPIVOT_ORACLE = """
    SELECT l_orderkey, l_linenumber, metric, val
    FROM (
        SELECT l_orderkey, l_linenumber, 'qty' AS metric, l_quantity AS val
        FROM lineitem WHERE l_orderkey < 100
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'px', l_extendedprice
        FROM lineitem WHERE l_orderkey < 100
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'disc', l_discount
        FROM lineitem WHERE l_orderkey < 100
    )
"""


@register(
    "unpivot_melt",
    oracle=_UNPIVOT_ORACLE,
    category="sqlapi",
    doc="UNPIVOT (melt): wide metrics to long (metric, val) rows — the "
    "inverse of pivot_agg; oracle spells it as the equivalent UNION ALL.",
)
def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _UNPIVOT_SPARK)


@register(
    "recursive_cte_chain",
    oracle="""
        WITH RECURSIVE chain(root, k, depth, cents) AS (
            SELECT o_orderkey, o_orderkey, 0,
                   CAST(round(o_totalprice * 100) AS BIGINT)
            FROM orders WHERE o_orderkey BETWEEN 1 AND 8
            UNION ALL
            SELECT c.root, o.o_orderkey, c.depth + 1,
                   CAST(round(o.o_totalprice * 100) AS BIGINT)
            FROM chain c JOIN orders o ON o.o_orderkey = c.k * 2
        )
        SELECT root,
               CAST(max(depth) AS INT) AS chain_len,
               CAST(count(*) AS BIGINT) AS n_nodes,
               CAST(sum(cents) AS BIGINT) AS subtree_cents
        FROM chain
        GROUP BY root
        """,
    category="sqlapi",
    doc="Recursive CTE (Spark 4's WITH RECURSIVE, UNION ALL form) — the "
    "hierarchy-walk / BOM-explosion shape: seed rows fan out through a "
    "key-derived parent→child edge (k -> 2k, a DAG so UNION ALL "
    "recursion terminates), accumulating depth and subtree totals.  "
    "Each recursion step is one equi-join Catalyst plans like any "
    "other (broadcast here; shuffle on the edge key at scale), and "
    "the engine materializes the frontier per step — the iterative "
    "shape graph_pagerank_iter hand-rolls, now expressed purely in "
    "SQL.  Cyclic closures (dedup_clusters) still need the iterative "
    "DataFrame form: Spark recursion is UNION ALL-only, so cycles "
    "would not terminate.",
)
def recursive_cte_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW orders_rec_v AS "
        "SELECT o_orderkey, o_totalprice FROM orders"
    )
    return spark.sql(
        """
        WITH RECURSIVE chain(root, k, depth, cents) AS (
            SELECT o_orderkey, o_orderkey, 0,
                   CAST(round(o_totalprice * 100) AS BIGINT)
            FROM orders_rec_v WHERE o_orderkey BETWEEN 1 AND 8
            UNION ALL
            SELECT c.root, o.o_orderkey, c.depth + 1,
                   CAST(round(o.o_totalprice * 100) AS BIGINT)
            FROM chain c JOIN orders_rec_v o ON o.o_orderkey = c.k * 2
        )
        SELECT root,
               CAST(max(depth) AS INT) AS chain_len,
               count(*) AS n_nodes,
               sum(cents) AS subtree_cents
        FROM chain
        GROUP BY root
        """
    )


_REBALANCE = """
    SELECT /*+ REBALANCE(l_returnflag) */
           l_returnflag, count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
"""

_REBALANCE_ORACLE = """
    SELECT l_returnflag, count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
"""


@register(
    "sql_rebalance_hint",
    oracle=_REBALANCE_ORACLE,
    category="sqlapi",
    doc="AQE REBALANCE hint: asks the runtime to even out partition "
    "sizes (splitting skewed ones, coalescing tiny ones) before the "
    "downstream stage — the declarative cure for skewed writes and "
    "lopsided stages that repartition(n) can only guess at.  Purely a "
    "physical-layout directive: results are hint-independent (the "
    "oracle runs the hint-free query).  RebalancePartitions appears in "
    "the optimized plan (asserted in test_plans).",
)
def sql_rebalance_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _REBALANCE)


_LATERAL_TOPN = """
    SELECT r.r_name, top.n_name, top.n_nationkey
    FROM region r,
         LATERAL (
             SELECT n_name, n_nationkey
             FROM nation n
             WHERE n.n_regionkey = r.r_regionkey
             ORDER BY n_nationkey DESC
             LIMIT 2
         ) AS top
"""


@register(
    "sql_lateral_topn",
    oracle=_LATERAL_TOPN,
    category="sqlapi",
    doc="LATERAL correlated subquery join — top-2 nations per region "
    "where the inner query references the outer row (the SQL-standard "
    "form of per-row subsetting).  Catalyst decorrelates this into a "
    "window-rank + filter plan, i.e. the same physical shape as "
    "topk_per_group — no nested-loop re-execution per outer row, which "
    "is what makes LATERAL safe at 100 TB.",
)
def sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _LATERAL_TOPN)


_NOT_IN_NULL = """
    SELECT count(*) AS n_matched,
           (SELECT count(*) FROM customer) AS n_customers
    FROM customer
    WHERE c_custkey NOT IN (
        SELECT CASE WHEN o_orderkey % 100 = 0 THEN NULL
                    ELSE o_custkey END
        FROM orders
    )
"""


@register(
    "not_in_null_semantics",
    oracle=_NOT_IN_NULL,
    category="sqlapi",
    doc="The NOT IN null trap, handled to the SQL standard: when the "
    "subquery list contains any NULL, `x NOT IN (...)` is never TRUE "
    "(x <> NULL is unknown), so the match count must be 0 even though "
    "most keys are absent from the list.  Every 100th order plants a "
    "NULL deterministically (o_orderkey % 100 = 0), so the list always "
    "contains NULLs and n_matched = 0 is forced by the standard "
    "semantics — asserted locally in test_oracle_extra.  Engines that "
    "rewrite NOT IN as a plain anti join silently return wrong rows "
    "here; Spark plans it as a null-aware anti join and agrees with "
    "DuckDB exactly.  The n_customers scalar pins the denominator so "
    "the zero is visibly semantic, not an empty-table artifact.",
)
def not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _NOT_IN_NULL)


_COLLATION_CI = """
    SELECT lower(o_orderpriority) AS priority_ci,
           count(*) AS n
    FROM (SELECT CASE WHEN o_orderkey % 3 = 0 THEN upper(o_orderpriority)
                      ELSE o_orderpriority END AS o_orderpriority
          FROM orders)
    GROUP BY 1
"""


@register(
    "string_collation_ci",
    oracle=_COLLATION_CI,
    category="sqlapi",
    doc="Case-insensitive collation (Spark 4 COLLATE UTF8_LCASE): mixed-"
    "case keys (a third of rows upper-cased deterministically) group "
    "together under the collated comparison with no expression "
    "wrapping at the call sites.  The oracle states the same "
    "semantics via lower() — which is also what the collation "
    "compiles to for grouping, so the result (and at scale the "
    "shuffle key) is identical; collation moves the normalization "
    "into the type where every comparison, join and sort inherits it.",
)
def string_collation_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
        SELECT lower(pr COLLATE UTF8_LCASE) AS priority_ci,
               count(*) AS n
        FROM (SELECT CASE WHEN o_orderkey % 3 = 0 THEN upper(o_orderpriority)
                          ELSE o_orderpriority END AS pr
              FROM orders)
        GROUP BY pr COLLATE UTF8_LCASE
        """,
    )


@register(
    "sql_pipe_syntax",
    oracle="""
        SELECT o_orderpriority,
               count(*) AS n,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS total_cents
        FROM orders
        WHERE o_orderstatus = 'F'
        GROUP BY o_orderpriority
        """,
    category="sqlapi",
    doc="SQL pipe syntax (Spark 4.0, SIG-piped-SQL): the same logical "
    "plan written as a left-to-right pipeline — FROM ... |> WHERE ... "
    "|> AGGREGATE ... GROUP BY ... — which Catalyst compiles to the "
    "identical Filter+HashAggregate as the ANSI form the oracle "
    "states.  Zero planner cost, pure syntax surface; certifies the "
    "entry point a pipeline-minded user (this repo's audience) "
    "reaches for first.",
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
        FROM orders
        |> WHERE o_orderstatus = 'F'
        |> AGGREGATE count(*) AS n,
                     CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                          AS BIGINT) AS total_cents
           GROUP BY o_orderpriority
        """,
    )


@register(
    "sql_exec_immediate",
    oracle="""
        SELECT n_name, count(*) AS n_customers
        FROM customer JOIN nation ON n_nationkey = c_nationkey
        WHERE n_regionkey = 1
        GROUP BY n_name
        """,
    category="sqlapi",
    doc="Parameterized SQL via EXECUTE IMMEDIATE ... USING (Spark 4): "
    "the query text binds a named parameter marker (:region) instead "
    "of string interpolation — the injection-safe templating surface "
    "for generated pipeline SQL.  Catalyst substitutes the literal "
    "before optimization, so pushdown/broadcast behave exactly as the "
    "inlined form the oracle states.",
)
def sql_exec_immediate(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    spark.sql("DECLARE OR REPLACE VARIABLE q STRING")
    spark.sql(
        """SET VAR q = 'SELECT n_name, count(*) AS n_customers
           FROM customer JOIN nation ON n_nationkey = c_nationkey
           WHERE n_regionkey = :region GROUP BY n_name'"""
    )
    return spark.sql("EXECUTE IMMEDIATE q USING 1 AS region")


@register(
    "sql_session_variables",
    oracle="""
        SELECT count(*) AS n_big,
               min(o_orderkey) AS first_key
        FROM orders
        WHERE o_totalprice > 150000
        """,
    category="sqlapi",
    doc="Session variables (Spark 4 DECLARE / SET VARIABLE): a typed, "
    "session-scoped threshold referenced directly in a query — the "
    "configuration mechanism for parameterized jobs without string "
    "templating.  The variable folds to a literal at analysis time, "
    "so the predicate pushes to the parquet scan like any constant.",
)
def sql_session_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    spark.sql("DECLARE OR REPLACE VARIABLE price_floor DOUBLE DEFAULT 150000.0")
    spark.sql("SET VAR price_floor = 150000.0")
    return spark.sql(
        """SELECT count(*) AS n_big, min(o_orderkey) AS first_key
           FROM orders WHERE o_totalprice > price_floor"""
    )


_MODERN_AGG = """
    SELECT o_orderstatus,
           o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT)
               AS n_big,
           CAST(min(o_orderkey) FILTER (WHERE o_totalprice > 200000)
               AS BIGINT) AS first_big_key
    FROM orders
    GROUP BY ALL
"""


@register(
    "sql_modern_agg",
    oracle=_MODERN_AGG,
    category="sqlapi",
    doc="Modern ANSI aggregate surface, identical text in both engines: "
    "GROUP BY ALL (grouping keys inferred from the non-aggregate "
    "select list — no positional drift when columns are added) and the "
    "FILTER (WHERE ...) aggregate clause (per-aggregate predicates "
    "without CASE WHEN scaffolding).  Catalyst compiles FILTER to the "
    "same conditional partial aggregate as the CASE form "
    "(conditional_aggregates), so the two-phase HashAggregate shape — "
    "and the single fact shuffle — is unchanged.",
)
def sql_modern_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(spark, sf_dir, _MODERN_AGG)


@register(
    "sql_parameterized",
    oracle="""
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM lineitem
        WHERE l_shipdate >= DATE '1995-01-01'
          AND l_quantity < 30
        GROUP BY l_returnflag
        """,
    category="sqlapi",
    doc="Parameterized SQL (Spark 3.4+/4 named parameter markers): the "
    "query text carries :ship_floor / :qty_cap placeholders and the "
    "values travel OUT-OF-BAND via spark.sql(query, args={...}) — the "
    "injection-safe job-parameterization surface (no f-string splicing "
    "of untrusted values into SQL text).  The binder substitutes typed "
    "literals BEFORE analysis, so both predicates fold into the scan "
    "as PushedFilters exactly like hand-written constants — "
    "parameterization costs nothing at plan time.  At 100 TB this plus "
    "partition pruning is how one query text serves every daily run.",
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    import datetime

    return spark.sql(
        """SELECT l_returnflag,
                  CAST(count(*) AS BIGINT) AS n,
                  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
           FROM lineitem
           WHERE l_shipdate >= :ship_floor AND l_quantity < :qty_cap
           GROUP BY l_returnflag""",
        args={
            "ship_floor": datetime.date(1995, 1, 1),
            "qty_cap": 30,
        },
    )


@register(
    "sql_observe_metrics",
    oracle="""
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(*) FILTER (WHERE o_totalprice > 200000) AS BIGINT)
                   AS n_big,
               CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS centi_total,
               CAST(min(o_orderkey) AS BIGINT) AS min_key,
               CAST(max(o_orderkey) AS BIGINT) AS max_key
        FROM orders
        """,
    category="sqlapi",
    doc="The OBSERVE surface (df.observe + Observation): named metrics "
    "computed as a side-product of a pass the job was already making "
    "— the production data-quality hook (row counts, domain checks, "
    "freshness gauges) that costs ZERO extra scans, unlike a separate "
    "audit query (dq_audit) which re-reads the table.  The observed "
    "aggregates ride the CollectMetrics operator inside the main "
    "plan; the driver reads one metrics row per action.  Here the "
    "observed pass is a full-table count and the five metrics "
    "(half-up centi-unit money so the sum is hash-exact) must match "
    "the oracle's direct aggregation.  At 100 TB: attach observe to "
    "the WRITE of every pipeline stage and alert on the metrics "
    "stream — no second job, no sampled approximations.",
)
def sql_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Observation

    from mincemeatpy_spark.tables import t

    obs = Observation("orders_dq")
    o = t(spark, sf_dir, "orders")
    from pyspark.sql import functions as F

    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("o_totalprice") > 200000, 1)).alias("n_big"),
        F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("centi_total"),
        F.min("o_orderkey").cast("bigint").alias("min_key"),
        F.max("o_orderkey").cast("bigint").alias("max_key"),
    )
    observed.count()  # the action the metrics piggyback on
    m = obs.get  # one metrics row, driver-side by design
    return spark.createDataFrame(
        [
            (
                m["n_rows"],
                m["n_big"],
                m["centi_total"],
                m["min_key"],
                m["max_key"],
            )
        ],
        "n_rows bigint, n_big bigint, centi_total bigint, "
        "min_key bigint, max_key bigint",
    )


_SCRIPT_ORACLE = """
    WITH rev AS (
        SELECT CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS r
        FROM orders
    )
    SELECT 6 AS n_iterations,
           r AS revenue_centi,
           CAST(r // 2 + r // 4 + r // 8 + r // 16 + r // 32 + r // 64
                AS BIGINT) AS tail_discounted_centi
    FROM rev
"""


@register(
    "sql_scripting_loop",
    oracle=_SCRIPT_ORACLE,
    category="sqlapi",
    doc="SQL scripting (Spark 4.0, SQL/PSM subset): BEGIN…END block with "
    "DECLAREd variables and a WHILE loop folding a six-term geometric "
    "amortization of total order revenue (centi-unit bigint, DIV per "
    "term so every step is integer-exact).  The script's control flow "
    "runs on the driver but each statement compiles through Catalyst — "
    "the revenue aggregate is one ordinary distributed scan+agg whose "
    "1-row result binds to a variable; the loop then does pure literal "
    "arithmetic (no per-iteration jobs).  The procedural twin of the "
    "iterative-driver-loop pattern graph_pagerank_2iter documents — "
    "control flow in SQL instead of Python.  The conf is enabled "
    "per-call (pin-on-every-consumer, the test_conf_invariants rule).  "
    "Oracle is the closed form of the unrolled loop.",
)
def sql_scripting_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    spark.conf.set("spark.sql.scripting.enabled", "true")
    return spark.sql(
        """
        BEGIN
          DECLARE rev BIGINT DEFAULT 0;
          DECLARE i INT DEFAULT 1;
          DECLARE acc BIGINT DEFAULT 0;
          SET rev = (SELECT CAST(SUM(CAST(ROUND(o_totalprice * 100)
                                          AS BIGINT)) AS BIGINT)
                     FROM orders);
          WHILE i <= 6 DO
            SET acc = acc + rev DIV SHIFTLEFT(CAST(1 AS BIGINT), i);
            SET i = i + 1;
          END WHILE;
          SELECT 6 AS n_iterations,
                 rev AS revenue_centi,
                 acc AS tail_discounted_centi;
        END
        """
    )


_TRANSPOSE_BASE = """
    SELECT r.r_name,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT))
                AS BIGINT) AS revenue_centi
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY r.r_name
"""


@register(
    "sqlapi_transpose",
    oracle=f"""
        WITH agg AS ({_TRANSPOSE_BASE})
        SELECT 'n_orders' AS key,
               MAX(CASE WHEN r_name = 'AFRICA' THEN n_orders END) AS "AFRICA",
               MAX(CASE WHEN r_name = 'AMERICA' THEN n_orders END) AS "AMERICA",
               MAX(CASE WHEN r_name = 'ASIA' THEN n_orders END) AS "ASIA",
               MAX(CASE WHEN r_name = 'EUROPE' THEN n_orders END) AS "EUROPE",
               MAX(CASE WHEN r_name = 'MIDDLE EAST' THEN n_orders END)
                   AS "MIDDLE EAST"
        FROM agg
        UNION ALL
        SELECT 'revenue_centi',
               MAX(CASE WHEN r_name = 'AFRICA' THEN revenue_centi END),
               MAX(CASE WHEN r_name = 'AMERICA' THEN revenue_centi END),
               MAX(CASE WHEN r_name = 'ASIA' THEN revenue_centi END),
               MAX(CASE WHEN r_name = 'EUROPE' THEN revenue_centi END),
               MAX(CASE WHEN r_name = 'MIDDLE EAST' THEN revenue_centi END)
        FROM agg
        """,
    category="sqlapi",
    doc="DataFrame.transpose (Spark 4.0): rows and columns swap, the "
    "index column's VALUES becoming the output schema — here the "
    "5-region revenue rollup flips to one row per metric with a column "
    "per region.  Transpose must materialize the index values to name "
    "the columns (an inherently bounded collect inside Spark itself), "
    "so it is only sane on an already-aggregated frame — this one is 5 "
    "rows AFTER the distributed join+agg, which is where all the scale "
    "cost lives and which stays a normal shuffled plan.  The oracle "
    "builds the transposed table explicitly with per-region MAX(CASE) "
    "branches and quoted column aliases ('MIDDLE EAST' has a space).",
)
def sqlapi_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    agg = spark.sql(_TRANSPOSE_BASE)
    return agg.transpose("r_name")


@register(
    "sql_identifier_clause",
    oracle="""
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    AS BIGINT) AS revenue_centi
        FROM orders
        GROUP BY o_orderpriority
        """,
    category="sqlapi",
    doc="The IDENTIFIER() clause (Spark 4): table and column names "
    "supplied as PARAMETERS instead of string-concatenated SQL — the "
    "injection-safe way to write the per-tenant / per-partition "
    "templated queries a pipeline scheduler emits (the identifier is "
    "parsed as exactly one name; 'orders; DROP TABLE x' fails to "
    "resolve rather than executes).  The constants fold at analysis "
    "time, so the optimized plan is byte-identical to the literal "
    "query — grouping and pushdown still work on the parameterized "
    "column.  Complements sql_parameterized (VALUE parameters) and "
    "sql_exec_immediate (statement templating): this one "
    "parameterizes NAMES.",
)
def sql_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT IDENTIFIER(:col) AS o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(round(IDENTIFIER(:val) * 100) AS BIGINT))
                    AS BIGINT) AS revenue_centi
        FROM IDENTIFIER(:tbl)
        GROUP BY IDENTIFIER(:col)
        """,
        args={
            "tbl": "orders",
            "col": "o_orderpriority",
            "val": "o_totalprice",
        },
    )


@register(
    "sql_create_function",
    oracle="""
        SELECT o_orderpriority,
               CAST(sum(CASE WHEN o_totalprice * (1 - 0.04) > 100000
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_big_net,
               round(avg(o_totalprice * (1 - 0.04)), 2) AS avg_net
        FROM orders
        GROUP BY o_orderpriority
        """,
    category="sqlapi",
    doc="SQL UDFs (Spark 4 CREATE FUNCTION ... RETURNS ... RETURN "
    "expr): a scalar business rule (net price after a 4% fee) defined "
    "ONCE in the catalog and reused across queries — the governed "
    "alternative to copy-pasting expressions, and unlike a Python UDF "
    "it is INLINED by the analyzer into the calling plan, so it "
    "costs nothing: the aggregate below runs whole-stage-codegen "
    "with the expression folded in, no serialization boundary.  The "
    "oracle states the inlined form, certifying the inlining "
    "semantics.  TEMPORARY scope keeps the catalog session-clean "
    "(the repo's conf-hygiene rule).",
)
def sql_create_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    spark.sql(
        """CREATE OR REPLACE TEMPORARY FUNCTION net_price(p DOUBLE)
           RETURNS DOUBLE RETURN p * (1 - 0.04)"""
    )
    return spark.sql(
        """SELECT o_orderpriority,
                  CAST(sum(CASE WHEN net_price(o_totalprice) > 100000
                                THEN 1 ELSE 0 END) AS BIGINT) AS n_big_net,
                  round(avg(net_price(o_totalprice)), 2) AS avg_net
           FROM orders
           GROUP BY o_orderpriority"""
    )


@register(
    "sql_lateral_column_alias",
    oracle="""
        SELECT l_orderkey,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                    AS BIGINT) AS net_e4,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                    * 7 AS BIGINT) AS tax_e6,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                    * 107 AS BIGINT) AS gross_e6
        FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                   > 3000000000
        """,
    category="sqlapi",
    doc="Lateral column aliases (Spark 3.4+): later select-list items "
    "reference earlier ALIASES in the same SELECT (net_e4 -> tax_e6 "
    "-> gross_e6) and the HAVING references the alias too, instead "
    "of re-stating the aggregate or nesting a subquery — the "
    "analyzer rewrites the chain into one projection, so the "
    "aggregate is computed once and reused, which the oracle (forced "
    "to restate the expression four times, as engines without the "
    "feature must) demonstrates by contrast.  Money is exact-cents "
    "int64 (the repo's rule: a round(2) over a float SUM flips at "
    "half-cent boundaries between engines — caught live at sf0.01).",
)
def sql_lateral_column_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """SELECT l_orderkey,
                  sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                      AS net_e4,
                  net_e4 * 7 AS tax_e6,
                  net_e4 * 107 AS gross_e6
           FROM lineitem
           GROUP BY l_orderkey
           HAVING net_e4 > 3000000000"""
    )


@register(
    "sql_star_except",
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
               count(*) AS n
        FROM orders
        WHERE o_orderkey % 100 = 0
        GROUP BY ALL
        """,
    category="sqlapi",
    doc="SELECT * EXCEPT (cols) — the projection-by-exclusion surface "
    "(Spark 4 / BigQuery-style): project everything but the wide or "
    "sensitive columns without enumerating the keep-list, the idiom "
    "that keeps SELECTs stable under additive schema evolution.  "
    "Paired with GROUP BY ALL (group by every non-aggregate output) — "
    "the two features compose into 'aggregate over everything except "
    "the metrics' with zero column lists.  Catalyst resolves EXCEPT "
    "at analysis time, so column pruning in the scan is identical to "
    "an explicit projection (no runtime cost).  The oracle enumerates "
    "the surviving columns explicitly.",
)
def sql_star_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _sql(
        spark,
        sf_dir,
        """
        SELECT * EXCEPT (o_totalprice, o_orderdate), count(*) AS n
        FROM orders
        WHERE o_orderkey % 100 = 0
        GROUP BY ALL
        """,
    )
