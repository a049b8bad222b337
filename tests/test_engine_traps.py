"""Cross-engine exactness traps, pinned (VERDICT r8 task 8).

Each oracle query pairs a Spark plan with DuckDB SQL; rounds 7-8
catalogued expressions where the two engines legally disagree, and the
registered queries route AROUND those divergences (floor() on the
oracle side, explicit formulas, integer-cents sums).  These tests
evaluate each trap expression in BOTH engines and assert the documented
divergence STILL HOLDS — so an engine upgrade that silently changes a
trap's behavior fails loudly here, telling us the workaround (and its
comment trail) needs re-auditing, rather than surfacing as an
unexplained 6-decimal hash mismatch three queries away.

One test per trap documented in .claude/skills/verify/SKILL.md
("Round-8 additions") and NOTES_r07/r08; each names the query whose
oracle carries the workaround.
"""

from __future__ import annotations


def _spark1(spark, expr: str):
    return spark.sql(f"SELECT {expr} AS v").collect()[0][0]


def _duck1(duck, expr: str):
    return duck.execute(f"SELECT {expr} AS v").fetchone()[0]


def test_double_to_bigint_cast_rounds_in_duckdb_truncates_in_spark(
    spark, duck
):
    """DuckDB CAST(double AS BIGINT) rounds half away; Spark truncates
    toward zero.  Workaround: wrap the oracle side in floor()
    (math_functions_extended)."""
    expr = "CAST(CAST(2.7 AS DOUBLE) AS BIGINT)"
    assert _spark1(spark, expr) == 2  # truncation
    assert _duck1(duck, expr) == 3  # rounding
    # floor() on the oracle side restores agreement — the workaround.
    assert _duck1(duck, "CAST(floor(CAST(2.7 AS DOUBLE)) AS BIGINT)") == 2


def test_hypot_carries_extra_precision_vs_explicit_formula(spark, duck):
    """Java's Math.hypot (Spark's hypot) uses an extended-precision
    algorithm; sqrt(x*x + y*y) does not.  At micro-unit truncation the
    ulp difference flips the last digit for some inputs.  Workaround:
    spell sqrt(x*x + y*y) explicitly in BOTH engines
    (math_functions_extended's hypot_micro_sum)."""
    # Find a pair where the JVM's OWN hypot differs from the naive
    # formula (Java's Math.hypot and glibc's differ in implementation,
    # so scanning with Python's math.hypot finds the WRONG pairs —
    # measured while writing this test: JVM hypot(1.0, 8/7) equals the
    # formula where glibc's does not).  The division is spelled i/7e0
    # (int / double-literal) — exact inputs, correctly-rounded double
    # division, identical in both engines.
    rows = spark.sql(
        """
        SELECT id FROM range(1, 200000)
        WHERE hypot(id/7e0, (id+1)/7e0)
              != sqrt((id/7e0)*(id/7e0) + ((id+1)/7e0)*((id+1)/7e0))
        LIMIT 1
        """
    ).collect()
    assert rows, "JVM hypot ulp divergence vanished (JDK change?)"
    i = rows[0][0]
    formula = f"sqrt(({i}/7e0)*({i}/7e0) + ({i + 1}/7e0)*({i + 1}/7e0))"
    jvm_hypot = _spark1(spark, f"hypot({i}/7e0, {i + 1}/7e0)")
    spark_formula = _spark1(spark, formula)
    duck_formula = _duck1(duck, formula)
    # The explicit formula agrees bit-for-bit across engines ...
    assert spark_formula == duck_formula
    # ... and hypot legitimately differs from it (the trap).
    assert jvm_hypot != spark_formula


def test_intdiv_truncates_in_duckdb_floor_floors(spark, duck):
    """DuckDB's // truncates toward zero; floor(x/y) floors.  They
    disagree for negative operands (pre-epoch timestamps).  Workaround:
    floor(x/7.0) in oracles (events_psi_drift)."""
    assert _duck1(duck, "(-8) // 7") == -1  # truncation toward zero
    assert _duck1(duck, "CAST(floor(-8 / 7.0) AS BIGINT)") == -2
    assert _spark1(spark, "CAST(floor(-8 / 7.0) AS BIGINT)") == -2
    # Spark's DIV operator truncates too — the floor() spelling is the
    # only one that agrees in both engines for negatives.
    assert _spark1(spark, "(-8) DIV 7") == -1


def test_duckdb_factorial_is_hugeint_needs_bigint_cast(spark, duck):
    """DuckDB's factorial()/!! returns HUGEINT (int128); pyarrow maps it
    to a type the hash comparator treats differently from Spark's
    BIGINT factorial.  Workaround: CAST(factorial(n) AS BIGINT) in the
    oracle (math_functions_extended, relational.py:169)."""
    raw = duck.execute("SELECT factorial(5) AS v").arrow()
    assert str(raw.schema.field("v").type) != "int64"  # the trap
    cast = duck.execute(
        "SELECT CAST(factorial(5) AS BIGINT) AS v"
    ).arrow()
    assert str(cast.schema.field("v").type) == "int64"  # the workaround
    assert _spark1(spark, "factorial(5)") == 120
    assert _duck1(duck, "CAST(factorial(5) AS BIGINT)") == 120


def test_date_diff_counts_boundary_crossings_not_elapsed_micros(duck):
    """DuckDB date_diff('second', a, b) counts SECOND-BOUNDARY
    crossings, not elapsed time: 0.9s apart across a boundary -> 1.
    Workaround: (epoch_us(b) - epoch_us(a)) // 1000000 for elapsed
    seconds (the sessionization oracles)."""
    a = "TIMESTAMP '2024-01-01 00:00:00.95'"
    b = "TIMESTAMP '2024-01-01 00:00:01.05'"
    assert _duck1(duck, f"date_diff('second', {a}, {b})") == 1
    assert (
        _duck1(duck, f"(epoch_us({b}) - epoch_us({a})) // 1000000") == 0
    )


def test_float_sum_is_order_dependent_integer_cents_are_not(spark):
    """IEEE double addition is not associative: the same multiset of
    doubles sums to different binaries under different orders, so any
    cross-engine float SUM is scale/partitioning-dependent.  Workaround:
    integerize to cents and divide ONCE at the end
    (features_target_encoding_loo).  Pin a concrete order-dependent
    triple so 'floats are fine now' can never be assumed silently."""
    assert (0.1 + 0.2) + 0.3 != 0.1 + (0.2 + 0.3)
    # The engine-side demonstration: the integerized form is invariant
    # under any partitioning; 1-partition and 4-partition sums agree.
    df = spark.createDataFrame(
        [(float(v),) for v in (0.1, 0.2, 0.3, 1e15, -1e15)], "x double"
    )
    from pyspark.sql import functions as F

    cents = F.sum(F.round(F.col("x") * 100).cast("bigint"))
    one = df.coalesce(1).agg(cents).collect()[0][0]
    four = df.repartition(4).agg(cents).collect()[0][0]
    assert one == four == 60


def test_bare_decimal_literals_divide_as_decimal_not_double(spark, duck):
    """A bare literal like 7.0 is DECIMAL in BOTH engines, and
    integer/DECIMAL division then runs at each engine's own decimal
    scale rules — Spark and DuckDB disagree in the 7th decimal for
    8/7.0 fed through sqrt.  (Rediscovered writing this very suite:
    the hypot test's first draft used bare literals and the 'formula
    agrees bit-for-bit' assertion failed.)  Workaround: CAST(x AS
    DOUBLE) or an e-notation literal (7e0) whenever an oracle divides."""
    bare_spark = _spark1(spark, "sqrt((8/7.0)*(8/7.0) + (9/7.0)*(9/7.0))")
    bare_duck = _duck1(duck, "sqrt((8/7.0)*(8/7.0) + (9/7.0)*(9/7.0))")
    assert bare_spark != bare_duck  # the trap
    dbl_spark = _spark1(spark, "sqrt((8/7e0)*(8/7e0) + (9/7e0)*(9/7e0))")
    dbl_duck = _duck1(duck, "sqrt((8/7e0)*(8/7e0) + (9/7e0)*(9/7e0))")
    assert dbl_spark == dbl_duck  # the workaround
