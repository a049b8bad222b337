"""layout_hilbert_clustering's oracle and Spark plan share ONE
expression generator (_hilbert_steps), so an error in the branch-free
unrolling would pass the oracle comparison silently.  This test breaks
that circularity: it evaluates the generated SQL in DuckDB over the
FULL 256x256 grid and pins it against (a) the classic rotate/flip loop
(Wikipedia's xy2d) implemented independently here, and (b) the
defining Hilbert property that consecutive indices are unit-step
adjacent (|dx| + |dy| = 1) across all 65,536 points.
"""

from __future__ import annotations

import duckdb

from mincemeatpy_spark.operators.advanced import _hilbert_sql

_GRID = (
    "SELECT (g.generate_series // 256) AS x,"
    " (g.generate_series % 256) AS y,"
    " (g.generate_series // 256) AS x0,"
    " (g.generate_series % 256) AS y0"
    " FROM generate_series(0, 65535) g"
)


def _xy2d_ref(n: int, x: int, y: int) -> int:
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_generated_sql_matches_reference_loop_exhaustively():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT x0, y0, d FROM ({_hilbert_sql(_GRID, carry=('x0', 'y0'))})"
    ).fetchall()
    assert len(rows) == 65536
    for x0, y0, d in rows:
        assert d == _xy2d_ref(256, x0, y0), (x0, y0, d)


def test_consecutive_hilbert_indices_are_unit_adjacent():
    con = duckdb.connect()
    (bad,) = con.execute(
        f"""
        WITH hil AS (
            SELECT x0, y0, d
            FROM ({_hilbert_sql(_GRID, carry=('x0', 'y0'))})
        )
        SELECT count(*)
        FROM hil a JOIN hil b ON b.d = a.d + 1
        WHERE abs(a.x0 - b.x0) + abs(a.y0 - b.y0) != 1
        """
    ).fetchone()
    assert bad == 0
