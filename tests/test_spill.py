"""Spill-to-disk survival under the test suite (r7 judge task 2).

The reference's merge step holds every reduce input in master RAM
(reference mincemeat.py:344-347) — working set > RAM kills the job.
Spark's external sort/aggregate spills instead; tools/spill_probe.py
proves it query-by-query.  This wrapper drives the probe's fast
configuration in a subprocess (local-mode executor memory can only be
set before the JVM starts, so the starved session must be its own
process): a 600 MB heap with spark.memory.fraction=0.08 forces the
sf0.1 sessionization window's sort to spill, and the probe asserts
BOTH that stage metrics recorded memory+disk spill bytes > 0 AND that
the spilled run still hash-matches its DuckDB oracle.

The sf1 soak configuration (1 GB heap, three queries, ~100-300 MB
spilled each) is recorded in NOTES_r08.md; this test keeps the
property from regressing without the suite paying sf1 wall time.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spilled_query_still_matches_oracle():
    env = dict(os.environ, SPARK_DRIVER_MEMORY="600m")
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(_REPO, "tools", "spill_probe.py"),
            "--sf-dir", "/root/testdata/sf0.1",
            "--fraction", "0.08",
            "--partitions", "2",
            "--cores", "2",
            "--require-disk",
            "window_session",
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=_REPO,
        timeout=600,
    )
    assert "SPILL_PROBE_OK" in r.stdout, (
        f"stdout={r.stdout[-2000:]}\nstderr={r.stderr[-2000:]}"
    )
    rec = json.loads(
        next(ln for ln in r.stdout.splitlines() if ln.startswith("{"))
    )
    assert rec["mem_spilled"] > 0 and rec["disk_spilled"] > 0, rec
    assert rec["oracle_equal"], rec
