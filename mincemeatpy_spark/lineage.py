"""Lineage truncation with a reliability knob (r7 judge task 6).

Iterative queries (PageRank, star-contraction CC, prefix-doubling
suffix array, k-means, BPE) re-plan on their own output each round;
without truncation the lineage doubles per iteration and the optimizer
re-analyzes an exponentially growing tree.  ``localCheckpoint`` is the
cheap fix — but it stores blocks on executors, so at cluster scale a
single lost executor makes the truncated lineage UNRECOVERABLE: the
exact single-point-of-failure class SURVEY §2a O11 flags in the
reference (master-RAM merge, mincemeat.py:344-347).

``truncate_eager`` / ``truncate_lazy`` keep the cheap local behavior by
default (right for tests and for clusters where retry-the-job is
acceptable) and switch to RELIABLE checkpoints — written to the fault-
tolerant checkpoint directory, surviving executor loss — when one is
configured, via either:

  * ``SparkContext.setCheckpointDir(...)`` set by the application, or
  * ``$SPARK_GRAFT_CHECKPOINT_DIR`` (applied to the context on first
    use), the operational knob documented in SCALE.md.

Call sites use ``df.transform(truncate_eager)`` so the fluent pipeline
shape is preserved.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def _reliable_dir(df: DataFrame) -> str | None:
    sc = df.sparkSession.sparkContext
    ck = sc.getCheckpointDir()
    if ck:
        return ck
    env = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
    if env:
        sc.setCheckpointDir(env)
        return env
    return None


def _truncate(df: DataFrame, eager: bool) -> DataFrame:
    if _reliable_dir(df) is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def truncate_eager(df: DataFrame) -> DataFrame:
    """Materialize now and truncate lineage (loop-step convention)."""
    return _truncate(df, eager=True)


def truncate_lazy(df: DataFrame) -> DataFrame:
    """Truncate lineage at first materialization (reuse-once convention)."""
    return _truncate(df, eager=False)
