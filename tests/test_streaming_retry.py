"""VERDICT r11 task 1: the transformWithState e2e worker-launch flake
("Python worker failed to connect back" under full-suite load) must be
retried ONCE by ``run_to_completion``'s drive loop, and everything else
must stay loud.  These tests exercise the retry machinery with fake
streaming queries — no Spark session needed — so the classification
and the bounded-retry contract are pinned mechanically."""

from __future__ import annotations

import pytest

from mincemeatpy_spark.streaming.stream_ops import (
    _drive_to_completion_with_retry,
    _is_worker_launch_flake,
)


class _FakeQuery:
    def __init__(self, exc: BaseException | None):
        self.exc = exc
        self.stopped = False

    def processAllAvailable(self):
        if self.exc is not None:
            raise self.exc

    def stop(self):
        self.stopped = True


class _FakeCatalog:
    def __init__(self):
        self.dropped: list[str] = []

    def dropTempView(self, name: str):
        self.dropped.append(name)


class _FakeSpark:
    def __init__(self):
        self.catalog = _FakeCatalog()


_FLAKE_MSG = (
    "Query [id = x] terminated with exception: Job aborted due to stage "
    "failure: org.apache.spark.SparkException: Python worker failed to "
    "connect back."
)


def test_flake_classifier_matches_worker_connect():
    assert _is_worker_launch_flake(RuntimeError(_FLAKE_MSG))
    # marker buried in the cause chain
    outer = RuntimeError("stream died")
    outer.__cause__ = ValueError(_FLAKE_MSG)
    assert _is_worker_launch_flake(outer)
    # a value error / analysis error must NOT classify as a flake
    assert not _is_worker_launch_flake(RuntimeError("column not found"))
    # cycle-safe: self-referential context terminates
    loop = RuntimeError("x")
    loop.__context__ = loop
    assert not _is_worker_launch_flake(loop)


def test_retry_once_on_flake_then_succeed():
    spark = _FakeSpark()
    queries = [_FakeQuery(RuntimeError(_FLAKE_MSG)), _FakeQuery(None)]
    started: list[_FakeQuery] = []

    def start():
        q = queries[len(started)]
        started.append(q)
        return q

    _drive_to_completion_with_retry(spark, start, "t_retry")
    assert len(started) == 2, "flake must trigger exactly one restart"
    assert all(q.stopped for q in started), "both attempts must be stopped"
    assert spark.catalog.dropped == ["t_retry"], (
        "partial memory table must be dropped before the retry"
    )


def test_second_flake_reraises():
    spark = _FakeSpark()
    started: list[_FakeQuery] = []

    def start():
        q = _FakeQuery(RuntimeError(_FLAKE_MSG))
        started.append(q)
        return q

    with pytest.raises(RuntimeError, match="failed to connect back"):
        _drive_to_completion_with_retry(spark, start, "t_twice")
    assert len(started) == 2, "retry is bounded at one restart"


def test_non_flake_error_is_not_retried():
    spark = _FakeSpark()
    started: list[_FakeQuery] = []

    def start():
        q = _FakeQuery(RuntimeError("MICRO_BATCH value mismatch"))
        started.append(q)
        return q

    with pytest.raises(RuntimeError, match="value mismatch"):
        _drive_to_completion_with_retry(spark, start, "t_loud")
    assert len(started) == 1, "non-flake errors must fail on first attempt"
    assert spark.catalog.dropped == []


def test_success_path_single_attempt():
    spark = _FakeSpark()
    q = _FakeQuery(None)
    _drive_to_completion_with_retry(spark, lambda: q, "t_ok")
    assert q.stopped
    assert spark.catalog.dropped == []
