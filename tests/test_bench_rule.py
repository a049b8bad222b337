"""The bench regression rule (bench.py, r7 judge task 1) is the
instrument every future perf claim flows through — pin its mechanics
so a refactor can't silently change what REGRESSION means.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import LOAD_FACTOR, REGRESSION_PCT, TIGHT_IQR, classify


def _cur(median, iqr, load1=1.0):
    return {"median": median, "iqr": iqr, "host": [{"load1": load1}]}


def test_stable_within_threshold():
    assert classify("q", _cur(1.10, 0.01), 1.0, 32) == "STABLE"
    assert classify("q", _cur(0.90, 0.01), 1.0, 32) == "STABLE"


def test_regression_needs_tight_iqr():
    # +30% with tight IQR => REGRESSION
    assert classify("q", _cur(1.30, 0.05), 1.0, 32) == "REGRESSION"
    # same move, wide IQR => NOISE (measurement too dispersed to trust)
    assert classify("q", _cur(1.30, 0.20), 1.0, 32) == "NOISE"


def test_improvement_symmetric():
    assert classify("q", _cur(0.70, 0.05), 1.0, 32) == "IMPROVEMENT"
    assert classify("q", _cur(0.70, 0.30), 1.0, 32) == "NOISE"


def test_load_contamination_downgrades_to_noise():
    # tight IQR but the host was saturated during trials => NOISE
    loaded = {
        "median": 1.30,
        "iqr": 0.01,
        "host": [{"load1": LOAD_FACTOR * 32 + 1}],
    }
    assert classify("q", loaded, 1.0, 32) == "NOISE"


def test_new_query_has_no_baseline():
    assert classify("q", _cur(1.0, 0.0), None, 32) == "NEW"


def test_thresholds_are_the_documented_ones():
    # the rule's constants are part of the instrument's public contract
    assert REGRESSION_PCT == 0.15
    assert TIGHT_IQR == 0.10
    assert LOAD_FACTOR == 1.5


def test_unverified_when_move_exceeds_threshold_but_no_iqr():
    # A compact line / tail-recovered median has no dispersion data:
    # a >15% move must classify UNVERIFIED, never REGRESSION (r9).
    assert classify("q", {"median": 1.30, "iqr": None}, 1.0, 32) == "UNVERIFIED"
    assert classify("q", {"median": 1.10, "iqr": None}, 1.0, 32) == "STABLE"


def test_tail_recovery_from_truncated_driver_capture():
    from bench import _recover_from_tail

    # the BENCH_r08.json failure mode: a giant JSON line truncated to
    # its last 2000 chars mid-object
    tail = (
        'roc": 278}]}, "qx": {"median": 1.67, "iqr": 0.571, "best": 1.581,'
        ' "trials": [2.722]}, "qy": {"median": 0.5, "iqr": 0.1}, "qz": {"med'
    )
    got = _recover_from_tail(tail)
    assert got == {
        "qx": {"median": 1.67, "iqr": 0.571},
        "qy": {"median": 0.5, "iqr": 0.1},
    }
    # compact-format dicts are recovered as medians with unknown IQR
    got2 = _recover_from_tail('..., "queries": {"a": 1.5, "b": 2.0}, "sf"')
    assert got2["a"] == {"median": 1.5, "iqr": None}


def test_load_bench_handles_all_artifact_shapes(tmp_path):
    import json

    from bench import _load_bench

    # 1. driver wrapper with parsed: null -> tail recovery, no crash
    w = tmp_path / "wrapped.json"
    w.write_text(json.dumps({
        "tail": '"qa": {"median": 2.0, "iqr": 0.2, "best": 1.9}',
        "parsed": None,
    }))
    assert _load_bench(str(w))["qa"]["median"] == 2.0

    # 2. compact line with a "full" pointer -> stats read from the
    #    full record sitting next to the artifact
    (tmp_path / "full.json").write_text(json.dumps({
        "stats": {"qb": {"median": 3.0, "iqr": 0.3, "host": []}}
    }))
    c = tmp_path / "compact.json"
    c.write_text(json.dumps({
        "queries": {"qb": 3.0}, "full": "full.json"
    }))
    assert _load_bench(str(c))["qb"]["iqr"] == 0.3

    # 3. pre-r8 best-of-k record -> medians with unknown IQR
    p = tmp_path / "old.json"
    p.write_text(json.dumps({"queries": {"qc": 4.0}, "extended": {"qd": 5.0}}))
    got = _load_bench(str(p))
    assert got["qc"] == {"median": 4.0, "iqr": None}
    assert got["qd"]["median"] == 5.0
