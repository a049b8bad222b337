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
