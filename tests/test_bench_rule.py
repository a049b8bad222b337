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


def test_compact_fallback_drops_extended_total_with_extended():
    """r9 ADVICE: when the >1900-char fallback strips per-query
    'extended' medians, 'extended_total_sec' must go with them — a
    total with no per-query backing cannot be attributed."""
    import bench

    big_ext = {f"q{i:04d}_{'x' * 40}": 1.234 for i in range(60)}
    rec = {
        "metric": "headline_queries_total_sec",
        "value": 10.0,
        "unit": "sec",
        "queries": {"q1": 1.0},
        "sf": 0.1,
        "extended": big_ext,
        "extended_total_sec": round(sum(big_ext.values()), 3),
        "best_total_sec": 9.0,
        "trials": {"headline": 5, "extended": 3},
    }
    import json

    line = bench._compact_line(rec, "BENCH_full_latest.json")
    assert len(line) <= 1900
    parsed = json.loads(line)
    assert "extended" not in parsed
    assert "extended_total_sec" not in parsed  # rides with extended
    assert parsed["value"] == 10.0 and parsed["queries"] == {"q1": 1.0}

    # small record: everything kept, total paired with its queries
    small = dict(rec, extended={"e1": 2.0}, extended_total_sec=2.0)
    parsed2 = json.loads(bench._compact_line(small, None))
    assert parsed2["extended_total_sec"] == 2.0
    assert parsed2["extended"] == {"e1": 2.0}


def test_iqr_retry_burst():
    """r9 judge task 7: a burst whose IQR > 2x median re-trials ONCE,
    records both attempts, and keeps the quieter one."""
    import bench

    host = lambda: {"load1": 1.0, "nproc": 10}

    # quiet burst: no retry, no extra keys
    quiet = iter([1.0, 1.1, 0.9])
    s = bench._measure_with_retry(lambda: next(quiet), 3, host)
    assert "retried" not in s and "noisy_attempt" not in s
    assert s["median"] == 1.0 and len(s["trials"]) == 3

    # noisy first burst (IQR 24.9 vs median 6.3 — the r9 webp shape),
    # quiet second: second kept, first preserved as noisy_attempt
    seq = iter([25.9, 4.9, 6.3, 1.3, 1.25, 1.4])
    s = bench._measure_with_retry(lambda: next(seq), 3, host)
    assert s["retried"] is True
    assert s["median"] == 1.3
    assert s["iqr"] <= bench.RETRY_IQR_FACTOR * s["median"]
    assert s["noisy_attempt"]["median"] == 6.3
    assert s["noisy_attempt"]["trials"] == [25.9, 4.9, 6.3]

    # both bursts noisy: exactly one retry, LOWER-MEDIAN kept (r11:
    # external load is additive, so the lower median is closer to the
    # code's true cost)
    seq2 = iter([25.0, 1.0, 6.0, 30.0, 1.0, 2.0])
    s = bench._measure_with_retry(lambda: next(seq2), 3, host)
    assert s["retried"] is True
    assert s["median"] == 2.0
    assert s["noisy_attempt"]["median"] == 6.0
    import pytest

    with pytest.raises(StopIteration):  # no third burst ever
        next(seq2)


def test_spread_retry_burst():
    """r11: the spread trigger — a burst whose median exceeds
    RETRY_SPREAD_FACTOR x its best re-trials even when its relative
    IQR is under RETRY_IQR_FACTOR (the r11 webp shape: [15.4, 13.8,
    2.3], rel IQR 0.47, median/best 5.9)."""
    import bench

    host = lambda: {"load1": 1.0, "nproc": 10}
    seq = iter([15.372, 13.834, 2.338, 2.3, 2.4, 2.35])
    s = bench._measure_with_retry(lambda: next(seq), 3, host)
    assert s["retried"] is True
    assert s["median"] == 2.35
    assert s["noisy_attempt"]["median"] == 13.834

    # quiet burst (median/best ~1.04): no retry
    quiet = iter([2.4, 2.3, 2.35])
    s2 = bench._measure_with_retry(lambda: next(quiet), 3, host)
    assert "retried" not in s2


def test_load_gate_waits_then_records(monkeypatch):
    """r11 (VERDICT r10 task 3): a loaded host delays the burst and the
    wait is recorded in the burst record; a quiet host adds nothing."""
    import bench as B

    monkeypatch.setattr(B.time, "sleep", lambda s: None)
    loads = iter([12.0, 11.0, 3.0] + [1.0] * 10)
    fake = lambda: {"load1": next(loads), "nproc": 100}
    rec = B._measure_one(lambda: 0.5, trials=2, host_sample=fake)
    gate = rec["load_gate"]
    assert gate["load1_before"] == 12.0
    assert gate["load1_after"] == 3.0
    assert gate["waited_s"] == 2 * B.LOAD_GATE_POLL
    assert gate["still_loaded"] is False

    quiet = lambda: {"load1": 1.0, "nproc": 100}
    rec2 = B._measure_one(lambda: 0.5, trials=2, host_sample=quiet)
    assert "load_gate" not in rec2


def test_load_gate_gives_up_and_proceeds(monkeypatch):
    """The gate must never stall the bench: after LOAD_GATE_MAX_WAIT it
    proceeds and marks the record still_loaded."""
    import bench as B

    monkeypatch.setattr(B.time, "sleep", lambda s: None)
    fake = lambda: {"load1": 50.0, "nproc": 400}
    rec = B._measure_one(lambda: 0.5, trials=1, host_sample=fake)
    gate = rec["load_gate"]
    assert gate["still_loaded"] is True
    assert gate["waited_s"] >= B.LOAD_GATE_MAX_WAIT


def test_probe_and_steal_contamination_downgrade():
    """r11: hypervisor-level contention (inflated fixed-work probe or
    steal >5%) downgrades a >15% move to NOISE even at idle loadavg
    and tight IQR."""
    import bench

    base = {"median": 12.0, "iqr": 0.1, "host": [{"load1": 0.4}]}
    # healthy probe, no steal: the move certifies as REGRESSION
    cur = dict(base, cpu_probe_ms_min=bench.PROBE_FLOOR_MS, steal_pct=0.0)
    assert bench.classify("q", cur, 10.0, 32) == "REGRESSION"
    # inflated probe: NOISE
    cur = dict(base, cpu_probe_ms_min=2 * bench.PROBE_FLOOR_MS, steal_pct=0.0)
    assert bench.classify("q", cur, 10.0, 32) == "NOISE"
    # heavy steal: NOISE
    cur = dict(base, cpu_probe_ms_min=bench.PROBE_FLOOR_MS, steal_pct=9.0)
    assert bench.classify("q", cur, 10.0, 32) == "NOISE"


def test_probe_floor_is_session_derived(monkeypatch):
    """r12 (ADVICE r11 item 1): the probe floor self-calibrates per
    session — seeded by the startup burst, tightened by every probe
    seen — and PROBE_FLOOR_MS is only the artifact-fallback."""
    import bench as B

    monkeypatch.setitem(B._SESSION, "probe_floor_ms", None)
    probes = iter([9.0, 8.6, 8.9, 9.4])
    fake = lambda: {"load1": 0.5, "cpu_probe_ms": next(probes)}
    floor = B._calibrate_probe_floor(host_sample=fake, n=4)
    assert floor == 8.6 and B._probe_floor() == 8.6
    # a quieter probe later in the run tightens the floor
    B._note_probe(8.2)
    assert B._probe_floor() == 8.2
    # an inflated probe never loosens it
    B._note_probe(12.0)
    assert B._probe_floor() == 8.2


def test_probe_floor_calibration_guards_empty_sample(monkeypatch):
    """ADVICE r12 item 3: an injected sampler that never yields a
    positive probe must fall back to PROBE_FLOOR_MS, not crash main()
    on min() of an empty sequence."""
    import bench as B

    monkeypatch.setitem(B._SESSION, "probe_floor_ms", None)
    dead = lambda: {"load1": 0.5, "cpu_probe_ms": 0.0}
    floor = B._calibrate_probe_floor(host_sample=dead, n=4)
    assert floor == B.PROBE_FLOOR_MS
    assert B._probe_floor() == B.PROBE_FLOOR_MS


def test_record_flags_suspect_session_floor(monkeypatch):
    """ADVICE r12 item 2: a session calibrated on a contended host
    (floor > 2x the canonical fallback) must ship its record flagged
    probe_floor_suspect, and the flag must ride the compact line."""
    import bench as B

    rec = {
        "metric": "m", "value": 1.0, "unit": "sec", "queries": {},
        "sf": 0.1, "probe_floor_ms": 12.0, "probe_certified": True,
        "probe_floor_suspect": True,
    }
    import json as _json

    line = _json.loads(B._compact_line(rec, None))
    assert line["probe_floor_suspect"] is True


def test_burst_records_probe_certification(monkeypatch):
    """Every burst carries probe_floor_ms + probe_ok so the committed
    record is self-describing (VERDICT r11 task 8)."""
    import bench as B

    monkeypatch.setitem(B._SESSION, "probe_floor_ms", 5.0)
    healthy = lambda: {"load1": 0.5, "cpu_probe_ms": 5.2}
    rec = B._measure_one(lambda: 1.0, trials=2, host_sample=healthy)
    assert rec["probe_ok"] is True and rec["probe_floor_ms"] == 5.0

    monkeypatch.setitem(B._SESSION, "probe_floor_ms", 5.0)
    contended = lambda: {"load1": 0.5, "cpu_probe_ms": 9.0}
    rec = B._measure_one(lambda: 1.0, trials=2, host_sample=contended)
    assert rec["probe_ok"] is False


def test_probe_trigger_retries_and_records_rule(monkeypatch):
    """An uncertified burst retries once; the kept entry names the
    trigger and the selection rule (ADVICE r11 item 3)."""
    import bench as B

    monkeypatch.setitem(B._SESSION, "probe_floor_ms", 5.0)
    # 4 host samples per burst (load gate + per-trial + post):
    # burst1 hot, burst2 cool
    probes = iter([9.0, 9.1, 9.2, 9.0, 5.1, 5.2, 5.1, 5.2])
    fake = lambda: {"load1": 0.5, "cpu_probe_ms": next(probes)}
    vals = iter([2.0, 2.1, 1.0, 1.05])
    s = B._measure_with_retry(lambda: next(vals), 2, fake)
    assert s["retried"] is True
    assert s["retry_trigger"] == ["probe"]
    assert s["selected_by"] == "lower_median"
    assert s["median"] == 1.025


def test_classify_prefers_artifact_probe_floor():
    """--compare on a record from a slower host: the floor recorded IN
    the artifact governs, not this host's constant."""
    import bench

    cur = {
        "median": 12.0,
        "iqr": 0.1,
        "host": [{"load1": 0.4}],
        "cpu_probe_ms_min": 8.0,   # >1.25x the 5.1 constant...
        "probe_floor_ms": 7.8,     # ...but healthy for ITS host
    }
    assert bench.classify("q", cur, 10.0, 32) == "REGRESSION"
    cur2 = dict(cur, cpu_probe_ms_min=11.0)  # hot even for its host
    assert bench.classify("q", cur2, 10.0, 32) == "NOISE"


def test_load_gate_wall_clock_bound(monkeypatch):
    """ADVICE r11 item 4: when host_sample itself is slow under load,
    the monotonic wall bound stops the gate at LOAD_GATE_MAX_WAIT even
    though the poll-count accumulator has barely advanced."""
    import bench as B

    monkeypatch.setattr(B.time, "sleep", lambda s: None)
    clock = iter([0.0] + [i * 31.0 for i in range(1, 10)])
    monkeypatch.setattr(B.time, "monotonic", lambda: next(clock))
    fake = lambda: {"load1": 50.0, "nproc": 400}
    gate = B._await_quiet_host(fake)
    assert gate["still_loaded"] is True
    # exited on the wall bound long before waited_s reached the max
    assert gate["waited_s"] < B.LOAD_GATE_MAX_WAIT


def test_compare_prev_never_chases_into_cur_full(tmp_path, capsys):
    """r12: an OLD compact line points `full` at BENCH_full_latest.json,
    which the CURRENT run has overwritten — loading it as PREV must NOT
    resolve into CUR's record (every row would read X -> X)."""
    import json

    import bench as B

    full = tmp_path / "BENCH_full_latest.json"
    full.write_text(
        json.dumps({"stats": {"q": {"median": 9.0, "iqr": 0.1}}})
    )
    prev = tmp_path / "BENCH_r_old.json"
    prev.write_text(
        json.dumps(
            {"queries": {"q": 1.0}, "full": "BENCH_full_latest.json"}
        )
    )
    # direct load still chases the pointer (for CUR that is correct)
    assert B._load_bench(str(prev))["q"]["median"] == 9.0
    # run_compare must keep PREV's own median (1.0), so the move to 9.0
    # is visible (classified UNVERIFIED: no dispersion data on a >15%
    # move from a compact-only PREV... the iqr belongs to CUR, so it
    # actually classifies REGRESSION)
    rc = B.run_compare(["--compare", str(prev), str(full)], cpus=32)
    out = capsys.readouterr().out
    assert rc == 0
    assert "1.0 -> 9.0" in out, out
