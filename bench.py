"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE COMPACT JSON line (the FINAL stdout line, kept under ~1800
chars so it survives the driver's 2000-char tail capture — the r8
lesson: the full per-trial record pushed the line past the window and
BENCH_r08.json recorded `parsed: null`):
  {"metric": "...", "value": <sum of medians>, "unit": "sec",
   "queries": {name: median, ...}, "extended": {...}, "sf": <sf>,
   "full": "BENCH_full_latest.json", ...}

The FULL falsifiability record (per-query median/IQR/trial list/host
telemetry) is written to $SPARK_GRAFT_BENCH_FULL_OUT (default
BENCH_full_latest.json next to this script) — commit it per round as
BENCH_full_r{N}.json.

Each query executes fully (noop sink — JVM-side materialization, no
driver collect) on local[$SPARK_GRAFT_CPUS].

Round-8 change (VERDICT r7 task 1): the bench is now a *falsifiable
instrument*.  Two consecutive rounds attributed regressions on
byte-identical code to host noise with only narrative evidence; now
every query records k trials (headline k=5, extended k=3; override
with $SPARK_GRAFT_BENCH_TRIALS), and the JSON carries per-query
median, IQR, the full trial list, and host telemetry (/proc/loadavg
one-minute load + process count sampled before each trial).  The
headline "value" is the SUM OF MEDIANS — the median is the robust
location estimate; best-of-k (the pre-r8 metric, still emitted as
"best_total_sec"/"queries_best" for the r1-r7 trend line) hides
contention on all-but-one trial but also hides real regressions that
show up as a distribution shift.

Mechanical regression rule (applied by `python bench.py --compare
PREV.json CUR.json` — two driver BENCH_r*.json artifacts, this
script's own compact line, or BENCH_full_r*.json records, in any mix;
with ONE file, CUR defaults to BENCH_full_latest.json.  A wrapper
whose `parsed` is null degrades to regex-recovering medians/IQRs from
its `tail` instead of crashing).  A per-query delta is

  REGRESSION   if median moved > +15% vs prev  AND  IQR/median < 10%
  IMPROVEMENT  if median moved < -15% vs prev  AND  IQR/median < 10%
  NOISE        if median moved > 15% either way but IQR/median >= 10%
               (the measurement is too dispersed to trust the move) or
               the mean 1-min loadavg during trials exceeded 1.5x CPUs
  STABLE       otherwise

The rule is deliberately dumb and stated here so the classification is
reproducible from the two JSON files alone — no narrative required.

Round-14 change (VERDICT r13 "what's wrong" #1): every trial (and every
--all entry) starts with spark.catalog.clearCache(), outside the timed
region, so Spark's CacheManager can never satisfy a later trial from an
earlier trial's InMemoryRelation (ten queries .cache() an intermediate
for within-query alias reuse and never unpersist; canonical-plan
matching made trials 2..k skip that compute).  Medians for the caching
queries are therefore honest cold-run numbers from r14 on — expect a
one-time upward step vs r13 records for the minhash/shingle family.
"""

from __future__ import annotations

import json
import os
import re
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Representative spread: scan+agg, joins (broadcast-heavy Q9 and
# decorrelated Q21 included), windows, text, dedup/LSH, similarity,
# sessionization, JSON, and the fused corpus-prep pipeline.
HEADLINE = [
    "wordcount",
    "tpch_q1_pricing_summary",
    "join_inner",
    "tpch_q3_shipping_priority",
    "tpch_q9_product_profit",
    "tpch_q21_waiting_suppliers",
    "join_asof",
    "window_running_sum",
    "window_session",
    "json_extract_agg",
    "dedup_minhash_lsh",
    "similarity_topk",
    "pipeline_training_corpus",
    "text_dup_ngram_fraction",
    "dedup_decontaminate",
    "bitmap_distinct_users",
]

# Heavy families added after the HEADLINE list froze (r5-r6).  HEADLINE
# stays untouched for cross-round comparability; these get their own
# wall-time guard so regressions in the new families are visible
# round-over-round (VERDICT r5 task 6).
EXTENDED = [
    "text_suffix_array",
    "similarity_ann_ivfpq",
    "bpe_train_3merges",
    "stream_restart_recovery_e2e",
    "dedup_minhash_lsh_capped",
    "stream_stream_full_outer_join_e2e",
    "multimodal_decode_audio_real",
    "stream_session_timer_e2e",
    "stream_chained_window_aggs_e2e",
    "lm_doc_score_kn",
    "stream_session_timeout_gss_e2e",
    # r9: the two new codec queries (VP8L image, Vorbis audio)
    "multimodal_decode_webp_real",
    "multimodal_decode_vorbis_real",
    # r10: tokenizer ENCODE (the daily-ingest op; merge table cached,
    # so this measures encode, not retrain), compressed video (MJPEG
    # through the real JPEG pipeline + the dedupe-before-decode video
    # composite), and lossy WebP (VP8 intra)
    "bpe_encode_corpus",
    "multimodal_decode_mjpeg_real",
    "pipeline_video_corpus",
    "multimodal_decode_vp8_real",
    "multimodal_decode_gif_anim",
    "multimodal_decode_vp8x_real",
    "multimodal_decode_webp_anim",
    # r11: fractional-alpha animated-WebP compositing
    "multimodal_decode_webp_anim_fralpha",
    # r12: the CommonCrawl composite (WARC -> HTML extract -> lang-id
    # -> quality gate -> dedup, one fused plan) and BPE training at
    # realistic depth
    "pipeline_web_corpus",
    "pipeline_web_corpus_inplan",
    "bpe_train_32merges",
    # r13: host-graph PageRank over the extracted link graph, and the
    # learned-classifier gate (solo inference + wired into the web
    # composite)
    "web_host_pagerank",
    "text_quality_classifier",
    "pipeline_web_corpus_classified",
    # r13: anchor text, segment-rewrite dedup, CCNet buckets, SQ8 ANN,
    # bitext mining, and the in-stream learned gate
    "web_anchor_text",
    "dedup_segments_rewrite",
    "ccnet_perplexity_buckets",
    "similarity_ann_sq8",
    "similarity_sq8_recall",
    "bitext_margin_mining",
    # stream_web_classified_gate_e2e is NOT here (r12 precedent: the
    # stream web twins are trigger-latency-dominated and cost ~42 s at
    # sf0.1; their per-round record is the BENCH_sf1 soak section)
    "web_frontier_priority",
    "web_hits_scores",
    "site_template_blocks",
    # r13 OPTIMIZATION round additions (entries only added, never
    # removed/renamed): the two largest non-bench wins of the round,
    # recorded so the next round's --compare can watch them —
    # text_html_extract (extraction tree now evaluated once per row)
    # and dedup_clusters (convergence signal fused into the label
    # checkpoint instead of a per-round join job).
    "text_html_extract",
    "dedup_clusters",
    # and the sf1-soak follow-up: dedup_simhash_pairs emits each pair
    # from its first matching band (pair-level distinct exchange gone;
    # 2.4x at sf1 where the pair set is 105M rows).
    "dedup_simhash_pairs",
    # r14 OPTIMIZATION round additions (entries only added, never
    # removed/renamed): the round's two code wins, recorded so the
    # driver's --compare watches them — dedup_embedding_cosine (Gram
    # matmul through float64 BLAS, bit-exact, ~2.9x) and
    # text_substring_dup_spans (gram-hash table shared between the
    # duplicate test and the hits semi-join; 2 md5 subtrees -> 1).
    "dedup_embedding_cosine",
    "text_substring_dup_spans",
    # and the funnel-composite fixes (shared expensive chains):
    "pipeline_stage_counts",
    "corpus_split_leakage_matrix",
]

REGRESSION_PCT = 0.15  # median must move more than this ...
TIGHT_IQR = 0.10  # ... with relative IQR below this, to be believed
LOAD_FACTOR = 1.5  # mean loadavg > LOAD_FACTOR * cpus => contaminated
# Self-defense against the documented external noisy neighbor (r9: the
# committed webp entry carried trials [25.9, 4.9, 6.3], IQR 10.5 vs
# median 6.26 — ratio 1.68): a burst whose IQR exceeds this multiple of
# its median is re-run ONCE, both attempts recorded, the quieter kept.
# Quiet-host relative IQRs here run <0.1, so 1.0 is a 10x margin while
# still catching the r9 contamination shape (which 2.0 would miss).
RETRY_IQR_FACTOR = 1.0
# r11 hypervisor-contention telemetry thresholds: the fixed-work CPU
# probe (see _host_sample) runs ~5.1-5.3 ms on this host when healthy;
# a burst whose QUIETEST probe exceeds 1.25x that floor, or that lost
# >5% of CPU ticks to steal, is contaminated at the hypervisor level
# even when loadavg reads idle.
# r12 (ADVICE r11 item 1): 5.1 is the FALLBACK only — each bench run
# derives its own floor (min probe over a startup calibration burst,
# tightened by every probe seen during the run via _session_floor), so
# the gate self-calibrates on other hosts instead of marking every
# move NOISE when the fixed-work probe naturally runs slower.
PROBE_FLOOR_MS = 5.1
PROBE_INFLATION_FACTOR = 1.25
STEAL_PCT_NOISE = 5.0
# r11 second retry trigger: the r11 quiet-window run caught a burst of
# [15.4, 13.8, 2.3] (external load arriving mid-burst, load1 6.2->9.4)
# whose relative IQR 0.47 slipped UNDER the 1.0 factor while its
# median sat 5.9x above its best trial.  External load is strictly
# additive, so on a quiet host median/best runs ~1.0-1.1; a spread
# beyond this factor is contamination regardless of IQR shape.
RETRY_SPREAD_FACTOR = 2.0
# r11 (VERDICT r10 task 3): pre-trial load gate.  The r10 committed
# records drifted +10-45% with per-trial telemetry showing external
# load1 6-18 (co-tenant bursts); the IQR retry only catches spikes
# landing MID-burst.  Before each burst, if the host 1-min loadavg
# exceeds LOAD_GATE_LOAD1, wait (polling) up to LOAD_GATE_MAX_WAIT s
# for it to drain, then proceed regardless; the wait and the
# before/after load are recorded in the burst record so a still-loaded
# measurement is self-describing.  8.0 = 0.25x the 32 local cores: an
# idle JVM + OS floor is ~1-3 here, external contamination ran 6-18.
LOAD_GATE_LOAD1 = 8.0
LOAD_GATE_MAX_WAIT = 60.0
LOAD_GATE_POLL = 5.0


def _host_sample() -> dict:
    """One telemetry sample: 1-min loadavg + running process count +
    cumulative steal/total CPU ticks + a fixed-work CPU probe.

    The r11 drift adjudication found bursts uniformly ~40% slower at
    IDLE loadavg (run1 wordcount 0.42 s @ load1 0.8 vs run3 0.70 s @
    load1 0.4) — co-tenant pressure on the physical host shows up as
    hypervisor steal / frequency contention, which loadavg cannot see.
    `cpu_probe_ms` times a fixed pure-Python spin: on a healthy host it
    is constant across a session, so a burst whose probes run >25%
    above the session floor is contaminated regardless of loadavg;
    steal tick deltas across the burst corroborate."""
    try:
        with open("/proc/loadavg") as f:
            load1 = float(f.read().split()[0])
    except OSError:
        load1 = -1.0
    try:
        nproc = sum(1 for d in os.listdir("/proc") if d.isdigit())
    except OSError:
        nproc = -1
    steal = total = -1
    try:
        with open("/proc/stat") as f:
            vals = list(map(int, f.readline().split()[1:]))
        total = sum(vals)
        steal = vals[7] if len(vals) > 7 else -1
    except (OSError, ValueError, IndexError):
        pass
    t0 = time.perf_counter()
    acc = 0
    for i in range(100_000):  # ~5-10 ms of fixed interpreter work
        acc += i * i
    probe_ms = round((time.perf_counter() - t0) * 1000, 2)
    return {
        "load1": load1,
        "nproc": nproc,
        "steal_ticks": steal,
        "total_ticks": total,
        "cpu_probe_ms": probe_ms,
    }


def _await_quiet_host(host_sample) -> dict | None:
    """Pre-burst load gate (r11): poll until load1 <= LOAD_GATE_LOAD1
    or LOAD_GATE_MAX_WAIT elapses.  Returns a record of the wait when
    one happened (None on an already-quiet host).

    r12 (ADVICE r11 item 4): the loop is bounded on BOTH the poll-count
    accumulator and wall-clock ``time.monotonic()`` — when host_sample
    itself crawls under the very load being waited out, the wall bound
    stops the gate from overshooting LOAD_GATE_MAX_WAIT."""
    s0 = host_sample()
    if s0.get("load1", -1.0) <= LOAD_GATE_LOAD1:
        return None
    waited = 0.0
    t0 = time.monotonic()
    s = s0
    while (
        s.get("load1", -1.0) > LOAD_GATE_LOAD1
        and waited < LOAD_GATE_MAX_WAIT
        and time.monotonic() - t0 < LOAD_GATE_MAX_WAIT
    ):
        time.sleep(LOAD_GATE_POLL)
        waited += LOAD_GATE_POLL
        s = host_sample()
    return {
        "waited_s": round(waited, 1),
        "elapsed_s": round(time.monotonic() - t0, 1),
        "load1_before": s0.get("load1"),
        "load1_after": s.get("load1"),
        "still_loaded": s.get("load1", -1.0) > LOAD_GATE_LOAD1,
    }


# r12 (ADVICE r11 item 1 + VERDICT r11 task 8): the probe floor is a
# SESSION measurement, not a constant.  A startup calibration burst
# seeds it; every probe taken during the run can only TIGHTEN it (min).
# PROBE_FLOOR_MS remains the fallback for artifact-only paths
# (--compare on records that predate the floor field).
_SESSION: dict = {"probe_floor_ms": None}


def _probe_floor() -> float:
    return _SESSION["probe_floor_ms"] or PROBE_FLOOR_MS


def _calibrate_probe_floor(host_sample=None, n: int = 15) -> float:
    """Seed the session probe floor: min fixed-work probe over n
    back-to-back samples (~100 ms total).  The min is the right
    estimator — contention only ever inflates the probe.  ADVICE r12:
    if no sample yields a positive probe (only reachable with an
    injected sampler), fall back to PROBE_FLOOR_MS instead of raising
    on an empty min()."""
    host_sample = host_sample or _host_sample
    probes = [
        s["cpu_probe_ms"]
        for s in (host_sample() for _ in range(n))
        if s.get("cpu_probe_ms", 0) > 0
    ]
    floor = min(probes) if probes else PROBE_FLOOR_MS
    _SESSION["probe_floor_ms"] = floor
    return floor


def _note_probe(ms: float) -> None:
    cur = _SESSION["probe_floor_ms"]
    if ms > 0 and (cur is None or ms < cur):
        _SESSION["probe_floor_ms"] = ms


def _measure_one(run_once, trials: int, host_sample=None) -> dict:
    """One trial burst: stats over `trials` timed runs of run_once()."""
    host_sample = host_sample or _host_sample
    gate = _await_quiet_host(host_sample)
    samples: list[float] = []
    host: list[dict] = []
    for _ in range(trials):
        host.append(host_sample())
        samples.append(run_once())
    host.append(host_sample())
    out = {
        "median": round(statistics.median(samples), 3),
        "iqr": round(_iqr(samples), 3),
        "best": round(min(samples), 3),
        "trials": [round(s, 3) for s in samples],
        "host": host,
    }
    if gate is not None:
        out["load_gate"] = gate
    h0, h1 = host[0], host[-1]
    if h0.get("total_ticks", -1) > 0 and h1.get("total_ticks", -1) > 0:
        dt = h1["total_ticks"] - h0["total_ticks"]
        ds = h1.get("steal_ticks", 0) - h0.get("steal_ticks", 0)
        if dt > 0 and ds >= 0:
            out["steal_pct"] = round(100.0 * ds / dt, 2)
    probes = [
        s["cpu_probe_ms"] for s in host if s.get("cpu_probe_ms", 0) > 0
    ]
    if probes:
        out["cpu_probe_ms_min"] = min(probes)
        out["cpu_probe_ms_max"] = max(probes)
        _note_probe(min(probes))
        # r12 probe certification (VERDICT r11 task 8): the burst is
        # self-describing — probe_ok means its quietest probe sat
        # within PROBE_INFLATION_FACTOR of the session floor, i.e. the
        # host was demonstrably healthy while these trials ran.
        out["probe_floor_ms"] = _probe_floor()
        out["probe_ok"] = (
            out["cpu_probe_ms_min"]
            <= PROBE_INFLATION_FACTOR * out["probe_floor_ms"]
        )
    return out


def _measure_with_retry(run_once, trials: int, host_sample=None) -> dict:
    """r9 judge task 7: re-trial a noise-contaminated burst once.

    If the first burst's IQR exceeds RETRY_IQR_FACTOR x its median, OR
    its median exceeds RETRY_SPREAD_FACTOR x its best trial (two
    signatures of an external loadavg spike landing mid-burst —
    quiet-host relative IQRs here run <0.1 and median/best ~1.0-1.1),
    run ONE more burst.  Both attempts are recorded; the attempt with
    the LOWER MEDIAN is kept as the entry (external load is strictly
    additive, so the lower median is always the closer estimate of the
    code's true cost; the r10 lower-relative-IQR rule could keep a
    uniformly-slowed burst), and the other rides along as
    `noisy_attempt`."""

    def _triggers(s: dict) -> list[str]:
        m = max(s["median"], 1e-9)
        out = []
        if s["iqr"] > RETRY_IQR_FACTOR * m:
            out.append("iqr")
        if s["median"] > RETRY_SPREAD_FACTOR * max(s["best"], 1e-9):
            out.append("spread")
        # r12 (VERDICT r11 task 8): an uncertified probe is a retry
        # trigger too — a burst measured on a demonstrably-contended
        # host gets one chance at a clean window before the record
        # ships annotated.
        if s.get("probe_ok") is False:
            out.append("probe")
        return out

    first = _measure_one(run_once, trials, host_sample)
    trig = _triggers(first)
    if not trig:
        return first

    second = _measure_one(run_once, trials, host_sample)

    keep, other = (
        (second, first)
        if second["median"] <= first["median"]
        else (first, second)
    )
    keep = dict(keep)
    keep["retried"] = True
    # ADVICE r11 item 3: record WHICH rule selected this entry, so
    # cross-round compares can tell min-selected medians from
    # single-burst medians.
    keep["retry_trigger"] = trig
    keep["selected_by"] = "lower_median"
    keep["noisy_attempt"] = {
        k: other[k] for k in ("median", "iqr", "best", "trials", "host")
    }
    return keep


def _iqr(xs: list[float]) -> float:
    if len(xs) < 2:
        return 0.0
    q = statistics.quantiles(sorted(xs), n=4, method="inclusive")
    return q[2] - q[0]


def classify(
    name: str, cur: dict, prev_median: float | None, cpus: int
) -> str:
    """Apply the mechanical rule from the module docstring."""
    if prev_median is None or prev_median <= 0:
        return "NEW"
    med = cur["median"]
    rel_move = (med - prev_median) / prev_median
    if abs(rel_move) <= REGRESSION_PCT:
        return "STABLE"
    if cur.get("iqr") is None:
        # Moved >15% but the artifact carries no dispersion data (a
        # compact line or a tail-recovered median) — the rule cannot
        # certify the move either way.
        return "UNVERIFIED"
    rel_iqr = cur["iqr"] / med if med > 0 else float("inf")
    loads = [
        s["load1"] for s in cur.get("host", []) if s.get("load1", -1) >= 0
    ]
    contaminated = bool(loads) and (
        sum(loads) / len(loads) > LOAD_FACTOR * cpus
    )
    # r11: hypervisor-level contention shows up in the fixed-work CPU
    # probe and the steal counters, not in loadavg (the r11 drift ran
    # at load1 0.4).  A burst whose quietest probe sits >25% above the
    # healthy floor, or that lost >5% of CPU to steal, cannot certify
    # a move either way.
    # r12 (ADVICE r11 item 1): prefer the floor recorded IN the
    # artifact (per-session calibration) over the host-specific
    # constant, so --compare stays meaningful on other hosts.
    floor = cur.get("probe_floor_ms") or PROBE_FLOOR_MS
    probe = cur.get("cpu_probe_ms_min")
    if probe and probe > PROBE_INFLATION_FACTOR * floor:
        contaminated = True
    if cur.get("steal_pct", 0) and cur["steal_pct"] > STEAL_PCT_NOISE:
        contaminated = True
    if rel_iqr >= TIGHT_IQR or contaminated:
        return "NOISE"
    return "REGRESSION" if rel_move > 0 else "IMPROVEMENT"


def _recover_from_tail(tail: str) -> dict[str, dict]:
    """Best-effort per-query stats from a truncated driver tail capture
    (the BENCH_r08.json `parsed: null` failure mode).  Recovers every
    complete ``"name": {"median": X, "iqr": Y`` fragment, plus whole
    compact-format name->median dicts if present."""
    stats: dict[str, dict] = {}
    for m in re.finditer(
        r'"([A-Za-z0-9_]+)":\s*\{"median":\s*([0-9.]+),\s*"iqr":\s*([0-9.]+)',
        tail,
    ):
        stats[m.group(1)] = {
            "median": float(m.group(2)),
            "iqr": float(m.group(3)),
        }
    for key in ("queries", "extended"):
        m = re.search(r'"%s":\s*(\{[^{}]*\})' % key, tail)
        if m:
            try:
                for n, v in json.loads(m.group(1)).items():
                    stats.setdefault(
                        n, {"median": float(v), "iqr": None}
                    )
            except (ValueError, TypeError):
                pass
    return stats


def _load_bench(path: str, avoid: set[str] | None = None) -> dict[str, dict]:
    """Load any bench artifact into ``{name: {median, iqr|None, host}}``.

    Accepts this script's compact stdout line, the full per-trial
    record (BENCH_full_r*.json), a pre-r8 best-of-k record, or the
    driver wrapper ``{tail, parsed}`` — including ``parsed: null``,
    which degrades to tail recovery instead of crashing.

    ``avoid``: real paths the ``full`` pointer must NOT be chased into.
    r12 fix: every compact line points at BENCH_full_latest.json, which
    each new run OVERWRITES — so loading an OLD compact as PREV chased
    its pointer into the CURRENT run's record and every compare row
    read ``X -> X``.  run_compare passes CUR's resolved file(s) here
    when loading PREV; the old compact then falls back to its own
    embedded medians (dispersion-free, classified UNVERIFIED on big
    moves — honest, instead of silently self-comparing)."""
    with open(path) as f:
        doc = json.load(f)
    if "parsed" in doc or "tail" in doc:
        parsed = doc.get("parsed")
        if parsed is None:
            return _recover_from_tail(doc.get("tail") or "")
        doc = parsed
    out: dict[str, dict] = {}
    _carry = (
        "cpu_probe_ms_min",
        "probe_floor_ms",
        "probe_ok",
        "steal_pct",
    )

    def _entry(st: dict) -> dict:
        e = {
            "median": st["median"],
            "iqr": st.get("iqr"),
            "host": st.get("host", []),
        }
        for k in _carry:
            if k in st:
                e[k] = st[k]
        return e

    for name, st in (doc.get("stats") or {}).items():
        out[name] = _entry(st)
    # Compact-line medians (and pre-r8 best-of-k values, which the rule
    # treats as location estimates with unknown dispersion).
    for key in ("queries", "extended"):
        for name, v in (doc.get(key) or {}).items():
            if isinstance(v, (int, float)):
                out.setdefault(name, {"median": float(v), "iqr": None})
    # A compact line points at its full record; prefer that for IQRs.
    full = doc.get("full")
    if full and not doc.get("stats"):
        cand = (
            full
            if os.path.isabs(full)
            else os.path.join(os.path.dirname(os.path.abspath(path)), full)
        )
        if avoid and os.path.realpath(cand) in avoid:
            cand = ""
        if cand and os.path.exists(cand):
            try:
                with open(cand) as f:
                    for name, st in (
                        json.load(f).get("stats") or {}
                    ).items():
                        out[name] = _entry(st)
            except (OSError, ValueError):
                pass
    return out


def run_compare(argv: list[str], cpus: int) -> int:
    """`--compare PREV.json [CUR.json]` — classify per-query deltas
    with the mechanical rule, from artifacts alone (no Spark session).
    CUR defaults to BENCH_full_latest.json next to this script."""
    i = argv.index("--compare")
    paths = [a for a in argv[i + 1 :] if not a.startswith("--")][:2]
    if not paths:
        print(
            "usage: python bench.py --compare PREV.json [CUR.json]",
            file=sys.stderr,
        )
        return 2
    if len(paths) == 1:
        paths.append(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "BENCH_full_latest.json",
            )
        )
    try:
        cur = _load_bench(paths[1])
        # PREV must never chase its `full` pointer into CUR's file(s)
        # (BENCH_full_latest.json is overwritten per run — see
        # _load_bench docstring).
        avoid = {os.path.realpath(paths[1])}
        try:
            with open(paths[1]) as f:
                _cur_doc = json.load(f)
            _cur_doc = _cur_doc.get("parsed") or _cur_doc
            full = (_cur_doc or {}).get("full")
            if full:
                avoid.add(
                    os.path.realpath(
                        full
                        if os.path.isabs(full)
                        else os.path.join(
                            os.path.dirname(os.path.abspath(paths[1])),
                            full,
                        )
                    )
                )
        except (OSError, ValueError):
            pass
        prev = _load_bench(paths[0], avoid=avoid)
    except (OSError, ValueError) as ex:
        print(f"cannot load bench artifact: {ex}", file=sys.stderr)
        return 2
    if not cur:
        print(f"no per-query data recoverable from {paths[1]}", file=sys.stderr)
        return 2
    for name in sorted(cur, key=lambda n: cur[n]["median"], reverse=True):
        st = cur[name]
        pm = prev.get(name, {}).get("median")
        print(
            f"{classify(name, st, pm, cpus):>12}"
            f"  {name}: {pm} -> {st['median']} (iqr {st.get('iqr')})"
        )
    dropped = sorted(set(prev) - set(cur))
    if dropped:
        print(f"     DROPPED  {', '.join(dropped)}")
    return 0


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    if "--compare" in sys.argv:
        sys.exit(run_compare(sys.argv, cpus))

    from mincemeatpy_spark.registry import load_all_queries
    from mincemeatpy_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    # Seed the session probe floor BEFORE the JVM spins up (quietest
    # moment of the run); every later probe can only tighten it.
    probe_floor = _calibrate_probe_floor()
    spark = get_spark("mincemeatpy-bench")

    queries = load_all_queries()

    if "--all" in sys.argv:
        # Diagnostic mode: single-run timing of EVERY registered query,
        # slowest first (stderr table; not the driver's JSON contract).
        queries["tpch_q1_pricing_summary"].fn(spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        times = {}
        for name, q in queries.items():
            spark.catalog.clearCache()  # r14: same trial isolation as measure()
            t0 = time.perf_counter()
            try:
                q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                times[name] = round(time.perf_counter() - t0, 2)
            except Exception as ex:  # noqa: BLE001
                times[name] = f"ERROR {type(ex).__name__}"
        for name, sec in sorted(
            times.items(), key=lambda kv: -(kv[1] if isinstance(kv[1], float) else 1e9)
        ):
            print(f"{sec:>8}  {name}", file=sys.stderr)
        return

    # Warm up the JVM (classloading, codegen compiler) and the page cache
    # so per-query timings measure the queries, not startup.  The first
    # trial of each query still pays that query's own one-off codegen
    # compile; with k trials the median sits on steady-state samples.
    queries["tpch_q1_pricing_summary"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    def measure(names: list[str], trials: int) -> dict[str, dict]:
        out: dict[str, dict] = {}
        for name in names:
            q = queries[name]

            def run_once(fn=q.fn):
                # r14 (VERDICT r13 "what's wrong" #1): isolate trials
                # from Spark's CacheManager.  Ten queries legitimately
                # .cache() an intermediate for within-query alias reuse
                # but never unpersist; CacheManager matches by canonical
                # plan, so trials 2..k (and later queries over the same
                # intermediate) would silently substitute trial 1's
                # InMemoryRelation and skip the compute.  Clearing
                # OUTSIDE the timed region makes every trial pay the
                # full cold compute while the within-trial reuse (the
                # legitimate intent of those caches) still works.
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                return time.perf_counter() - t0

            out[name] = _measure_with_retry(run_once, trials)
        return out

    k_head = int(os.environ.get("SPARK_GRAFT_BENCH_TRIALS", "5"))
    # Extended entries are each seconds-heavy; 3 trials still yields a
    # median robust to one contaminated sample at ~half the wall cost.
    k_ext = max(3, k_head - 2)

    head_stats = measure(HEADLINE, k_head)
    ext_stats = (
        {} if "--no-extended" in sys.argv else measure(EXTENDED, k_ext)
    )

    stats = {**head_stats, **ext_stats}
    timings = {n: s["median"] for n, s in head_stats.items()}
    extended = {n: s["median"] for n, s in ext_stats.items()}

    full_out = os.environ.get(
        "SPARK_GRAFT_BENCH_FULL_OUT",
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "BENCH_full_latest.json",
        ),
    )
    full_record = {
        "metric": "headline_queries_total_sec",
        # headline value = SUM OF MEDIANS from r8 on (see module
        # docstring); best-of-k retained alongside for the r1-r7
        # trend line.
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "extended": extended,
        "extended_total_sec": round(sum(extended.values()), 3),
        "best_total_sec": round(
            sum(s["best"] for s in head_stats.values()), 3
        ),
        "queries_best": {n: s["best"] for n, s in head_stats.items()},
        "trials": {"headline": k_head, "extended": k_ext},
        "regression_rule": {
            "flag_pct": REGRESSION_PCT,
            "tight_iqr": TIGHT_IQR,
            "load_factor": LOAD_FACTOR,
        },
        # r12 certification block (VERDICT r11 task 8): the committed
        # record carries its own probe floor and a per-query list of
        # bursts that could NOT be certified host-healthy even after
        # the probe-triggered retry — the judge reads certification
        # state off the artifact alone.
        "probe_floor_ms": round(_probe_floor(), 3),
        "probe_floor_calibration_ms": round(probe_floor, 3),
        # ADVICE r12 item 2: a session whose calibrated floor sits far
        # above the canonical-host fallback was contended from
        # calibration onward — probe_ok then certifies against an
        # inflated floor, so the record carries an explicit flag that
        # distinguishes whole-session contamination from a slow host.
        "probe_floor_suspect": _probe_floor() > 2 * PROBE_FLOOR_MS,
        "probe_uncertified": sorted(
            n for n, s in stats.items() if s.get("probe_ok") is False
        ),
        "probe_certified": all(
            s.get("probe_ok") is not False for s in stats.values()
        ),
        "stats": stats,
    }
    try:
        with open(full_out, "w") as f:
            json.dump(full_record, f)
    except OSError as ex:  # a read-only checkout must not kill the bench
        print(f"warn: cannot write {full_out}: {ex}", file=sys.stderr)
        full_out = None

    print(_compact_line(full_record, full_out))


def _compact_line(full_record: dict, full_out: str | None) -> str:
    """FINAL stdout line: compact (no trials/host/stats) so the whole
    line fits the driver's 2000-char tail capture."""
    compact = {
        k: full_record[k]
        for k in (
            "metric",
            "value",
            "unit",
            "queries",
            "sf",
            "extended",
            "extended_total_sec",
            "best_total_sec",
            "trials",
            "probe_floor_ms",
            "probe_certified",
            "probe_floor_suspect",
        )
        if k in full_record
    }
    if full_out is not None:
        compact["full"] = os.path.basename(full_out)
    line = json.dumps(compact)
    if len(line) > 1900:  # belt-and-braces: medians only, never truncate
        # extended_total_sec rides with extended: a total with no
        # per-query backing cannot be attributed by _load_bench (r9
        # ADVICE).
        for k in ("extended", "extended_total_sec", "trials", "best_total_sec"):
            compact.pop(k, None)
        line = json.dumps(compact)
    return line


if __name__ == "__main__":
    main()
