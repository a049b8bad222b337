"""Property-based check of the mapreduce() compat API.

``_model`` is a direct pure-Python transcription of the reference's
dataflow semantics — per-task map with per-key grouping (reference
mincemeat.py:167-173), optional collectfn rewrap (mincemeat.py:174-176),
global extend-merge (mincemeat.py:344-347), per-key reduce
(mincemeat.py:179-182).  For any datasource and any commutative/
associative reduce, the Spark execution must agree with the model
exactly; Hypothesis searches the input space instead of us picking
fixtures.  (Non-commutative reduces are excluded by the reference's own
contract: value order is worker-arrival order, SURVEY.md §1.3.)
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from mincemeatpy_spark.compat import mapreduce


def _model(datasource, mapfn, reducefn, collectfn=None):
    map_results: dict = {}
    for k in datasource:
        out: dict = {}
        for k2, v2 in mapfn(k, datasource[k]):
            out.setdefault(k2, []).append(v2)
        if collectfn is not None:
            out = {k2: [collectfn(k2, vs)] for k2, vs in out.items()}
        for k2, vs in out.items():
            map_results.setdefault(k2, []).extend(vs)
    return {k: reducefn(k, vs) for k, vs in map_results.items()}


def _tag_mapfn(k, v):
    # 1..n output pairs per input (flatMap), key derived from value.
    for x in v:
        yield x % 5, x


def _sum_reduce(k, vs):
    return sum(vs)


def _max_reduce(k, vs):
    return max(vs)


_DATASOURCES = st.dictionaries(
    st.integers(min_value=0, max_value=50),
    st.lists(st.integers(min_value=-100, max_value=100), max_size=8),
    max_size=12,
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@_SETTINGS
@given(ds=_DATASOURCES)
def test_sum_reduce_matches_model(spark, ds):
    assert mapreduce(spark, ds, _tag_mapfn, _sum_reduce) == _model(
        ds, _tag_mapfn, _sum_reduce
    )


@_SETTINGS
@given(ds=_DATASOURCES)
def test_collectfn_is_semantics_preserving(spark, ds):
    # With an associative reduce, adding the combiner must not change the
    # result — the reference's collectfn contract (mincemeat.py:174-176).
    with_c = mapreduce(spark, ds, _tag_mapfn, _sum_reduce, collectfn=_sum_reduce)
    without_c = mapreduce(spark, ds, _tag_mapfn, _sum_reduce)
    assert with_c == without_c == _model(ds, _tag_mapfn, _sum_reduce, _sum_reduce)


@_SETTINGS
@given(ds=_DATASOURCES)
def test_max_reduce_matches_model(spark, ds):
    assert mapreduce(spark, ds, _tag_mapfn, _max_reduce) == _model(
        ds, _tag_mapfn, _max_reduce
    )
