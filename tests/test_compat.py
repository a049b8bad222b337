"""Golden test: the reference's one certified behavior (reference
example.py:4-18, smoke.sh:1), reproduced through the compat API —
compared order-insensitively (FIXTURES.md Fixture 0).
"""

from __future__ import annotations

from mincemeatpy_spark.compat import mapreduce

CORPUS = {
    0: "Humpty Dumpty sat on a wall",
    1: "Humpty Dumpty had a great fall",
    2: "All the King's horses and all the King's men",
    3: "Couldn't put Humpty together again",
}

EXPECTED = {
    "a": 2, "on": 1, "great": 1, "Humpty": 3, "again": 1, "wall": 1,
    "Dumpty": 2, "men": 1, "had": 1, "all": 1, "together": 1, "King's": 2,
    "horses": 1, "All": 1, "Couldn't": 1, "fall": 1, "and": 1, "the": 2,
    "put": 1, "sat": 1,
}


def mapfn(k, v):
    for w in v.split():
        yield w, 1


def reducefn(k, vs):
    return sum(vs)


def test_golden_wordcount(spark):
    assert mapreduce(spark, CORPUS, mapfn, reducefn) == EXPECTED


def test_golden_wordcount_with_collectfn(spark):
    # collectfn = map-side partial sum (reference mincemeat.py:174-176);
    # must not change the result.
    assert mapreduce(spark, CORPUS, mapfn, reducefn, collectfn=reducefn) == EXPECTED


def test_reducefn_required(spark):
    import pytest

    with pytest.raises(TypeError):
        mapreduce(spark, CORPUS, mapfn, None)


def test_non_dict_datasource(spark):
    # Any dict-like: iter() -> keys, [k] -> value (reference mincemeat.py:306,314).
    class Source:
        def __iter__(self):
            return iter(CORPUS)

        def __getitem__(self, k):
            return CORPUS[k]

    assert mapreduce(spark, Source(), mapfn, reducefn) == EXPECTED
