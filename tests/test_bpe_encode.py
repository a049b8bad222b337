"""BPE ENCODE semantics (r9 judge task 3).

The encode operator applies a TRAINED merge table; its correctness
contract is that greedy lowest-rank-first merging (the canonical scale
encoder, what _bpe_encode_word implements) equals replaying merges in
rank order (what the SQL oracle unrolls as the s1->s2->s3 recurrence).
The equivalence holds for any table produced by BPE training because a
later merge's output symbol cannot be a component of an earlier merge.
"""

from __future__ import annotations

from mincemeatpy_spark.text.analysis import _bpe_encode_word


def _replay_rank_order(word: str, table: list[tuple[str, str]]) -> list[str]:
    """The oracle's formulation: apply each merge exhaustively
    left-to-right, in rank order."""
    syms = list(word)
    for a, b in table:
        merged: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                merged.append(a + b)
                i += 2
            else:
                merged.append(syms[i])
                i += 1
        syms = merged
    return syms


def test_greedy_equals_rank_order_replay():
    # a chained table of the training-valid shape: each merge's parts
    # exist before it (chars or earlier merges)
    table = [("t", "h"), ("th", "e"), ("i", "n"), ("the", "in")]
    ranks = {p: i for i, p in enumerate(table)}
    for w in [
        "the", "thethe", "thein", "theinthein", "tthhee", "inthe",
        "t", "", "xyz", "ththth", "thee", "hte", "einein", "theintheinthe",
    ]:
        assert _bpe_encode_word(w, ranks, {}) == _replay_rank_order(w, table), w


def test_merge_all_occurrences_left_to_right():
    ranks = {("a", "b"): 0}
    assert _bpe_encode_word("ababab", ranks, {}) == ["ab", "ab", "ab"]
    # left-to-right canonical choice on overlap-shaped input (a<>b so
    # occurrences cannot truly overlap, but adjacency shifts matter)
    assert _bpe_encode_word("aab", ranks, {}) == ["a", "ab"]
    assert _bpe_encode_word("abb", ranks, {}) == ["ab", "b"]


def test_rank_priority_not_position():
    # lower-rank pair merges first even when a higher-rank pair appears
    # earlier in the word
    table = [("c", "d"), ("a", "b")]
    ranks = {p: i for i, p in enumerate(table)}
    # "abcd": (c,d) is rank 0 -> merge first; then (a,b)
    assert _bpe_encode_word("abcd", ranks, {}) == ["ab", "cd"]
    # chained: (b,c) rank 0 consumes the b, blocking (a,b) rank 1
    ranks2 = {("b", "c"): 0, ("a", "b"): 1}
    assert _bpe_encode_word("abc", ranks2, {}) == ["a", "bc"]


def test_word_cache_is_used_and_correct():
    ranks = {("a", "b"): 0}
    cache: dict[str, list[str]] = {}
    first = _bpe_encode_word("abab", ranks, cache)
    assert first == ["ab", "ab"]
    assert cache["abab"] == first
    # poisoning the cache proves the hit path is taken
    cache["abab"] = ["HIT"]
    assert _bpe_encode_word("abab", ranks, cache) == ["HIT"]


def test_untrained_word_stays_chars():
    assert _bpe_encode_word("xyz", {("a", "b"): 0}, {}) == ["x", "y", "z"]
    assert _bpe_encode_word("q", {}, {}) == ["q"]
