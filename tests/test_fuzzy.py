"""fuzzy_name_pairs: exact-recall blocking vs a naive Python oracle,
including the short-name rescue path and insertion shifts."""

import pytest
from hypothesis import given, settings, strategies as st

from mysql_ch_replicator_spark.operators.dedup import fuzzy_name_pairs


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _naive(names, max_dist):
    uniq = sorted(set(names))
    return {(a, b, _lev(a, b)) for i, a in enumerate(uniq)
            for b in uniq[i + 1:] if 1 <= _lev(a, b) <= max_dist}


def _run(spark, names, max_dist=2):
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = {(r.name_a, r.name_b, r.dist)
           for r in fuzzy_name_pairs(df, "name", max_dist=max_dist).collect()}
    return got


def test_known_pairs(spark):
    names = ["red bolt", "red bolts", "blue bolt", "red colt",
             "grease", "greases", "nut", "nuts", "bat"]
    got = _run(spark, names)
    expect = _naive(names, 2)
    assert got == expect
    assert ("red bolt", "red bolts", 1) in got      # insertion
    assert ("nut", "nuts", 1) in got                # short-name rescue
    assert ("bat", "nut", 2) in got                 # short, 2 substitutions


def test_duplicates_collapse_before_pairing(spark):
    # repeated identical names contribute ONE distinct node, zero pairs
    got = _run(spark, ["same name"] * 50 + ["same namX"])
    assert got == {("same namX", "same name", 1)}


@settings(max_examples=15, deadline=None)
@given(st.lists(st.text(alphabet="abcx ", min_size=1, max_size=12),
                min_size=2, max_size=14))
def test_matches_naive_oracle(spark, names):
    assert _run(spark, names) == _naive(names, 2)


def test_prefix_shift_insertion_found(spark):
    # a front insertion shifts every positional gram; set blocking
    # must still recall the pair
    got = _run(spark, ["abcdefgh", "xabcdefgh"])
    assert got == {("abcdefgh", "xabcdefgh", 1)}
