"""Skew utilities equivalence + property-based DDL parser tests.

The hypothesis tests generate random table definitions, render them as
CREATE TABLE SQL, parse them back, and require a structural round-trip —
the parser-hardening the reference gets from its hand-picked cases
(tests/test_mysql_ch_replicator.py:413–456), generalized."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from mysql_ch_replicator_spark.operators.skew import salted_agg, salted_join
from mysql_ch_replicator_spark.schema.ddl_parser import parse_create_table


# -- salted operators: equivalence with the unsalted plan --------------------

@pytest.fixture()
def skewed(spark):
    # one hot key (0) with 900 rows, a long tail
    rows = [(0, i * 1.0) for i in range(900)] + \
           [(k, k * 1.0) for k in range(1, 101)]
    return spark.createDataFrame(rows, "k long, v double")


def test_salted_agg_equivalence(spark, skewed):
    plain = {(r.k): (r.cnt, r.s) for r in
             skewed.groupBy("k").agg(F.count(F.lit(1)).alias("cnt"),
                                     F.sum("v").alias("s")).collect()}
    salted = {(r.k): (r.cnt, r.s) for r in
              salted_agg(skewed, ["k"],
                         {"cnt": F.count(F.lit(1)), "s": F.sum("v")},
                         {"cnt": F.sum("cnt"), "s": F.sum("s")}).collect()}
    assert salted == plain


def test_salted_join_equivalence(spark, skewed):
    small = spark.createDataFrame([(0, "hot"), (1, "a"), (2, "b")],
                                  "k long, label string")
    plain = sorted((r.k, r.v, r.label)
                   for r in skewed.join(small, "k").collect())
    salted = sorted((r.k, r.v, r.label)
                    for r in salted_join(skewed, small, "k").collect())
    assert salted == plain


# -- property-based DDL parser round-trip ------------------------------------

_ident = st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True)

_types = st.one_of(
    st.just(("int", "")),
    st.just(("bigint", "")),
    st.just(("smallint", "")),
    st.tuples(st.just("varchar"), st.integers(1, 255).map(str)),
    st.tuples(st.just("decimal"),
              st.tuples(st.integers(2, 30), st.integers(0, 2))
              .map(lambda t: f"{max(t[0], t[1] + 1)},{t[1]}")),
    st.just(("text", "")),
    st.just(("date", "")),
    st.just(("datetime", "")),
    st.just(("double", "")),
)


@st.composite
def _tables(draw):
    names = draw(st.lists(_ident, min_size=1, max_size=8, unique=True))
    cols = []
    for n in names:
        base, params = draw(_types)
        unsigned = base in ("int", "bigint", "smallint") and draw(st.booleans())
        nullable = draw(st.booleans())
        cols.append((n, base, params, unsigned, nullable))
    pk = draw(st.sampled_from(names))
    return cols, pk


def _render(cols, pk) -> str:
    lines = []
    for n, base, params, unsigned, nullable in cols:
        t = base + (f"({params})" if params else "")
        if unsigned:
            t += " unsigned"
        line = f"`{n}` {t}"
        if not nullable or n == pk:
            line += " NOT NULL"
        lines.append(line)
    lines.append(f"PRIMARY KEY (`{pk}`)")
    return "CREATE TABLE `t1` (\n  " + ",\n  ".join(lines) + "\n)"


@given(_tables())
@settings(max_examples=200, deadline=None)
def test_ddl_parser_roundtrip(table):
    cols, pk = table
    st_parsed = parse_create_table(_render(cols, pk))
    assert st_parsed.table_name == "t1"
    assert st_parsed.primary_keys == [pk]
    assert [f.name for f in st_parsed.fields] == [c[0] for c in cols]
    for field, (n, base, params, unsigned, nullable) in zip(
            st_parsed.fields, cols):
        assert field.base_type == base
        assert field.params.replace(" ", "") == params
        assert field.unsigned == unsigned
        assert field.nullable == (nullable and n != pk)


@pytest.mark.heavy
def test_connected_components_matches_union_find(spark):
    """Randomized cross-check of the iterative min-label propagation against
    a driver-side union-find on 400 nodes / 300 random edges (seed fixed).
    Long chains and multi-merge components exercise >1 propagation round."""
    import numpy as np

    from mysql_ch_replicator_spark.operators.dedup import connected_components

    rng = np.random.default_rng(3)
    n = 400
    edges = [(int(min(a, b)), int(max(a, b)))
             for a, b in rng.integers(0, n, (300, 2)) if a != b]

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {i: find(i) for i in range(n)}

    pairs = spark.createDataFrame(edges, "a long, b long")
    ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    got = {r.doc_id: r.dup_of
           for r in connected_components(pairs, ids).collect()}
    assert got == expected


def test_closure_partitions_scale_with_edges(spark):
    """The closure loop's shuffle width must derive from |edges| (r4
    verdict: the old repartition(8) constant bottlenecks at a billion
    pairs): small graphs collapse, huge graphs fan out to the clamp."""
    from mysql_ch_replicator_spark.operators.dedup import closure_partitions

    lo = max(1, spark.sparkContext.defaultParallelism // 4)
    hi = int(spark.conf.get("spark.sql.shuffle.partitions")) * 8
    assert closure_partitions(10_000, spark) == lo
    assert closure_partitions(50_000_000, spark) == min(hi, 51)
    assert closure_partitions(10**9, spark) == hi
    # monotone in edge count, always within the clamp
    prev = 0
    for n in (0, 10**4, 10**6, 10**8, 10**10):
        p = closure_partitions(n, spark)
        assert lo <= p <= hi and p >= prev
        prev = p


def test_connected_components_explicit_partitions(spark):
    """Caller-supplied num_partitions is honored and results unchanged."""
    from mysql_ch_replicator_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "a long, b long")
    ids = spark.createDataFrame([(i,) for i in range(1, 13)], "doc_id long")
    got = {r.doc_id: r.dup_of
           for r in connected_components(pairs, ids,
                                         num_partitions=3).collect()}
    assert got[1] == got[2] == got[3] == 1
    assert got[10] == got[11] == 10
    assert got[5] == 5
