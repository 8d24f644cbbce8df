"""Pure-Python cross-checks of the round-6 late additions (temporal join,
fixed-point PageRank, segmented inverted index, compaction planner, skew
advisor, feature backfill, semantic decontamination) — the
oracle-independence layer: DuckDB proves cross-engine agreement, these
prove the shared semantics are the INTENDED ones."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F


def test_temporal_join_point_in_time(spark):
    """Each fact picks exactly the dim version whose [from, to) interval
    contains its timestamp; facts before any version get NULLs; the join
    never fans out (one output row per fact)."""
    from mysql_ch_replicator_spark.operators.replica import (
        scd2_history, temporal_join)

    dim = spark.createDataFrame(
        [(1, "a", 10), (1, "b", 30), (2, "x", 20)],
        "k long, payload string, _seq long")
    hist = scd2_history(dim, ["k"])
    facts = spark.createDataFrame(
        [(100, 1, 5), (101, 1, 10), (102, 1, 29), (103, 1, 30),
         (104, 1, 99), (105, 2, 19), (106, 2, 20), (107, 3, 50)],
        "fid long, k long, at long")
    out = {r.fid: r.payload
           for r in temporal_join(facts, hist.select("k", "payload",
                                                     "valid_from",
                                                     "valid_to"),
                                  ["k"], "at").collect()}
    assert out == {100: None, 101: "a", 102: "a", 103: "b", 104: "b",
                   105: None, 106: "x", 107: None}
    assert temporal_join(facts, hist.select(
        "k", "payload", "valid_from", "valid_to"), ["k"], "at").count() == 8


def test_pagerank_matches_python_fixed_point(spark):
    """Spark ranks == a literal python run of the documented fixed-point
    update on a crafted weighted digraph (hub/authority asymmetry)."""
    from mysql_ch_replicator_spark.operators.graph import SCALE, pagerank

    edge_rows = [("a", "b", 3), ("a", "c", 1), ("b", "c", 2),
                 ("c", "a", 1), ("d", "c", 5)]
    edges = spark.createDataFrame(edge_rows, "s string, t string, wt long")
    got = {r.node: r.rank for r in pagerank(edges, iterations=3).collect()}

    nodes = {n for e in edge_rows for n in e[:2]}
    outw = {}
    for s, _, w in edge_rows:
        outw[s] = outw.get(s, 0) + w
    rank = {n: SCALE for n in nodes}
    base = 15 * SCALE // 100
    for _ in range(3):
        acc = {n: 0 for n in nodes}
        for s, t, w in edge_rows:
            acc[t] += w * (rank[s] // outw[s])
        rank = {n: base + (85 * acc[n]) // 100 for n in nodes}
    assert got == rank
    # authority check: c (most in-weight) outranks the pure hub d
    assert got["c"] > got["d"]


def test_inverted_index_segments(spark):
    """Span-based segmentation: postings land in seg = doc_id div span,
    sorted in-segment; df counts corpus-wide distinct docs; duplicate
    occurrences within a doc collapse."""
    from mysql_ch_replicator_spark.operators.retrieval import (
        build_inverted_index)

    docs = spark.createDataFrame(
        [(0, "cat dog cat"), (1, "cat"), (4, "dog cat"), (5, "cat fish")],
        "doc_id long, text string")
    out = {(r.term, r.seg): (r.seg_n, r.postings, r.df)
           for r in build_inverted_index(docs, span=4).collect()}
    assert out == {
        ("cat", 0): (2, "0,1", 4),
        ("cat", 1): (2, "4,5", 4),
        ("dog", 0): (1, "0", 2),
        ("dog", 1): (1, "4", 2),
        ("fish", 1): (1, "5", 1),
    }


def test_plan_compaction_next_fit(spark):
    """Bins follow the prefix-sum rule (cum_before div target) per
    partition; totals and file ranges aggregate per bin."""
    from mysql_ch_replicator_spark.optimizer import plan_compaction

    rows = [("p", 0, 60), ("p", 1, 60), ("p", 2, 60),  # cum_before 0,60,120
            ("p", 3, 200),                             # cum_before 180
            ("q", 0, 500)]
    files = spark.createDataFrame(rows, "part string, file_id long, bytes long")
    out = {(r.part, r.bin): (r.n_files, r.total_bytes, r.first_file,
                             r.last_file)
           for r in plan_compaction(files, ["part"], 100).collect()}
    assert out == {
        ("p", 0): (2, 120, 0, 1),   # cum_before 0 and 60 -> bin 0
        ("p", 1): (2, 260, 2, 3),   # cum_before 120 and 180 -> bin 1
        ("q", 0): (1, 500, 0, 0),
    }


def test_skew_advisor_report(spark):
    """ppm shares and ceil-based salt factors over a crafted hot key."""
    from mysql_ch_replicator_spark.operators.skew import skew_advisor

    rows = ([("hot",)] * 70) + ([("warm",)] * 20) + ([("cold",)] * 10)
    df = spark.createDataFrame(rows, "k string")
    out = {r.k: (r.key_rows, r.share_ppm, r.salt_factor, r.rank)
           for r in skew_advisor(df, ["k"], n_partitions=4, top=2).collect()}
    assert out == {
        "hot": (70, 700000, 3, 1),   # ceil(70*4/100) = 3
        "warm": (20, 200000, 1, 2),
    }


def test_feature_backfill_leakage_guard(spark):
    """Events at or after a cutoff are invisible to it; each cutoff sees
    its own strict prefix."""
    from mysql_ch_replicator_spark.operators.features import feature_backfill

    events = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "purchase", 10.0),
         (1, "2024-01-05 00:00:00", "click", 0.0),
         (1, "2024-01-10 00:00:00", "purchase", 5.0),
         (2, "2024-01-12 00:00:00", "click", 0.0)],
        "user_id long, ts string, event_type string, value double") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    out = {(r.user_id, str(r.cutoff)): (r.n_events, r.n_purchase,
                                        str(r.spend))
           for r in feature_backfill(
               events, ["2024-01-05 00:00:00", "2024-01-15 00:00:00"])
           .collect()}
    assert out == {
        (1, "2024-01-05 00:00:00"): (1, 1, "10.00"),
        (1, "2024-01-15 00:00:00"): (3, 2, "15.00"),
        (2, "2024-01-15 00:00:00"): (1, 0, "None"),
    }


def test_semantic_contamination_matches_python(spark):
    """Match counts and best-eval argmax against a literal cosine sweep."""
    from mysql_ch_replicator_spark.operators.contamination import (
        semantic_contamination)

    vecs = {1: [1.0, 0.0], 2: [0.9, 0.1], 3: [0.0, 1.0],
            100: [1.0, 0.05], 101: [0.0, 0.9]}
    rows = [(k, v) for k, v in sorted(vecs.items())]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    train = df.where(F.col("vec_id") < 100)
    ev = df.where(F.col("vec_id") >= 100)
    got = {r.vec_id: (r.n_matches, r.eval_id, r.cos)
           for r in semantic_contamination(train, ev, threshold=0.9)
           .collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return round(d / (math.sqrt(sum(x * x for x in a))
                          * math.sqrt(sum(y * y for y in b))), 6)

    expect = {}
    for t in (1, 2, 3):
        hits = [(cos([float(f) for f in map(float, vecs[t])], vecs[e]), e)
                for e in (100, 101)]
        hits = [(c, e) for c, e in hits if c >= 0.9]
        if hits:
            best = sorted(hits, key=lambda ce: (-ce[0], ce[1]))[0]
            expect[t] = (len(hits), best[1], best[0])
    assert set(got) == set(expect)
    for t in expect:
        assert got[t][0] == expect[t][0] and got[t][1] == expect[t][1]
        assert abs(got[t][2] - expect[t][2]) < 2e-6


def test_pagerank_redistribute_matches_python_and_conserves_mass(spark):
    """redistribute=True: each iteration adds dang idiv N to every
    node's accumulator before damping (python model agreement on a graph
    WITH a dangling node), and total mass stays within idiv-truncation
    error of |V|*SCALE — the property the default drop-mode forfeits."""
    from mysql_ch_replicator_spark.operators.graph import SCALE, pagerank

    edge_rows = [("a", "b", 3), ("a", "c", 1), ("b", "c", 2),
                 ("c", "a", 1), ("d", "c", 5), ("c", "e", 2)]
    edges = spark.createDataFrame(edge_rows, "s string, t string, wt long")
    got = {r.node: int(r.rank)
           for r in pagerank(edges, iterations=3,
                             redistribute=True).collect()}

    nodes = {n for e in edge_rows for n in e[:2]}
    outw = {}
    for s, _, w in edge_rows:
        outw[s] = outw.get(s, 0) + w
    rank = {n: SCALE for n in nodes}
    base = 15 * SCALE // 100
    for _ in range(3):
        acc = {n: 0 for n in nodes}
        for s, t, w in edge_rows:
            acc[t] += w * (rank[s] // outw[s])
        dang = sum(rank[n] for n in nodes if n not in outw)
        share = dang // len(nodes)
        rank = {n: base + (85 * (acc[n] + share)) // 100 for n in nodes}
    assert got == rank
    # mass conservation: within per-node idiv truncation of |V|*SCALE
    total = sum(got.values())
    assert abs(total - len(nodes) * SCALE) < len(nodes) * 300
    # and the drop-mode total is strictly smaller on this graph
    dropped = sum(int(r.rank)
                  for r in pagerank(edges, iterations=3).collect())
    assert dropped < total


def test_ngram_posting_cap_report_counts(spark):
    """The audit's numbers are the literal set arithmetic: with cap=2 on
    a corpus where shingle X appears in 3 docs and the rest in ≤2, X is
    the one dropped shingle, its 3 postings the dropped postings, and
    max_df_seen = 3 — and ngram_jaccard_dedup under the same cap indeed
    loses the pair only X connected."""
    from mysql_ch_replicator_spark.operators.dedup import (
        ngram_jaccard_dedup, ngram_posting_cap_report)

    docs = spark.createDataFrame(
        [(1, "red green blue alpha"),      # shingle "red green blue" etc.
         (2, "red green blue beta"),
         (3, "red green blue gamma"),
         (4, "one two three four"),
         (5, "one two three four")],
        "doc_id long, text string")
    rep = ngram_posting_cap_report(docs, shingle_n=3, max_posting=2).first()
    # shingles: doc1-3 share "red green blue" (df=3, dropped), each has
    # one unique trailing shingle (df=1); doc4-5 share both of theirs
    assert rep.max_df_seen == 3
    assert rep.n_dropped_shingles == 1
    assert rep.n_dropped_postings == 3
    assert rep.n_shingles == 1 + 3 + 2   # hot + 3 unique + 2 shared

    # under that cap docs 1-3 lose their only common shingle: no pair
    # survives for them, while 4/5 still dedup
    dup = {r.doc_id: r.dup_of
           for r in ngram_jaccard_dedup(docs, shingle_n=3, threshold=0.5,
                                        max_posting=2).collect()}
    assert dup[5] == 4 and dup[1] == 1 and dup[2] == 2 and dup[3] == 3
    # with a generous cap the triple collapses
    dup2 = {r.doc_id: r.dup_of
            for r in ngram_jaccard_dedup(docs, shingle_n=3, threshold=0.3,
                                         max_posting=100).collect()}
    assert dup2[2] == 1 and dup2[3] == 1


def test_containment_contamination_asymmetry(spark):
    """Containment ranks an eval example EMBEDDED in a big training doc
    at 1e6 (full containment) even though Jaccard is tiny; a doc sharing
    half the eval grams scores 500000; disjoint docs don't appear; ties
    break on the smaller eval id."""
    from mysql_ch_replicator_spark.operators.contamination import (
        containment_contamination)

    eval_doc = "alpha beta gamma delta epsilon"          # 2 distinct 4-grams
    train = spark.createDataFrame(
        [(1, "intro words here " + eval_doc + " trailing boilerplate "
             "of a much larger crawl page that dilutes jaccard a lot"),
         (2, "alpha beta gamma delta unrelated tail"),    # 1 of 2 grams
         (3, "completely different text with no overlap at all")],
        "doc_id long, text string")
    ev = spark.createDataFrame([(100, eval_doc)], "doc_id long, text string")

    got = {r.doc_id: (r.eval_id, r.n_shared, r.containment6)
           for r in containment_contamination(train, ev, n=4).collect()}
    assert got[1] == (100, 2, 1_000_000)
    assert got[2] == (100, 1, 500_000)
    assert 3 not in got

    # tie-break: two eval docs fully contained -> smaller eval id wins
    ev2 = spark.createDataFrame(
        [(200, "alpha beta gamma delta epsilon"),
         (150, "intro words here alpha")],
        "doc_id long, text string")
    got2 = {r.doc_id: r.eval_id
            for r in containment_contamination(train, ev2, n=4).collect()}
    assert got2[1] == 150


def test_dedup_cluster_stats_histogram(spark):
    """The audit is the literal histogram of the mapping: sizes total
    the corpus, removals = docs - clusters; composes over any family's
    (doc_id, dup_of) mapping (exact and closure-mapped inputs agree
    with the python model)."""
    from mysql_ch_replicator_spark.operators.dedup import (
        dedup_cluster_stats, exact_dedup)

    docs = spark.createDataFrame(
        [(1, "aaa"), (2, "aaa"), (3, "aaa"),       # size-3 cluster
         (4, "bbb"), (5, "bbb"),                   # size-2
         (6, "ccc"), (7, "ddd")],                  # singletons
        "doc_id long, text string")
    got = {r.cluster_size: (r.n_clusters, r.n_docs, r.n_removed)
           for r in dedup_cluster_stats(exact_dedup(docs)).collect()}
    assert got == {3: (1, 3, 2), 2: (1, 2, 1), 1: (2, 2, 0)}
    assert sum(d for _, d, _ in got.values()) == 7          # totals corpus
    assert sum(r for _, _, r in got.values()) == 7 - 4      # docs - clusters


def test_bm25_indexed_equals_corpus_scan_and_prunes(spark, tmp_path):
    """The persisted lexical index returns bit-identical BM25 results to
    the corpus-scan scorer for several term sets, its probe plan prunes
    partitions to the query terms' shards with the term filter pushed
    into the scan, and the corpus parquet never appears in the probe
    plan."""
    import contextlib
    import io

    from mysql_ch_replicator_spark.operators.retrieval import (
        bm25_indexed_topk, bm25_topk, write_lexical_index)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "lexidx")
    write_lexical_index(docs, path, shards=8)

    for terms in (["hash", "merge"], ["vector"], ["nosuchterm"],
                  ["MERGE", "merge"]):
        a = sorted((r.doc_id, str(r.score), r.rank)
                   for r in bm25_topk(docs, terms, k=10).collect())
        b = sorted((r.doc_id, str(r.score), r.rank)
                   for r in bm25_indexed_topk(spark, path, terms,
                                              k=10).collect())
        assert a == b, terms

    probe = bm25_indexed_topk(spark, path, ["hash", "merge"], k=10)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probe.explain("formatted")
    plan = buf.getvalue()
    assert "documents.parquet" not in plan       # corpus never read
    scans = [b for b in plan.split("\n\n")
             if "postings" in b and "PartitionFilters" in b]
    assert scans and "shard" in scans[0].split("PartitionFilters")[1] \
        .split("\n")[0]
    assert "In(term" in plan                      # term pushdown


def test_lexical_index_upsert_matches_rebuild(spark, tmp_path):
    """upsert_lexical_index == a from-scratch rebuild of the updated
    corpus: identical postings (df recomputed exactly, a term whose last
    posting vanishes leaves the index), identical doclen and descriptor
    scalars, untouched term shards byte-untouched, and a second
    identical upsert is a no-op on state (idempotent recovery)."""
    import json
    import os

    from mysql_ch_replicator_spark.operators.retrieval import (
        upsert_lexical_index, write_lexical_index)

    def dump(path):
        post = sorted(tuple(r) for r in spark.read.parquet(
            path + "/postings").select("term", "doc_id", "tf", "df")
            .collect())
        dl = sorted(tuple(r) for r in spark.read.parquet(
            path + "/docmeta").select("doc_id", "dl").collect())
        memb = sorted((r.doc_id, tuple(sorted(r.shards)))
                      for r in spark.read.parquet(
                          path + "/docmeta").collect())
        meta = json.load(open(os.path.join(path, "_lex_meta.json")))
        return post, dl, memb, meta

    # disjoint vocabularies -> the batch touches only its own shards
    base = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "gamma delta"),
         (3, "zeta zeta eta"), (4, "theta iota")],
        "doc_id long, text string")
    adds = spark.createDataFrame(
        [(2, "gamma gamma NEW"), (9, "gamma kappa")],  # re-add 2 + new 9
        "doc_id long, text string")
    removes = spark.createDataFrame([(3,)], "doc_id long")

    inc = str(tmp_path / "inc")
    write_lexical_index(base, inc, shards=8)
    before = {}
    pdir = os.path.join(inc, "postings")
    for d in os.listdir(pdir):
        if d.startswith("shard="):
            full = os.path.join(pdir, d)
            before[d] = sorted((f, os.path.getmtime(os.path.join(full, f)))
                               for f in os.listdir(full))
    touched = upsert_lexical_index(spark, inc, adds=adds, removes=removes)

    updated = (base.where("doc_id NOT IN (2, 3)")
               .unionByName(adds))
    full_path = str(tmp_path / "full")
    write_lexical_index(updated, full_path, shards=8)
    assert dump(inc) == dump(full_path)

    # 'zeta'/'eta' (doc 3's only terms) are gone entirely
    terms = {r.term for r in spark.read.parquet(pdir).collect()}
    assert "zeta" not in terms and "eta" not in terms
    assert "new" in terms and "kappa" in terms

    # untouched shards byte-untouched
    for d, files in before.items():
        if int(d.split("=")[1]) in touched["shards"]:
            continue
        full = os.path.join(pdir, d)
        assert sorted((f, os.path.getmtime(os.path.join(full, f)))
                      for f in os.listdir(full)) == files, d

    # idempotent recovery: same upsert again, state unchanged
    want = dump(inc)
    upsert_lexical_index(spark, inc, adds=adds, removes=removes)
    assert dump(inc) == want


def test_constraint_report_rule_algebra(spark):
    """Every rule kind against crafted rows with known violation counts;
    null semantics (accepted_values/range fault only non-null values);
    rule_ids follow input order; unknown rules and empty lists raise."""
    import pytest as _pytest

    from mysql_ch_replicator_spark.operators.quality import (
        constraint_report)

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 50.0), (None, "q", None),
         (2, None, 0.5), (3, "b", -1.0)],
        "id long, cat string, x double")
    dim = spark.createDataFrame([(1,), (2,)], "id long")
    rep = {r.rule_id: (r.rule, r.target, r.n_rows, r.n_violations,
                       r.passed)
           for r in constraint_report(df, [
               {"rule": "not_null", "col": "id"},
               {"rule": "unique", "cols": ["id"]},
               {"rule": "accepted_values", "col": "cat",
                "values": ["a", "b"]},
               {"rule": "range", "col": "x", "lo": 0.0, "hi": 10.0},
               {"rule": "ref", "col": "id", "ref": dim,
                "ref_col": "id"},
           ], table="t").collect()}
    assert rep[0] == ("not_null", "id", 5, 1, False)
    # row-value distinct: the NULL id is its own key tuple (SQL
    # count(DISTINCT (id)) semantics), so only the duplicated id=2 faults
    assert rep[1] == ("unique", "id", 5, 1, False)   # 5 - {1,2,3,NULL}
    assert rep[2] == ("accepted_values", "cat", 5, 1, False)  # 'q' only
    assert rep[3] == ("range", "x", 5, 2, False)     # 50.0 and -1.0
    assert rep[4] == ("ref", "id->id", 5, 1, False)  # id=3 unmatched

    with _pytest.raises(ValueError, match="unknown rule"):
        constraint_report(df, [{"rule": "nope"}]).collect()
    with _pytest.raises(ValueError, match="empty"):
        constraint_report(df, [])


def test_constraint_report_unique_null_tuples(spark):
    """Row-value distinct semantics for the unique rule: a tuple with a
    NULL component still counts as a distinct key (SQL
    count(DISTINCT (a,b)) behavior) — countDistinct over the column
    LIST would skip it and report a phantom violation."""
    from mysql_ch_replicator_spark.operators.quality import (
        constraint_report)

    df = spark.createDataFrame(
        [(1, 1), (1, 1), (5, None)], "a long, b long")
    r = constraint_report(df, [{"rule": "unique", "cols": ["a", "b"]}],
                          table="t").first()
    assert (r.n_rows, r.n_violations, r.passed) == (3, 1, False)


def test_hdr_bucket_monotone_and_invertible_hypothesis(spark):
    """Hypothesis sweep of the HDR bucket arithmetic (pure-python twin
    of the column expressions, already pinned equal to Spark in
    test_sketch): buckets are monotone in the value, the lower bound
    inverts into the right bucket, and the relative error bound
    lb <= v < lb*(1+1/16)+1 holds for every non-negative int64."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tests.test_sketch import _hdr_bucket_py, _hdr_lb_py

    @given(st.integers(min_value=0, max_value=2**62),
           st.integers(min_value=0, max_value=2**62))
    @settings(max_examples=300, deadline=None)
    def check(a, b):
        ba, bb = _hdr_bucket_py(a), _hdr_bucket_py(b)
        if a <= b:
            assert ba <= bb
        lb = _hdr_lb_py(ba)
        assert _hdr_bucket_py(lb) == ba
        assert lb <= a <= lb * 17 // 16 + 1

    check()


def test_pagerank_idiv_exact_hypothesis(spark):
    """The remainder-subtracted decimal division is EXACT integer
    division for arbitrary non-negative operands — including past 2^63,
    where `div` (bigint) wraps; spot-checked through a real Spark plan
    over hypothesis-drawn operand pairs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mysql_ch_replicator_spark.operators.graph import _idiv

    pairs = []

    @given(st.integers(min_value=0, max_value=10**30),
           st.integers(min_value=1, max_value=10**15))
    @settings(max_examples=80, deadline=None)
    def gather(n, d):
        pairs.append((n, d))

    gather()
    pairs.append((2**64, 7))             # past int64 by construction
    df = spark.createDataFrame(
        [(str(n), str(d)) for n, d in pairs], "n string, d string")
    got = df.select(
        "n", "d",
        _idiv(F.col("n").cast("decimal(38,0)"),
              F.col("d").cast("decimal(38,0)")).alias("q")).collect()
    for r in got:
        assert int(r.q) == int(r.n) // int(r.d), (r.n, r.d, r.q)


# ---------------------------------------------------------------------------
# Exact KS drift (operators/quality.ks_drift)
# ---------------------------------------------------------------------------

def test_ks_drift_hand_computed(spark):
    """A={1,2,3}, B={3,4,5,6}: the integer KS numerator is
    max|cum_A·4 − cum_B·3| = 9, attained at x=3 (|3·4 − 1·3|) — the
    classic max-gap right after A's mass ends; symmetric for both
    groups; d_ppm = 9e6 div 12 = 750000."""
    from mysql_ch_replicator_spark.operators.quality import ks_drift

    df = spark.createDataFrame(
        [("A", 1), ("A", 2), ("A", 3),
         ("B", 3), ("B", 4), ("B", 5), ("B", 6)],
        "source string, n_chars long")
    out = {r.source: r for r in ks_drift(df).collect()}
    assert out["A"].n_s == 3 and out["A"].n_r == 4
    assert out["A"].d_num == "9" and out["A"].d_ppm == 750000
    assert out["B"].n_s == 4 and out["B"].n_r == 3
    assert out["B"].d_num == "9" and out["B"].d_ppm == 750000


def test_ks_drift_identical_distributions_zero(spark):
    """Two groups with identical value multisets → D = 0 exactly."""
    from mysql_ch_replicator_spark.operators.quality import ks_drift

    rows = [(g, v) for g in ("A", "B") for v in (5, 7, 7, 9)]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    for r in ks_drift(df).collect():
        assert r.d_num == "0" and r.d_ppm == 0


def test_ks_drift_single_group_empty(spark):
    """One group has no complement (n_r = 0) → no report row rather
    than a divide-by-zero."""
    from mysql_ch_replicator_spark.operators.quality import ks_drift

    df = spark.createDataFrame(
        [("A", 1), ("A", 2)], "source string, n_chars long")
    assert ks_drift(df).count() == 0


# ---------------------------------------------------------------------------
# Collocation lift (operators/lm.collocation_lift)
# ---------------------------------------------------------------------------

def test_collocation_lift_hand_computed(spark):
    """Corpus 'x y x y': bigrams (x,y)×2, (y,x)×1 → N=3;
    lift(x,y) = 1e6·3·2 div (2·2) = 1_500_000,
    lift(y,x) = 1e6·3·1 div (1·1) = 3_000_000."""
    from mysql_ch_replicator_spark.operators.lm import collocation_lift

    docs = spark.createDataFrame([(1, "x y x y")],
                                 "doc_id long, text string")
    out = {(r.a, r.b): (r.n_ab, r.lift_ppm)
           for r in collocation_lift(docs, min_count=1, top_k=10)
           .collect()}
    assert out[("x", "y")] == (2, 1_500_000)
    assert out[("y", "x")] == (1, 3_000_000)


def test_collocation_min_count_and_tiebreak(spark):
    """min_count drops rare pairs; equal-lift ties cut by (a, b)
    ascending so a mid-tie top_k is still deterministic."""
    from mysql_ch_replicator_spark.operators.lm import collocation_lift

    # two disjoint-vocab pairs, identical counts → identical lift
    docs = spark.createDataFrame(
        [(1, "p q"), (2, "p q"), (3, "m n"), (4, "m n"), (5, "z w")],
        "doc_id long, text string")
    full = collocation_lift(docs, min_count=2, top_k=10).collect()
    assert {(r.a, r.b) for r in full} == {("p", "q"), ("m", "n")}
    lifts = {r.lift_ppm for r in full}
    assert len(lifts) == 1  # tied
    cut = collocation_lift(docs, min_count=2, top_k=1).collect()
    assert [(r.a, r.b) for r in cut] == [("m", "n")]  # (a, b) ascending


# ---------------------------------------------------------------------------
# Prefix-filtered Jaccard join (operators/dedup.jaccard_prefix_join)
# ---------------------------------------------------------------------------

def _shingle3(text):
    ws = [w for w in text.lower().split() if w]
    return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}


def test_jaccard_prefix_exact_recall_vs_bruteforce(spark):
    """The prefix join must return EXACTLY the brute-force J ≥ 0.5 pair
    set — the lossless claim — on a corpus designed so the prefix
    filter actually prunes (a hot shingle shared by every doc, plus
    near-dup pairs and unrelated tails)."""
    from mysql_ch_replicator_spark.operators.dedup import (
        jaccard_prefix_join)

    hot = "the quick fox"   # one shingle every doc shares
    docs = []
    for i in range(12):
        tail = f"unique{i} tail{i} words{i} extra{i}"
        docs.append((i, f"{hot} {tail}"))
    # two near-dup pairs: same tail, tiny difference
    docs.append((100, f"{hot} shared tail words alpha beta gamma"))
    docs.append((101, f"{hot} shared tail words alpha beta delta"))
    docs.append((200, f"{hot} common run of tokens here now"))
    docs.append((201, f"{hot} common run of tokens here now"))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r.a, r.b): (r.common, r.union_n, r.jacc_ppm)
           for r in jaccard_prefix_join(df).collect()}

    sh = {i: _shingle3(t) for i, t in docs}
    want = {}
    ids = sorted(sh)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sh[a] & sh[b])
            union = len(sh[a] | sh[b])
            if union and 1_000_000 * inter >= 500_000 * union:
                want[(a, b)] = (inter, union,
                                (1_000_000 * inter) // union)
    assert got == want
    assert (200, 201) in got and (100, 101) in got
    assert len(got) >= 2


def test_jaccard_prefix_identical_docs_full_score(spark):
    """Byte-identical docs score jacc_ppm = 1_000_000 with
    common == union."""
    from mysql_ch_replicator_spark.operators.dedup import (
        jaccard_prefix_join)

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"),
         (2, "alpha beta gamma delta epsilon")],
        "doc_id long, text string")
    out = jaccard_prefix_join(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.a, r.b) == (1, 2)
    assert r.common == r.union_n and r.jacc_ppm == 1_000_000


# ---------------------------------------------------------------------------
# Snapshot reconciliation diff (operators/replica.snapshot_diff)
# ---------------------------------------------------------------------------

def test_snapshot_diff_classifies_all_three_ops(spark):
    """insert/update/delete each classified; unchanged keys emit
    NOTHING; delete rows carry the OLD payload, insert/update the NEW."""
    from mysql_ch_replicator_spark.operators.replica import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 100), (2, "b", 200), (3, "c", 300)],
        "k long, s string, v long")
    new = spark.createDataFrame(
        [(2, "b", 200), (3, "c2", 350), (4, "d", 400)],
        "k long, s string, v long")
    got = {r.k: (r.op, r.s, r.v)
           for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {
        1: ("delete", "a", 100),   # old payload survives
        3: ("update", "c2", 350),  # new payload
        4: ("insert", "d", 400),
    }


def test_snapshot_diff_null_safe_compare(spark):
    """NULL == NULL for change detection (no spurious updates), and a
    NULL→value transition IS an update."""
    from mysql_ch_replicator_spark.operators.replica import snapshot_diff

    old = spark.createDataFrame(
        [(1, None, None), (2, None, 20)],
        "k long, s string, v long")
    new = spark.createDataFrame(
        [(1, None, None), (2, "x", 20)],
        "k long, s string, v long")
    got = {r.k: r.op for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {2: "update"}   # key 1 unchanged (null-safe equal)


def test_snapshot_diff_identical_snapshots_empty(spark):
    from mysql_ch_replicator_spark.operators.replica import snapshot_diff

    df = spark.createDataFrame([(1, "a", 1), (2, "b", 2)],
                               "k long, s string, v long")
    same = spark.createDataFrame([(1, "a", 1), (2, "b", 2)],
                                 "k long, s string, v long")
    assert snapshot_diff(df, same, ["k"]).count() == 0


def test_entity_resolution_chains_compose(spark):
    """A~B and B~C (but A≁C directly, distance 4) must resolve to ONE
    canonical with cluster_size 3 — the composition the e2e query
    gates; unrelated names stay out."""
    from mysql_ch_replicator_spark.operators.dedup import (
        connected_components, fuzzy_name_pairs)

    a, b, c = "aaaa bbbb", "aaaa bbcc", "aaee bbcc"
    # dist(a,b) = 2, dist(b,c) = 2, but dist(a,c) = 4: only the chain
    # through b connects a and c
    names = [a, b, c, "navy blue", "navi blue", "chartreuse"]
    part = spark.createDataFrame([(n,) for n in names], "p_name string")
    pairs = (fuzzy_name_pairs(part, "p_name", max_dist=2)
             .select(F.col("name_a").alias("a"),
                     F.col("name_b").alias("b")))
    direct = {(r.a, r.b) for r in pairs.collect()}
    assert (a, c) not in direct and (c, a) not in direct  # truly a chain
    ids = part.select(F.col("p_name").alias("doc_id")).distinct()
    comp = {r.doc_id: r.dup_of
            for r in connected_components(pairs, ids).collect()}
    assert comp[a] == comp[b] == comp[c] == a
    assert comp["navy blue"] == comp["navi blue"] == "navi blue"
    assert comp["chartreuse"] == "chartreuse"


# --- hypothesis sweep: prefix Jaccard join vs brute force ---------------

from hypothesis import HealthCheck, given, settings as hyp_settings
from hypothesis import strategies as st

_VOCAB = ["aa", "bb", "cc", "dd", "ee", "ff"]
_DOCS = st.lists(
    st.lists(st.integers(0, len(_VOCAB) - 1), min_size=3, max_size=9),
    min_size=2, max_size=8)


@hyp_settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(_DOCS)
@pytest.mark.heavy
def test_jaccard_prefix_lossless_on_random_corpora(spark, word_lists):
    """Random tiny-vocab corpora (hot shared shingles, duplicates,
    short docs): the prefix+positional-filtered join returns EXACTLY
    the brute-force J >= 0.5 pair set — the lossless claim under
    adversarially overlapping inputs, not just the crafted corpus."""
    from mysql_ch_replicator_spark.operators.dedup import (
        jaccard_prefix_join)

    docs = [(i, " ".join(_VOCAB[w] for w in ws))
            for i, ws in enumerate(word_lists)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r.a, r.b): (r.common, r.union_n)
           for r in jaccard_prefix_join(df).collect()}

    sh = {i: _shingle3(t) for i, t in docs}
    want = {}
    ids = sorted(sh)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            if not sh[a] or not sh[b]:
                continue
            inter = len(sh[a] & sh[b])
            union = len(sh[a] | sh[b])
            if 1_000_000 * inter >= 500_000 * union:
                want[(a, b)] = (inter, union)
    assert got == want
