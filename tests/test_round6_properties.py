"""Randomized/crafted cross-checks of the round-6 operators against pure-
Python references — the oracle-independence layer (the DuckDB oracle
proves cross-engine agreement; these prove the shared semantics are the
INTENDED ones)."""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

SEP_WORDS = re.compile(r"[^a-z0-9]+")


def _words(text: str) -> list[str]:
    return [w for w in SEP_WORDS.split(text.lower()) if w]


def test_bm25_matches_reference(spark):
    """Spark BM25 == a literal python evaluation of the documented
    integer formula (idf6 rational, 10*TL-cleared tf normalization);
    a doc stuffed with one query term must not out-rank a doc matching
    several terms (the length normalization at work)."""
    from mysql_ch_replicator_spark.operators.retrieval import bm25_topk

    texts = {
        1: "cat dog fish",
        2: "cat cat cat cat cat cat cat cat cat cat cat cat",
        3: "dog fish bird cat",
        4: "bird bird snake",
        5: "fish cat dog mouse fish",
        6: "unrelated words entirely here",
    }
    docs = spark.createDataFrame(sorted(texts.items()),
                                 "doc_id long, text string")
    terms = ["cat", "dog", "fish"]
    got = {r.doc_id: (int(r.score), r.rank)
           for r in bm25_topk(docs, terms, k=10).collect()}

    toks = {d: _words(t) for d, t in texts.items()}
    n = len(texts)
    tl = sum(len(v) for v in toks.values())
    df = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    expect = {}
    for d, v in toks.items():
        s = 0
        for t in terms:
            tf = v.count(t)
            if not tf:
                continue
            idf6 = (1_000_000 * (2 * (n - df[t]) + 1)) // (2 * df[t] + 1)
            tfn6 = (1_000_000 * 22 * tf * tl) // (
                10 * tl * tf + 3 * tl + 9 * len(v) * n)
            s += idf6 * tfn6
        if s:
            expect[d] = s
    ranks = {d: i + 1 for i, (d, _) in enumerate(
        sorted(expect.items(), key=lambda kv: (-kv[1], kv[0])))}
    assert got == {d: (expect[d], ranks[d]) for d in expect}
    # multi-term doc 5 beats the single-term-stuffed doc 2
    assert got[5][1] < got[2][1]


def test_source_similarity_matrix_matches_reference(spark):
    """Matrix == python set algebra over 3-word shingles; identical
    sources hit jaccard6 == 1e6, disjoint ones 0 (and still appear)."""
    from mysql_ch_replicator_spark.operators.dedup import (
        source_similarity_matrix,
    )

    rows = [
        (1, "alpha beta gamma delta epsilon", "s1"),
        (2, "alpha beta gamma delta epsilon", "s2"),   # clone of s1's doc
        (3, "zeta eta theta iota kappa", "s2"),
        (4, "completely different text body here", "s3"),
        (5, "beta gamma delta epsilon zeta", "s3"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, "
                                       "source string")
    got = {(r.src_a, r.src_b): (r.inter, r.uni, r.jaccard6)
           for r in source_similarity_matrix(docs).collect()}

    def sh_set(srcs):
        out = set()
        for _, text, s in rows:
            if s != srcs:
                continue
            w = _words(text)
            out |= {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}
        return out

    sets = {s: sh_set(s) for s in ("s1", "s2", "s3")}
    expect = {}
    for a, b in (("s1", "s2"), ("s1", "s3"), ("s2", "s3")):
        inter = len(sets[a] & sets[b])
        uni = len(sets[a] | sets[b])
        expect[(a, b)] = (inter, uni,
                          0 if uni == 0 else 1_000_000 * inter // uni)
    assert got == expect
    assert got[("s1", "s2")][0] > 0        # the clone overlaps
    assert got[("s1", "s3")][2] < 1_000_000


def test_minhash_calibration_properties(spark):
    """Identical docs must calibrate perfectly (est6 == true6 == 1e6,
    err6 == 0); a partially-overlapping pair's true6 must equal the
    python set-Jaccard; est6 always equals floor(1e6*m/12) for an
    integer match count m."""
    from mysql_ch_replicator_spark.operators.dedup import (
        minhash_calibration,
    )

    t1 = "the quick brown fox jumps over the lazy dog again and again"
    t2 = t1  # exact clone
    t3 = "the quick brown fox jumps over a sleepy cat today and forever"
    docs = spark.createDataFrame(
        [(1, t1), (2, t2), (3, t3)], "doc_id long, text string")
    got = {(r.a, r.b): (r.est6, r.true6, r.err6)
           for r in minhash_calibration(docs).collect()}

    assert got[(1, 2)] == (1_000_000, 1_000_000, 0)
    for (a, b), (est6, true6, err6) in got.items():
        assert est6 in {1_000_000 * m // 12 for m in range(13)}
        assert err6 == abs(est6 - true6)
    if (1, 3) in got:
        w1 = _words(t1)
        w3 = _words(t3)
        s1 = {" ".join(w1[i:i + 3]) for i in range(len(w1) - 2)}
        s3 = {" ".join(w3[i:i + 3]) for i in range(len(w3) - 2)}
        want_true6 = 1_000_000 * len(s1 & s3) // len(s1 | s3)
        assert got[(1, 3)][1] == want_true6


def test_vocab_coverage_matches_reference(spark):
    """OOV rate == python evaluation with the same top-V (count desc,
    term asc) vocabulary; a source written entirely in rare terms shows
    oov6 == 1e6."""
    from mysql_ch_replicator_spark.queries_ml import (
        _VOCAB_COVERAGE_V, text_vocab_coverage,
    )

    # vocabulary is the corpus-wide top V; make 'common' terms dominate
    common = [f"w{i}" for i in range(_VOCAB_COVERAGE_V)]
    rows = []
    for d in range(10):
        rows.append((d, " ".join(common * 3), "en", "main", 0))
    rows.append((100, "raretermone raretermtwo raretermthree",
                 "en", "weird", 0))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")

    import os
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        docs.write.mode("overwrite").parquet(
            os.path.join(td, "documents.parquet"))
        got = {r.source: (r.total_tok, r.covered_tok, r.oov6)
               for r in text_vocab_coverage(spark, td).collect()}
    assert got["main"] == (10 * 3 * len(common), 10 * 3 * len(common), 0)
    assert got["weird"] == (3, 0, 1_000_000)
