"""Approximation-quality floors for the ANN paths.

Correctness vs the oracle only proves the approximate algorithms compute
what they claim; these tests pin that what they claim is USEFUL — recall@10
of the LSH and IVF paths against the exact brute-force ranking. The floors
are deliberately loose (the corpus is tiny synthetic data); they catch a
bucketing scheme going degenerate (everything in one bucket, or recall ~0),
not small tuning drift."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mysql_ch_replicator_spark.operators.similarity import (
    brute_force_topk, ivf_topk, lsh_topk, train_ivf_centroids,
)

SF = "/root/testdata/sf0.01"
K = 10


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def queries_df(spark, corpus):
    return corpus.where(F.col("vec_id") < 20) \
        .select(F.col("vec_id").alias("query_id"), "embedding")


def _neighbors(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def _recall(approx: dict, exact: dict) -> float:
    hits = total = 0
    for q, truth in exact.items():
        hits += len(approx.get(q, set()) & truth)
        total += len(truth)
    return hits / total


@pytest.fixture(scope="module")
def exact(corpus, queries_df):
    return _neighbors(brute_force_topk(corpus, queries_df, K))


def test_lsh_recall_floor(corpus, queries_df, exact):
    # multi-table OR-amplification: 8 tables x 4 planes measured ~0.66 here
    approx = _neighbors(lsh_topk(corpus, queries_df, K, tables=8, planes=4))
    r = _recall(approx, exact)
    assert r >= 0.5, f"LSH recall@10 degenerate: {r:.2f}"


def test_ivf_recall_floor(corpus, queries_df, exact):
    approx = _neighbors(ivf_topk(corpus, queries_df, K,
                                 n_cells=8, probes=2))
    r = _recall(approx, exact)
    assert r >= 0.3, f"IVF recall@10 degenerate: {r:.2f}"


def test_ivf_kmeans_training_improves_recall(corpus, queries_df, exact):
    """The Lloyd refinement must actually move the needle: trained codebook
    recall@10 >= untrained (same cells/probes/data, deterministic init)."""
    dims = len(corpus.select("embedding").first()[0])
    cents = train_ivf_centroids(corpus, "embedding", n_cells=8, dims=dims,
                                iters=3)
    trained = _recall(_neighbors(ivf_topk(corpus, queries_df, K, n_cells=8,
                                          probes=2, centroids=cents)), exact)
    untrained = _recall(_neighbors(ivf_topk(corpus, queries_df, K, n_cells=8,
                                            probes=2)), exact)
    assert trained >= untrained, (
        f"k-means-refined IVF lost recall: {trained:.2f} < {untrained:.2f}")
    assert trained >= 0.3, f"trained IVF recall degenerate: {trained:.2f}"


def test_pq_rerank_recall_floor(corpus, queries_df, exact):
    """Two-stage PQ (ADC shortlist -> exact rerank) measured 0.91 at
    (m=16, codes=16, R=100); the floor catches codebook-scale or
    normalization regressions, not tuning drift."""
    from mysql_ch_replicator_spark.operators.similarity import ann_pq_topk
    approx = _neighbors(ann_pq_topk(corpus, queries_df, K,
                                    m=16, n_codes=16, shortlist=100))
    r = _recall(approx, exact)
    assert r >= 0.7, f"PQ rerank recall@10 degenerate: {r:.2f}"


def test_pq_shortlist_dial(corpus, queries_df, exact):
    """The recall dial must dial: a corpus-wide shortlist makes stage 2
    exhaustive = recall 1.0."""
    from mysql_ch_replicator_spark.operators.similarity import ann_pq_topk
    n = corpus.count()
    full = _neighbors(ann_pq_topk(corpus, queries_df, K,
                                  m=16, n_codes=16, shortlist=n))
    assert _recall(full, exact) == 1.0


def test_ivf_single_cell_is_exhaustive(corpus, queries_df, exact):
    """The recall dial must actually dial: one cell holds everything, so
    probing it is exhaustive search = recall 1.0."""
    all_cells = _neighbors(ivf_topk(corpus, queries_df, K,
                                    n_cells=1, probes=1))
    assert _recall(all_cells, exact) == 1.0


def test_connected_components_chain(spark):
    """A-B, B-C, D-E chain: closure maps {1,2,3}→1 and {4,5}→4; isolated 6→6.
    One-hop min-link would leave 3→2 (its only direct neighbor's min is 2)."""
    from mysql_ch_replicator_spark.operators.dedup import (
        _pair_min_dup, connected_components)
    pairs = spark.createDataFrame([(1, 2), (2, 3), (4, 5)], "a long, b long")
    ids = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    got = {r.doc_id: r.dup_of
           for r in connected_components(pairs, ids).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6}
    onehop = {r.doc_id: r.dup_of for r in _pair_min_dup(pairs, ids).collect()}
    assert onehop[3] == 2  # the case closure fixes
