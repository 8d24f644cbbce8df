"""Data-selection operator tests: DSIR importance scoring, n-gram novelty,
normalized dedup, Gopher quality gate, and the scale-safe global running
sum behind token-budget selection."""

from __future__ import annotations

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from mysql_ch_replicator_spark.operators.selection import (
    dsir_bucket_weights, dsir_scores, ngram_novelty, ranged_running_sum,
    token_budget_select,
)
from mysql_ch_replicator_spark.operators.dedup import normalized_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


# ---------------------------------------------------------------------------
# ranged_running_sum — the no-single-partition-sort prefix sum
# ---------------------------------------------------------------------------

def test_ranged_running_sum_matches_global_window(spark):
    rows = [(i, (i * 37) % 11 - 5, (i * 13) % 7 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, k long, v long")
    got = {r.id: r.run for r in
           ranged_running_sum(df, "k", "v", tie_breaks=("id",), buckets=8,
                              out_col="run").collect()}
    w = (Window.orderBy("k", "id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    want = {r.id: r.run for r in
            df.withColumn("run", F.sum("v").over(w)).collect()}
    assert got == want


@pytest.mark.heavy
def test_ranged_running_sum_property(spark):
    """Property: for RANDOM key distributions — negative keys, heavy ties,
    skewed clusters — the range-bucketed prefix sum equals the single-task
    global window exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=6, deadline=None)
    @given(keys=st.lists(st.integers(min_value=-50, max_value=50),
                         min_size=1, max_size=120),
           buckets=st.integers(min_value=1, max_value=16))
    def check(keys, buckets):
        rows = [(i, k, (i * 7) % 5 + 1) for i, k in enumerate(keys)]
        df = spark.createDataFrame(rows, "id long, k long, v long")
        got = {r.id: r.run for r in
               ranged_running_sum(df, "k", "v", tie_breaks=("id",),
                                  buckets=buckets, out_col="run").collect()}
        w = (Window.orderBy("k", "id")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        want = {r.id: r.run for r in
                df.withColumn("run", F.sum("v").over(w)).collect()}
        assert got == want

    check()


def test_ranged_running_sum_empty(spark):
    df = spark.createDataFrame([], "id long, k long, v long")
    assert ranged_running_sum(df, "k", "v", out_col="run").count() == 0


def test_ranged_running_sum_single_key(spark):
    # all rows share one key — the degenerate all-ties bucket
    df = spark.createDataFrame([(i, 7, 2) for i in range(10)],
                               "id long, k long, v long")
    runs = sorted(r.run for r in
                  ranged_running_sum(df, "k", "v", tie_breaks=("id",),
                                     out_col="run").collect())
    assert runs == [2 * (i + 1) for i in range(10)]


# ---------------------------------------------------------------------------
# DSIR importance
# ---------------------------------------------------------------------------

def test_dsir_target_tokens_outweigh_raw(spark):
    # target docs are pure 'xx', background pure 'yy' — the xx bucket gets
    # weight ~2e6 (all target), yy ~big-raw-small-target, so an xx doc must
    # outscore a yy doc of the same length
    rows = ([(i, "en", "xx xx xx xx") for i in range(5)]
            + [(100 + i, "de", "yy yy yy yy") for i in range(5)])
    scores = {r.doc_id: r.score for r in
              dsir_scores(_docs(spark, rows),
                          target=F.col("lang") == "en").collect()}
    assert scores[0] > scores[100]
    # same-content docs score identically
    assert scores[0] == scores[1] and scores[100] == scores[101]


def test_dsir_weights_are_integer_ratios(spark):
    rows = [(1, "en", "aa"), (2, "de", "aa aa aa")]
    w = dsir_bucket_weights(_docs(spark, rows),
                            target=F.col("lang") == "en").collect()
    assert len(w) == 1  # one bucket: 'aa'
    # (n_tgt+1)*1e6 div (n_raw+1) = 2*1e6 div 5
    assert w[0].n_raw == 4 and w[0].n_tgt == 1
    assert w[0].w == (2 * 1_000_000) // 5


# ---------------------------------------------------------------------------
# n-gram novelty
# ---------------------------------------------------------------------------

def test_novelty_duplicate_doc_scores_zero(spark):
    rows = [(1, "en", "alpha beta gamma delta"),
            (2, "en", "alpha beta gamma delta"),     # exact repeat → 0 novel
            (3, "en", "alpha beta gamma epsilon"),   # shares 1 of 2 grams
            (4, "en", "short one")]                  # too short for 3-grams
    out = {r.doc_id: r for r in ngram_novelty(_docs(spark, rows), n=3).collect()}
    assert out[1].n_grams == 2 and out[1].n_novel == 2
    assert out[1].novelty_ratio == 1.0
    assert out[2].n_novel == 0 and out[2].novelty_ratio == 0.0
    # doc3: grams {alpha beta gamma, beta gamma epsilon} — first is doc1's
    assert out[3].n_grams == 2 and out[3].n_novel == 1
    assert out[3].novelty_ratio == 0.5
    assert out[4].n_grams == 0 and out[4].novelty_ratio == 0.0


# ---------------------------------------------------------------------------
# normalized dedup
# ---------------------------------------------------------------------------

def test_normalized_dedup_catches_repunctuated_copies(spark):
    rows = [(1, "en", "Hello, World!"),
            (2, "en", "hello   world"),
            (3, "en", "HELLO-WORLD."),
            (4, "en", "goodbye world")]
    out = {r.doc_id: r for r in normalized_dedup(_docs(spark, rows)).collect()}
    assert out[1].dup_of == 1 and out[2].dup_of == 1 and out[3].dup_of == 1
    assert out[1].n_copies == 3
    assert out[4].dup_of == 4 and out[4].n_copies == 1


# ---------------------------------------------------------------------------
# Gopher quality gate
# ---------------------------------------------------------------------------

def test_gopher_rules_fire_individually(spark):
    from mysql_ch_replicator_spark.functions.text import (
        alpha_word_ratio, gopher_passes, mean_word_len, punct_ratio,
        stopword_count,
    )
    from mysql_ch_replicator_spark.functions.hashing import words as words_fn

    good = " ".join(["the quick brown fox jumps over it and off for"] * 4)
    rows = [
        (1, "en", good),                             # 40 words, stopwords OK
        (2, "en", "too short for the gate"),         # word-count floor
        (3, "en", " ".join(["word"] * 50)),          # no stopwords
        (4, "en", " ".join(["the"] * 35) + " " + "!?#@ " * 30),  # punct soup
    ]
    df = _docs(spark, rows)
    t = F.col("text")
    out = {r.doc_id: r.p for r in df.select(
        "doc_id",
        gopher_passes(F.size(words_fn(t)), mean_word_len(t),
                      alpha_word_ratio(t), stopword_count(t),
                      punct_ratio(t)).alias("p")).collect()}
    assert out[1] is True
    assert out[2] is False and out[3] is False and out[4] is False


# ---------------------------------------------------------------------------
# token-budget selection
# ---------------------------------------------------------------------------

def test_token_budget_selects_quality_prefix(spark):
    # quality rises with text length (length_term); budget cuts mid-corpus
    rows = [(i, "en", "the fox and it " * (2 + 3 * i)) for i in range(8)]
    out = token_budget_select(_docs(spark, rows), budget_tokens=150).collect()
    by_id = {r.doc_id: r for r in out}
    # ordering is quality desc -> doc 7 (longest) first
    ordered = sorted(out, key=lambda r: r.cum_tokens)
    assert [r.doc_id for r in ordered][0] == 7
    # cum_tokens is a strictly increasing prefix sum of n_tokens
    acc = 0
    for r in ordered:
        acc += r.n_tokens
        assert r.cum_tokens == acc
    # the selected set is exactly the prefix within budget
    for r in out:
        assert r.selected == (1 if r.cum_tokens <= 150 else 0)
    assert 0 < sum(r.selected for r in out) < len(rows)
    assert by_id[7].selected == 1


def test_curation_pipeline_stage_semantics(spark):
    from mysql_ch_replicator_spark.operators.selection import curation_pipeline
    good = " ".join(["the quick brown fox jumps over it and off for"] * 4)
    rows = [
        (1, "en", good),                       # gated, survivor, selected
        (2, "en", good.upper() + "!!!"),       # dup of 1 after normalization
        (3, "en", "too short for the gate"),   # fails gate
        (4, "en", good + " extra tail here"),  # gated, unique → survivor
    ]
    out = {r.doc_id: r for r in
           curation_pipeline(_docs(spark, rows),
                             budget_tokens=10_000).collect()}
    assert out[1].passed_gate == 1 and out[1].is_survivor == 1
    assert out[2].passed_gate == 1 and out[2].is_survivor == 0  # deduped
    assert out[3].passed_gate == 0 and out[3].is_survivor == 0
    assert out[4].is_survivor == 1
    # non-survivors never reach selection
    assert out[2].cum_tokens is None and out[2].selected == 0
    assert out[3].cum_tokens is None and out[3].selected == 0
    # survivors fit in the big budget
    assert out[1].selected == 1 and out[4].selected == 1


# ---------------------------------------------------------------------------
# SemDeDup-style cluster-scoped semantic dedup
# ---------------------------------------------------------------------------

def test_semantic_cell_dedup_groups_near_identical_vectors(spark):
    from mysql_ch_replicator_spark.operators.dedup import semantic_cell_dedup
    base = [1.0] + [0.0] * 15
    near = [1.0, 0.001] + [0.0] * 14
    ortho = [0.0, 1.0] + [0.0] * 14
    rows = [(1, base), (2, base), (3, near), (4, ortho)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.doc_id: r for r in
           semantic_cell_dedup(emb, n_cells=4, threshold=0.98).collect()}
    assert out[1].dup_of == 1 and out[2].dup_of == 1
    assert out[3].dup_of == 1          # cosine(base, near) ≈ 0.9999995
    assert out[4].dup_of == 4          # orthogonal survives
    # duplicates landed in the same cell (same nearest centroid)
    assert out[1].cell == out[2].cell == out[3].cell


# ---------------------------------------------------------------------------
# plan shapes — the 100 TB contract
# ---------------------------------------------------------------------------

def _executed(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_dsir_weights_join_is_broadcast(spark, sf_dir):
    from mysql_ch_replicator_spark.queries import spark_queries
    plan = _executed(spark_queries()["dsir_importance_select"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_token_budget_has_no_single_partition_exchange(spark, sf_dir):
    from mysql_ch_replicator_spark.queries import spark_queries
    plan = _executed(spark_queries()["token_budget_select"](spark, sf_dir))
    assert "Exchange SinglePartition" not in plan


def test_novelty_has_no_single_partition_exchange(spark, sf_dir):
    from mysql_ch_replicator_spark.queries import spark_queries
    plan = _executed(spark_queries()["ngram_novelty"](spark, sf_dir))
    assert "Exchange SinglePartition" not in plan


def test_transient_cache_is_bounded(spark):
    """Operator-internal caches are registered in a bounded FIFO (ADVICE
    r4): exceeding the cap unpersists the oldest, so a long-lived session
    running the whole registry holds at most TRANSIENT_CACHE_LIMIT
    operator caches."""
    from mysql_ch_replicator_spark.cache import (
        _TRANSIENT, release_transient_caches, transient_persist,
    )

    release_transient_caches()
    dfs = [spark.range(5).withColumn("x", F.lit(i)) for i in range(5)]
    for df in dfs:
        transient_persist(df, limit=3)
    assert len(_TRANSIENT) == 3
    assert dfs[0].storageLevel.useMemory is False   # evicted
    assert dfs[4].storageLevel.useMemory is True    # newest retained
    assert release_transient_caches() == 3
    assert all(not df.storageLevel.useMemory for df in dfs)


def test_mixture_plan_arithmetic_and_exposure(spark):
    """mixture_plan == the literal integer arithmetic: capped sources
    keep everything and report epochs>1, uncapped sources get the exact
    scaled-rational rate, weighted-but-absent sources surface full
    deficit, unweighted corpus sources plan to zero — never silently
    dropped."""
    from mysql_ch_replicator_spark.operators.selection import mixture_plan

    docs = spark.createDataFrame(
        [(1, "a b c d", "big"), (2, "e f g h", "big"),
         (3, "i j", "small"), (4, "k l m n o p", "unweighted")],
        "doc_id long, text string, source string")
    # weights big:3 small:1 ghost:1, sum 5; budget 10 tokens
    got = {r.stratum: tuple(r)[1:]
           for r in mixture_plan(docs, "source",
                                 {"big": 3, "small": 1, "ghost": 1},
                                 10).collect()}
    # big: avail 8, target 10*3//5=6 -> rate 750000, planned 6
    assert got["big"] == (3, 8, 6, 750_000, 6, 0, 75)
    # small: avail 2, target 2 -> capped, planned 2, exactly 1 epoch
    assert got["small"] == (1, 2, 2, 1_000_000, 2, 0, 100)
    # ghost: weighted but absent -> full deficit, epochs NULL
    assert got["ghost"] == (1, 0, 2, 0, 0, 2, None)
    # unweighted corpus source: planned to zero, visible in the plan
    assert got["unweighted"] == (0, 6, 0, 0, 0, 0, 0)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="positive"):
        mixture_plan(docs, "source", {}, 10)
