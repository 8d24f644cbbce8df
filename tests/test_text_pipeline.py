"""Unit tests for the corpus-hygiene operators: PII scrub, repetition
signals, n-gram decontamination. The cross-engine gate for the same
operators lives in test_queries_oracle.py (text_pii_scrub,
text_repetition, decontaminate_ngram); these tests pin exact semantics
on crafted rows plus the scale-critical plan shapes."""

import pytest
from pyspark.sql import functions as F

from mysql_ch_replicator_spark.functions.pii import (
    PII_PATTERNS, pii_count, redact_pii,
)
from mysql_ch_replicator_spark.operators.contamination import (
    ngram_contamination,
)
from mysql_ch_replicator_spark.operators.repetition import (
    repetition_signals,
)


# --- PII -------------------------------------------------------------------


def test_pii_counts_and_redaction(spark):
    text = ("reach me at jane.doe+x@mail-host.org or 192.168.0.1, "
            "ssn 123-45-6789, cell +1 555-123-4567, backup "
            "bob@corp.io done")
    df = spark.createDataFrame([(1, text)], ["id", "t"])
    row = df.select(
        *[pii_count(F.col("t"), k).alias(k) for k, _, _ in PII_PATTERNS],
        redact_pii(F.col("t")).alias("red")).first()
    assert row["email"] == 2
    assert row["ipv4"] == 1
    assert row["ssn"] == 1
    assert row["phone"] == 1
    assert row["red"] == ("reach me at [EMAIL] or [IP], ssn [SSN], "
                          "cell [PHONE], backup [EMAIL] done")


def test_pii_clean_text_untouched(spark):
    text = "no pii here, just words and the number 42."
    df = spark.createDataFrame([(1, text)], ["id", "t"])
    row = df.select(redact_pii(F.col("t")).alias("red"),
                    *[pii_count(F.col("t"), k).alias(k)
                      for k, _, _ in PII_PATTERNS]).first()
    assert row["red"] == text
    assert all(row[k] == 0 for k, _, _ in PII_PATTERNS)


def test_pii_ssn_not_eaten_by_phone(spark):
    # adjacent ssn + phone: each pattern claims exactly its own span
    df = spark.createDataFrame([(1, "123-45-6789 +9 123-456-7890")],
                               ["id", "t"])
    assert df.select(redact_pii(F.col("t")).alias("r")).first()["r"] \
        == "[SSN] [PHONE]"


# --- repetition ------------------------------------------------------------


def test_repetition_signals_values(spark):
    docs = spark.createDataFrame(
        [(1, "a a a a"),          # 1 distinct / 4 -> dup 0.75; bigram "a a" x3
         (2, "a b c d"),          # all distinct, every gram unique
         (3, "x y x y x y"),      # trigrams: "x y x" x2, "y x y" x2 -> dup 1.0
         (4, "solo"),             # too short for any gram
         (5, "")],                # no tokens at all
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in repetition_signals(docs).collect()}
    assert out[1]["dup_word_frac"] == 0.75
    assert out[1]["top_bigram_frac"] == 1.0
    assert out[2]["dup_word_frac"] == 0.0
    assert out[2]["dup_trigram_frac"] == 0.0
    assert out[3]["dup_trigram_frac"] == 1.0
    assert out[3]["top_bigram_frac"] == pytest.approx(3 / 5)  # "x y" 3 of 5
    assert out[4]["top_bigram_frac"] == 0.0
    assert out[5]["dup_word_frac"] == 0.0
    assert len(out) == 5  # short/empty docs still present


# --- decontamination -------------------------------------------------------


def test_ngram_contamination_exact(spark):
    eight = "one two three four five six seven eight"
    train = spark.createDataFrame(
        [(1, f"prefix {eight} suffix"),   # shares the 8-gram
         (2, "totally different words with no overlap at all here"),
         (3, f"{eight}")],                # exact 8-gram doc
        ["doc_id", "text"])
    eval_set = spark.createDataFrame([(100, f"intro {eight} outro")],
                                     ["doc_id", "text"])
    got = {r["doc_id"]: r["n_shared"]
           for r in ngram_contamination(train, eval_set, n=8).collect()}
    assert set(got) == {1, 3}
    assert got[3] == 1           # exactly the one shared 8-gram
    assert got[1] >= 1


def test_contamination_broadcasts_eval_side(spark):
    docs = spark.createDataFrame([(i, f"w{i} " * 10) for i in range(20)],
                                 ["doc_id", "text"])
    plan = ngram_contamination(docs, docs.limit(2), n=3) \
        ._jdf.queryExecution().executedPlan().toString()
    # eval grams broadcast: the corpus side reaches its per-doc count
    # without a pre-join shuffle
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_substring_dup_stats_flags_shared_spans(spark):
    """A 64+-char span pasted into two docs must mark dup windows in both;
    a unique doc has zero; short docs (< win) drop out."""
    from mysql_ch_replicator_spark.operators.dedup import substring_dup_stats

    boiler = ("copyright notice all rights reserved this text is repeated "
              "verbatim across documents " * 3)  # ~260 chars
    # stride-aligned offsets: shared spans are only caught when they start
    # at the same phase mod stride in both docs (the documented recall
    # trade of stride > 1) — the preamble is exactly one stride long
    rows = [
        (1, boiler + " plus tail one that is long enough to window"),
        (2, "unrelated preamble of 32 chars! " + boiler),
        (3, "completely unique text " + "x y z w " * 30),
        (4, "short"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_windows, r.n_dup_windows)
           for r in substring_dup_stats(docs, win=64, stride=32).collect()}
    assert 4 not in got                          # too short to window
    assert got[3][1] == 0                        # unique: no dup windows
    assert got[1][1] >= 1 and got[2][1] >= 1     # shared span flagged... 


def test_corpus_diff_classifies_all_transitions(spark):
    from mysql_ch_replicator_spark.operators.dedup import corpus_diff

    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "will vanish")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed!"), (4, "brand new")],
        "doc_id long, text string")
    got = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_corpus_diff_null_text_uses_presence_not_hash(spark):
    """md5(NULL) is NULL: presence must come from the join sides, so a
    NULL-text doc in both versions is 'unchanged', text->NULL is
    'changed', and NULL->NULL stays comparable (review r5)."""
    from mysql_ch_replicator_spark.operators.dedup import corpus_diff

    old = spark.createDataFrame(
        [(1, None), (2, "text"), (3, None)], "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, None), (2, None), (4, None)], "doc_id long, text string")
    got = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}
