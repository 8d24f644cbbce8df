"""Repetition-based quality signals (the Gopher/C4 family).

Natural text repeats itself far less than boilerplate, SEO spam, or
scraper loops; pre-training pipelines filter on exactly these ratios
(Rae et al. 2021 "Scaling Language Models" §A.1.1 repetition filters).
Three signals per document:

- ``dup_word_frac``   — 1 - distinct/total tokens (pure expression,
  computed at scan, no shuffle).
- ``top_bigram_frac`` — share of all bigram occurrences taken by the
  most frequent bigram.
- ``dup_trigram_frac`` — share of trigram occurrences whose trigram
  appears more than once.

Scale shape (100 TB): the n-gram signals explode each doc into its
grams — a LINEAR blow-up (n-1 grams per doc) — then aggregate twice:
once on (doc_id, gram) with map-side partial counts, once on doc_id.
Both shuffles are keyed by doc_id-first, so skew follows document
length, which is bounded; no all-pairs term anywhere. The final join
back to the full doc list is on doc_id and stays co-partitioned with
the second aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import shingles, words


def dup_word_fraction(col: Column) -> Column:
    """1 - distinct/total lowercase alphanumeric tokens; 0.0 for docs
    with no tokens."""
    w = words(col)
    return F.when(
        F.size(w) > 0,
        1.0 - F.size(F.array_distinct(w)).cast("double") / F.size(w),
    ).otherwise(F.lit(0.0))


def _gram_ratio(docs: DataFrame, id_col: str, w: Column, n: int,
                ratio: str) -> DataFrame:
    """Per-doc gram-count ratio: 'top' = max(count)/sum(count),
    'dup' = sum(count where count>1)/sum(count)."""
    grams = docs.select(id_col, F.explode(shingles(w, n)).alias("g"))
    counts = grams.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("cnt"))
    if ratio == "top":
        num = F.max("cnt")
    else:
        num = F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0))
    return counts.groupBy(id_col).agg(
        F.round(num.cast("double") / F.sum("cnt"), 6).alias("_ratio"))


def repetition_signals(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """All three repetition signals joined to every input doc (docs too
    short for a gram size get 0.0 for that signal)."""
    w = words(F.col(text_col))
    base = docs.select(id_col,
                       F.round(dup_word_fraction(F.col(text_col)), 6)
                        .alias("dup_word_frac"))
    top2 = (_gram_ratio(docs, id_col, w, 2, "top")
            .withColumnRenamed("_ratio", "top_bigram_frac"))
    dup3 = (_gram_ratio(docs, id_col, w, 3, "dup")
            .withColumnRenamed("_ratio", "dup_trigram_frac"))
    return (base.join(top2, id_col, "left").join(dup3, id_col, "left")
            .select(id_col, "dup_word_frac",
                    F.coalesce("top_bigram_frac", F.lit(0.0))
                     .alias("top_bigram_frac"),
                    F.coalesce("dup_trigram_frac", F.lit(0.0))
                     .alias("dup_trigram_frac")))
