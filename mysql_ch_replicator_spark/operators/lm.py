"""Corpus-trained bigram language-model scoring — the distributed shape of
KenLM-style fluency filtering (CCNet, Wenzek et al. 2020: docs whose token
transitions are improbable under a corpus LM are boilerplate/garbled and
get filtered before training).

The score is integer-exact so a SQL oracle can replay it bit-for-bit:
instead of ``sum log P(w2|w1)`` (float, engine-divergent), each bigram
occurrence contributes the SCALED conditional probability
``C(w1,w2) * SCALE div C(w1,*)`` and a doc's fluency is the sum (higher =
more typical transitions). Monotone in the geometric-mean-probability
ranking for docs of equal length; ``n_bigrams`` rides along so callers can
length-normalize.

Scale notes (100 TB corpus): two aggregations build the count tables —
bigram counts and unigram-context counts, both map-side combining and
bounded by observed vocabulary (not corpus size); scoring re-explodes the
corpus once and joins it against the count tables (broadcast when the
vocab fits, shuffle-join on the bigram key otherwise — either way the
corpus shuffles at most once, on the join key). No Python anywhere: the
bigram explode is ``transform(sequence(...))`` over the shared tokenizer,
fully JVM-side.

Reference parity: none — the reference engine replicates, it doesn't
score text; this is part of the beyond-reference LLM-pipeline surface
(SURVEY.md §2, LLM-pipeline operators).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..cache import transient_persist
from ..functions.hashing import words
from ..sources.snapshot import spread

LM_SCALE = 1_000_000


def bigram_pairs(text_col: Column) -> Column:
    """array<struct<a,b>> of adjacent lowercase-token pairs, with
    multiplicity (occurrences, not distinct pairs); < 2 tokens → empty."""
    w = words(text_col)
    return F.when(
        F.size(w) >= 2,
        F.transform(F.sequence(F.lit(1), F.size(w) - 1),
                    lambda i: F.struct(F.element_at(w, i).alias("a"),
                                       F.element_at(w, i + 1).alias("b")))
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))


def bigram_lm_scores(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     scale: int = LM_SCALE) -> DataFrame:
    """(doc_id, n_bigrams, fluency) for every doc with >= 2 tokens:
    fluency = sum over bigram occurrences of C(w1,w2)*scale div C(w1,*),
    counts taken over the whole corpus (self-trained LM)."""
    bg = (spread(docs)
          .select(F.col(id_col).alias("doc_id"),
                  F.explode(bigram_pairs(F.col(text_col))).alias("p"))
          .select("doc_id", F.col("p.a").alias("a"), F.col("p.b").alias("b")))
    # one persisted explode feeds both count tables AND the scoring join
    # — eager, because those three consumers first-touch the cache from
    # concurrent stages of one action (lazy = each re-ran the bigram
    # explode; cache stampede, guide §5)
    bg = transient_persist(bg, eager=True)
    c_ab = bg.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    c_a = bg.groupBy("a").agg(F.count(F.lit(1)).alias("c_a"))
    scored = (bg.join(c_ab, ["a", "b"])
              .join(c_a, "a")
              .groupBy("doc_id")
              .agg(F.count(F.lit(1)).cast("long").alias("n_bigrams"),
                   F.sum(F.expr(f"(c_ab * {scale}L) div c_a"))
                   .cast("long").alias("fluency")))
    return scored


def collocation_lift(docs: DataFrame, text_col: str = "text",
                     min_count: int = 5, top_k: int = 50,
                     scale: int = LM_SCALE) -> DataFrame:
    """PMI-style collocation mining: the corpus bigrams whose observed
    count most exceeds the independence expectation, scored by exact
    integer lift

        lift_ppm = scale · N · C(a,b)  div  (C(a,·) · C(·,b))

    (N = total bigram occurrences, C(a,·)/C(·,b) = occurrences of a as
    first / b as second token). Lift is the ppm-scaled ratio of observed
    to expected-under-independence — monotone in PMI, but integer-exact
    so the DuckDB oracle replays it bit-for-bit (log-PMI's float sums
    diverge across engines). The min_count floor drops hapax noise; the
    result is the top_k by (lift, a, b) — a full tie-break, so the set
    is deterministic.

    Scale shape: one persisted bigram explode feeds all three
    vocab-bounded count tables (map-side combining); the scoring joins
    run over the C(a,b) AGGREGATE (never the raw occurrences), N rides
    a broadcast 1-row frame, and top_k is a TakeOrdered — no global
    sort. Products ride decimal(38,0): N·C(a,b) reaches 10^24 at corpus
    scale, far past int64."""
    bg = (spread(docs)
          .select(F.explode(bigram_pairs(F.col(text_col))).alias("p"))
          .select(F.col("p.a").alias("a"), F.col("p.b").alias("b")))
    # eager: c_ab/c_a/c_b/tot all first-touch this cache from concurrent
    # stages of one action (lazy = four bigram-explode re-runs)
    bg = transient_persist(bg, eager=True)
    c_ab = bg.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("n_ab"))
    c_a = bg.groupBy("a").agg(F.count(F.lit(1)).cast("long").alias("n_a"))
    c_b = bg.groupBy("b").agg(F.count(F.lit(1)).cast("long").alias("n_b"))
    tot = bg.agg(F.count(F.lit(1)).cast("long").alias("n"))
    scored = (c_ab.where(F.col("n_ab") >= min_count)
              .join(c_a, "a").join(c_b, "b")
              .crossJoin(F.broadcast(tot))
              .select(
                  "a", "b", "n_ab",
                  F.expr(f"(({scale}L * cast(n as decimal(38,0)) "
                         "* cast(n_ab as decimal(38,0))) div "
                         "(cast(n_a as decimal(38,0)) "
                         "* cast(n_b as decimal(38,0))))")
                   .cast("long").alias("lift_ppm")))
    return (scored
            .orderBy(F.col("lift_ppm").desc(), "a", "b")
            .limit(top_k))
