"""Byte-pair-encoding merge induction over a corpus (Sennrich et al. 2016)
— the tokenizer-training step of an LLM data pipeline, expressed as pure
DataFrame algebra with ZERO driver round-trips.

Classic BPE iterates: count adjacent symbol pairs, merge the most frequent
pair everywhere, repeat. Two representation choices make this engine-shaped:

1. **The working set is the word-frequency table, not the corpus.** One
   map-side-combining aggregate collapses the corpus to (word, freq); every
   merge round then touches |vocab| rows — orders of magnitude smaller than
   the corpus, and exactly how reference BPE trainers work.

2. **A word's symbol sequence is a STRING with each symbol wrapped in
   separators** (``<SEP>sym<SEP>`` concatenated), so applying a merge is one
   built-in ``replace`` call: the pattern ``<SEP>x<SEP><SEP>y<SEP>`` →
   ``<SEP>xy<SEP>`` consumes both symbols' full wrappers, and left-to-right
   non-overlapping ``replace`` semantics (identical in Spark and DuckDB)
   are EXACTLY greedy BPE within-round merge semantics: "aaaa" under (a,a)
   becomes [aa, aa], "aaa" becomes [aa, a], and a token formed this round
   never re-merges this round. The separator is a non-alphanumeric
   codepoint the tokenizer can never emit inside a symbol.

The per-round argmax pair is a 1-row DataFrame cross-joined back in
(broadcast, the repo's standard scalar-join form) — no ``collect``; each
round ends in an eager ``localCheckpoint`` of the (small) vocab table so
the plan stays linear in R instead of exponential. Deterministic via
exact integer counts and a total (count DESC, pair ASC) tie-break.

Scale shape (100 TB): corpus → vocab is the only full-size aggregate;
each round is a vocab-size explode + one pair aggregate + a broadcast
scalar join. R is a static hyperparameter (tokenizer trainings run a
fixed merge budget), so the unrolled plan depth is bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import words

SEP = "␟"


def _symbols(repr_col):
    return F.filter(F.split(repr_col, SEP), lambda s: s != "")


def _pair_strings(repr_col):
    """Adjacent symbol pairs as 'x y' strings (symbols are alphanumeric,
    so the space is unambiguous and string order == (x, y) tuple order)."""
    syms = _symbols(repr_col)
    return F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(syms) - 1, F.lit(1))),
            lambda i: F.concat(F.element_at(syms, i), F.lit(" "),
                               F.element_at(syms, i + 1)),
        )).otherwise(F.array().cast("array<string>"))


def learn_bpe_merges(docs: DataFrame, text_col: str,
                     rounds: int = 3) -> DataFrame:
    """Learn the first ``rounds`` BPE merges from a corpus.

    Returns one row per round: (round, merge_x, merge_y, pair_count,
    corpus_tokens) where pair_count is the winning pair's corpus-weighted
    frequency and corpus_tokens the total symbol count AFTER applying the
    merge — the compression trajectory a tokenizer training reports."""
    vocab = (docs.select(F.explode(words(F.col(text_col))).alias("word"))
             .groupBy("word").agg(F.count(F.lit(1)).alias("freq")))
    repr0 = F.concat(F.lit(""), F.regexp_replace(
        F.col("word"), "(.)", SEP + "$1" + SEP))
    cur = vocab.select("word", "freq", repr0.alias("repr"))

    stats: list[DataFrame] = []
    for r in range(1, rounds + 1):
        counted = (cur.select("freq",
                              F.explode(_pair_strings(F.col("repr")))
                              .alias("pair"))
                   .groupBy("pair")
                   .agg(F.sum("freq").cast("long").alias("cnt")))
        best = (counted.orderBy(F.col("cnt").desc(), F.col("pair").asc())
                .limit(1)
                .select(F.split("pair", " ").getItem(0).alias("x"),
                        F.split("pair", " ").getItem(1).alias("y"),
                        "cnt"))
        pattern = F.concat(F.lit(SEP), F.col("x"), F.lit(SEP + SEP),
                           F.col("y"), F.lit(SEP))
        merged = F.concat(F.lit(SEP), F.col("x"), F.col("y"), F.lit(SEP))
        # localCheckpoint truncates the lineage each round (the
        # connected_components pattern): without it every stats/count
        # consumer re-derives ALL previous rounds and the physical plan
        # grows exponentially in R (measured: 101 exchanges at R=3).
        # The vocab table is small — materializing it per round is the
        # cheap side of that trade, and it is still a distributed
        # materialization, not a driver collect.
        cur = (cur.crossJoin(F.broadcast(best))
               .withColumn("repr", F.replace(F.col("repr"), pattern, merged))
               .drop("x", "y", "cnt")
               .localCheckpoint(eager=True))
        toks = cur.agg(
            F.sum(F.col("freq") * F.size(_symbols(F.col("repr"))))
             .cast("long").alias("corpus_tokens"))
        stats.append(
            best.crossJoin(F.broadcast(toks))
            .select(F.lit(r).cast("long").alias("round"),
                    F.col("x").alias("merge_x"),
                    F.col("y").alias("merge_y"),
                    F.col("cnt").alias("pair_count"),
                    "corpus_tokens"))
    out = stats[0]
    for s in stats[1:]:
        out = out.unionByName(s)
    return out


#: Merge-chain length kept in ONE projection. Below this the encode is a
#: zero-join scan-side chain; above it the chain is segmented over the
#: vocab table with a checkpoint per segment (plan depth stays O(segment),
#: materialization stays vocab-sized). 64 keeps the generated code well
#: under janino's 64KB method limit.
APPLY_SEGMENT = 64


def _chain_merges(enc, merges: list[tuple[str, str]]):
    for x, y in merges:
        enc = F.replace(enc, F.lit(f"{SEP}{x}{SEP}{SEP}{y}{SEP}"),
                        F.lit(f"{SEP}{x}{y}{SEP}"))
    return enc


def apply_bpe_merges(docs: DataFrame, merges: list[tuple[str, str]],
                     text_col: str = "text",
                     id_col: str = "doc_id",
                     segment: int = APPLY_SEGMENT) -> DataFrame:
    """Encode the corpus with a LEARNED merge list — the tokenizer-apply
    companion of ``learn_bpe_merges``: each word's wrapped-separator
    representation goes through the merges in priority order (one built-in
    ``replace`` per merge, literal patterns), then per-doc token counts
    aggregate.

    Left-to-right non-overlapping ``replace`` is exactly greedy BPE
    within-merge application, identically in Spark and the SQL oracle —
    the same property the learner leans on.

    Scale shape, two regimes (r5 verdict #7 — plan depth used to grow
    unboundedly with |merges|):

    - ``len(merges) <= segment``: one explode + chained replaces in a
      single whole-stage-codegen projection + one doc-keyed aggregate —
      zero joins, nothing shuffles except the final agg.
    - larger merge lists (real tokenizers run 30k+): the chain runs over
      the DISTINCT-WORD table instead of the occurrence stream — the
      learner's working-set trick — segmented ``segment`` merges per
      projection with an eager ``localCheckpoint`` between segments, so
      both expression depth and generated-method size are bounded by
      ``segment`` while each materialization is vocab-sized, never
      corpus-sized. Occurrences then join the per-word symbol count on
      the word key (one extra shuffle — the price of a bounded plan,
      paid only in the big-vocab regime).

    Returns (doc_id, n_words, n_tokens_bpe)."""
    repr0 = F.regexp_replace(F.col("word"), "(.)", SEP + "$1" + SEP)
    occurrences = docs.select(F.col(id_col).alias("doc_id"),
                              F.explode(words(F.col(text_col))).alias("word"))
    if len(merges) <= segment:
        enc = _chain_merges(repr0, merges)
        return (occurrences
                .select("doc_id", F.size(_symbols(enc)).alias("n_sym"))
                .groupBy("doc_id")
                .agg(F.count(F.lit(1)).cast("long").alias("n_words"),
                     F.sum("n_sym").cast("long").alias("n_tokens_bpe")))
    counts = (occurrences.groupBy("doc_id", "word")
              .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    vocab = counts.select("word").distinct() \
        .withColumn("enc", repr0)
    for lo in range(0, len(merges), segment):
        vocab = vocab.withColumn(
            "enc", _chain_merges(F.col("enc"), merges[lo:lo + segment]))
        if lo + segment < len(merges):
            vocab = vocab.localCheckpoint(eager=True)
    syms = vocab.select("word", F.size(_symbols(F.col("enc"))).alias("n_sym"))
    return (counts.join(syms, "word")
            .groupBy("doc_id")
            .agg(F.sum("cnt").cast("long").alias("n_words"),
                 F.sum(F.col("cnt") * F.col("n_sym"))
                  .cast("long").alias("n_tokens_bpe")))
