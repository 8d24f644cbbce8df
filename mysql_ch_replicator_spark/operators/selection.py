"""Data-selection operators for training-corpus curation: DSIR-style
importance scoring, first-occurrence n-gram novelty, and greedy selection
under a global token budget.

These are the "which documents make the cut" half of a pre-training data
pipeline (the dedup/decontamination family in ``dedup.py`` /
``contamination.py`` is the "which documents are redundant" half). All
public knowledge: DSIR is Xie et al. 2023 ("Data Selection for Language
Models via Importance Resampling"); the quality-rule composite lives in
``functions/text.py`` (Rae et al. 2021 Gopher rules).

Everything is built-in column expressions over md5-derived hashes (the one
hash Spark and the DuckDB oracle share, see ``functions/hashing.py``) and
integer arithmetic — no float logs, no Python UDFs — so every operator has
an exact cross-engine oracle.

Scale design (100 TB):

- DSIR bucket statistics are a fixed-width aggregate (``n_buckets`` rows,
  default 4096) — map-side combined, then **broadcast** back onto the token
  stream: the corpus itself shuffles zero times for scoring; the only wide
  exchange is the per-doc score aggregate on ``doc_id``.
- Novelty needs each n-gram's global first occurrence: one window
  partitioned by the gram (min over the whole partition — no sort, no
  join) then one doc-keyed aggregate. Two exchanges total, both map-side
  combinable. Hot grams skew a partition but never serialize the plan.
- The token-budget running sum uses the same arithmetic range-bucket
  protocol as ``replica.stamp_version_ranged``: per-bucket window sums
  plus driver-side cumulative offsets (≤ #buckets longs collected), so no
  single-partition global sort exists anywhere on the path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..cache import transient_persist
from ..functions.hashing import h60, norm_text_hash, shingles, words

DSIR_SCALE = 1_000_000  # integer weight scale — exact in both engines


def linear_quality_score(docs: DataFrame, weights: DataFrame,
                         text_col: str = "text", id_col: str = "doc_id",
                         bias_ppm: int = 0,
                         keep_threshold_ppm: int = 0) -> DataFrame:
    """Learned linear quality-classifier INFERENCE (fastText-style, the
    CCNet/LLaMA-pipeline "keep-probability" gate next to the rule-based
    Gopher filter): score = bias + mean over tokens of the term's learned
    weight, all in ppm-scaled integers so the dot product is exact in
    both engines (Spark ``div`` and DuckDB ``//`` both truncate toward
    zero — parity holds for the negative numerators hostile documents
    produce).  ``weights`` is a (term, w_ppm long) frame — training
    happens offline; inference is what the 100 TB pipeline runs.

    Scale shape: the corpus explodes to tokens once and LEFT-joins the
    BROADCAST vocab (a learned vocab is ~10^5–10^6 rows — always
    broadcastable; OOV tokens contribute 0 but still count in the mean,
    exactly like a fastText bag-of-words with a zero vector); ONE
    doc-keyed aggregate and nothing else — a zero-token doc emits a
    single NULL token so it survives the explode and scores bias without
    a corpus-sized rejoin (``count(term)`` skips the null, so its token
    count stays 0).  The corpus never shuffles before the per-doc
    aggregate; the plan pin holds the join to broadcast-hash.
    Returns (doc_id, n_tokens, score_ppm, keep)."""
    from ..sources.snapshot import spread

    w = words(F.col(text_col))
    toks = spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.when(F.size(w) > 0, w)
                  .otherwise(F.array(F.lit(None).cast("string"))))
        .alias("term"))
    agg = (toks.join(F.broadcast(weights.select("term", "w_ppm")),
                     "term", "left")
           .groupBy("doc_id")
           .agg(F.count("term").cast("long").alias("n_tokens"),
                F.coalesce(F.sum("w_ppm"), F.lit(0)).cast("long")
                 .alias("dot")))
    score = (F.lit(bias_ppm).cast("long")
             + F.when(F.col("n_tokens") > 0,
                      F.expr("dot div n_tokens")).otherwise(F.lit(0)))
    return (agg.select("doc_id", "n_tokens",
                       score.cast("long").alias("score_ppm"))
            .withColumn("keep",
                        (F.col("score_ppm") >= keep_threshold_ppm)
                        .cast("int")))


def dsir_bucket_weights(docs: DataFrame, target: Column,
                        text_col: str = "text",
                        n_buckets: int = 4096) -> DataFrame:
    """Hashed-unigram importance weights, DSIR-style.

    Tokens hash into ``n_buckets`` buckets (``h60(word) % n_buckets``); the
    weight of a bucket is the smoothed integer ratio of its target-domain
    token count to its raw-corpus token count:

        w_b = ((n_target_b + 1) * DSIR_SCALE) div (n_raw_b + 1)

    Laplace-smoothed so unseen buckets get a small nonzero weight, and pure
    BIGINT arithmetic so the Spark and DuckDB sides agree bit-for-bit
    (float log-likelihood ratios — the paper's formulation — are libm-
    dependent; an integer ratio preserves the ranking).

    Returns a ``n_buckets``-row DataFrame (bkt, n_raw, n_tgt, w) — small
    enough to broadcast at any corpus scale.
    """
    toks = docs.select(target.alias("__tgt"),
                       F.explode(words(F.col(text_col))).alias("w"))
    bkt = F.pmod(h60(F.col("w")), F.lit(n_buckets)).alias("bkt")
    cnt = (toks.groupBy(bkt)
           .agg(F.count(F.lit(1)).alias("n_raw"),
                F.sum(F.when(F.col("__tgt"), 1).otherwise(0))
                 .cast("long").alias("n_tgt")))
    return cnt.withColumn(
        "w", F.expr(f"((n_tgt + 1) * {DSIR_SCALE}L) div (n_raw + 1)"))


def dsir_scores(docs: DataFrame, target: Column, text_col: str = "text",
                id_col: str = "doc_id", n_buckets: int = 4096) -> DataFrame:
    """Per-document DSIR importance score: the sum of its tokens' bucket
    weights (with multiplicity). Higher = more target-domain-like.

    Plan: token stream → broadcast-join the ≤``n_buckets``-row weight table
    → one ``doc_id``-keyed aggregate. The corpus is scanned twice (once for
    bucket stats, once for scoring) and shuffled once (the score agg).
    """
    weights = dsir_bucket_weights(docs, target, text_col, n_buckets)
    toks = docs.select(F.col(id_col).alias("doc_id"),
                       F.explode(words(F.col(text_col))).alias("w"))
    toks = toks.withColumn("bkt", F.pmod(h60(F.col("w")), F.lit(n_buckets)))
    wts = weights.select("bkt", F.col("w").alias("__wt"))
    return (toks.join(F.broadcast(wts), "bkt")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.sum("__wt").cast("long").alias("score")))


def ngram_novelty(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """First-occurrence novelty: for each document, the share of its
    distinct word ``n``-grams whose globally-first occurrence (minimum
    doc id over the corpus) is this document.

    A cheap proxy for "how much new content does this doc add given
    everything before it" — the streaming-corpus cousin of dedup: a doc
    that is pure boilerplate scores ~0, a fresh doc scores ~1.

    Plan: distinct grams per doc → ``min(doc_id) over (partition by
    gram)`` (whole-partition frame: one exchange on the gram, NO sort, no
    self-join) → doc-keyed aggregate. Docs too short for any n-gram get
    (0, 0, 0.0) via the left join back onto the id spine.
    """
    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(
            shingles(words(F.col(text_col)), n))).alias("g"))
    first = F.min("doc_id").over(Window.partitionBy("g"))
    per_doc = (grams.withColumn("first_doc", first)
               .groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_grams"),
                    F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1)
                          .otherwise(0)).cast("long").alias("n_novel")))
    spine = docs.select(F.col(id_col).alias("doc_id"))
    return (spine.join(per_doc, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
                    F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
                    F.round(F.when(F.col("n_grams") > 0,
                                   F.col("n_novel").cast("double")
                                   / F.col("n_grams"))
                            .otherwise(F.lit(0.0)), 6)
                    .alias("novelty_ratio")))


def ranged_running_sum(df: DataFrame, key_col: str, value_col: str,
                       tie_breaks: tuple[str, ...] = (),
                       buckets: int | None = None,
                       out_col: str = "__running") -> DataFrame:
    """Global prefix sum of ``value_col`` in ``(key_col, *tie_breaks)``
    ascending order — with NO single-partition sort, the running-sum twin
    of ``replica.stamp_version_ranged``.

    Protocol: (1) one light agg fetches min/max of the integer key (2
    longs to the driver); (2) rows get an arithmetic range bucket
    ``(key - lo) div width`` — deterministic, sampling-free; (3) one more
    light agg collects per-bucket value sums (≤ ``buckets`` longs) from
    which cumulative offsets are computed driver-side; (4) a window
    partitioned BY BUCKET computes ``offset[bucket] + running sum within
    bucket``. Each partition sorts only its own key slice.
    """
    spark = df.sparkSession
    if buckets is None:
        buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    k = F.col(key_col)
    bounds = df.agg(F.min(k).alias("lo"), F.max(k).alias("hi")).collect()[0]
    if bounds.lo is None:  # empty input
        return df.withColumn(out_col, F.lit(None).cast("long"))
    lo, hi = int(bounds.lo), int(bounds.hi)
    width = max((hi - lo) // buckets + 1, 1)
    with_bucket = df.withColumn(
        "__bucket", F.expr(f"(({key_col} - {lo}L) div {width}L)"))

    sums = {int(r.b): int(r.s) for r in
            with_bucket.groupBy(F.col("__bucket").alias("b"))
            .agg(F.sum(F.col(value_col)).alias("s")).collect()}
    offsets, acc = {}, 0
    for b in sorted(sums):
        offsets[b] = acc
        acc += sums[b]
    offset_map = F.create_map(*[F.lit(x) for b in sorted(offsets)
                                for x in (b, offsets[b])])

    w = (Window.partitionBy("__bucket")
         .orderBy(k, *[F.col(t) for t in tie_breaks])
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (with_bucket
            .withColumn(out_col,
                        (F.sum(F.col(value_col)).over(w)
                         + offset_map[F.col("__bucket")]).cast("long"))
            .drop("__bucket"))


def curation_pipeline(docs: DataFrame, budget_tokens: int,
                      text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """The full corpus-curation pipeline as ONE composed plan:
    quality gate (Gopher rules) → normalized exact dedup among gated docs
    → greedy token-budget selection among survivors — the standard
    filter/dedup/select order of a pre-training data build.

    Returns every input doc with its stage outcomes: ``passed_gate``,
    ``is_survivor`` (gated AND the min-id keeper of its normalized-content
    group), ``cum_tokens`` (prefix position in the quality-desc ranking of
    survivors; NULL for docs that never reach selection) and ``selected``.
    Keeping all stages' verdicts on every row makes the pipeline auditable
    — "why did this doc drop" is a column read, not a diff of snapshots.

    Scale: one scan computes every per-doc signal; the dedup keeper is one
    hash-keyed aggregate; the budget stage runs the range-bucketed running
    sum over survivors only. No stage re-tokenizes (signals are staged),
    and nothing sorts globally in one task.
    """
    from ..functions.text import (
        alpha_word_ratio, gopher_passes, mean_word_len, punct_ratio,
        quality_score, stopword_count, token_count_bpe,
    )
    from ..functions.hashing import words

    t = F.col(text_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(words(t)).cast("long").alias("__nw"),
        mean_word_len(t).alias("__mwl"),
        alpha_word_ratio(t).alias("__alpha"),
        stopword_count(t).cast("long").alias("__nstop"),
        punct_ratio(t).alias("__pr"),
        token_count_bpe(t).cast("long").alias("n_tokens"),
        quality_score(t).alias("quality"),
        norm_text_hash(t).alias("__h"))
    gated = base.withColumn(
        "passed_gate",
        gopher_passes(F.col("__nw"), F.col("__mwl"), F.col("__alpha"),
                      F.col("__nstop"), F.col("__pr")).cast("long")) \
        .transform(lambda d: transient_persist(d, eager=True))
    # ^ every signal used by 2+ downstream jobs, which first-touch the
    # cache from concurrent stages — eager, or each re-runs the full
    # quality/tokenize projection (cache stampede, guide §5)
    keeper = (gated.where(F.col("passed_gate") == 1)
              .groupBy("__h").agg(F.min("doc_id").alias("__keep")))
    staged = gated.join(keeper, "__h", "left").withColumn(
        "is_survivor",
        ((F.col("passed_gate") == 1)
         & (F.col("doc_id") == F.col("__keep"))).cast("long"))
    sel_in = staged.where(F.col("is_survivor") == 1) \
        .select("doc_id", "n_tokens", "quality") \
        .withColumn("__qkey", (-F.round(F.col("quality") * 1e6, 0))
                    .cast("long"))
    run = ranged_running_sum(sel_in, "__qkey", "n_tokens",
                             tie_breaks=("doc_id",), out_col="cum_tokens")
    sel = run.select(
        "doc_id", "cum_tokens",
        F.when(F.col("cum_tokens") <= budget_tokens, 1).otherwise(0)
        .cast("long").alias("__sel"))
    return (staged.join(sel, "doc_id", "left")
            .select("doc_id", "passed_gate",
                    F.coalesce("is_survivor", F.lit(0)).alias("is_survivor"),
                    "n_tokens", "quality", "cum_tokens",
                    F.coalesce("__sel", F.lit(0)).alias("selected")))


def token_budget_select(docs: DataFrame, budget_tokens: int,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Greedy quality-first selection under a global token budget: order
    documents by (quality desc, id asc), keep every doc whose cumulative
    BPE-ish token count stays within ``budget_tokens`` — the standard
    "fill the training mix from the top of the quality ranking" step.

    Returns ALL docs with their quality, token count, cumulative position
    and a 0/1 ``selected`` flag (callers filter; returning the full
    ranking keeps the operator composable and exactly comparable).

    The global running sum uses ``ranged_running_sum`` over an integer
    quality key (quality is already rounded to 6 decimals, so
    ``-round(quality * 1e6)`` is an order-preserving exact long key) —
    no single-partition sort at any scale.
    """
    from ..functions.text import quality_score, token_count_bpe

    t = F.col(text_col)
    scored = docs.select(
        F.col(id_col).alias("doc_id"),
        token_count_bpe(t).cast("long").alias("n_tokens"),
        quality_score(t).alias("quality"))
    # Stage the scored projection: the ranged running sum runs THREE jobs
    # over it (key bounds, per-bucket sums, final window) and the quality
    # expression is the expensive part — without staging each job would
    # re-tokenize the whole corpus. At 100 TB this is a written table;
    # here, a cache of 4 narrow columns per doc.
    keyed = transient_persist(scored.withColumn(
        "__qkey", (-F.round(F.col("quality") * 1e6, 0)).cast("long")))
    run = ranged_running_sum(keyed, "__qkey", "n_tokens",
                             tie_breaks=("doc_id",), out_col="cum_tokens")
    return (run.drop("__qkey")
            .withColumn("selected",
                        F.when(F.col("cum_tokens") <= budget_tokens, 1)
                        .otherwise(0).cast("long")))


def mixture_plan(docs: DataFrame, stratum_col: str,
                 weights: dict[str, int], budget_tokens: int,
                 text_col: str = "text") -> DataFrame:
    """Token-budget mixture PLANNING — the step before
    ``sampling.mixture_sample``/``epoch_upsample`` can run: given target
    integer mixture weights and a total token budget, compute per
    stratum what the corpus can actually deliver.

    Per stratum: ``tokens_available`` (whitespace tokens, the shared
    ``token_count_ws`` contract), ``target_tokens = budget * w div
    Σw``, the downsampling rate ``rate6 = min(1e6, target*1e6 div
    available)``, the ``planned_tokens`` that rate yields, the
    ``deficit_tokens`` a single epoch cannot cover, and ``epochs_x100 =
    target*100 div available`` (>100 ⇒ the source must repeat — feed it
    to epoch_upsample). Strata in the corpus but not in ``weights`` get
    w=0 (explicitly planned to zero, never silently dropped); strata in
    ``weights`` but absent from the corpus surface with available=0 and
    full deficit — the plan EXPOSES an unfillable mix instead of letting
    a 100 TB job discover it.

    Exactness: every division is integer (the scaled-rational
    convention); the two products that exceed int64 at real corpus sizes
    (target×1e6, available×rate6 — ~1e21 at a 1e13-token corpus) run in
    decimal(38,0) (HUGEINT on the oracle). Scale shape: ONE combining
    token-count aggregate over the corpus; everything after is
    |strata|-sized with the weight table broadcast."""
    from ..functions.text import token_count_ws

    spark = docs.sparkSession
    dec = "decimal(38,0)"
    sum_w = sum(weights.values())
    if sum_w <= 0:
        raise ValueError("mixture_plan: weights must sum to a positive "
                         "integer")
    avail = (docs.groupBy(F.col(stratum_col).alias("stratum"))
             .agg(F.sum(token_count_ws(F.col(text_col)))
                  .cast("long").alias("tokens_available")))
    wdf = spark.createDataFrame(sorted(weights.items()),
                                "stratum string, w long")
    j = (avail.join(F.broadcast(wdf), "stratum", "full_outer")
         .select("stratum",
                 F.coalesce("w", F.lit(0)).cast("long").alias("w"),
                 F.coalesce("tokens_available", F.lit(0)).cast("long")
                 .alias("tokens_available")))
    j = j.withColumn(
        "target_tokens",
        F.expr(f"CAST({int(budget_tokens)} AS BIGINT) * w div {sum_w}"))
    j = j.withColumn(
        "rate6",
        F.when(F.col("tokens_available") <= 0, F.lit(0).cast("long"))
        .when(F.col("target_tokens") >= F.col("tokens_available"),
              F.lit(1_000_000).cast("long"))
        .otherwise(F.expr(
            f"CAST(target_tokens AS {dec}) * 1000000 "
            f"div CAST(tokens_available AS {dec})")))
    j = j.withColumn(
        "planned_tokens",
        F.when(F.col("rate6") == 1_000_000, F.col("tokens_available"))
        .otherwise(F.expr(
            f"CAST(tokens_available AS {dec}) * CAST(rate6 AS {dec}) "
            f"div 1000000")))
    return (j.withColumn(
        "deficit_tokens",
        F.greatest(F.col("target_tokens") - F.col("planned_tokens"),
                   F.lit(0).cast("long")))
        .withColumn(
            "epochs_x100",
            F.when(F.col("tokens_available") > 0, F.expr(
                f"CAST(target_tokens AS {dec}) * 100 "
                f"div CAST(tokens_available AS {dec})"))
            .otherwise(F.lit(None).cast("long")))
        .select("stratum", "w", "tokens_available", "target_tokens",
                "rate6", "planned_tokens", "deficit_tokens",
                "epochs_x100"))
