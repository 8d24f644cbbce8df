"""Test-set decontamination: n-gram overlap between a training corpus
and a held-out evaluation set.

The standard pre-training hygiene pass (GPT-3 appendix C, PaLM §B.2):
a training document is contaminated if it shares any word ``n``-gram
with an evaluation document. Both sides reduce to 60-bit gram hashes
(md5-derived, portable to the DuckDB oracle); the training side keeps
per-doc DISTINCT grams so the overlap count is "number of distinct
shared grams", not occurrences.

Scale shape (100 TB): evaluation sets are tiny relative to the corpus
(benchmarks, not crawls), so the eval gram set is collected into a
broadcast hash join — the training side explodes scan-locally, joins
map-side with ZERO corpus shuffle, and the only exchange is the final
per-doc count keyed by doc_id. The per-doc ``array_distinct`` happens
before the explode, bounding the join probe count by document length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h60, shingles, words


def _doc_grams(docs: DataFrame, n: int, id_col: str,
               text_col: str) -> DataFrame:
    """(id, g): the per-doc DISTINCT 60-bit n-gram hashes, exploded."""
    gram_hashes = F.array_distinct(
        F.transform(shingles(words(F.col(text_col)), n), h60))
    return docs.select(id_col, F.explode(gram_hashes).alias("g"))


def ngram_contamination(train: DataFrame, eval_set: DataFrame, n: int = 8,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Training docs sharing at least one word n-gram with the eval set:
    (id_col, n_shared) where n_shared counts distinct shared grams."""
    eval_grams = _doc_grams(eval_set, n, id_col, text_col) \
        .select("g").distinct()
    train_grams = _doc_grams(train, n, id_col, text_col)
    return (train_grams.join(F.broadcast(eval_grams), "g")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_shared")))


def split_contamination(docs: DataFrame, eval_pred: Column, n: int = 8,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Convenience form when eval membership is a predicate over one
    corpus table (e.g. a holdout split): contamination of the non-eval
    side against the eval side."""
    return ngram_contamination(docs.where(~eval_pred), docs.where(eval_pred),
                               n, id_col, text_col)


def semantic_contamination(train: DataFrame, eval_set: DataFrame,
                           threshold: float = 0.95,
                           vec_col: str = "embedding",
                           id_col: str = "vec_id") -> DataFrame:
    """Embedding-space decontamination (the semantic complement of
    ``ngram_contamination``): a training vector is contaminated when some
    evaluation vector sits within cosine ``threshold`` — catches
    paraphrases and translations that share no verbatim n-gram (the gap
    the GPT-4 / Llama-3 decontamination reports call out for string
    matching).

    Same scale shape as the n-gram pass: the eval side is benchmark-sized,
    so it broadcasts and the corpus is scanned ONCE with zero pre-join
    shuffle; the only exchange is the per-vector argmax keyed by the
    training id, whose input is bounded by |matches above threshold|, not
    |corpus| x |eval|. Scores are ranked and emitted at 6 dp (the rounded
    value is what cross-engine consumers see — same contract as
    ``similarity.brute_force_topk``).

    Returns ``(id_col, n_matches, eval_id, cos)``: the match count and the
    highest-scoring eval neighbor (ties broken on the smaller eval id).
    """
    from pyspark.sql import Window

    from .similarity import cosine_expr
    from ..sources.snapshot import spread

    ev = eval_set.select(F.col(id_col).alias("eval_id"),
                         F.col(vec_col).alias("ev"))
    tr = spread(train).select(F.col(id_col), F.col(vec_col).alias("tv"))
    scored = (tr.join(F.broadcast(ev), F.lit(True))
              .withColumn("cos", F.round(cosine_expr("tv", "ev"), 6))
              .where(F.col("cos") >= threshold))
    w = Window.partitionBy(id_col).orderBy(F.col("cos").desc(),
                                           F.col("eval_id"))
    n = Window.partitionBy(id_col)
    return (scored
            .withColumn("n_matches", F.count(F.lit(1)).over(n))
            .withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") == 1)
            .select(id_col, "n_matches", "eval_id", "cos"))


def containment_contamination(train: DataFrame, eval_set: DataFrame,
                              n: int = 8, threshold6: int = 0,
                              id_col: str = "doc_id",
                              text_col: str = "text") -> DataFrame:
    """ASYMMETRIC eval-containment decontamination: for each training
    doc, the eval doc whose distinct n-gram set it contains the largest
    FRACTION of — ``containment(eval, doc) = |grams(doc) ∩ grams(eval)|
    / |grams(eval)|``. This is the measure that catches an eval example
    embedded verbatim inside a much larger training document (a README
    quoting a benchmark item, a crawl page wrapping it in boilerplate),
    where symmetric Jaccard dilutes toward 0 and the binary any-shared-
    gram flag of ``ngram_contamination`` can't rank severity.

    Integer-exact: ``containment6 = n_shared * 1e6 div |grams(eval)|``
    (the engine's scaled-rational convention — no float division to
    diverge cross-engine). Returns one row per contaminated training
    doc: (id, eval_id, n_shared, containment6), the highest-containment
    eval doc with ties broken on the smaller eval id, filtered to
    ``containment6 >= threshold6``.

    Scale shape: identical ingress to ``ngram_contamination`` — the
    benchmark-sized eval gram postings AND the per-eval gram counts
    broadcast; the corpus explodes scan-locally with ZERO pre-join
    shuffle; the only exchanges are the per-(doc, eval) match count
    (bounded by actual shared grams, not |corpus|×|eval|) and the
    per-doc argmax window."""
    from pyspark.sql import Window

    eval_grams = _doc_grams(eval_set, n, id_col, text_col) \
        .select(F.col(id_col).alias("eval_id"), "g")
    eval_sizes = eval_grams.groupBy("eval_id") \
        .agg(F.count(F.lit(1)).alias("ev_n"))
    train_grams = _doc_grams(train, n, id_col, text_col)
    pair = (train_grams.join(F.broadcast(eval_grams), "g")
            .groupBy(id_col, "eval_id")
            .agg(F.count(F.lit(1)).alias("n_shared")))
    scored = (pair.join(F.broadcast(eval_sizes), "eval_id")
              .withColumn("containment6",
                          F.expr("n_shared * 1000000 div ev_n"))
              .where(F.col("containment6") >= F.lit(threshold6)))
    w = Window.partitionBy(id_col).orderBy(F.col("containment6").desc(),
                                           F.col("eval_id"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") == 1)
            .select(id_col, "eval_id", "n_shared", "containment6"))
