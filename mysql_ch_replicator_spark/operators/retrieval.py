"""Lexical retrieval — full BM25 (Robertson/Sparck Jones) top-k over the
corpus, in EXACT integer arithmetic.

The repo's hybrid RRF query (similarity.hybrid_rrf_search) uses a
degenerate occurrence-count lexical arm; this is the real scorer a
production retrieval stack runs, kept engine-exact the same way the
TF-IDF query is (queries_ml.tfidf_top_terms): every float in the classic
formula is replaced by an integer-scaled rational, so Spark and any SQL
engine rank identically — float ln()/division differ in the last ulp
across runtimes and flip rankings at near-ties.

With k1 = 1.2 and b = 0.75 (the standard defaults), N docs, TL total
tokens, per-doc length dl and per-(doc,term) frequency tf:

    idf       = ln((N - df + 0.5)/(df + 0.5) + 1)      -- classic, floats
    idf6      = (1e6 * (2*(N - df) + 1)) div (2*df + 1)
                 -- the EXACT rational (N-df+0.5)/(df+0.5) scaled 1e6;
                 -- ln is monotone, and per-term ordering is all the sum
                 -- needs to stay deterministic, so the rational form
                 -- keeps BM25's df-ordering without any float
    tf-part   = tf*(k1+1) / (tf + k1*(1 - b + b*dl*N/TL))
    tfn6      = (1e6 * 22*tf*TL) div (10*TL*tf + 3*TL + 9*dl*N)
                 -- multiply num/den by 10*TL: every operand integral
    score     = sum over query terms of idf6 * tfn6    -- decimal(38,0)

The products run in decimal(38,0) (HUGEINT on a DuckDB oracle): at a
100 TB corpus TL ~ 1e13 pushes the tfn6 numerator past int64, and
idf6*tfn6 past it again (the embedding_outlier_scores lesson — ADVICE
r5).  Determinism note: this is a *variant* scoring (rational idf, not
ln-idf); it is documented as such and identical in both engines, which
is the property the oracle gate checks.

Scale shape: ONE tokenizing explode feeds a single per-doc aggregate
producing (dl, per-query-term tf) together — the corpus text is read
and tokenized exactly once, and the shuffle carries one row per doc
with |terms|+1 longs, not the token stream; df aggregates the (tiny)
per-term unpivot of that table; N/TL ride along as a broadcast one-row
frame (zero driver round-trips); the final top-k is a
TakeOrderedAndProject after a bounded per-doc sum."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cache import transient_persist
from ..functions.hashing import words
from ..sources.snapshot import spread

BM25_SCALE = 1_000_000


def bm25_topk(docs: DataFrame, query_terms: list[str], k: int = 20,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Top-``k`` documents for a term query under integer-exact BM25.

    Returns (doc_id, score, rank); ``score`` is decimal(38,0) — the
    1e12-scaled sum of idf6*tfn6 contributions — ordered descending with
    doc_id breaking ties."""
    terms = sorted({t.lower() for t in query_terms})
    # ONE explode pass stages (doc_id, dl, query-term tfs) — dl and the
    # per-term counts come out of the same scan-side aggregate, so the
    # corpus text is tokenized exactly once; TL derives from the dl table
    # and N from a pruned count scan (no text read).
    tok = spread(docs).select(F.col(id_col).alias("doc_id"),
                              F.explode(words(F.col(text_col))).alias("term"))
    per_doc = transient_persist(
        tok.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("long").alias("dl"),
            *[F.sum(F.when(F.col("term") == t, 1).otherwise(0))
              .cast("long").alias(f"__tf_{i}")
              for i, t in enumerate(terms)]))
    dl = per_doc.select("doc_id", "dl")
    n_tl = docs.agg(
        F.count(F.lit(1)).cast("long").alias("n")).crossJoin(
        per_doc.agg(F.sum("dl").cast("long").alias("tl")))
    tf = (per_doc.select(
        "doc_id",
        F.explode(F.map_from_arrays(
            F.array(*[F.lit(t) for t in terms]),
            F.array(*[F.col(f"__tf_{i}") for i in range(len(terms))])))
        .alias("term", "tf"))
        .where(F.col("tf") > 0))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))

    dec = "decimal(38,0)"
    idf6 = F.expr(
        f"CAST({BM25_SCALE} AS {dec}) * CAST(2*(n - df) + 1 AS {dec}) "
        f"div CAST(2*df + 1 AS {dec})")
    tfn6 = F.expr(
        f"CAST({BM25_SCALE} AS {dec}) * CAST(22 AS {dec}) "
        f"* CAST(tf AS {dec}) * CAST(tl AS {dec}) "
        f"div (CAST(10 AS {dec})*CAST(tl AS {dec})*CAST(tf AS {dec}) "
        f"+ CAST(3 AS {dec})*CAST(tl AS {dec}) "
        f"+ CAST(9 AS {dec})*CAST(dl AS {dec})*CAST(n AS {dec}))")
    scored = (tf.join(F.broadcast(dfreq), "term")
              .join(dl, "doc_id")
              .crossJoin(F.broadcast(n_tl))
              .withColumn("idf6", idf6)
              .withColumn("tfn6", tfn6)
              .groupBy("doc_id")
              .agg(F.sum(F.col("idf6").cast(dec) * F.col("tfn6").cast(dec))
                   .cast(dec).alias("score")))
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id")).limit(k)
    from pyspark.sql import Window
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return (top.withColumn("rank", F.row_number().over(w))
            .select("doc_id", "score", "rank"))


def build_inverted_index(docs: DataFrame, span: int = 256,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Segmented inverted index: (term, seg, seg_n, postings, df) — the
    posting-list build behind every lexical retrieval stack (Lucene's
    per-segment postings, Sphinx/Manticore's doc-id-range shards).

    Segmentation is SPAN-based, not rank-based: a posting lands in
    segment ``doc_id div span``, so segments form deterministic doc-id
    ranges and — the scale point — NO per-term global sort ever happens.
    A rank-based split (row_number over the term's postings) would
    funnel a stopword's billions of postings through one window
    partition; span-based segmentation turns the same stopword into
    many (term, seg) groups, each bounded by ``span``, that aggregate
    independently with map-side combine. Hot terms cost more SEGMENTS,
    never a bigger task. Sorting happens inside each bounded segment
    (``sort_array`` on ≤ span elements, scan-local).

    ``df`` (corpus document frequency, the number every scorer needs) is
    a second term-keyed aggregate over the same distinct postings,
    joined back — term-uniform shuffle, no skew amplification.

    Postings are emitted as a comma-joined string: the portable surface
    for cross-engine hashing, and incidentally the compact wire form a
    downstream index loader consumes.
    """
    tok = (docs.select(F.col(id_col).alias("doc_id"),
                       F.explode(words(F.col(text_col))).alias("term"))
           .distinct())
    seg = (tok.withColumn("seg", F.expr(f"doc_id div {span}"))
           .groupBy("term", "seg")
           .agg(F.count(F.lit(1)).alias("seg_n"),
                F.array_join(
                    F.transform(F.sort_array(F.collect_list("doc_id")),
                                lambda x: x.cast("string")),
                    ",").alias("postings")))
    dfreq = tok.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return seg.join(dfreq, "term").select(
        "term", "seg", "seg_n", "postings", "df")
