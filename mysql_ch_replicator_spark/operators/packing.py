"""Sequence packing: group documents into fixed token-budget training
sequences.

Trainers consume fixed-length sequences; feeding one short doc per
sequence wastes the budget on padding, so pipelines PACK documents until
the next one would overflow. This operator implements deterministic
contiguous packing: docs are hashed into ``num_buckets`` independent
streams, ordered by id within each stream, and a running token total
assigns each doc to sequence ``floor((running-1)/max_tokens)`` — the
greedy fill where the doc that crosses a budget boundary starts counting
toward its own bin. A doc longer than the budget occupies (at least) its
own sequence; chunking oversized docs is a tokenizer-side concern.

Scale shape (100 TB): ONE shuffle keyed by the hash bucket, then a
per-bucket sort — never a global sort. ``num_buckets`` is the
parallelism dial: each bucket holds ~corpus/num_buckets docs, so at
1000 executors you raise it until a bucket's docs fit one task's sort
buffer. Assignment depends only on (id, bucket count, budget) — stable
across runs, partitionings, and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import h60


def pack_sequences(df: DataFrame, id_col: str, token_col,
                   max_tokens: int, num_buckets: int = 32,
                   salt: str = "pack") -> DataFrame:
    """Assign every doc a (pack_bucket, seq_id): sequence seq_id within
    bucket pack_bucket holds consecutive-by-id docs totaling ~max_tokens
    tokens. ``token_col`` is a column name or expression giving the
    doc's token count. Output keeps n_tokens for fill accounting."""
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    bucket = h60(F.concat(F.lit(f"{salt}|"),
                          F.col(id_col).cast("string"))) % num_buckets
    w = (Window.partitionBy("pack_bucket").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    staged = df.select(id_col, bucket.alias("pack_bucket"),
                       tok.cast("long").alias("n_tokens"))
    running = F.sum("n_tokens").over(w)
    # greatest(.,1) guards leading zero-token docs (running=0 -> seq 0,
    # not -1); exact integer floor-div on both engines
    seq = F.floor((F.greatest(running, F.lit(1)) - 1) / max_tokens)
    return staged.select(id_col, "pack_bucket",
                         seq.cast("long").alias("seq_id"), "n_tokens")


def packing_stats(packed: DataFrame, max_tokens: int) -> DataFrame:
    """Per-sequence fill accounting: token total and fill ratio vs the
    budget (sequences a long doc overflowed show ratio > 1). One
    aggregate keyed by (bucket, seq) — co-partitioned with the packing
    window's own shuffle when chained."""
    return (packed.groupBy("pack_bucket", "seq_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("seq_tokens"))
            .withColumn("fill_ratio",
                        F.round(F.col("seq_tokens") / max_tokens, 6)))


def chunk_documents(df: DataFrame, id_col: str, text_col: str,
                    chunk_size: int, overlap: int = 0) -> DataFrame:
    """Split every document into fixed-size overlapping character windows —
    the "chunking oversized docs" step the packing docstring defers to the
    tokenizer side, done engine-side: chunk k covers characters
    [k*stride, k*stride + chunk_size) with stride = chunk_size - overlap,
    so consecutive chunks share ``overlap`` characters (the standard
    RAG/pretraining windowing). An empty document yields one empty chunk
    (sequence(0, 0) = [0]) so no doc silently vanishes.

    Output: (id, chunk_idx, chunk_text, chunk_len, n_chunks).

    Scale shape (100 TB): pure scan-side column expressions — sequence +
    posexplode + substr, whole-stage codegen, ZERO shuffles; output size
    is input size x (1 + overlap/stride). Token-window chunking is the
    same shape over an array of tokens (slice instead of substr)."""
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    stride = chunk_size - overlap
    length = F.length(F.col(text_col))
    offsets = F.sequence(F.lit(0), F.greatest(length - 1, F.lit(0)),
                         F.lit(stride))
    exploded = df.select(
        F.col(id_col),
        F.col(text_col).alias("_chunk_src"),
        F.size(offsets).cast("long").alias("n_chunks"),
        F.posexplode(offsets).alias("chunk_idx", "_chunk_off"))
    chunk = F.col("_chunk_src").substr(F.col("_chunk_off") + 1,
                                       F.lit(chunk_size))
    return exploded.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        chunk.alias("chunk_text"),
        F.length(chunk).cast("long").alias("chunk_len"),
        "n_chunks")
