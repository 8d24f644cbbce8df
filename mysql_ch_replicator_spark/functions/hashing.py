"""Portable hashing/text primitives shared by the dedup + similarity suite.

Everything here is built on ``md5`` because it is the one hash both Spark and
DuckDB (the correctness oracle) compute identically — Spark's ``hash()`` /
``xxhash64`` and DuckDB's ``hash()`` are different algorithms. A 60-bit
integer hash is derived from the first 15 hex chars (fits in a signed long in
both engines).

All builders return Column expressions (JVM-side, whole-stage codegen);
nothing here drops to Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WORD_SPLIT_RE = "[^a-z0-9]+"


def md5_hex(col: Column) -> Column:
    return F.md5(col)


def h60(col: Column) -> Column:
    """Deterministic 60-bit integer hash, identical in Spark and DuckDB:
    ``CAST('0x' || substr(md5(x),1,15) AS BIGINT)``."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def norm_text_hash(col: Column) -> Column:
    """md5 of the case/punctuation-normalized text — THE normalization
    contract shared by normalized dedup, the curation pipeline, and the
    corpus audit report (one definition, one SQL twin:
    ``md5(trim(regexp_replace(lower(x), '[^a-z0-9]+', ' ', 'g')))``).
    Change it here and every consumer + oracle moves together."""
    return F.md5(F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " ")))


def words(col: Column) -> Column:
    """Lowercased alphanumeric tokens, empties dropped — the tokenizer every
    text operator shares (DuckDB twin: list_filter(regexp_split_to_array(
    lower(x), '[^a-z0-9]+'), w -> w != ''))."""
    return F.filter(F.split(F.lower(col), WORD_SPLIT_RE), lambda w: w != "")


def shingles(words_col: Column, n: int) -> Column:
    """Word n-gram shingles: space-joined sliding windows of length n.
    Docs shorter than n words yield an empty array."""
    return F.when(
        F.size(words_col) < n, F.array().cast("array<string>")
    ).otherwise(F.transform(
        F.sequence(F.lit(0), F.size(words_col) - n),
        lambda i: F.array_join(F.slice(words_col, i + 1, n), " "),
    ))


def minhash_signature(shingles_col: Column, num_hashes: int) -> Column:
    """MinHash signature as an array of ``num_hashes`` hex strings: for seed
    k, ``min(md5(k || '|' || shingle))``. String min == numeric min on the
    uniformly-distributed hex (lexicographic order), and stays portable.

    Empty shingle set → array of NULLs (doc too short to minhash)."""
    seeds = F.array(*[F.lit(str(k)) for k in range(num_hashes)])
    return F.transform(
        seeds,
        lambda s: F.array_min(
            F.transform(shingles_col,
                        lambda g: F.md5(F.concat(s, F.lit("|"), g)))),
    )


def lsh_band_keys(signature_col: Column, bands: int, rows_per_band: int) -> Column:
    """LSH banding: hash each band of ``rows_per_band`` signature entries to
    one bucket key; docs agreeing on ANY band are candidate pairs
    (probability 1-(1-s^r)^b for Jaccard s)."""
    band_ids = F.array(*[F.lit(b) for b in range(bands)])
    return F.transform(
        band_ids,
        lambda b: F.md5(F.concat(
            b.cast("string"), F.lit("#"),
            F.array_join(F.slice(signature_col, b * rows_per_band + 1,
                                 rows_per_band), ","))),
    )


def simhash64(words_col: Column, bits: int = 60) -> Column:
    """SimHash fingerprint: per-bit majority vote of the word hashes.
    bit i of fingerprint = 1 iff sum over words of (±1 by word-hash bit i)
    is positive. 60 bits so the value fits a signed long in both engines.

    Single pass over the words: each word hash (one md5) is expanded into a
    ±1 vote vector and folded into a 60-counter accumulator array —
    O(words × bits) integer ops but exactly ONE md5 per word. (A naive
    per-bit formulation inlines the hash transform into all 60 bit
    expressions; Catalyst's CollapseProject duplicates it and the md5 work
    explodes 60×.)"""
    hashes = F.transform(words_col, h60)  # ONE md5 per word
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), bits),
        # h is a bound lambda variable (already-computed long), so the
        # 60-bit expansion below is pure integer ops
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(bits - 1)),
                lambda i: F.when(
                    F.call_function("shiftright", h, i.cast("int"))
                     .bitwiseAND(F.lit(1)) == 1,
                    F.lit(1)).otherwise(F.lit(-1))),
            lambda a, v: a + v),
    )
    # fold the vote counters into the fingerprint long
    return F.aggregate(
        F.zip_with(votes,
                   F.sequence(F.lit(0), F.lit(bits - 1)),
                   lambda v, i: F.when(
                       v > 0,
                       F.call_function("shiftleft", F.lit(1).cast("long"),
                                       i.cast("int")))
                    .otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, b: acc + b,
    )


def hamming60(a: Column, b: Column) -> Column:
    """Hamming distance between two 60-bit fingerprints (bit_count(xor))."""
    return F.bit_count(a.bitwiseXOR(b))


def h60_py(s: str) -> int:
    """Driver-side twin of ``h60`` (same md5-prefix arithmetic) for the
    rare places a plan needs the hash of a LITERAL before Spark runs —
    e.g. computing which index shards a query's terms live in, so the
    scan prunes partitions at planning time."""
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
