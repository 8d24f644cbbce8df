"""chunk_documents + shuffle_shards: reconstruction, determinism, and
plan-shape (chunking must stay scan-side; shuffling must cost exactly one
exchange)."""

import pytest
from pyspark.sql import functions as F

from mysql_ch_replicator_spark.operators.packing import chunk_documents
from mysql_ch_replicator_spark.operators.sampling import shuffle_shards


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "abcdefghij"),          # 10 chars
        (2, ""),                    # empty doc
        (3, "x"),                   # single char
        (4, "0123456789" * 7),      # 70 chars, many chunks
        (5, "exact"),               # == chunk_size when size=5
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _chunks(docs, size, overlap):
    return {(r.doc_id, r.chunk_idx): r
            for r in chunk_documents(docs, "doc_id", "text",
                                     chunk_size=size,
                                     overlap=overlap).collect()}


def test_chunk_covers_and_reconstructs(docs):
    size, overlap, stride = 4, 1, 3
    got = _chunks(docs, size, overlap)
    texts = {r.doc_id: r.text for r in docs.collect()}
    for doc_id, text in texts.items():
        n = max(len(text) - 1, 0) // stride + 1
        mine = [got[(doc_id, k)] for k in range(n)]
        assert all(r.n_chunks == n for r in mine)
        # chunk k is exactly text[k*stride : k*stride+size]
        for k, r in enumerate(mine):
            assert r.chunk_text == text[k * stride:k * stride + size]
            assert r.chunk_len == len(r.chunk_text)
        # drop the overlap from every chunk but the first -> original text
        rebuilt = mine[0].chunk_text + "".join(
            r.chunk_text[overlap:] for r in mine[1:])
        assert rebuilt == text
        # no extra chunks beyond n
        assert (doc_id, n) not in got


def test_chunk_empty_doc_yields_one_empty_chunk(docs):
    got = _chunks(docs, 4, 1)
    r = got[(2, 0)]
    assert r.chunk_text == "" and r.chunk_len == 0 and r.n_chunks == 1


def test_chunk_overlap_must_be_smaller():
    with pytest.raises(ValueError):
        chunk_documents(None, "doc_id", "text", chunk_size=4, overlap=4)


def test_chunk_plan_is_scan_side(docs):
    plan = chunk_documents(docs, "doc_id", "text", 4, 1) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_shuffle_shards_contract(docs):
    out = shuffle_shards(docs, "doc_id", n_shards=3, epoch=0).collect()
    assert sorted(r.doc_id for r in out) == [1, 2, 3, 4, 5]
    by_shard = {}
    for r in out:
        assert 0 <= r.shard < 3
        by_shard.setdefault(r.shard, []).append(r.pos)
    # positions are dense 0..n-1 within each shard
    for poss in by_shard.values():
        assert sorted(poss) == list(range(len(poss)))


def test_shuffle_deterministic_and_epoch_sensitive(docs):
    a = {(r.doc_id): (r.shard, r.pos)
         for r in shuffle_shards(docs, "doc_id", 3, epoch=0).collect()}
    b = {(r.doc_id): (r.shard, r.pos)
         for r in shuffle_shards(docs, "doc_id", 3, epoch=0).collect()}
    c = {(r.doc_id): (r.shard, r.pos)
         for r in shuffle_shards(docs, "doc_id", 3, epoch=1).collect()}
    assert a == b          # stable across runs
    assert a != c          # epoch re-randomizes


def test_shuffle_single_exchange(docs):
    plan = shuffle_shards(docs, "doc_id", 3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_shuffle_order_matches_hash_order(spark):
    # reading a shard by pos must equal ordering its docs by (h60, id)
    from mysql_ch_replicator_spark.functions.hashing import h60
    docs = spark.range(0, 200).select(F.col("id").alias("doc_id"))
    out = shuffle_shards(docs, "doc_id", n_shards=4, epoch=2)
    h = h60(F.concat(F.lit("shuffle|2|"), F.col("doc_id").cast("string")))
    expect = (docs.select("doc_id", h.alias("h"))
              .withColumn("shard", (F.col("h") % 4).cast("long")))
    rows = {r.doc_id: (r.shard, r.pos) for r in out.collect()}
    by_shard = {}
    for r in expect.collect():
        by_shard.setdefault(r.shard, []).append((r.h, r.doc_id))
    for shard, hs in by_shard.items():
        for pos, (_, doc_id) in enumerate(sorted(hs)):
            assert rows[doc_id] == (shard, pos)
