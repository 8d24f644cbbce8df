"""Deterministic sampling/split/quantization operator properties beyond the
oracle check: proportions, the nested-subset guarantee, the no-shuffle plan,
and int8 code range."""

from pyspark.sql import functions as F

from mysql_ch_replicator_spark.operators.sampling import (
    hash_split, quantize_int8, stratified_sample,
)

SF = "/root/testdata/sf0.01"


def test_split_proportions_and_determinism(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n = docs.count()
    counts = {r.split: r.n for r in hash_split(docs, "doc_id")
              .groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / n - 0.90) < 0.02
    assert abs(counts["val"] / n - 0.05) < 0.02
    # deterministic: second evaluation identical
    again = {r.split: r.n for r in hash_split(docs, "doc_id")
             .groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == again


def test_sample_nested_subset(spark):
    """fraction 0.05 must be a strict subset of fraction 0.10 (same salt) —
    the growing-subset experiment contract."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    small = {r.doc_id for r in
             stratified_sample(docs, "doc_id", 0.05).select("doc_id").collect()}
    big = {r.doc_id for r in
           stratified_sample(docs, "doc_id", 0.10).select("doc_id").collect()}
    assert small < big


def test_split_plan_no_shuffle(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = hash_split(docs, "doc_id").select("doc_id", "split") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "split must be scan-side, no shuffle"


def test_quantize_code_range(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(200)
    q = emb.select("vec_id", *quantize_int8("embedding"))
    bad = q.where(
        F.exists("q_codes", lambda c: (c < 0) | (c > 255))).count()
    assert bad == 0
    # scale strictly positive on real embeddings
    assert q.where(F.col("q_scale") <= 0).count() == 0
