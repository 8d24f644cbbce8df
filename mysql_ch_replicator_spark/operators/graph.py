"""Iterative graph rank over a token co-occurrence graph.

Data-curation pipelines rank sources/domains/terms by link or
co-occurrence authority (Common Crawl's harmonic-centrality domain
ranks, TextRank keyword extraction) and feed the rank into mixture
weights. This module gives the engine that shape: build a weighted
directed graph from corpus text, then run a fixed number of PageRank
iterations in EXACT fixed-point integer arithmetic so the result is
bit-identical across engines (the DuckDB oracle runs the same three
iterations as chained CTEs — float PR can never be hash-compared).

Fixed-point contract (scale 1e12, damping 85/100):

    rank0(v)   = SCALE
    contrib(e) = w(e) * (rank(src) div out_w(src))     -- integer div
    rank'(v)   = (15*SCALE) div 100  +  (85 * sum contrib) div 100

Dangling mass (nodes with no out-edges) is dropped, not redistributed —
documented, deterministic, and standard for ranking use cases where
only the ORDER matters.

Scale shape (100 TB): the edge list is the big side and shuffles once
per iteration on its destination key (the groupBy); the rank table is
vertex-cardinality. With a token/domain vocabulary the rank side is
broadcast-sized and AQE turns every rank join into a broadcast — the
edge list itself never re-partitions, exactly the Pregel cost model.
Plan depth is ``iterations`` joins; at the 3–10 iterations ranking
needs, no checkpoint is required (the transitive-closure operator in
``dedup.py`` shows the checkpointed variant for unbounded loops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import shingles, words

SCALE = 10 ** 12
_BASE = 15 * SCALE // 100  # (1 - d) * SCALE, d = 0.85


def word_cooccurrence_edges(docs: DataFrame,
                            text_col: str = "text") -> DataFrame:
    """Weighted directed edges (s, t, wt): adjacent-token pairs over the
    shared tokenizer, weight = corpus-wide occurrence count. One explode
    + one (s, t)-keyed aggregate with map-side combine."""
    bigram = F.explode(shingles(words(F.col(text_col)), 2)).alias("bg")
    g = docs.select(bigram)
    parts = F.split(F.col("bg"), " ")
    return (g.select(parts.getItem(0).alias("s"),
                     parts.getItem(1).alias("t"))
            .groupBy("s", "t")
            .agg(F.count(F.lit(1)).alias("wt")))


def pagerank(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """Fixed-point PageRank over (s, t, wt) edges: (node, rank) with rank
    an integer at ``SCALE`` — deterministic, hashable, engine-portable."""
    nodes = (edges.select(F.col("s").alias("node"))
             .union(edges.select(F.col("t").alias("node")))
             .distinct())
    out_w = edges.groupBy("s").agg(F.sum("wt").alias("ow"))
    contrib_edges = edges.join(out_w, "s")

    ranks = nodes.select("node", F.lit(SCALE).cast("long").alias("rank"))
    for _ in range(iterations):
        acc = (contrib_edges
               .join(ranks, contrib_edges["s"] == ranks["node"])
               .select(F.col("t"),
                       (F.col("wt")
                        * F.expr("rank div ow")).alias("c"))
               .groupBy("t")
               .agg(F.sum("c").alias("acc")))
        ranks = (nodes.join(acc, nodes["node"] == acc["t"], "left")
                 .select("node",
                         (F.lit(_BASE)
                          + F.expr("(85 * coalesce(acc, 0L)) div 100"))
                         .cast("long").alias("rank")))
    return ranks
