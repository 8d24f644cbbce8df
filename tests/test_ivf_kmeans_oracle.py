"""Hard correctness gate for the trained-IVF path (VERDICT r1 #2).

``train_ivf_centroids`` runs Lloyd's iteration in EXACT quantized
arithmetic (floor(x·scale) integers; every squared distance and every
cell-component sum stays an exact float64 integer), so the Spark-jobs
codebook must equal a pure-Python mirror BIT-FOR-BIT — independent of
partitioning, summation order, or engine. The same property is what lets
the ann_ivf_kmeans_topk driver oracle unroll the training into plain
DuckDB SQL.
"""

import math

import pytest

from mysql_ch_replicator_spark.operators.similarity import (
    ivf_centroids, quantize_centroids, train_ivf_centroids,
)

DIMS = 4
N_CELLS = 3
# |components| ≤ 14 here, so the default 2^22 scale would push squared
# distances past 2^53; 2^18 keeps everything exact (bound in the
# QUANT_SCALE docstring).
SCALE = 262_144.0

# 12 vectors in three loose clusters
VECS = [
    [0.0, 1.0, 2.0, 3.0], [1.0, 2.0, 3.0, 4.0], [0.0, 2.0, 2.0, 4.0],
    [10.0, 11.0, 12.0, 13.0], [11.0, 12.0, 13.0, 14.0],
    [10.0, 12.0, 12.0, 14.0], [12.0, 10.0, 13.0, 11.0],
    [-5.0, -6.0, -7.0, -8.0], [-6.0, -7.0, -8.0, -9.0],
    [-5.0, -7.0, -7.0, -9.0], [-8.0, -5.0, -9.0, -6.0],
    [0.25, -0.75, 0.125, 0.0],   # non-integer: exercises the quantizer
]


def _python_lloyd_quant(vecs, cents_q, iters, scale):
    """Pure-Python mirror of train_ivf_centroids: quantize, assign by
    exact integer squared L2 (first-min tie-break), quantized floor-mean
    update, empty cells keep their previous centroid."""
    vq = [[math.floor(x * scale) for x in v] for v in vecs]
    cents_q = [list(c) for c in cents_q]
    for _ in range(iters):
        sums = [[0] * DIMS for _ in cents_q]
        counts = [0] * len(cents_q)
        for v in vq:
            dists = [sum((x - y) * (x - y) for x, y in zip(v, c))
                     for c in cents_q]
            cell = dists.index(min(dists))   # first min, like array_position
            counts[cell] += 1
            for i, x in enumerate(v):
                sums[cell][i] += x
        for ci in range(len(cents_q)):
            if counts[ci]:
                cents_q[ci] = [math.floor(float(s) / float(counts[ci]))
                               for s in sums[ci]]
    return cents_q


def _want(iters):
    init_q = quantize_centroids(ivf_centroids(N_CELLS, DIMS), SCALE)
    return [[m / SCALE for m in row]
            for row in _python_lloyd_quant(VECS, init_q, iters, SCALE)]


@pytest.mark.parametrize("iters", [1, 5])
def test_trained_codebook_matches_python_lloyd(spark, iters):
    df = spark.createDataFrame([(v,) for v in VECS], "embedding array<double>") \
        .repartition(4)  # exactness must not depend on partitioning
    got = train_ivf_centroids(df, "embedding", N_CELLS, DIMS, iters=iters,
                              quant_scale=SCALE)
    assert got == _want(iters)


def test_training_moves_centroids_to_cluster_means(spark):
    """After enough iterations the codebook converges to the (quantized)
    cluster means and is a fixed point of one more Lloyd step."""
    df = spark.createDataFrame([(v,) for v in VECS], "embedding array<double>")
    got = train_ivf_centroids(df, "embedding", N_CELLS, DIMS, iters=8,
                              quant_scale=SCALE)
    assert got == _want(8)
    got_q = [[round(m * SCALE) for m in row] for row in got]
    assert _python_lloyd_quant(VECS, got_q, 1, SCALE) == got_q


def test_hash_sample_is_deterministic_and_engine_portable(spark):
    """sample_fraction selects by md5-hash threshold on id_col — the
    trained codebook over the sample must be reproducible from the same
    hash filter applied driver-side (DataFrame.sample's XORShift draw
    would not be)."""
    import hashlib

    rows = [(i, VECS[i % len(VECS)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vid int, embedding array<double>")
    got = train_ivf_centroids(df, "embedding", N_CELLS, DIMS, iters=2,
                              sample_fraction=0.5, id_col="vid",
                              salt="s", quant_scale=SCALE)

    def keep(i):
        h = int(hashlib.md5(f"s|{i}".encode()).hexdigest()[:15], 16)
        return h % 10_000 < 5_000

    sampled = [v for i, v in rows if keep(i)]
    assert 0 < len(sampled) < len(rows)
    init_q = quantize_centroids(ivf_centroids(N_CELLS, DIMS), SCALE)
    want = [[m / SCALE for m in row]
            for row in _python_lloyd_quant(sampled, init_q, 2, SCALE)]
    assert got == want


def test_sample_fraction_requires_id_col(spark):
    df = spark.createDataFrame([(v,) for v in VECS], "embedding array<double>")
    with pytest.raises(ValueError, match="id_col"):
        train_ivf_centroids(df, "embedding", N_CELLS, DIMS,
                            sample_fraction=0.5)
