"""Hard correctness gate for the trained-IVF path (VERDICT r1 #2).

``ann_ivf_kmeans_topk`` is legitimately not SQL-expressible (iterative,
data-dependent state), so the driver records a rows-only check. This is
the compensating oracle: a pure-Python Lloyd implementation over a tiny
fixed dataset must produce the EXACT same codebook as
``train_ivf_centroids`` running as Spark jobs.

The fixture uses integer-valued vectors so every partial sum is exactly
representable in float64 — summation order (which Spark does not pin)
cannot perturb the means, making exact equality well-defined.
"""

import pytest

from mysql_ch_replicator_spark.operators.similarity import (
    ivf_centroids, train_ivf_centroids,
)

DIMS = 4
N_CELLS = 3

# 12 integer-valued vectors in three loose clusters
VECS = [
    [0.0, 1.0, 2.0, 3.0], [1.0, 2.0, 3.0, 4.0], [0.0, 2.0, 2.0, 4.0],
    [10.0, 11.0, 12.0, 13.0], [11.0, 12.0, 13.0, 14.0],
    [10.0, 12.0, 12.0, 14.0], [12.0, 10.0, 13.0, 11.0],
    [-5.0, -6.0, -7.0, -8.0], [-6.0, -7.0, -8.0, -9.0],
    [-5.0, -7.0, -7.0, -9.0], [-8.0, -5.0, -9.0, -6.0],
    [0.0, 0.0, 0.0, 0.0],
]


def _python_lloyd(vecs, cents, iters):
    """Driver-side mirror of train_ivf_centroids' iteration: nearest
    centroid by squared L2 with first-occurrence tie-break, cell means,
    empty cells keep their previous centroid."""
    cents = [list(c) for c in cents]
    for _ in range(iters):
        sums = [[0.0] * DIMS for _ in cents]
        counts = [0] * len(cents)
        for v in vecs:
            dists = [sum((x - y) * (x - y) for x, y in zip(v, c))
                     for c in cents]
            cell = dists.index(min(dists))   # first min, like array_position
            counts[cell] += 1
            for i, x in enumerate(v):
                sums[cell][i] += x
        for ci in range(len(cents)):
            if counts[ci]:
                cents[ci] = [s / counts[ci] for s in sums[ci]]
    return cents


@pytest.mark.parametrize("iters", [1, 5])
def test_trained_codebook_matches_python_lloyd(spark, iters):
    df = spark.createDataFrame([(v,) for v in VECS], "embedding array<double>") \
        .repartition(4)  # exactness must not depend on partitioning
    got = train_ivf_centroids(df, "embedding", N_CELLS, DIMS, iters=iters)
    want = _python_lloyd(VECS, ivf_centroids(N_CELLS, DIMS), iters)
    assert got == want


def test_training_moves_centroids_to_cluster_means(spark):
    """After enough iterations the codebook converges to the true cluster
    means (the fixture's clusters are far apart relative to the init)."""
    df = spark.createDataFrame([(v,) for v in VECS], "embedding array<double>")
    got = train_ivf_centroids(df, "embedding", N_CELLS, DIMS, iters=8)
    want = _python_lloyd(VECS, ivf_centroids(N_CELLS, DIMS), 8)
    assert got == want
    # the trained codebook is a fixed point: one more Lloyd step on the
    # converged assignment changes nothing
    assert _python_lloyd(VECS, got, 1) == got
