"""Randomized cross-checks of the round-5 operators against pure-Python
references (seed-fixed) — the same oracle-independence layer the fuzzy/
closure suites use: the DuckDB oracle proves cross-engine agreement, these
prove the shared semantics are the INTENDED ones."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest

from pyspark.sql import functions as F


def test_systematic_weighted_sample_matches_reference(spark):
    """Spark pps sampling == a literal prefix-sum walk; every row heavier
    than the stride is always selected; output size ~ k."""
    from mysql_ch_replicator_spark.operators.sampling import (
        systematic_weighted_sample,
    )

    rng = np.random.default_rng(11)
    weights = [int(w) for w in rng.integers(1, 500, 300)]
    weights[17] = 100_000  # heavyweight: > stride, must always be kept
    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id long, w long")

    k = 23
    total = sum(weights)
    step = max(total // k, 1)
    cum = 0
    expect = set()
    for i, w in enumerate(weights):
        prev = cum
        cum += w
        if cum // step > prev // step:
            expect.add(i)

    out = systematic_weighted_sample(df, "w", k, id_col="doc_id").collect()
    got = {r.doc_id for r in out}
    assert got == expect
    assert 17 in got
    # pps accounting: the STRIDE MULTIPLES covered by selected rows number
    # ~k (a heavy row absorbs several but appears once, so |rows| < k here)
    hits = sum(r.cum_w // step - (r.cum_w - r.w) // step for r in out)
    assert k - 1 <= hits <= k
    assert len(got) < k    # the heavyweight really did absorb multiples


def _words(text):
    import re
    return [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]


def test_bigram_lm_scores_match_reference(spark):
    from mysql_ch_replicator_spark.operators.lm import bigram_lm_scores

    rng = np.random.default_rng(5)
    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    docs = [(i, " ".join(rng.choice(vocab, rng.integers(2, 12))))
            for i in range(40)]
    docs.append((99, "single"))       # < 2 tokens: excluded
    df = spark.createDataFrame(docs, "doc_id long, text string")

    # python reference
    from collections import Counter
    bg_by_doc = {i: list(zip(_words(t), _words(t)[1:]))
                 for i, t in docs if len(_words(t)) >= 2}
    c_ab = Counter(p for ps in bg_by_doc.values() for p in ps)
    c_a = Counter(a for ps in bg_by_doc.values() for a, _ in ps)
    expect = {i: (len(ps), sum((c_ab[p] * 1_000_000) // c_a[p[0]]
                               for p in ps))
              for i, ps in bg_by_doc.items()}

    got = {r.doc_id: (r.n_bigrams, r.fluency)
           for r in bigram_lm_scores(df).collect()}
    assert got == expect
    assert 99 not in got


def test_embedding_outlier_scores_match_reference(spark):
    from mysql_ch_replicator_spark.operators.similarity import (
        embedding_outlier_scores,
    )

    rng = np.random.default_rng(7)
    rows = []
    for i in range(60):
        label = int(i % 3)
        vec = rng.normal(0, 0.5, 8)
        if i == 5:
            vec = vec + 30.0   # gross outlier in its label group
        rows.append((i, [float(x) for x in vec], label))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, "
                                     "label int")

    # python reference (same float32->float64 + floor quantization)
    per_label: dict[int, list] = {}
    for i, v, lb in rows:
        xq = [math.floor(float(np.float32(x)) * 1024) for x in v]
        per_label.setdefault(lb, []).append((i, xq))
    expect = {}
    for lb, vs in per_label.items():
        n = len(vs)
        sums = [sum(xq[d] for _, xq in vs) for d in range(8)]
        for i, xq in vs:
            expect[i] = (lb, n, sum((n * xq[d] - sums[d]) ** 2
                                    for d in range(8)))

    got = {r.vec_id: (r.grp, r.n, r.dist_q)
           for r in embedding_outlier_scores(df).collect()}
    assert got == expect
    # the planted outlier dominates its group
    grp5 = [r for r in got.items() if r[1][0] == got[5][0]]
    assert max(grp5, key=lambda kv: kv[1][2])[0] == 5


def test_embedding_outlier_scores_beyond_int64(spark):
    """ADVICE r5: dist_q = sum_d (n*x - s)^2 wraps int64 around n ~ 2e5
    members at 64 dims.  One vector at -1 among 200k at +1 makes its
    distance-to-centroid exceed 2^63; the decimal(38,0) accumulator must
    return the exact positive value, not a wrapped negative long."""
    from mysql_ch_replicator_spark.operators.similarity import (
        embedding_outlier_scores,
    )

    n, dims = 200_001, 64
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[
            F.when(F.col("id") == 0, F.lit(-1.0)).otherwise(F.lit(1.0))
            for _ in range(dims)
        ]).cast("array<float>").alias("embedding"),
        F.lit(0).alias("label"),
    )
    row0 = (embedding_outlier_scores(emb)
            .where(F.col("vec_id") == 0).collect()[0])
    s_d = (n - 1) * 1024 + (-1024)          # per-dim sum of quantized comps
    expect = dims * (n * (-1024) - s_d) ** 2
    assert expect > 2**63                    # the probe actually overflows
    assert int(row0.dist_q) == expect
    assert row0.n == n


def test_substring_dup_windows_match_reference(spark):
    from mysql_ch_replicator_spark.operators.dedup import substring_dup_stats

    rng = np.random.default_rng(3)
    alphabet = list("abcd ")
    texts = {i: "".join(rng.choice(alphabet, rng.integers(10, 400)))
             for i in range(30)}
    texts[1] = texts[0]          # full duplicate: every window shared
    docs = spark.createDataFrame(list(texts.items()),
                                 "doc_id long, text string")

    win, stride = 32, 16

    def h60(sub: str) -> int:
        return int(hashlib.md5(sub.encode()).hexdigest()[:15], 16)

    windows = {}
    for i, t in texts.items():
        if len(t) < win:
            continue
        windows[i] = [h60(t[o:o + win])
                      for o in range(0, len(t) - win + 1, stride)]
    from collections import Counter
    docs_per_hash: dict[int, set] = {}
    for i, hs in windows.items():
        for h in hs:
            docs_per_hash.setdefault(h, set()).add(i)
    expect = {i: (len(hs), sum(1 for h in hs if len(docs_per_hash[h]) >= 2))
              for i, hs in windows.items()}

    got = {r.doc_id: (r.n_windows, r.n_dup_windows)
           for r in substring_dup_stats(docs, win=win,
                                        stride=stride).collect()}
    assert got == expect
    assert got[0][1] == got[0][0]   # full dup: every window shared
    assert got[1][1] == got[1][0]
