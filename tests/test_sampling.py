"""Deterministic sampling/split/quantization operator properties beyond the
oracle check: proportions, the nested-subset guarantee, the no-shuffle plan,
and int8 code range."""

import pytest

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


def test_mixture_rates_and_monotonicity(spark):
    from mysql_ch_replicator_spark.operators.sampling import mixture_sample
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rates = {"src0": 1.0, "src1": 0.5}
    kept = mixture_sample(docs, "doc_id", "source", rates, default_rate=0.1)
    per = {r.source: r.n for r in kept.groupBy("source")
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    base = {r.source: r.n for r in docs.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per["src0"] == base["src0"]                      # rate 1.0 = all
    # per-source counts are tiny (~25) at this SF: check direction per
    # stratum, and the rate on the pooled 10% default (~450 docs)
    assert 0 < per["src1"] < base["src1"]
    others_kept = sum(n for s, n in per.items() if s not in rates)
    others_base = sum(n for s, n in base.items() if s not in rates)
    assert abs(others_kept / others_base - 0.10) < 0.05
    # raising one stratum's rate only adds rows (nested-subset per stratum)
    more = mixture_sample(docs, "doc_id", "source",
                          {"src0": 1.0, "src1": 0.8}, default_rate=0.1)
    a = {r.doc_id for r in kept.select("doc_id").collect()}
    b = {r.doc_id for r in more.select("doc_id").collect()}
    assert a <= b
    # still scan-side: no shuffle
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pack_sequences_semantics(spark):
    from mysql_ch_replicator_spark.operators.packing import (
        packing_stats, pack_sequences,
    )
    # single bucket so the fill math is fully visible: budget 10
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate([4, 4, 4, 9, 12, 1])], ["id", "tok"])
    packed = pack_sequences(docs, "id", "tok", max_tokens=10, num_buckets=1)
    rows = {r.id: r for r in packed.collect()}
    # running: 4, 8, 12, 21, 33, 34 -> seq 0, 0, 1, 2, 3, 3
    assert [rows[i].seq_id for i in range(6)] == [0, 0, 1, 2, 3, 3]
    stats = {(r.pack_bucket, r.seq_id): r
             for r in packing_stats(packed, 10).collect()}
    # seq 3 = the 12-token oversize doc + the trailing 1-token doc:
    # it overflows the 10-token budget (fill > 1), by design
    assert stats[(0, 3)].n_docs == 2
    assert stats[(0, 3)].seq_tokens == 13
    assert stats[(0, 3)].fill_ratio > 1.0
    # seq 2 = the 9-token doc alone, under budget
    assert stats[(0, 2)].seq_tokens == 9


def test_pack_plan_bucket_shuffle_only(spark):
    from mysql_ch_replicator_spark.operators.packing import pack_sequences
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = pack_sequences(docs, "doc_id", F.col("n_chars"), 2048, 16) \
        ._jdf.queryExecution().executedPlan().toString()
    # one hash exchange on the pack bucket, never a global range sort
    assert "rangepartitioning" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "pack_bucket" in plan.split("Exchange hashpartitioning")[1][:80]


def test_per_group_cap_matches_naive_window(spark):
    """The skew-safe count+prefilter+rescue plan must be semantics-identical
    to the naive single-window form — on real data and on a synthetic skewed
    frame, including oversample=1 where the rescue path actually fires."""
    from mysql_ch_replicator_spark.operators.sampling import per_group_cap

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    naive = {(r.doc_id, r.source) for r in
             per_group_cap(docs, "source", "doc_id", 5, oversample=None)
             .select("doc_id", "source").collect()}
    fast = {(r.doc_id, r.source) for r in
            per_group_cap(docs, "source", "doc_id", 5)
            .select("doc_id", "source").collect()}
    assert naive == fast

    # skewed synthetic: one hot group (3000 rows), one at the 4*cap
    # boundary, one under cap
    rows = [(i, "hot") for i in range(3000)]
    rows += [(10_000 + i, "warm") for i in range(20)]
    rows += [(20_000 + i, "cold") for i in range(3)]
    df = spark.createDataFrame(rows, "id long, grp string")
    expect = {(r.id, r.grp) for r in
              per_group_cap(df, "grp", "id", 5, oversample=None).collect()}
    for oversample in (1, 8):
        got = {(r.id, r.grp) for r in
               per_group_cap(df, "grp", "id", 5, oversample=oversample)
               .collect()}
        assert got == expect, f"oversample={oversample}"
    assert sum(1 for _, g in expect if g == "cold") == 3  # under-cap kept


def test_temperature_sample_flattens_to_sqrt(spark):
    """alpha=0.5 temperature sampling: the smallest stratum keeps ~100%
    of its rows and kept counts are ~∝ sqrt(n_s) — the flattening rule.
    Deterministic in the ids, so repeated runs agree exactly."""
    import math

    from mysql_ch_replicator_spark.operators.sampling import (
        temperature_sample,
    )

    sizes = {"big": 6400, "mid": 1600, "small": 100}
    rows, next_id = [], 0
    for name, n in sizes.items():
        for _ in range(n):
            rows.append((next_id, name))
            next_id += 1
    df = spark.createDataFrame(rows, "id long, src string")
    out = temperature_sample(df, "id", "src")
    got = {r.src: r.n for r in
           out.groupBy("src").agg(F.count("id").alias("n")).collect()}
    # smallest stratum: keep rate 1.0 → kept exactly
    assert got["small"] == 100
    # larger strata: expected kept = sqrt(n_min * n_s); allow hash noise
    for name in ("big", "mid"):
        expect = math.sqrt(sizes[name] * sizes["small"])
        assert abs(got[name] - expect) / expect < 0.15, (name, got[name])
    # determinism
    got2 = {(r.id, r.src) for r in out.select("id", "src").collect()}
    got3 = {(r.id, r.src) for r in
            temperature_sample(df, "id", "src").select("id", "src")
            .collect()}
    assert got2 == got3


def test_per_group_cap_zero_survivor_groups_rescued(spark):
    """A group whose EVERY row is cut by the hash prefilter must still be
    rescued: with cap=1, oversample=1 and n=120, a group keeps zero
    prefilter survivors with probability ~(1-1/n)^n ~ 37%, so across 40
    groups the old capped-anchored detector (ADVICE r2 #2) loses ~15 groups
    entirely. The counts-anchored detector must keep all of them, exactly
    matching the naive window."""
    from mysql_ch_replicator_spark.operators.sampling import per_group_cap

    rows = [(g * 1000 + i, f"g{g}") for g in range(40) for i in range(120)]
    df = spark.createDataFrame(rows, "id long, grp string")
    naive = {(r.id, r.grp) for r in
             per_group_cap(df, "grp", "id", 1, oversample=None).collect()}
    got = {(r.id, r.grp) for r in
           per_group_cap(df, "grp", "id", 1, oversample=1).collect()}
    assert got == naive
    assert len({g for _, g in got}) == 40  # no group vanished


@pytest.mark.heavy
def test_per_group_cap_property_random_shapes(spark):
    """Property: for RANDOM group-size profiles (hypothesis-driven), the
    skew-safe plan equals the naive window for every oversample, every
    group keeps min(cap, n) rows, and the operator is partition-invariant
    (repartitioning the input never changes the selection — the
    determinism contract hash-based sampling promises)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mysql_ch_replicator_spark.operators.sampling import per_group_cap

    @settings(max_examples=6, deadline=None)
    @given(sizes=st.lists(st.integers(min_value=1, max_value=400),
                          min_size=1, max_size=6),
           cap=st.integers(min_value=1, max_value=7))
    def check(sizes, cap):
        rows, nid = [], 0
        for g, n in enumerate(sizes):
            for _ in range(n):
                rows.append((nid, f"g{g}"))
                nid += 1
        df = spark.createDataFrame(rows, "id long, grp string")
        naive = {(r.id, r.grp) for r in
                 per_group_cap(df, "grp", "id", cap,
                               oversample=None).collect()}
        fast = {(r.id, r.grp) for r in
                per_group_cap(df, "grp", "id", cap, oversample=2).collect()}
        assert fast == naive
        per_group = {}
        for _, g in naive:
            per_group[g] = per_group.get(g, 0) + 1
        for g, n in enumerate(sizes):
            assert per_group.get(f"g{g}", 0) == min(cap, n)
        shuffled = {(r.id, r.grp) for r in
                    per_group_cap(df.repartition(7), "grp", "id", cap,
                                  oversample=2).collect()}
        assert shuffled == naive

    check()


def test_temperature_sample_partition_invariant_and_nested(spark):
    """Properties: partition-invariance (hash decisions don't depend on
    physical layout) and subset monotonicity — flattening a superset
    corpus never *adds* rows for a stratum whose count grew (its keep
    rate only falls as n_s rises, rate = sqrt(n_min/n_s))."""
    from mysql_ch_replicator_spark.operators.sampling import (
        temperature_sample,
    )

    rows = [(i, "a") for i in range(900)] + \
           [(1000 + i, "b") for i in range(150)] + \
           [(2000 + i, "c") for i in range(30)]
    df = spark.createDataFrame(rows, "id long, src string")
    base = {(r.id, r.src) for r in
            temperature_sample(df, "id", "src").select("id", "src")
            .collect()}
    repart = {(r.id, r.src) for r in
              temperature_sample(df.repartition(13), "id", "src")
              .select("id", "src").collect()}
    assert repart == base

    # grow stratum 'a' (n_min unchanged): a-rows kept must be a subset of
    # before (rate fell), b/c unchanged counts → identical decisions
    grown = df.unionByName(spark.createDataFrame(
        [(5000 + i, "a") for i in range(900)], "id long, src string"))
    after = {(r.id, r.src) for r in
             temperature_sample(grown, "id", "src").select("id", "src")
             .collect()}
    base_a_old_ids = {t for t in base if t[1] == "a"}
    after_a_old_ids = {t for t in after if t[1] == "a" and t[0] < 5000}
    assert after_a_old_ids <= base_a_old_ids
    assert {t for t in after if t[1] == "c"} == \
        {t for t in base if t[1] == "c"}


def test_line_dedup_stats_crafted(spark):
    """Crafted cross-doc duplicate lines: first-document-wins counts."""
    from mysql_ch_replicator_spark.operators.dedup import line_dedup_stats

    df = spark.createDataFrame(
        [(1, "alpha\nshared\nbeta"),
         (2, "shared\ngamma"),
         (3, "shared\nalpha\nshared")],
        "doc_id long, text string")
    got = {r.doc_id: (r.n_lines, r.n_kept)
           for r in line_dedup_stats(df).collect()}
    # doc1 keeps alpha+shared+beta (first for all three); doc2 keeps gamma;
    # doc3 keeps nothing (shared->1, alpha->1; its duplicate 'shared' lines
    # count once in n_lines=3 but zero in kept)
    assert got == {1: (3, 3), 2: (2, 1), 3: (3, 0)}


def test_per_group_cap_null_group(spark):
    """NULL group values are a real group (dirty domains) — the count
    prefilter joins must be null-safe, never dropping the NULL bucket."""
    from mysql_ch_replicator_spark.operators.sampling import per_group_cap

    rows = [(i, None) for i in range(200)] + [(1000 + i, "g") for i in range(3)]
    df = spark.createDataFrame(rows, "id long, grp string")
    naive = {(r.id, r.grp) for r in
             per_group_cap(df, "grp", "id", 5, oversample=None).collect()}
    for oversample in (1, 8):
        got = {(r.id, r.grp) for r in
               per_group_cap(df, "grp", "id", 5, oversample=oversample)
               .collect()}
        assert got == naive, f"oversample={oversample}"
    assert sum(1 for _, g in naive if g is None) == 5


def test_epoch_upsample_rates_and_materialization(spark):
    from mysql_ch_replicator_spark.operators.sampling import epoch_upsample

    rows = [(i, f"src{i % 3}") for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = epoch_upsample(df, "doc_id", "source",
                         {"src0": 2.5, "src1": 0.5}, default_epochs=1.0)
    per = {r.source: (r.total, r.n) for r in
           out.groupBy("source")
           .agg(F.sum("repeat_count").alias("total"),
                F.count("*").alias("n")).collect()}
    # fractional epochs land within hash noise of the target rate
    assert abs(per["src0"][0] / per["src0"][1] - 2.5) < 0.1
    assert abs(per["src1"][0] / per["src1"][1] - 0.5) < 0.1   # downsample
    assert per["src2"][0] == per["src2"][1]                   # exactly 1.0
    # deterministic
    again = epoch_upsample(df, "doc_id", "source",
                           {"src0": 2.5, "src1": 0.5})
    assert out.exceptAll(again).isEmpty()
    # physical materialization matches the counts
    exploded = out.where(F.col("repeat_count") > 0).select(
        "doc_id", F.explode(F.sequence(F.lit(1), F.col("repeat_count"))))
    assert exploded.count() == sum(t for t, _ in per.values())


def test_leakage_safe_split_cluster_invariant(spark):
    """Every member of a normalized-dup cluster must share the rep's
    split — crafted re-punctuated copies can never straddle the fence."""
    from mysql_ch_replicator_spark.operators.sampling import (
        leakage_safe_split,
    )
    rows = [(i, f"unique document number {i}", ) for i in range(200)]
    # ids 500/501/502: three re-punctuated copies of one text
    rows += [(500, "The  Quick,, brown FOX!"), (501, "the quick brown fox"),
             (502, "THE QUICK... BROWN-FOX")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = leakage_safe_split(docs)
    got = {r.doc_id: (r.dup_of, r.n_copies, r.split) for r in out.collect()}
    assert len(got) == 203
    assert got[500] == got[501] == got[502]
    assert got[500][0] == 500 and got[500][1] == 3
    # cluster decision == hash_split of the REP id (the inheritance
    # contract: member split is a function of dup_of alone)
    from mysql_ch_replicator_spark.operators.sampling import hash_split
    rep_split = {r.doc_id: r.split for r in hash_split(
        docs.select("doc_id"), "doc_id").collect()}
    for d, (rep, _, split) in got.items():
        assert split == rep_split[rep]


def test_raked_mixture_balances_both_marginals(spark):
    """IPF keep-rates must pull BOTH marginals toward balance: a corpus
    with one dominant language and one dominant source ends up with a
    smaller max/min marginal ratio on each axis after selection."""
    from mysql_ch_replicator_spark.operators.sampling import raked_mixture
    rows = []
    i = 0
    for lang, source, n in [("en", "web", 600), ("en", "books", 80),
                            ("de", "web", 90), ("de", "books", 60),
                            ("fr", "web", 70), ("fr", "books", 50)]:
        for _ in range(n):
            rows.append((i, lang, source))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, lang string, "
                                       "source string")
    selected, rates = raked_mixture(docs, iters=2)

    def spread_ratio(df, col):
        counts = [r.n for r in df.groupBy(col)
                  .agg(F.count(F.lit(1)).alias("n")).collect()]
        return max(counts) / min(counts)

    assert spread_ratio(selected, "lang") < spread_ratio(docs, "lang")
    assert spread_ratio(selected, "source") < spread_ratio(docs, "source")
    # rates are ppm-capped and deterministic across evaluations
    rs = {(r.lang, r.source): r.rate_ppm for r in rates.collect()}
    assert all(0 <= v <= 1_000_000 for v in rs.values())
    again = raked_mixture(docs, iters=2)[1]
    assert {(r.lang, r.source): r.rate_ppm
            for r in again.collect()} == rs
    # the dominant cell is throttled hardest
    assert rs[("en", "web")] == min(rs.values())


def test_raked_mixture_degenerate_budget_raises(spark):
    """An integer marginal target that floors to zero must raise loudly
    (naming the knob), not ZeroDivisionError three CTEs deep."""
    import pytest as _pytest

    from mysql_ch_replicator_spark.operators.sampling import raked_mixture
    docs = spark.createDataFrame(
        [(i, f"l{i}", "s") for i in range(6)] + [(9, "l0", "s")],
        "doc_id long, lang string, source string")
    with _pytest.raises(ValueError, match="floors to zero"):
        raked_mixture(docs)
