"""Round-9 pins: O(changed spans) lexical scalar refresh (the r8
verdict's last hot-path flag), pre-r8 probe fallback, atomic/sessionless
fsutil, and sessionless IVF recovery helpers (r8 ADVICE)."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from pyspark.sql import functions as F


def _lex_docs(spark, n=40, extra=""):
    rows = [(i, f"alpha{i % 7} beta{i % 3} gamma {extra}")
            for i in range(n)]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.heavy
def test_lex_upsert_meta_matches_rebuild_multispan(spark, tmp_path):
    """After an upsert touching a strict subset of spans, the descriptor
    (n, tl, AND the per-span stats map) must equal a from-scratch
    rebuild's — including an emptied span DROPPING out of the map. The
    invariant the O(changed spans) refresh must keep to replace the
    stateless full recount."""
    from mysql_ch_replicator_spark.operators.retrieval import (
        upsert_lexical_index, write_lexical_index)

    docs = _lex_docs(spark, 40)
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    # span width 8 -> 5 spans; the batch touches spans {0, 4} only
    write_lexical_index(docs, inc, shards=4, span_width=8)
    adds = spark.createDataFrame([(2, "zeta eta theta")],
                                 "doc_id long, text string")
    removes = spark.createDataFrame(
        [(32,), (33,), (34,), (35,), (36,), (37,), (38,), (39,)],
        "doc_id long")   # empties span 4 entirely
    upsert_lexical_index(spark, inc, adds=adds, removes=removes)

    final = (docs.where(F.col("doc_id") < 32)
             .where(F.col("doc_id") != 2)
             .unionByName(adds))
    write_lexical_index(final, full, shards=4, span_width=8)

    m_inc = json.load(open(os.path.join(inc, "_lex_meta.json")))
    m_full = json.load(open(os.path.join(full, "_lex_meta.json")))
    assert m_inc == m_full
    assert "4" not in m_inc["spans"] and len(m_inc["spans"]) == 4
    # derived scalars agree with the map they summarize
    assert m_inc["n"] == sum(v[0] for v in m_inc["spans"].values())
    assert m_inc["tl"] == sum(v[1] for v in m_inc["spans"].values())


def test_lex_upsert_no_postwrite_docmeta_read(spark, tmp_path):
    """IO pin for the O(changed spans) refresh: the upsert reads the
    LIVE docmeta table exactly ONCE (the span-pruned discovery/merge
    read at the top) — the corpus-scalar refresh must come from the
    batch's own staged frame (r13; previously the checkpointed frame),
    never a second (post-write, full) docmeta scan, which at 1e10 docs
    and a 1 s CDC cadence would dominate the apply loop (r8 verdict).
    Reads of the batch's own ``_upsert_staging`` snapshot are bounded
    by the batch and don't count."""
    from pyspark.sql.readwriter import DataFrameReader

    from mysql_ch_replicator_spark.operators.retrieval import (
        upsert_lexical_index, write_lexical_index)

    path = str(tmp_path / "lex")
    write_lexical_index(_lex_docs(spark, 40), path, shards=4,
                        span_width=8)

    reads: list[str] = []
    orig = DataFrameReader.parquet

    def spy(self, *paths):
        reads.extend(paths)
        return orig(self, *paths)

    DataFrameReader.parquet = spy
    try:
        upsert_lexical_index(
            spark, path,
            adds=spark.createDataFrame([(3, "omega psi")],
                                       "doc_id long, text string"))
    finally:
        DataFrameReader.parquet = orig
    docmeta_reads = [p for p in reads
                     if "docmeta" in p and "_staging" not in p]
    assert len(docmeta_reads) == 1


def test_lex_pre_r9_descriptor_migrates(spark, tmp_path):
    """A pre-r9 descriptor ({n, tl, shards} only — no spans map, no
    dspan width) migrates on first upsert: one full-docmeta aggregate
    seeds the map, and the resulting index equals a rebuild."""
    from mysql_ch_replicator_spark.operators.retrieval import (
        _LEX_DSPAN, upsert_lexical_index, write_lexical_index)

    docs = _lex_docs(spark, 20)
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    write_lexical_index(docs, inc, shards=4)
    meta_path = os.path.join(inc, "_lex_meta.json")
    old = json.load(open(meta_path))
    # rewrite THROUGH fsutil: the local Hadoop FS keeps .crc sidecars,
    # so an out-of-band python write would poison the next Hadoop read
    from mysql_ch_replicator_spark import fsutil
    fsutil.write_text(meta_path,
                      json.dumps({k: old[k] for k in ("n", "tl", "shards")}),
                      spark=spark)

    adds = spark.createDataFrame([(20, "nu xi omicron")],
                                 "doc_id long, text string")
    removes = spark.createDataFrame([(5,)], "doc_id long")
    upsert_lexical_index(spark, inc, adds=adds, removes=removes)

    write_lexical_index(
        docs.where(F.col("doc_id") != 5).unionByName(adds), full,
        shards=4, span_width=_LEX_DSPAN)
    assert (json.load(open(meta_path))
            == json.load(open(os.path.join(full, "_lex_meta.json"))))


def test_bm25_probe_pre_r8_doclen_layout(spark, tmp_path):
    """Probing a pre-r8 index (doclen/, no docmeta/) WITHOUT upserting
    first must work — migration happens on first upsert, not first read
    (r8 ADVICE: the probe previously raised path-not-found)."""
    from mysql_ch_replicator_spark.operators.retrieval import (
        _LEX_DSPAN, bm25_indexed_topk, write_lexical_index)

    docs = _lex_docs(spark, 20)
    path = str(tmp_path / "lex")
    write_lexical_index(docs, path, shards=4)
    want = [tuple(r) for r in
            bm25_indexed_topk(spark, path, ["gamma", "beta1"], k=5)
            .collect()]
    (spark.read.parquet(path + "/docmeta").select("doc_id", "dl")
     .withColumn("dspan", F.expr(f"doc_id div {_LEX_DSPAN}"))
     .write.mode("overwrite").partitionBy("dspan")
     .parquet(path + "/doclen"))
    shutil.rmtree(path + "/docmeta")
    got = [tuple(r) for r in
           bm25_indexed_topk(spark, path, ["gamma", "beta1"], k=5)
           .collect()]
    assert got == want and got


def test_write_text_atomic_no_tmp_residue(spark, tmp_path):
    """write_text goes temp-then-rename on both the Hadoop and the
    local path: the target is either the old or the new full payload
    (never truncated), and no temp file survives a successful write."""
    from mysql_ch_replicator_spark import fsutil

    target = str(tmp_path / "meta.json")
    def no_tmp():
        # (the local Hadoop FS keeps .crc checksum sidecars — expected)
        return not [f for f in os.listdir(tmp_path) if "__tmp__" in f]

    fsutil.write_text(target, json.dumps({"v": 1}), spark=spark)
    fsutil.write_text(target, json.dumps({"v": 2}), spark=spark)
    assert json.load(open(target)) == {"v": 2} and no_tmp()
    # file:// URI form takes the Hadoop branch explicitly
    fsutil.write_text("file://" + target, json.dumps({"v": 3}),
                      spark=spark)
    assert json.load(open(target)) == {"v": 3} and no_tmp()


def test_ivf_recovery_helpers_sessionless(spark, tmp_path):
    """read_ivf_meta / pending_upsert_cells are recovery/monitoring
    probes — they must work on a local index path from code that has NO
    SparkSession (r8 ADVICE: routing through fsutil made them raise).
    getActiveSession is thread-local, so a fresh thread IS sessionless."""
    import threading

    from mysql_ch_replicator_spark.operators import similarity

    path = str(tmp_path / "ivf")
    os.makedirs(path)
    fname = os.path.join(path, "_ivf_meta.json")
    json.dump({"n_cells": 4, "dims": 2}, open(fname, "w"))

    out: dict = {}

    def probe():
        try:
            from pyspark.sql import SparkSession
            out["active"] = SparkSession.getActiveSession()
            out["meta"] = similarity.read_ivf_meta(path)
            out["pending"] = similarity.pending_upsert_cells(path)
        except Exception as e:          # pragma: no cover
            out["err"] = e

    t = threading.Thread(target=probe)
    t.start()
    t.join()
    assert "err" not in out, out.get("err")
    assert out["active"] is None        # genuinely sessionless
    assert out["meta"] == {"n_cells": 4, "dims": 2}
    assert out["pending"] is None


# ---------------------------------------------------------------------------
# Hot-band guard (_band15_resolve): identical-fp collapse before banding
# ---------------------------------------------------------------------------


def _brute_links(rows, max_distance, closure):
    """Reference min-link / closure over explicit fingerprints."""
    import itertools

    ids = [r[0] for r in rows]
    fpm = dict(rows)
    pairs = [(a, b) for a, b in itertools.combinations(sorted(ids), 2)
             if bin(fpm[a] ^ fpm[b]).count("1") <= max_distance]
    if not closure:
        nbr = {i: [i] for i in ids}
        for a, b in pairs:
            nbr[a].append(b)
            nbr[b].append(a)
        return {i: min(nbr[i]) for i in ids}
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in ids}


def _cluster_rows():
    """Fingerprint corpus with identical clusters, near pairs (≤3 bits)
    and far singletons — every banding regime in one frame."""
    import random

    random.seed(11)
    rows, did = [], 0
    for _ in range(25):
        b = random.getrandbits(60)
        for _ in range(random.choice([1, 1, 4, 7])):
            rows.append((did, b))
            did += 1
        if random.random() < 0.6:
            rows.append((did, b ^ (1 << random.randrange(60))))
            did += 1
    return rows


def test_band15_collapse_equivalent_to_uncollapsed(spark):
    """_band15_resolve (collapse-then-band) must equal brute-force
    min-link AND brute-force closure over the raw fingerprints — the
    hot-band guard is a plan change, never a semantics change."""
    from mysql_ch_replicator_spark.operators.dedup import _band15_resolve

    rows = _cluster_rows()
    fp = spark.createDataFrame(rows, "doc_id long, fp long")
    for closure in (False, True):
        got = {r.doc_id: r.dup_of
               for r in _band15_resolve(fp, fp.select("doc_id"), 3,
                                        closure).collect()}
        assert got == _brute_links(rows, 3, closure), f"closure={closure}"


def test_band15_candidates_linear_in_identical_cluster(spark):
    """The r8 verdict's blowup scenario, pinned dead: a c-doc identical-
    fingerprint cluster (blank thumbnails, logos) must cost the band
    join O(1) candidates after collapse — not c²/2 — while member
    linking stays linear and recall stays exact."""
    from mysql_ch_replicator_spark.operators.dedup import (
        _band15_pairs, _band15_resolve, band15_hot_report)

    c = 300
    rows = [(i, 0x5A5A5A5A5A5A5A & ((1 << 60) - 1)) for i in range(c)]
    rows += [(1000, 0b1), (1001, 0b10), (1002, (1 << 59) | 1)]
    fp = spark.createDataFrame(rows, "doc_id long, fp long")

    reps = fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    # candidate pairs between DISTINCT fps only: ≤ C(4,2), nowhere near
    # the C(300,2) = 44850 the uncollapsed band join would generate
    assert _band15_pairs(reps, 3).count() <= 6

    rep = band15_hot_report(fp).collect()[0]
    assert rep.n_docs == c + 3
    assert rep.max_fp_cluster == c
    assert rep.collapsed_docs == c - 1
    assert rep.cand_pairs_collapsed <= 4 * 6   # 4 chunks × C(4,2)
    assert rep.cand_pairs_raw >= c * (c - 1) // 2   # the avoided cost

    # and the dedup output is still exact
    got = {r.doc_id: r.dup_of
           for r in _band15_resolve(fp, fp.select("doc_id"), 3,
                                    False).collect()}
    assert got == _brute_links(rows, 3, False)


def test_dead_letter_digest_injection_safe(spark):
    """Two DIFFERENT dead-row sets whose raw bytes straddle the framing
    must hash differently: under the old \\x1f-concat framing,
    {("a\\x1fb","c")} and {("a","b\\x1fc")} rendered identically and a
    later batch silently OVERWROTE a dir holding different quarantined
    evidence (r8 ADVICE). to_json escaping makes the framing
    unforgeable — and the digest stays order-independent."""
    from mysql_ch_replicator_spark.main import _dead_letter_digest

    schema = "raw_value string, reason string"
    a = spark.createDataFrame([("a\x1fb", "c")], schema)
    b = spark.createDataFrame([("a", "b\x1fc")], schema)
    assert _dead_letter_digest(a) != _dead_letter_digest(b)
    # replay idempotence: same rows, any order -> same digest
    two = [("x", "malformed-json"), ("y", "unroutable-row")]
    fwd = spark.createDataFrame(two, schema)
    rev = spark.createDataFrame(list(reversed(two)), schema)
    assert _dead_letter_digest(fwd) == _dead_letter_digest(rev)


def test_membership_stats_reads_partition_column_only(spark, tmp_path):
    """The index-health query's scans must read ZERO data columns — span
    comes from the partition directory, so the parquet read schema is
    empty (struct<>) and neither postings nor vectors nor the membership
    arrays are touched (r8 verdict #7: listing-only health stats)."""
    import contextlib
    import io

    from mysql_ch_replicator_spark.operators.retrieval import (
        write_lexical_index)
    from mysql_ch_replicator_spark.operators.similarity import (
        write_ivf_index)
    from mysql_ch_replicator_spark.queries_ml import (
        _membership_span_frames)

    docs = _lex_docs(spark, 30)
    emb = spark.createDataFrame(
        [(i, [float(i % 3), 1.0]) for i in range(20)],
        "vec_id long, embedding array<float>")
    lex, ivf = str(tmp_path / "lex"), str(tmp_path / "ivf")
    write_lexical_index(docs, lex, shards=4, span_width=8)
    write_ivf_index(emb, ivf, n_cells=2)

    frame = _membership_span_frames(spark, lex, ivf)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        frame.groupBy("tbl", "span").count().explain("formatted")
    plan = buf.getvalue()
    assert "docmeta" in plan and "_vecmeta" in plan
    assert "postings" not in plan
    # every parquet scan in the plan reads no data columns
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert line.strip().endswith("struct<>"), line
    assert sum(1 for r in frame.collect()) == 50


def test_lex_upsert_crash_between_docmeta_and_meta_recovers(spark,
                                                            tmp_path):
    """Torn-batch contract for the per-span stats refresh: a crash AFTER
    the docmeta rewrite but BEFORE the descriptor write leaves the old
    meta + new table; recovery = re-running the SAME upsert must produce
    a descriptor identical to a from-scratch rebuild (per-span entries
    are functions of each span's FINAL state, so the re-run regenerates
    them from the already-updated table — the idempotence the old
    stateless full recount had)."""
    import pytest

    from mysql_ch_replicator_spark import fsutil
    from mysql_ch_replicator_spark.operators.retrieval import (
        _LEX_META, upsert_lexical_index, write_lexical_index)

    docs = _lex_docs(spark, 40)
    inc, full = str(tmp_path / "inc"), str(tmp_path / "full")
    write_lexical_index(docs, inc, shards=4, span_width=8)

    adds = spark.createDataFrame([(40, "omega psi"), (3, "replaced doc")],
                                 "doc_id long, text string")
    removes = spark.createDataFrame([(32,), (7,)], "doc_id long")

    orig = fsutil.write_text
    def crash_on_meta(path, text, spark=None):
        if path.endswith(_LEX_META):
            raise RuntimeError("injected crash before descriptor write")
        return orig(path, text, spark=spark)

    fsutil.write_text = crash_on_meta
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            upsert_lexical_index(spark, inc, adds=adds, removes=removes)
    finally:
        fsutil.write_text = orig

    # the torn window is detectable (intent manifest survives the crash)
    import os
    assert os.path.exists(os.path.join(inc, "_lex_upsert_pending.json"))

    # recovery: re-run the SAME batch
    upsert_lexical_index(spark, inc, adds=adds, removes=removes)
    assert not os.path.exists(os.path.join(inc, "_lex_upsert_pending.json"))

    final = (docs.where(~F.col("doc_id").isin(32, 7, 3))
             .unionByName(spark.createDataFrame(
                 [(40, "omega psi"), (3, "replaced doc")],
                 "doc_id long, text string")))
    write_lexical_index(final, full, shards=4, span_width=8)
    assert (json.load(open(os.path.join(inc, "_lex_meta.json")))
            == json.load(open(os.path.join(full, "_lex_meta.json"))))
