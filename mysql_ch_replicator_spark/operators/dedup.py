"""Document deduplication suite — exact, MinHash+LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

These are the operations a large-scale training-data pipeline runs over a
corpus; the reference engine has no analog (it replicates, it doesn't clean),
so these are designed Spark-first from scratch.

Common output convention: each operator returns the **survivor/duplicate
mapping** ``(doc_id, dup_of)`` where ``dup_of`` is the smallest doc_id of the
duplicate group the doc belongs to (dup_of == doc_id ⇒ survivor). Keeping
the mapping (not just survivors) makes the result auditable and joins back
onto the corpus cheaply.

Scale design notes (100 TB corpus):

- exact: one shuffle on a 128-bit content hash — minimal possible.
- MinHash LSH: signatures are computed scan-side (no shuffle); the only
  shuffle is the band-bucket explode+groupBy. Buckets are tiny (only docs
  agreeing on a band); the candidate verification joins shingle sets only
  for candidate pairs, never all-pairs.
- SimHash: fingerprint scan-side; candidates via 4-chunk pigeonhole
  (distance ≤3 ⇒ some 15-bit chunk equal) — again one explode+join.
- n-gram Jaccard: inverted index on shingle hash; pairs co-occurring in a
  posting list are counted — O(sum posting²) bounded by dropping
  ultra-frequent shingles (stopword-shingle cap), the standard trick.
- embedding: LSH (random hyperplanes) or brute-force; see similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..cache import transient_persist
from ..functions.hashing import (
    h60, lsh_band_keys, md5_hex, minhash_signature, norm_text_hash,
    shingles, simhash64, words,
)
from ..sources.snapshot import spread


def _shingled(docs: DataFrame, text_col: str, id_col: str,
              shingle_n: int, persist: bool = True) -> DataFrame:
    """(doc_id, sh) with sh = distinct word n-gram shingles, computed ONCE.

    The shingle subtree is interpreted (higher-order functions have no
    codegen), so it must not be re-evaluated per consumer: persisting the
    projection BEFORE the non-empty filter stops predicate pushdown from
    cloning the subtree into the filter, and gives every downstream branch
    (sizes, posting lists, signatures, verify join) the cached arrays. At
    100 TB the persist becomes a staged table write — same shape.

    ``persist=False`` returns the RAW UNFILTERED projection for callers
    that stage their own superset (minhash persists (doc_id, sh, sig) —
    caching sh twice would double the biggest column's memory footprint)
    or consume it exactly once (the cap audit). Such callers must either
    skip the non-empty filter (explode of an empty array emits nothing
    anyway) or apply it ABOVE their own persist — filtering this
    projection directly re-triggers the pushdown clone and doubles the
    shingle compute (seen as a 2.8× cold-run regression in r7)."""
    proj = spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(shingles(words(F.col(text_col)), shingle_n))
         .alias("sh"))
    if not persist:
        return proj
    return transient_persist(proj).where(F.size("sh") > 0)


def _pair_min_dup(pairs: DataFrame, all_ids: DataFrame) -> DataFrame:
    """Given verified duplicate pairs (a < b), produce (doc_id, dup_of) with
    dup_of = min id over the doc's direct duplicates (one link hop —
    deterministic and cheap; full transitive closure is
    ``connected_components``)."""
    best = pairs.groupBy(F.col("b").alias("doc_id")) \
        .agg(F.min("a").alias("dup_of"))
    return (all_ids.join(best, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("dup_of", "doc_id").alias("dup_of")))


def closure_partitions(n_edges: int, spark) -> int:
    """Shuffle width for the closure loop, derived from the edge count.

    The dup-pair graph is usually tiny relative to the corpus, and
    near-empty tasks dominate round latency if the loop inherits the
    parent's partitioning — but a hardcoded small constant (the pre-r5
    ``repartition(8)``) becomes the bottleneck at a billion pairs.
    ~1M bidirectional edges per partition, clamped to
    [cluster parallelism / 4, shuffle partitions * 8]: a 10k-pair graph
    collapses to a handful of tasks, a billion-pair one fans out to the
    full cluster."""
    sc = spark.sparkContext
    lo = max(1, sc.defaultParallelism // 4)
    hi = int(spark.conf.get("spark.sql.shuffle.partitions",
                            str(sc.defaultParallelism))) * 8
    return min(hi, max(lo, n_edges // 1_000_000 + 1))


def connected_components(pairs: DataFrame, all_ids: DataFrame,
                         max_iter: int = 50,
                         num_partitions: int | None = None) -> DataFrame:
    """Full transitive closure of a duplicate-pair graph: (doc_id, dup_of)
    with dup_of = the MINIMUM doc_id in the doc's connected component
    (so A~B, B~C ⇒ all three map to min(A,B,C) even if A≁C directly).

    Algorithm: iterative min-label propagation — each round every node takes
    ``min(own label, min neighbor label)`` until a fixpoint. Converges in
    O(component diameter) rounds; duplicate clusters are shallow (near-clique),
    so 2–4 rounds in practice. Per round: one shuffle join (edges × labels)
    + one groupBy min. ``localCheckpoint`` truncates the lineage each round —
    without it the plan doubles per iteration and the driver OOMs planning
    round ~20.

    Scale notes (100 TB corpus): only nodes that appear in at least one pair
    enter the loop — the iteration working set is |dup pairs|, typically
    orders of magnitude smaller than the corpus; isolated docs are closed
    with a single left join at the end. The convergence check is an
    ``isEmpty`` on a changed-labels anti-pattern join, which short-circuits
    on the first changed partition. For adversarial long-chain graphs swap
    in large-star/small-star (O(log n) rounds) — not needed for dedup
    workloads.
    """
    # pairs is typically the tail of an expensive candidate+verify pipeline;
    # pin it before the bidirectional union or that pipeline runs TWICE.
    # Eager localCheckpoint materializes AND truncates the lineage in one
    # job (the r5 maintenance-loop pattern — ~2x a persist + forcing
    # count), so the sizing count below scans cached blocks only.
    pairs = pairs.localCheckpoint()
    if num_partitions is None:
        num_partitions = closure_partitions(pairs.count() * 2,
                                            pairs.sparkSession)
    # no distinct: verified pairs are unique (a < b), so the two union
    # branches cannot collide — and even a caller passing duplicate pairs
    # only duplicates rows under min-aggregations, never changes them.
    # Dropping it removes a full shuffle of the edge set (r5 verdict #6).
    edges = (pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
             .union(pairs.select(F.col("b").alias("src"),
                                 F.col("a").alias("dst")))
             .repartition(num_partitions, "src").persist())
    labels = (edges.select(F.col("src").alias("id")).distinct()
              .withColumn("lbl", F.col("id")).localCheckpoint())
    for round_no in range(max_iter):
        if round_no == 0:
            # identity labels: label(src) == src, so round 0 needs no
            # edges x labels join — the propagation is a bare aggregation
            prop = (edges.groupBy(F.col("dst").alias("id"))
                    .agg(F.min("src").alias("nlbl")))
        else:
            prop = (edges.join(labels.select(F.col("id").alias("src"),
                                             F.col("lbl").alias("slbl")),
                               "src")
                    .groupBy(F.col("dst").alias("id"))
                    .agg(F.min("slbl").alias("nlbl")))
        # the changed flag rides along in the same projection, so
        # convergence detection costs no extra join — just a scan of the
        # checkpointed round output
        new_labels = (labels.join(prop, "id", "left")
                      .select("id",
                              F.least(F.col("lbl"),
                                      F.coalesce("nlbl", F.col("lbl")))
                               .alias("lbl"),
                              (F.col("nlbl") < F.col("lbl")).alias("chg"))
                      .localCheckpoint())
        converged = new_labels.where(F.col("chg")).isEmpty()
        labels = new_labels.drop("chg")
        if converged:
            break
    edges.unpersist()
    # pairs' checkpoint blocks are reclaimed by the ContextCleaner once the
    # frame goes out of scope (checkpoints have no explicit unpersist)
    return (all_ids.join(labels.select(F.col("id").alias("doc_id"), "lbl"),
                         "doc_id", "left")
            .select("doc_id",
                    F.coalesce("lbl", F.col("doc_id")).alias("dup_of")))


def _resolve(pairs: DataFrame, all_ids: DataFrame, closure: bool) -> DataFrame:
    """Tail of every near-dup operator: one-hop min link (default) or full
    transitive closure when ``closure=True``."""
    if closure:
        return connected_components(pairs, all_ids)
    return _pair_min_dup(pairs, all_ids)


def exact_dedup(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Exact dedup on the md5 of the raw text: one hash-shuffle, keep the
    min doc_id per content group."""
    hashed = docs.select(F.col(id_col).alias("doc_id"),
                         md5_hex(F.col(text_col)).alias("content_hash"))
    keeper = hashed.groupBy("content_hash").agg(F.min("doc_id").alias("dup_of"))
    return hashed.join(keeper, "content_hash") \
        .select("doc_id", "dup_of", "content_hash")


def normalized_dedup(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Normalization-aware exact dedup: lowercase, fold every non-
    alphanumeric run to a single space, trim, THEN hash — catches the
    re-encoded / re-punctuated / re-wrapped copies that byte-exact dedup
    misses while staying a pure one-shuffle hash-group (the cheap middle
    ground before the MinHash family).

    Same plan shape as ``exact_dedup``: hash projection at the scan, one
    map-side-combined aggregate on the hash, keeper = min doc id; the
    join back is hash-co-partitioned with the aggregate's exchange.
    Returns (doc_id, dup_of, n_copies, norm_hash) for every doc.
    """
    hashed = docs.select(F.col(id_col).alias("doc_id"),
                         norm_text_hash(F.col(text_col)).alias("norm_hash"))
    keeper = hashed.groupBy("norm_hash").agg(
        F.min("doc_id").alias("dup_of"),
        F.count(F.lit(1)).alias("n_copies"))
    return hashed.join(keeper, "norm_hash") \
        .select("doc_id", "dup_of", "n_copies", "norm_hash")


def quality_keeper_dedup(docs: DataFrame, score_expr,
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Normalization-aware dedup that keeps the HIGHEST-QUALITY copy per
    cluster instead of the first-seen: pretraining pipelines that
    collapse duplicates want the cleanest surviving copy (the CCNet /
    RefinedWeb convention — dedup keeps the best-scored instance), and a
    min-id keeper silently prefers whichever copy was crawled first.

    ``score_expr`` is a Column evaluated AT THE SCAN (a pure function of
    the row — e.g. the linear quality classifier's token-weight mean
    folded into one ``aggregate`` over the shared tokenizer), so the
    whole operator keeps ``normalized_dedup``'s shape: hash + score
    projection at the scan, ONE map-side-combined aggregate on the norm
    hash (``max_by`` on (score, -doc_id) — highest score wins, ties to
    the lower id), and a hash-co-partitioned join back. No second
    shuffle, no window (a window would funnel a viral doc's whole
    cluster through one task).

    Returns (doc_id, dup_of, n_copies, kept, norm_hash) for every doc —
    ``kept`` marks the cluster representative."""
    # the score keeps its native type — a silent cast("long") here would
    # truncate fractional scores to ties and quietly degrade the keeper
    # to min-id, the exact bias this operator exists to remove; use
    # integer (ppm-scaled) scores when cross-engine exactness matters
    hashed = docs.select(
        F.col(id_col).alias("doc_id"),
        norm_text_hash(F.col(text_col)).alias("norm_hash"),
        score_expr.alias("__s"))
    keeper = hashed.groupBy("norm_hash").agg(
        F.max_by("doc_id",
                 F.struct(F.col("__s"), (-F.col("doc_id")).alias("nid")))
         .alias("dup_of"),
        F.count(F.lit(1)).alias("n_copies"))
    return (hashed.join(keeper, "norm_hash")
            .select("doc_id", "dup_of", "n_copies",
                    (F.col("doc_id") == F.col("dup_of"))
                    .cast("int").alias("kept"),
                    "norm_hash"))


def minhash_lsh_dedup(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", shingle_n: int = 3,
                      num_hashes: int = 12, bands: int = 4,
                      threshold: float = 0.6,
                      closure: bool = False) -> DataFrame:
    """Near-dup via MinHash signatures + LSH banding + exact-Jaccard
    verification of candidates.

    Pipeline: shingle → 12-hash MinHash signature → 4 bands × 3 rows →
    band-bucket join (candidates) → verify true Jaccard of distinct shingle
    sets ≥ threshold → (doc_id, dup_of) by one-hop min link.

    One-hop rather than full transitive closure: closure needs an iterative
    connected-components (graphframes / loop of joins); one hop is
    deterministic, single-pass, and the standard first stage — re-running on
    survivors converges if full closure is wanted.

    Shuffle-payload contract (r6 verdict #1): the band-bucket self-join
    carries (bucket, doc_id) ONLY — at 100 TB the shingle arrays, not the
    keys, would dominate that exchange (each doc's full shingle set would
    cross it once per band per side). Shingle sets re-attach by doc_id
    AFTER candidate generation, so they shuffle once each for the
    ≤|candidates| verification joins instead of ``bands×`` for the
    bucket join; a plan pin (tests/test_plan_shapes.py) enforces that no
    array column enters the bucket exchange.
    """
    rows_per_band = num_hashes // bands
    raw = _shingled(docs, text_col, id_col, shingle_n, persist=False)
    # materialize (doc_id, sh, sig) ONCE: four consumers (both sides of the
    # bucket join via the band explode, and both sides of the verification
    # re-join) and Spark has no cross-branch CSE — without the persist every
    # shingle is re-md5'd per consumer (at 100 TB: write signatures to a
    # table; here: cache)
    # the non-empty filter sits ABOVE the cache: filtering the raw
    # projection would clone the shingle subtree into the pushed-down
    # predicate and evaluate it twice during cache fill
    # eager: banding (both join sides) and the two verify sh_tbl sides
    # first-touch this cache from concurrent stages of one action — a
    # lazy cache is recomputed by each (stampede, guide §5), and the
    # md5-per-hash signature is the most expensive projection here
    sigs = transient_persist(
        raw.withColumn("sig",
                       minhash_signature(F.col("sh"), num_hashes)),
        eager=True) \
        .where(F.size("sh") > 0)
    banded = sigs.select(
        "doc_id",
        F.explode(lsh_band_keys(F.col("sig"), bands, rows_per_band))
         .alias("bucket"))

    left = banded.select(F.col("doc_id").alias("a"), "bucket")
    right = banded.select(F.col("doc_id").alias("b"), "bucket")
    cand = (left.join(right, "bucket")
            .where(F.col("a") < F.col("b"))
            .select("a", "b")
            .dropDuplicates(["a", "b"]))
    sh_tbl = sigs.select("doc_id", "sh")
    cand = (cand
            .join(sh_tbl.select(F.col("doc_id").alias("a"),
                                F.col("sh").alias("sh_a")), "a")
            .join(sh_tbl.select(F.col("doc_id").alias("b"),
                                F.col("sh").alias("sh_b")), "b"))

    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    verified = cand.withColumn(
        "jaccard", inter.cast("double") / union.cast("double")) \
        .where(F.col("jaccard") >= threshold) \
        .select("a", "b")
    return _resolve(verified, docs.select(F.col(id_col).alias("doc_id")),
                    closure)


def simhash_dedup(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", max_distance: int = 3,
                  closure: bool = False) -> DataFrame:
    """Near-dup via 60-bit SimHash + pigeonhole candidate generation:
    distance ≤ 3 ⇒ at least one of the 4 15-bit chunks matches exactly, so
    candidates come from one explode+equi-join, then exact Hamming verify.
    Identical fingerprints collapse to one representative BEFORE banding
    (``_band15_resolve``) — the hot-band guard."""
    fp = transient_persist(spread(docs).select(
        F.col(id_col).alias("doc_id"),
        simhash64(words(F.col(text_col))).alias("fp")))
    return _band15_resolve(fp, docs.select(F.col(id_col).alias("doc_id")),
                           max_distance, closure)


def _band15_chunk_col() -> Column:
    """The 4×15-bit chunk array of a 60-bit ``fp`` column — shared by
    candidate generation and the hot-band audit so both count the same
    buckets."""
    return F.array(*[
        F.concat(F.lit(f"{c}:"),
                 F.shiftright(F.col("fp"), c * 15)
                  .bitwiseAND(F.lit((1 << 15) - 1)).cast("string"))
        for c in range(4)])


def _band15_pairs(fp: DataFrame, max_distance: int) -> DataFrame:
    """Exact Hamming-≤k pairs over a 60-bit fingerprint frame
    ``(doc_id, fp)`` via 4×15-bit pigeonhole banding: distance ≤ 3 ⇒ at
    least one of the 4 chunks matches exactly, so candidates come from
    one explode+equi-join (never all-pairs), then exact verify.  Shared
    by text SimHash and image dHash — the fingerprint source differs,
    the banding algebra is identical.  Callers feed this DISTINCT
    fingerprints (``_band15_resolve`` collapses identical fps first);
    fed raw docs it still computes correct pairs, but an identical-fp
    cluster of c docs would fan the band equi-join out c² — the hot-band
    blowup the collapse exists to kill."""
    if max_distance > 3:
        raise ValueError(
            "4×15-bit pigeonhole banding guarantees recall only for "
            f"Hamming distance ≤ 3 (got max_distance={max_distance}); "
            "add bands before raising the radius")
    chunks = fp.select("doc_id", "fp",
                       F.explode(_band15_chunk_col()).alias("chunk"))
    left = chunks.select(F.col("doc_id").alias("a"), F.col("fp").alias("fp_a"),
                         "chunk")
    right = chunks.select(F.col("doc_id").alias("b"), F.col("fp").alias("fp_b"),
                          "chunk")
    cand = (left.join(right, "chunk")
            .where(F.col("a") < F.col("b"))
            .select("a", "b", "fp_a", "fp_b")
            .dropDuplicates(["a", "b"]))
    return cand.where(
        F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))) <= max_distance) \
        .select("a", "b")


def _band15_resolve(fp: DataFrame, all_ids: DataFrame, max_distance: int,
                    closure: bool) -> DataFrame:
    """Collapse-then-band tail shared by SimHash and dHash dedup, with
    output IDENTICAL to banding the raw docs (pinned by equivalence
    tests) at a fraction of the candidate volume.

    The hot-band guard (r8 verdict): a real 100 TB corpus has massive
    EXACT-duplicate clusters (blank thumbnails, logos, boilerplate)
    whose identical fingerprints share all four bands — a c-doc cluster
    fans the band equi-join out c²/2 candidate pairs that all verify at
    distance 0 and say nothing new.  Capping the band (the n-gram
    posting trick) would break the pigeonhole recall GUARANTEE, so
    instead: identical fps collapse to their MIN doc id (one fp-keyed
    map-side-combining shuffle), banding runs over DISTINCT fps only,
    and cluster members link to their representative afterwards —
    linear in cluster size, recall untouched.  ``band15_hot_report``
    quantifies both the collapse win and any residual distinct-fp
    band skew.

    Equivalences with the uncollapsed algebra:

    - closure: every member–rep edge is a true distance-0 pair and every
      rep–rep edge a true ≤k pair, and any uncollapsed pair (x, y) is
      bridged x — rep(x) — rep(y) — y, so connected components (hence
      dup_of = component min) are identical.
    - min-link: dup_of(b) = min doc id over b's CLOSED Hamming-≤k
      neighborhood.  Every doc with fingerprint g in that neighborhood
      contributes its fp-group minimum = rep(g), so the neighborhood min
      equals min(rep(fp_b), adjacent reps) — computable rep-level, then
      broadcast back to members by one fp join.

    All-distinct short-circuit (r9 verdict #4): the collapse's guard
    costs a pure-distinct corpus a useless member link-back join (the
    collapse deduped nothing, so reps IS the corpus row-for-row). The
    rep aggregate already computes group sizes, so one tiny max over the
    persisted rep frame detects ``max(c) == 1`` and skips the link-back
    (min-link) / member-edge union (closure) entirely — outputs
    identical by the equivalences above with rep(g) = the doc itself."""
    reps_c = transient_persist(
        fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"),
                             F.count(F.lit(1)).cast("long").alias("c")))
    mx = reps_c.agg(F.max("c").alias("m")).first()
    all_distinct = mx is None or int(mx.m or 0) <= 1
    reps = reps_c.select("fp", "doc_id")
    rep_pairs = _band15_pairs(reps, max_distance)
    if closure:
        if all_distinct:
            return connected_components(rep_pairs, all_ids)
        members = (fp.join(reps.select("fp", F.col("doc_id").alias("a")),
                           "fp")
                   .where(F.col("doc_id") != F.col("a"))
                   .select("a", F.col("doc_id").alias("b")))
        return connected_components(rep_pairs.unionByName(members), all_ids)
    # eager: both nbrs directions first-touch this from concurrent
    # stages — lazy, each would re-run the band join + Hamming verify
    rep_pairs = transient_persist(rep_pairs, eager=True)
    nbrs = rep_pairs.select(F.col("a").alias("r"), F.col("b").alias("n")) \
        .unionByName(rep_pairs.select(F.col("b").alias("r"),
                                      F.col("a").alias("n")))
    best = nbrs.groupBy("r").agg(F.min("n").alias("nbr_min"))
    if all_distinct:
        # reps is one row per DOC: dup_of comes straight off the
        # rep-level neighborhood min, no fp link-back join
        linked = (reps.join(best, reps["doc_id"] == best["r"], "left")
                  .select("doc_id",
                          F.least(F.col("doc_id"),
                                  F.coalesce("nbr_min", F.col("doc_id")))
                          .alias("dup_of")))
    else:
        rep_best = (reps.join(best, reps["doc_id"] == best["r"], "left")
                    .select("fp",
                            F.least(F.col("doc_id"),
                                    F.coalesce("nbr_min", F.col("doc_id")))
                            .alias("dup_of")))
        linked = fp.join(rep_best, "fp").select("doc_id", "dup_of")
    return (all_ids.join(linked, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("dup_of", "doc_id").alias("dup_of")))


def band15_hot_report(fp: DataFrame) -> DataFrame:
    """The 'no silent blowups' audit twin of ``_band15_resolve`` (the
    ``ngram_posting_cap_report`` mold): ONE row quantifying identical-
    fingerprint cluster mass and residual band skew so a 100 TB image/
    text dedup sizes its shuffle before committing.

    Columns: n_docs, n_distinct_fps, max_fp_cluster (largest identical-
    fp cluster), collapsed_docs (docs deduped by collapse alone),
    max_band_fps (hottest band bucket over DISTINCT fps — residual skew
    the collapse can't remove), cand_pairs_collapsed (Σ C(c,2) over
    buckets of distinct fps — the exact band-join candidate bound the
    dedup pays), cand_pairs_raw (same bound WITHOUT collapse — what the
    r8 plan would have paid).

    Scale shape: one fp-keyed aggregate + one chunk-keyed aggregate over
    the exploded DISTINCT fps (4 rows per fp), a second chunk-keyed
    aggregate over raw docs for the contrast column, then one-row
    totals. No joins, no pair generation — safe at any corpus size."""
    # eager: the two one-row stat branches below materialize as
    # concurrent broadcast jobs inside the caller's single action, and a
    # lazy cache would be recomputed by each (stampede — guide §5)
    per_fp = transient_persist(
        fp.groupBy("fp").agg(F.count(F.lit(1)).cast("long").alias("c")),
        eager=True)
    fp_stats = per_fp.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_fps"),
        F.coalesce(F.max("c"), F.lit(0)).cast("long")
         .alias("max_fp_cluster"),
        F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).cast("long")
         .alias("collapsed_docs"))
    coll = (per_fp.select(F.explode(_band15_chunk_col()).alias("chunk"),
                          "c")
            .groupBy("chunk")
            .agg(F.count(F.lit(1)).cast("long").alias("k"),
                 F.sum("c").cast("long").alias("d"))
            .agg(F.coalesce(F.max("k"), F.lit(0)).cast("long")
                  .alias("max_band_fps"),
                 # k*(k-1) is always even: div is exact (stays integer —
                 # the cross-engine hash compares values, not floats)
                 F.coalesce(F.sum(F.expr("k*(k-1) div 2")), F.lit(0))
                  .cast("long").alias("cand_pairs_collapsed"),
                 F.coalesce(F.sum(F.expr("d*(d-1) div 2")), F.lit(0))
                  .cast("long").alias("cand_pairs_raw")))
    return fp_stats.crossJoin(coll)


def image_dhash_dedup(images: DataFrame, id_col: str = "doc_id",
                      max_distance: int = 3, closure: bool = False,
                      rows: int = 6, cols: int = 10) -> DataFrame:
    """Near-duplicate IMAGE detection — the multimodal twin of
    ``simhash_dedup``: a 60-bit perceptual difference hash per image
    (``multimodal.dhash_images``, one shuffle-free Arrow pass over the
    binary column) banded through the SAME 4×15-bit pigeonhole machinery,
    so a 100 TB image corpus dedups with one explode+equi-join instead of
    all-pairs pixel comparison.  Input: (doc_id, image binary).  Output:
    (doc_id, dup_of) per image, min-link or full closure like every
    other dedup operator."""
    from .multimodal import dhash_images

    fp = transient_persist(dhash_images(images, rows=rows, cols=cols))
    return _band15_resolve(fp,
                           images.select(F.col(id_col).alias("doc_id")),
                           max_distance, closure)


def ngram_jaccard_dedup(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", shingle_n: int = 3,
                        threshold: float = 0.5, max_posting: int = 1000,
                        closure: bool = False) -> DataFrame:
    """Exact n-gram Jaccard over an inverted shingle index (no MinHash
    approximation): explode distinct shingles, drop shingles occurring in
    more than ``max_posting`` docs (stopword-shingle cap — they add pairs
    quadratically and carry no signal), count co-occurrences per pair, and
    keep pairs with true Jaccard ≥ threshold.

    The cap is NOT silent: ``ngram_posting_cap_report`` returns exactly
    how many shingles/postings a given cap discards and the hottest
    document frequency seen, so a 100 TB run sizes the recall trade
    before committing (r6 verdict #5)."""
    base = _shingled(docs, text_col, id_col, shingle_n)
    sizes = base.select("doc_id", F.size("sh").alias("n_sh"))
    # eager: the action fans into concurrent AQE stages (freq, both
    # pair-join sides, two sizes branches) that all first-touch these
    # caches — lazily persisted, each stage re-ran the interpreted
    # shingle subtree (cache stampede, guide §5). One count populates
    # posting AND, en route, the base shingle cache it reads through.
    posting = transient_persist(
        base.select("doc_id", F.explode("sh").alias("g"))
        .withColumn("gh", h60(F.col("g"))).drop("g"), eager=True)
    freq = posting.groupBy("gh").agg(F.count(F.lit(1)).alias("df"))
    posting = transient_persist(
        posting.join(freq.where(F.col("df") <= max_posting), "gh"))

    pairs = (posting.alias("x").join(posting.alias("y"), "gh")
             .where(F.col("x.doc_id") < F.col("y.doc_id"))
             .groupBy(F.col("x.doc_id").alias("a"),
                      F.col("y.doc_id").alias("b"))
             .agg(F.count(F.lit(1)).alias("common")))
    verified = (pairs
                .join(sizes.select(F.col("doc_id").alias("a"),
                                   F.col("n_sh").alias("na")), "a")
                .join(sizes.select(F.col("doc_id").alias("b"),
                                   F.col("n_sh").alias("nb")), "b")
                .withColumn("jaccard",
                            F.col("common").cast("double")
                            / (F.col("na") + F.col("nb") - F.col("common")))
                .where(F.col("jaccard") >= threshold)
                .select("a", "b"))
    return _resolve(verified, docs.select(F.col(id_col).alias("doc_id")),
                    closure)


def ngram_posting_cap_report(docs: DataFrame, text_col: str = "text",
                             id_col: str = "doc_id", shingle_n: int = 3,
                             max_posting: int = 1000) -> DataFrame:
    """The 'no silent caps' audit twin of ``ngram_jaccard_dedup``: ONE
    row quantifying what the ``max_posting`` stopword-shingle cap would
    discard — (n_shingles, n_dropped_shingles, n_dropped_postings,
    max_df_seen). A dedup run that silently loses recall to the cap is
    indistinguishable from one that doesn't; this report makes the loss
    a number an operator checks before (or alongside) the corpus run.

    Scale shape: the same scan-side shingle explode and ONE map-side-
    combining aggregate on the shingle hash as the dedup operator's
    frequency stage, then a one-row total — no joins, no pair
    generation, safe to run at any corpus size. The shingle arrays are
    staged through the SHARED ``_shingled`` persist before the explode —
    Generate's codegen re-evaluates its child expression per emitted
    element, so exploding the raw projection multiplies the interpreted
    higher-order shingle compute by average-shingles-per-doc (measured
    6× at sf0.1); staging also means the audit and the dedup itself
    share one cache fill when run together."""
    base = _shingled(docs, text_col, id_col, shingle_n)
    posting = base.select("doc_id", F.explode("sh").alias("g")) \
        .withColumn("gh", h60(F.col("g")))
    freq = posting.groupBy("gh").agg(F.count(F.lit(1)).alias("df"))
    over = F.col("df") > max_posting
    return freq.agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles"),
        F.coalesce(F.sum(F.when(over, 1).otherwise(0)), F.lit(0))
         .cast("long").alias("n_dropped_shingles"),
        F.coalesce(F.sum(F.when(over, F.col("df")).otherwise(0)), F.lit(0))
         .cast("long").alias("n_dropped_postings"),
        F.max("df").cast("long").alias("max_df_seen"))


def embedding_neardup(embeddings: DataFrame, vec_col: str = "embedding",
                      id_col: str = "vec_id", threshold: float = 0.98,
                      planes: int = 12,
                      closure: bool = False) -> DataFrame:
    """Embedding near-dup: random-hyperplane LSH buckets → cosine verify.

    Hyperplane components are deterministic pseudo-randoms derived from md5
    of constant strings, precomputed driver-side and inlined (portable to
    the SQL oracle — see similarity.plane_components). A vector's bucket is
    the sign pattern over all planes; near-identical vectors agree on every
    sign with high probability. Verification computes exact cosine within
    buckets.
    """
    from ..operators.similarity import cosine_expr, hyperplane_bucket

    dims = len(embeddings.select(vec_col).first()[0])
    # eager: both bucket-join sides first-touch this cache concurrently;
    # lazy, each re-ran the hyperplane sign projection (stampede)
    bucketed = transient_persist(spread(embeddings).select(
        F.col(id_col).alias("doc_id"), F.col(vec_col).alias("v"),
        hyperplane_bucket(vec_col, planes, dims).alias("bucket")),
        eager=True)

    left = bucketed.select(F.col("doc_id").alias("a"), F.col("v").alias("va"),
                           "bucket")
    right = bucketed.select(F.col("doc_id").alias("b"), F.col("v").alias("vb"),
                            "bucket")
    cand = (left.join(right, "bucket")
            .where(F.col("a") < F.col("b"))
            .dropDuplicates(["a", "b"]))
    verified = cand.withColumn("cos", cosine_expr("va", "vb")) \
        .where(F.col("cos") >= threshold).select("a", "b")
    return _resolve(
        verified, embeddings.select(F.col(id_col).alias("doc_id")), closure)


def semantic_cell_dedup(embeddings: DataFrame, vec_col: str = "embedding",
                        id_col: str = "vec_id", n_cells: int = 16,
                        threshold: float = 0.98,
                        closure: bool = False) -> DataFrame:
    """SemDeDup-style cluster-scoped semantic dedup (Abbas et al. 2023):
    assign every embedding to its nearest of ``n_cells`` deterministic IVF
    centroids, then mark cosine-near-duplicates WITHIN each cell only —
    the cluster bounds the pair space, which is the whole point of the
    method (and what makes it shard cleanly: cell = partition key, each
    task does its own cell's pairs, no global candidate structure).

    The hyperplane variant (``embedding_neardup``) buckets on sign
    agreement — high precision, recall limited to sign-exact matches; the
    cell variant trades a coarser partition for full recall inside each
    cell, the standard semantic-dedup operating point.

    Returns ``(doc_id, cell, dup_of)`` for every vector.
    """
    from .similarity import cosine_expr, ivf_assign

    dims = len(embeddings.select(vec_col).first()[0])
    assigned = ivf_assign(
        spread(embeddings).select(F.col(id_col).alias("doc_id"),
                                  F.col(vec_col).alias("v")),
        "v", n_cells, dims, probes=1, cells_col="cells")
    # eager: both cell-join sides plus the final cell join-back
    # first-touch this cache concurrently; lazy, each re-ran the
    # 16-centroid assignment projection (stampede)
    cells = transient_persist(
        assigned.withColumn("cell", F.element_at("cells", 1))
        .drop("cells"), eager=True)
    left = cells.select(F.col("doc_id").alias("a"),
                        F.col("v").alias("va"), "cell")
    right = cells.select(F.col("doc_id").alias("b"),
                         F.col("v").alias("vb"), "cell")
    pairs = (left.join(right, "cell")
             .where(F.col("a") < F.col("b"))
             .where(cosine_expr("va", "vb") >= threshold)
             .select("a", "b"))
    resolved = _resolve(pairs,
                        embeddings.select(F.col(id_col).alias("doc_id")),
                        closure)
    return (resolved.join(cells.select("doc_id", "cell"), "doc_id")
            .select("doc_id", "cell", "dup_of"))


def line_dedup_stats(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     sep: str = "\n") -> DataFrame:
    """Corpus-wide line-level exact dedup (the CCNet/RefinedWeb hygiene
    step: boilerplate lines — nav bars, cookie banners, license headers —
    repeat across millions of pages and are removed corpus-wide, not
    per-document). A line occurrence is KEPT iff its document is the
    minimum ``id_col`` among all documents containing that exact line —
    deterministic first-document-wins. Returns one row per document:
    ``(id, n_lines, n_kept)``.

    Scale shape: explode → ONE aggregate keyed on the line text (uniform
    key space, min(doc_id) combines map-side, so the shuffle carries one
    record per distinct line per partition — boilerplate lines collapse
    before the wire, exactly where the volume is) → one small per-doc
    count aggregate + a doc-keyed join. No window over the corpus, no
    all-pairs comparison anywhere.
    """
    lines = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), sep)).alias("__l"))
    n_lines = lines.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_lines"))
    keepers = lines.groupBy("__l").agg(F.min(id_col).alias("__kdoc"))
    kept = (keepers.groupBy("__kdoc").agg(F.count(F.lit(1)).alias("n_kept"))
            .withColumnRenamed("__kdoc", id_col))
    return (n_lines.join(kept, id_col, "left")
            .select(id_col, "n_lines",
                    F.coalesce("n_kept", F.lit(0)).alias("n_kept")))


def fuzzy_name_pairs(df: DataFrame, name_col: str, max_dist: int = 2,
                     gram_n: int = 2, short_len: int = 6) -> DataFrame:
    """Edit-distance entity matching: all UNORDERED pairs of distinct
    names within Levenshtein distance [1, max_dist] — the fuzzy-join
    family (typo'd entity names, OCR noise) that the set-based near-dup
    operators (Jaccard/MinHash) cannot express, since edit distance is
    order- and position-sensitive.

    Blocking is exact-recall, not heuristic: a candidate pair must share
    one character n-gram (an edit destroys at most ``gram_n`` grams of
    the SET — set blocking is shift-invariant under insertions — so for
    names with > max_dist*gram_n + gram_n - 1 chars a survivor gram
    always exists) OR involve a short name (< ``short_len`` chars),
    which is rescued by a short-bucket block against every name within
    ``max_dist`` of its length. Candidates then verify with a single
    JVM levenshtein call. The oracle is deliberately the NAIVE exhaustive
    pair join, so a blocking recall hole shows up as a driver mismatch
    rather than being mirrored away.

    Scale shape (100 TB): the working set is DISTINCT names (one
    map-side-combining aggregate over the corpus — orders of magnitude
    smaller than the row count); the gram self-join carries a length
    predicate so hot grams prune before the verify; no all-pairs join
    anywhere except inside the bounded short bucket. For hostile
    hot-gram distributions, composite (gram, length-bucket) keys are the
    standard escalation — same plan shape, more blocks."""
    # no persist: every consumer branch sits above the SAME distinct
    # aggregate, so its exchange is planned once and reused (AQE
    # ReuseExchange) — caching would leak across a long-lived session
    names = df.select(F.col(name_col).alias("name")).distinct() \
        .withColumn("len", F.length("name"))
    grams = names.select(
        "name", "len",
        F.explode(F.array_distinct(F.transform(
            F.sequence(F.lit(0),
                       F.greatest(F.col("len") - gram_n, F.lit(0))),
            lambda i: F.col("name").substr(i + 1, F.lit(gram_n)),
        ))).alias("g")).where(F.length("g") == gram_n)
    a = grams.select(F.col("name").alias("name_a"),
                     F.col("len").alias("la"), "g")
    b = grams.select(F.col("name").alias("name_b"),
                     F.col("len").alias("lb"), "g")
    cand = (a.join(b, "g")
            .where((F.col("name_a") < F.col("name_b"))
                   & (F.abs(F.col("la") - F.col("lb")) <= max_dist))
            .select("name_a", "name_b"))
    shorts = names.where(F.col("len") < short_len) \
        .select(F.col("name").alias("s_name"), F.col("len").alias("sl"))
    near = names.where(F.col("len") < short_len + max_dist) \
        .select(F.col("name").alias("o_name"), F.col("len").alias("ol"))
    rescue = (shorts.join(near,
                          (F.abs(F.col("sl") - F.col("ol")) <= max_dist)
                          & (F.col("s_name") != F.col("o_name")))
              .select(F.least("s_name", "o_name").alias("name_a"),
                      F.greatest("s_name", "o_name").alias("name_b")))
    dist = F.levenshtein("name_a", "name_b")
    out = (cand.unionByName(rescue).distinct()
           .withColumn("dist", dist.cast("long"))
           .where((F.col("dist") >= 1) & (F.col("dist") <= max_dist))
           .select("name_a", "name_b", "dist"))
    return out


def substring_dup_stats(docs: DataFrame, win: int = 64, stride: int = 32,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Cross-document substring-duplication audit (the rolling-window
    approximation of exact substring dedup, Lee et al. 2021 "Deduplicating
    Training Data Makes Language Models Better"): hash every ``win``-char
    window at ``stride`` offsets, count per doc how many of its windows
    also occur in ANOTHER document — the docs with high duplicated-window
    share are the boilerplate/mirror candidates a suffix-array pass would
    flag.

    Scale design: window hashing is a zero-shuffle scan-side explode
    (sequence+substr+h60, all codegen); the only shuffles are the
    window-hash frequency aggregate (map-side combining, keyspace bounded
    by total windows) and the count join back. No suffix array, no global
    sort — the standard big-corpus trade (stride>1 misses unaligned dups;
    halve the stride to dial recall).

    Returns (doc_id, n_windows, n_dup_windows) for docs with >= 1 window
    (len >= win)."""
    wh = (spread(docs)
          .where(F.length(text_col) >= win)
          .select(F.col(id_col).alias("doc_id"),
                  F.explode(F.transform(
                      F.sequence(F.lit(0),
                                 F.floor((F.length(text_col) - win)
                                         / stride).cast("int")),
                      lambda i: h60(F.substr(F.col(text_col),
                                             i * stride + 1,
                                             F.lit(win)))))
                  .alias("wh")))
    # eager: the frequency aggregate and the count join-back first-touch
    # this cache from concurrent stages (stampede — guide §5)
    wh = transient_persist(wh, eager=True)
    freq = wh.groupBy("wh").agg(
        F.count_distinct("doc_id").alias("nd"))
    return (wh.join(freq, "wh")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_windows"),
                 F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
                 .cast("long").alias("n_dup_windows")))


def corpus_diff(old_docs: DataFrame, new_docs: DataFrame,
                text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Release diff between two corpus versions — the dataset-versioning
    audit every training-data pipeline runs before shipping a new crawl:
    (doc_id, status) with status ∈ added / removed / changed / unchanged,
    decided by content hash (not text equality — the comparison ships a
    16-byte digest per side, never the documents themselves).

    Scale shape: each side is one scan projecting (id, md5); the diff is
    a single full-outer join on the id — no text moves through the
    shuffle, so the cost is O(|ids|) regardless of document size."""
    # presence is decided by explicit side markers, NOT by hash
    # nullability: md5(NULL text) is NULL, and hash-as-presence would
    # misreport a NULL-text doc present in both versions as 'added'
    # (review r5). The hash comparison itself is null-safe.
    oh = old_docs.select(F.col(id_col).alias("doc_id"),
                         F.md5(text_col).alias("__old_h"),
                         F.lit(1).alias("__in_old"))
    nh = new_docs.select(F.col(id_col).alias("doc_id"),
                         F.md5(text_col).alias("__new_h"),
                         F.lit(1).alias("__in_new"))
    return (oh.join(nh, "doc_id", "full_outer")
            .select("doc_id",
                    F.when(F.col("__in_old").isNull(), "added")
                     .when(F.col("__in_new").isNull(), "removed")
                     .when(~F.col("__old_h").eqNullSafe(F.col("__new_h")),
                           "changed")
                     .otherwise("unchanged").alias("status")))


def source_similarity_matrix(docs: DataFrame, shingle_n: int = 3,
                             text_col: str = "text",
                             source_col: str = "source") -> DataFrame:
    """Pairwise shingle-set Jaccard between SOURCES — the corpus-level
    overlap diagnostic run before mixing datasets (two crawls sharing
    most of their shingles should not both be upweighted; a near-zero
    overlap validates a claimed-independent source).

    Set algebra on distinct (source, shingle-hash) postings:
    |A∩B| comes from the posting self-join on the hash, |A∪B| from
    per-source set sizes (|A|+|B|-|A∩B|), and jaccard6 =
    1e6*inter div union is integer-exact in both engines. Every source
    pair appears exactly once (src_a < src_b), including zero-overlap
    pairs.

    Scale shape: one scan explodes shingles into a distinct posting list
    (the dedup-family staging shuffle); the self-join is co-partitioned
    on the hash, and its fan-out per hash is bounded by the SOURCE count
    (not the corpus) since postings are per-source distinct — with S
    sources a hash contributes at most S(S-1)/2 pair rows, so the pair
    aggregate is S^2-bounded however large the corpus grows. Designed
    for the source-level regime (S in the tens-to-hundreds); per-DOC
    overlap at scale is the MinHash family's job."""
    posting = (spread(docs)
               .select(F.col(source_col).alias("src"),
                       F.explode(shingles(words(F.col(text_col)), shingle_n))
                        .alias("g"))
               .select("src", h60(F.col("g")).alias("gh"))
               .distinct())
    # eager: sizes (twice via all_pairs) and both self-join sides
    # first-touch this cache from concurrent AQE stages of the one
    # final action — lazily persisted, each re-ran the shingle explode
    # + distinct (cache stampede, guide §5)
    posting = transient_persist(posting, eager=True)
    sizes = posting.groupBy("src").agg(F.count(F.lit(1)).alias("n_sh"))
    a = posting.select(F.col("src").alias("src_a"), "gh")
    b = posting.select(F.col("src").alias("src_b"), "gh")
    inter = (a.join(b, "gh")
             .where(F.col("src_a") < F.col("src_b"))
             .groupBy("src_a", "src_b")
             .agg(F.count(F.lit(1)).cast("long").alias("inter")))
    all_pairs = (sizes.select(F.col("src").alias("src_a"),
                              F.col("n_sh").alias("n_a"))
                 .join(sizes.select(F.col("src").alias("src_b"),
                                    F.col("n_sh").alias("n_b")),
                       F.col("src_a") < F.col("src_b")))
    return (all_pairs.join(inter, ["src_a", "src_b"], "left")
            .select("src_a", "src_b",
                    F.coalesce("inter", F.lit(0)).cast("long").alias("inter"),
                    (F.col("n_a") + F.col("n_b")
                     - F.coalesce("inter", F.lit(0))).cast("long")
                    .alias("uni"))
            .withColumn("jaccard6",
                        F.expr("CASE WHEN uni = 0 THEN 0 "
                               "ELSE 1000000 * inter div uni END")))


def minhash_calibration(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", shingle_n: int = 3,
                        num_hashes: int = 12, bands: int = 4) -> DataFrame:
    """Estimator-quality audit for the MinHash family: for every LSH
    candidate pair, the signature-agreement Jaccard estimate
    (est6 = 1e6·matching-components div k) next to the exact
    shingle-set Jaccard (true6) and their absolute error — the
    calibration report that justifies a chosen (k, bands) config
    before a corpus-wide dedup run, and flags a broken hash family
    (systematic bias) immediately.

    Integer-exact end to end: component matches and set sizes are
    counts, both ratios are 1e6-scaled integer divisions. Scale shape:
    identical to ``minhash_lsh_dedup`` up to the candidate join (the
    staged signature/banding cache is shared work), then one
    projection per pair — no extra shuffles over the dedup pipeline
    it audits. Returns (a, b, est6, true6, err6)."""
    rows_per_band = num_hashes // bands
    base = _shingled(docs, text_col, id_col, shingle_n)
    sigs = base.withColumn("sig",
                           minhash_signature(F.col("sh"), num_hashes))
    # eager: both candidate-join sides first-touch this cache
    # concurrently; lazy, each re-ran the signature + banding projection
    banded = transient_persist(sigs.select(
        "doc_id", "sh", "sig",
        F.explode(lsh_band_keys(F.col("sig"), bands, rows_per_band))
         .alias("bucket")), eager=True)
    left = banded.select(F.col("doc_id").alias("a"),
                         F.col("sh").alias("sh_a"),
                         F.col("sig").alias("sig_a"), "bucket")
    right = banded.select(F.col("doc_id").alias("b"),
                          F.col("sh").alias("sh_b"),
                          F.col("sig").alias("sig_b"), "bucket")
    cand = (left.join(right, "bucket")
            .where(F.col("a") < F.col("b"))
            .dropDuplicates(["a", "b"]))
    matches = F.size(F.filter(
        F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
        lambda m: m))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    uni = F.size("sh_a") + F.size("sh_b") - inter
    return (cand
            .withColumn("__m", matches.cast("long"))
            .withColumn("__i", inter.cast("long"))
            .withColumn("__u", uni.cast("long"))
            .withColumn("est6", F.expr(f"1000000 * __m div {num_hashes}"))
            .withColumn("true6", F.expr(
                "CASE WHEN __u = 0 THEN 0 ELSE 1000000 * __i div __u END"))
            .withColumn("err6", F.abs(F.col("est6") - F.col("true6")))
            .select("a", "b", "est6", "true6", "err6"))


def dedup_cluster_stats(mapping: DataFrame) -> DataFrame:
    """Cluster-size audit over ANY family's (doc_id, dup_of) survivor
    mapping — the "what did dedup actually do" report a corpus release
    ships: one row per cluster size with (cluster_size, n_clusters,
    n_docs, n_removed = (size-1)·n_clusters). Singletons (size 1) are
    included, so the rows total the corpus and the removal ratio reads
    off directly; a pathological giant cluster (a boilerplate page
    duplicated a million times — the thing that silently eats a crawl)
    shows up as a heavy tail row instead of vanishing into an average.

    Two combining aggregates (dup_of → size, size → histogram), both
    map-side combined; output rows ≤ distinct cluster sizes."""
    sizes = mapping.groupBy("dup_of").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size"))
    return (sizes.groupBy("cluster_size")
            .agg(F.count(F.lit(1)).cast("long").alias("n_clusters"))
            .select("cluster_size", "n_clusters",
                    (F.col("cluster_size") * F.col("n_clusters"))
                    .cast("long").alias("n_docs"),
                    ((F.col("cluster_size") - 1) * F.col("n_clusters"))
                    .cast("long").alias("n_removed")))


def jaccard_prefix_join(docs: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", shingle_n: int = 3,
                        threshold_ppm: int = 500_000) -> DataFrame:
    """LOSSLESS set-similarity self-join via prefix filtering (PPJoin's
    core idea, Xiao et al., WWW'08): every pair with shingle Jaccard ≥ t
    is found, with NO posting cap and NO all-pairs join — the lossless
    100 TB alternative to ``ngram_jaccard_dedup``'s audited stopword cap
    (that one trades recall for a bounded index; this one bounds the
    join by mathematics instead).

    Prefix theorem: order every doc's shingles by one GLOBAL canonical
    order (ascending document frequency, then hash — rare first); if
    J(A,B) ≥ t, then A and B must share a shingle within their first
    L = |s| − ⌈t·|s|⌉ + 1 shingles, because missing all of A's L
    rarest still leaves at most |A| − L = ⌈t·|A|⌉ − 1 shared — below
    the intersection a Jaccard of t forces. So joining PREFIX postings
    only is exact-recall, and the per-shingle fan-out carries (1−t)
    of each doc, concentrated on the RAREST shingles — the hot
    stopword postings that explode a full posting join never enter the
    exchange. A (t·|A| ≤ |B| ≤ |A|/t) size filter prunes candidates
    before the verify.

    Verify is exact integer: common·10^6 ≥ t_ppm·(n_a + n_b − common),
    no float Jaccard. Returns (a, b, common, union_n, jacc_ppm) for
    every qualifying pair.

    Plan: one shingle scan; df aggregate (vocab-bounded); per-doc
    prefix ranks via a doc-keyed window; prefix⋈prefix on the shingle
    hash; PPJoin's POSITIONAL filter prunes candidates before the
    verify (overlap ≤ 1 + min(n_a−i, n_b−j) at the smallest shared
    token — sound, see inline proof; cut the sf0.1 verify input ~20×);
    one posting⋈posting count for the survivors; size join to
    finish."""
    tp = threshold_ppm
    base = _shingled(docs, text_col, id_col, shingle_n)
    sizes = base.select("doc_id", F.size("sh").alias("n_sh"))
    # eager: the action fans into concurrent AQE stages (freq, ranked,
    # both verify posting sides, three sizes branches) that all
    # first-touch these caches — lazily persisted, each stage re-ran
    # the interpreted shingle subtree (measured: seven ~0.7 s duplicate
    # stages at sf0.1 — cache stampede, guide §5). One count populates
    # posting AND, en route, the base shingle cache it reads through.
    posting = transient_persist(
        base.select("doc_id", F.explode("sh").alias("g"))
        .withColumn("gh", h60(F.col("g"))).drop("g"), eager=True)
    freq = posting.groupBy("gh").agg(F.count(F.lit(1)).alias("df"))
    ranked = (posting.join(freq, "gh").join(sizes, "doc_id")
              .withColumn("rn", F.row_number().over(
                  Window.partitionBy("doc_id").orderBy("df", "gh"))))
    # L = n − ceil(t·n) + 1, ceil in exact ppm integer arithmetic
    pref = ranked.where(
        F.col("rn") <= F.col("n_sh")
        - F.expr(f"(({tp}L * n_sh) + 999999) div 1000000") + 1)
    lhs = pref.select(F.col("doc_id").alias("a"),
                      F.col("n_sh").alias("na"),
                      F.col("rn").alias("ra"), "gh")
    rhs = pref.select(F.col("doc_id").alias("b"),
                      F.col("n_sh").alias("nb"),
                      F.col("rn").alias("rb"), "gh")
    shared = (lhs.join(rhs, "gh")
              .where((F.col("a") < F.col("b"))
                     & (F.lit(1_000_000) * F.col("nb")
                        >= F.lit(tp) * F.col("na"))
                     & (F.lit(1_000_000) * F.col("na")
                        >= F.lit(tp) * F.col("nb"))))
    # PPJoin positional filter: J ≥ t forces overlap ≥ α =
    # ⌈t·(n_a+n_b)/(1+t)⌉. For the canonically-SMALLEST shared token
    # (min rank — per-doc ranks follow the same global (df, hash) order,
    # so min ra picks it), no shared token precedes it in either doc,
    # hence overlap ≤ 1 + min(n_a − i, n_b − j). Pairs whose bound
    # misses α can't qualify — sound because a qualifying pair's
    # smallest shared token always lies inside both prefixes (the
    # prefix theorem), so the bound is computed at the true minimum.
    alpha = F.expr(f"(({tp}L * (na + nb)) + {1_000_000 + tp} - 1) "
                   f"div {1_000_000 + tp}")
    m = F.min_by(F.struct(F.col("ra"), F.col("rb")), F.col("ra"))
    cand = (shared.groupBy("a", "b", "na", "nb")
            .agg(m.alias("m"))
            .where(F.lit(1) + F.least(
                F.col("na") - F.col("m.ra"),
                F.col("nb") - F.col("m.rb")) >= alpha)
            .select("a", "b"))
    common = (cand
              .join(posting.select(F.col("doc_id").alias("a"), "gh"), "a")
              .join(posting.select(F.col("doc_id").alias("b2"),
                                   F.col("gh").alias("gh_b")),
                    (F.col("b") == F.col("b2"))
                    & (F.col("gh") == F.col("gh_b")))
              .groupBy("a", "b")
              .agg(F.count(F.lit(1)).cast("long").alias("common")))
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("n_sh").alias("nb"))
    out = (common.join(sa, "a").join(sb, "b")
           .withColumn("union_n",
                       (F.col("na") + F.col("nb") - F.col("common"))
                       .cast("long"))
           .where(F.lit(1_000_000) * F.col("common")
                  >= F.lit(tp) * F.col("union_n")))
    return out.select(
        "a", "b", "common", "union_n",
        F.expr("(1000000 * common) div union_n")
        .cast("long").alias("jacc_ppm"))
