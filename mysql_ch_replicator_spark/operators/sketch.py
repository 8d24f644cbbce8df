"""Count-Min sketch: a mergeable frequency summary (Cormode & Muthukrishnan
2005) built and queried as DataFrame algebra.

The sketch is a depth x width counter grid: row k counts occurrences under
hash_k(key) % width; a key's estimate is the MIN over its depth cells —
always >= the true count, with collision error bounded by corpus_size/width
per row. Hashes are md5-derived (``functions/hashing.h60``), so the sketch
is bit-identical in Spark and DuckDB — the oracle check is exact, not
statistical.

Scale shape (100 TB): the sketch IS a (k, bucket, cnt) table of at most
depth*width rows produced by ONE map-side-combining aggregate over the
corpus — the shuffle carries depth*width partial counters per partition no
matter how large the input, which is the whole point of a sketch: partial
sketches from any partitioning/stream merge by cell-wise addition (the same
groupBy), so it composes with incremental maintenance for free. Point
queries join the probe set (small, broadcast) against the sketch table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import h60


def _cells(key_col, depth: int, width: int, salt: str):
    """Array of the key's depth cell coordinates: element k is
    h60('<salt><k>|' || key) % width."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(depth - 1)),
        lambda k: h60(F.concat(F.lit(salt), k.cast("string"), F.lit("|"),
                               key_col)) % width)


def cm_build(df: DataFrame, key_col: str, depth: int = 4,
             width: int = 512, salt: str = "cm") -> DataFrame:
    """Build the sketch table (k, bucket, cnt) — one aggregate, at most
    depth*width result rows regardless of input size."""
    return (df.select(F.posexplode(
                _cells(F.col(key_col), depth, width, salt))
                .alias("k", "bucket"))
            .groupBy("k", "bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt")))


def cm_estimate(sketch: DataFrame, probes: DataFrame, key_col: str,
                depth: int = 4, width: int = 512,
                salt: str = "cm") -> DataFrame:
    """Point-query the sketch for every probe key: min over the key's
    depth cells, absent cells counting 0. Probe side is expected small
    (broadcast); the sketch is depth*width rows at most."""
    # reserved-prefix aliases: a probe frame already carrying a column
    # named k/bucket must not collide with the internal explode (ADVICE r4)
    pb = probes.select(
        "*", F.posexplode(_cells(F.col(key_col), depth, width, salt))
        .alias("__cm_k", "__cm_bucket"))
    others = [c for c in probes.columns]
    sk = sketch.select(F.col("k").alias("__cm_k"),
                       F.col("bucket").alias("__cm_bucket"),
                       F.col("cnt").alias("__cm_cnt"))
    return (pb.join(sk, ["__cm_k", "__cm_bucket"], "left")
            .groupBy(*others)
            .agg(F.min(F.coalesce(F.col("__cm_cnt"), F.lit(0)))
                 .cast("long").alias("est_count")))


# -- HyperLogLog (Flajolet et al. 2007), integer-exact variant ---------------

HLL_M = 64          # buckets (alpha_64 ~= 0.709)
HLL_W = 20          # rank-field width in bits
_ALPHA_NUM, _ALPHA_DEN = 709, 1000


def hll_registers(df: DataFrame, key_col: str,
                  salt: str = "hll") -> DataFrame:
    """The register table (bucket, t): bucket = h60 % m; the register
    stores T' = 2^bitlen(s) for the bucket's MINIMUM-bitlength sub-hash
    s = (h60 >> 6) % 2^W — an integer encoding of the classic
    max-leading-zeros rank (min bitlen == max rank), chosen because
    ``bin()`` renders identical minimal binary in Spark and DuckDB, so
    the whole sketch stays in exact integer arithmetic. One map-side-
    combining aggregate, <= m rows out; registers merge across partial
    sketches by MIN(t) — same groupBy."""
    # shiftright, not /: h is up to 2^60 and float division would lose
    # the low bits both engines must agree on
    h = h60(F.concat(F.lit(salt + "|"), F.col(key_col).cast("string")))
    s = F.shiftright(h, 6) % (1 << HLL_W)
    staged = df.select((h % HLL_M).alias("bucket"), s.alias("s"))
    t = F.expr("shiftleft(CAST(1 AS BIGINT), "
               "CASE WHEN s > 0 THEN length(bin(s)) ELSE 0 END)")
    return (staged.select("bucket", t.alias("t"))
            .groupBy("bucket").agg(F.min("t").cast("long").alias("t")))


def hll_estimate(registers: DataFrame) -> DataFrame:
    """One-row distinct-count estimate from the register table, entirely
    in integer arithmetic so both engines agree bit-for-bit:

        E = alpha * m^2 / sum_j 2^(-M_j)
          = alpha * m^2 * 2^(W+1) / sum_j T'_j     (empty bucket: T'=2^(W+1))

    floor-divided with the alpha ratio kept as an exact 709/1000. The
    standard small/large-range corrections need ln() (float, not
    portable) and are intentionally omitted — callers wanting them apply
    a driver-side correction to this exact raw estimate."""
    full = F.lit(1 << (HLL_W + 1)).cast("long")
    return (registers.agg(
        F.sum("t").cast("long").alias("sum_t"),
        F.count(F.lit(1)).cast("long").alias("used"))
        .select(
            (F.col("sum_t")
             + (F.lit(HLL_M) - F.col("used")) * full).alias("den"),
            "used")
        .select(F.expr(
            f"CAST({_ALPHA_NUM * HLL_M * HLL_M * (1 << (HLL_W + 1))} "
            f"AS BIGINT) div ({_ALPHA_DEN} * den)")
            .cast("long").alias("est_distinct")))


# -- Bloom filter (Bloom 1970) as a set-bits table ---------------------------


def bloom_build(df: DataFrame, key_col: str, n_bits: int = 4096,
                k: int = 3, salt: str = "bloom") -> DataFrame:
    """Membership sketch as the TABLE of set bit positions (bit) — at most
    n_bits rows whatever the input size: explode each key's k md5-seeded
    positions, one distinct. Partial filters merge by plain union+distinct
    (bitwise OR in table form), so it builds partition-parallel and
    composes with streams. The table form is also the 100 TB-friendly
    join representation: membership probes are a bits-table join, not a
    serialized bitmap shipped through the driver."""
    return (df.select(F.explode(
                _cells(F.col(key_col), k, n_bits, salt)).alias("bit"))
            .distinct())


def bloom_contains(bloom: DataFrame, probes: DataFrame, key_col: str,
                   n_bits: int = 4096, k: int = 3,
                   salt: str = "bloom") -> DataFrame:
    """Probe the filter: a key tests positive iff ALL k of its bit
    positions are set — no false negatives, false-positive rate
    (1 - e^(-k·n/m))^k. Probe bits join the (small, broadcastable)
    bits table; one per-key aggregate counts hits."""
    # reserved-prefix aliases, same collision guard as cm_estimate
    pb = probes.select(
        "*", F.posexplode(_cells(F.col(key_col), k, n_bits, salt))
        .alias("__bl_pos", "__bl_bit"))
    hit = bloom.select(F.col("bit").alias("__bl_bit"),
                       F.lit(1).alias("__bl_hit"))
    others = probes.columns
    return (pb.join(hit, "__bl_bit", "left")
            .groupBy(*others)
            .agg((F.sum(F.coalesce(F.col("__bl_hit"), F.lit(0)))
                  == F.lit(k)).alias("bloom_positive")))


# ---------------------------------------------------------------------------
# HDR-histogram quantile sketch — the fourth canonical mergeable sketch
# (frequencies: Count-Min; cardinality: HLL; membership: Bloom;
# QUANTILES: log-bucketed histogram). t-digest/KLL need float centroids or
# randomized compaction, so they can never be hash-compared cross-engine;
# the HdrHistogram bucketing (Gil Tene) is pure integer arithmetic: exact
# same sketch in Spark and any SQL engine, bounded relative error.
# ---------------------------------------------------------------------------

_HDR_SUB_BITS = 4           # 2^4 sub-buckets per octave → ≤ 1/16 rel. error


def _hdr_bucket(v):
    """Monotone HDR bucket id of a non-negative bigint: values < 16 map
    exactly to themselves; larger values keep the top 5 bits — bucket =
    (msb-4)*16 + (v >> (msb-4)) with msb = bit-position of the highest
    set bit. Buckets are contiguous across octave boundaries, ≤
    16*(63-4)+32 total. ``length(bin(v))`` is the engine-portable
    bit-length (identical string in Spark and DuckDB)."""
    msb = F.length(F.bin(v)) - 1      # floor(log2(v)) for v >= 1
    shift = msb - _HDR_SUB_BITS
    # call_function: the SQL shiftright accepts a COLUMN bit count (the
    # PySpark wrapper insists on a literal int)
    return F.when(v < (1 << _HDR_SUB_BITS), v.cast("long")).otherwise(
        (shift * (1 << _HDR_SUB_BITS)
         + F.call_function("shiftright", v, shift)).cast("long"))


def _hdr_lower_bound(bucket):
    """Inverse: smallest value mapping to ``bucket`` (the quantile
    ESTIMATE). bucket < 32 is exact; above, msb = bucket div 16 + 3 and
    lb = (16 + bucket % 16) << (msb - 4)."""
    q = F.floor(bucket / (1 << _HDR_SUB_BITS)).cast("int")
    r = (bucket % (1 << _HDR_SUB_BITS)).cast("int")
    return F.when(bucket < 2 * (1 << _HDR_SUB_BITS),
                  bucket.cast("long")).otherwise(
        F.call_function("shiftleft",
                        (F.lit(1 << _HDR_SUB_BITS) + r).cast("long"),
                        q - 1).cast("long"))


def hdr_build(df: DataFrame, value_col: str) -> DataFrame:
    """Build the quantile sketch (bucket, cnt) over a non-negative
    bigint column — ONE map-side-combining aggregate, at most ~1000
    result rows whatever the input size (the constant-wire property the
    other three sketches share). Negative values clamp to 0
    (documented domain: counts, sizes, latencies, token counts)."""
    v = F.greatest(F.col(value_col).cast("long"), F.lit(0))
    return (df.select(_hdr_bucket(v).alias("bucket"))
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt")))


def hdr_merge(*sketches: DataFrame) -> DataFrame:
    """Merge partial sketches: cell-wise addition — the same groupBy, so
    a sketch of a union equals the merge of per-part sketches (law
    pinned in tests)."""
    from functools import reduce

    merged = reduce(DataFrame.unionByName, sketches)
    return (merged.groupBy("bucket")
            .agg(F.sum("cnt").cast("long").alias("cnt")))


def hdr_quantiles(sketch: DataFrame,
                  permilles: list[int]) -> DataFrame:
    """(permille, bucket, estimate) for each requested quantile:
    rank = max(1, ceil(N * permille / 1000)) in integer arithmetic, the
    answer is the first bucket whose cumulative count reaches the rank,
    the estimate its lower bound — ≤ 1/16 relative error by
    construction. All sketch-sized: the window and join touch ≤ ~1000
    rows regardless of the original input."""
    cum = sketch.select(
        "bucket", "cnt",
        F.sum("cnt").over(
            Window.orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, 0)).alias("cum"))
    total = sketch.agg(F.sum("cnt").cast("long").alias("n"))
    qs = sketch.sparkSession.createDataFrame(
        [(int(p),) for p in sorted(permilles)], "permille long")
    ranked = (qs.crossJoin(F.broadcast(total))
              .withColumn("rank",
                          F.greatest(
                              F.expr("(n * permille + 999) div 1000"),
                              F.lit(1))))
    return (ranked.join(F.broadcast(cum), F.col("cum") >= F.col("rank"))
            .groupBy("permille", "n", "rank")
            .agg(F.min("bucket").alias("bucket"))
            .withColumn("estimate", _hdr_lower_bound(F.col("bucket")))
            .select("permille", "bucket", "estimate", "n"))


def hdr_build_grouped(df: DataFrame, value_col: str,
                      group_cols: list[str]) -> DataFrame:
    """Per-group quantile sketches in ONE aggregate: (group..., bucket,
    cnt) keyed by (group, bucket) — the production per-domain/per-source
    stats shape. Wire cost per partition is ≤ |groups|×~1000 counters,
    still input-size-independent; a group's sketch merges with any other
    partitioning of the same group by the same cell-wise addition."""
    v = F.greatest(F.col(value_col).cast("long"), F.lit(0))
    return (df.select(*group_cols, _hdr_bucket(v).alias("bucket"))
            .groupBy(*group_cols, "bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt")))


def hdr_quantiles_grouped(sketch: DataFrame, group_cols: list[str],
                          permilles: list[int]) -> DataFrame:
    """Per-group quantile read-off: same cumulative bucket walk as
    ``hdr_quantiles`` but windowed PER GROUP (no single-partition sort —
    the window partitions on the group key), joined to the requested
    permilles. All frames are sketch-sized."""
    w = (Window.partitionBy(*group_cols).orderBy("bucket")
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = sketch.select(*group_cols, "bucket",
                        F.sum("cnt").over(w).alias("cum"))
    totals = sketch.groupBy(*group_cols) \
        .agg(F.sum("cnt").cast("long").alias("n"))
    qs = sketch.sparkSession.createDataFrame(
        [(int(p),) for p in sorted(permilles)], "permille long")
    ranked = (totals.crossJoin(F.broadcast(qs))
              .withColumn("rank",
                          F.greatest(
                              F.expr("(n * permille + 999) div 1000"),
                              F.lit(1))))
    joined = ranked.join(cum, group_cols)
    return (joined.where(F.col("cum") >= F.col("rank"))
            .groupBy(*group_cols, "permille", "n")
            .agg(F.min("bucket").alias("bucket"))
            .withColumn("estimate", _hdr_lower_bound(F.col("bucket")))
            .select(*group_cols, "permille", "bucket", "estimate", "n"))


# ---------------------------------------------------------------------------
# Half-life-decayed counters — recency-weighted frequency, the trending /
# freshness primitive. exp(-λ·age) never hash-compares across engines
# (libm), so decay is POWER-OF-TWO by half-life: an event aged k
# half-lives contributes scale >> k — exact integer, mergeable (sums),
# and within 2× of the continuous exponential everywhere.
# ---------------------------------------------------------------------------

DECAY_SCALE = 10 ** 12


def decayed_counts(df: DataFrame, key_col: str, ts_col: str,
                   half_life_us: int, as_of_us: int | None = None,
                   scale: int = DECAY_SCALE) -> DataFrame:
    """(key, decayed, n_events) with ``decayed = Σ scale >> min(63,
    age div half_life)`` at ``as_of`` (default: the input's max
    timestamp, a 1-row broadcast) — events older than 63 half-lives
    contribute exactly 0, future timestamps clamp to full weight.
    ONE map-side-combining aggregate over the events; the sum runs in
    decimal(38,0) (a key with >9.2M fresh events would wrap int64).
    Deterministic on any partitioning, so the same ranking comes out of
    a backfill and a streaming refresh."""
    us = F.unix_micros(F.col(ts_col))
    staged = df.select(F.col(key_col), us.alias("__us"))
    if as_of_us is None:
        asof = staged.agg(F.max("__us").alias("__asof"))
        staged = staged.crossJoin(F.broadcast(asof))
    else:
        staged = staged.withColumn("__asof",
                                   F.lit(int(as_of_us)).cast("long"))
    age_hl = F.least(
        F.greatest(F.expr(f"(__asof - __us) div {int(half_life_us)}"),
                   F.lit(0)),
        F.lit(63)).cast("int")
    # two-stage exactness without per-row decimal cost: a LONG count per
    # (key, clamped age bucket) first — row counts cannot overflow and
    # the hot path stays a codegen'd long aggregate — then ≤64 rows per
    # key combine as count · (scale >> age) with the SUM in
    # decimal(38,0), confining decimal arithmetic to O(keys·64) rows.
    # (A single-stage sum(long).cast(decimal) would aggregate in
    # wrapping int64 — the overflow class the HUGEINT oracle avoids.)
    per_bucket = (staged.groupBy(key_col, age_hl.alias("__age"))
                  .agg(F.count(F.lit(1)).cast("long").alias("__c")))
    weight = F.when(F.col("__age") >= 63, F.lit(0).cast("long")).otherwise(
        F.call_function("shiftright",
                        F.lit(int(scale)).cast("long"), F.col("__age")))
    return (per_bucket.groupBy(key_col)
            .agg(F.sum(F.col("__c").cast("decimal(38,0)")
                       * weight.cast("decimal(38,0)"))
                 .cast("decimal(38,0)").alias("decayed"),
                 F.sum("__c").cast("long").alias("n_events")))


def hll_registers_grouped(df: DataFrame, key_col: str,
                          group_cols: list[str],
                          salt: str = "hll") -> DataFrame:
    """Per-group HLL register tables in ONE aggregate: (group...,
    bucket, t) keyed by (group, bucket) — the per-source/per-type
    distinct-count shape (distinct users per event type, distinct docs
    per domain). Wire cost ≤ |groups|×m MIN-merged registers per
    partition at any input size; a group's registers merge with any
    other partitioning of the same group by the same MIN."""
    h = h60(F.concat(F.lit(salt + "|"), F.col(key_col).cast("string")))
    s = F.shiftright(h, 6) % (1 << HLL_W)
    staged = df.select(*group_cols, (h % HLL_M).alias("bucket"),
                       s.alias("s"))
    t = F.expr("shiftleft(CAST(1 AS BIGINT), "
               "CASE WHEN s > 0 THEN length(bin(s)) ELSE 0 END)")
    return (staged.select(*group_cols, "bucket", t.alias("t"))
            .groupBy(*group_cols, "bucket")
            .agg(F.min("t").cast("long").alias("t")))


def hll_estimate_grouped(registers: DataFrame,
                         group_cols: list[str]) -> DataFrame:
    """Per-group distinct-count estimates from grouped registers — the
    same exact integer arithmetic as ``hll_estimate``, one row per
    group."""
    full = F.lit(1 << (HLL_W + 1)).cast("long")
    return (registers.groupBy(*group_cols)
            .agg(F.sum("t").cast("long").alias("sum_t"),
                 F.count(F.lit(1)).cast("long").alias("used"))
            .select(*group_cols,
                    (F.col("sum_t")
                     + (F.lit(HLL_M) - F.col("used")) * full).alias("den"))
            .select(*group_cols, F.expr(
                f"CAST({_ALPHA_NUM * HLL_M * HLL_M * (1 << (HLL_W + 1))} "
                f"AS BIGINT) div ({_ALPHA_DEN} * den)")
                .cast("long").alias("est_distinct")))


def hll_sliding_estimate(registers: DataFrame, day_col: str,
                         window_days: int) -> DataFrame:
    """Trailing-``window_days`` distinct estimate per day from per-day
    grouped HLL registers — the mergeable-sketch answer to "distinct
    users over the last 7 days, every day". The events stream is
    aggregated ONCE into ≤ 64 registers per day
    (``hll_registers_grouped``); each output day then MIN-merges the
    registers of its trailing window. Every frame past the register
    aggregate is sketch-sized (|days| × m rows), so the range join is a
    broadcast over the tiny day dimension and the whole sliding pass
    costs O(|days| · window · m) — it never re-touches an event, where
    the exact form (COUNT(DISTINCT) per overlapping window) re-scans
    every event ``window_days`` times. Output: (day, est_distinct).

    The register frame is persisted before fan-out: the day dimension
    and the merge both consume it, and without the pin Catalyst clones
    the whole scan+aggregate subtree into the day branch — a second
    full pass over the events at 100 TB just to list the calendar
    (plan-pinned in test_plan_shapes)."""
    from ..cache import transient_persist

    registers = transient_persist(registers)
    days = registers.select(F.col(day_col).alias("out_day")).distinct()
    joined = registers.join(
        F.broadcast(days),
        (F.col(day_col) > F.col("out_day") - window_days)
        & (F.col(day_col) <= F.col("out_day")))
    merged = (joined.groupBy("out_day", "bucket")
              .agg(F.min("t").cast("long").alias("t")))
    return hll_estimate_grouped(merged, ["out_day"]) \
        .withColumnRenamed("out_day", day_col)


def cm_join_size_estimate(sketch_a: DataFrame, sketch_b: DataFrame,
                          depth: int = 4) -> DataFrame:
    """Equi-join cardinality estimation from two Count-Min sketches
    (the AMS/CM inner-product estimator, Cormode & Muthukrishnan §4.2):
    for each depth row k, ``Σ_buckets cmA[k,b]·cmB[k,b]`` over-estimates
    ``|A ⋈ B| = Σ_key fA(key)·fB(key)``; the reported estimate is the
    MIN over depth rows — always ≥ the true join size, with collision
    error bounded by |A|·|B|/width per row. The planning primitive a
    100 TB engine wants BEFORE committing to a join strategy: both
    inputs compress to ≤ depth·width counters each, so the estimate
    costs two sketch builds plus a sketch-sized join — never a pass
    over the joined data.

    Exactness contract: products and sums run in decimal(38,0)
    (counts² at corpus scale pass int64), so a SQL oracle computes the
    bit-identical estimate. Returns one row: (est_join_size)."""
    dec = "decimal(38,0)"
    a = sketch_a.select("k", "bucket", F.col("cnt").alias("__ca"))
    b = sketch_b.select("k", "bucket", F.col("cnt").alias("__cb"))
    per_row = (a.join(b, ["k", "bucket"])
               .groupBy("k")
               .agg(F.sum(F.col("__ca").cast(dec)
                          * F.col("__cb").cast(dec))
                    .cast(dec).alias("__dot")))
    # a depth row with NO intersecting buckets has dot product 0 — it
    # must participate in the MIN (disjoint inputs estimate 0), so the
    # per-row dots left-join the full depth domain instead of letting
    # the inner join silently drop zero rows and bias the min upward
    domain = sketch_a.sparkSession.range(depth) \
        .select(F.col("id").cast("int").alias("k"))
    full = domain.join(per_row, "k", "left") \
        .select(F.coalesce("__dot", F.lit(0).cast(dec)).alias("__dot"))
    return full.agg(F.min("__dot").cast(dec).alias("est_join_size"))


def _bloom_word_pos(key, i: int, n_bits: int, salt: str):
    """Hash-i bit position for the dense-bitmap bloom: xxhash64 (one JVM
    hash, ~10× cheaper than the md5-string h60 chain — this bloom never
    crosses engines, so the sketch-table md5 convention isn't needed),
    pmod'd because xxhash64 is signed. The key is canonicalized to its
    STRING representation first: xxhash64 is type-sensitive (an int 7
    and a bigint 7 hash to different positions), so building the bitmap
    from one integer width and probing another would produce silent
    false negatives — the one failure mode a bloom must never have.
    String form is width-independent and still whole-stage codegen."""
    return F.pmod(
        F.xxhash64(F.lit(salt), F.lit(i), key.cast("string")),
        F.lit(n_bits))


def bloom_bitmap_words(keys: DataFrame, key_col: str,
                       n_bits: int = 262144, k: int = 3,
                       salt: str = "bloom") -> list[int]:
    """The bloom filter as a dense ``n_bits/64``-word bitmap, collected to
    the driver: ONE map-side-combining bit_or aggregate over the keys'
    cell positions, then a bounded collect (4096 longs at the 256 Kib
    default — the same bounded-scalar class as IVF cell lists). The
    word layout is what ``bloom_scan_filter`` probes. Size m for the
    expected key count: FP ≈ (1 − e^(−k·n/m))^k."""
    words = n_bits // 64
    bits = (keys.select(F.explode(F.array(*[
        _bloom_word_pos(F.col(key_col), i, n_bits, salt)
        for i in range(k)])).alias("bit")).distinct())
    rows = (bits.select(
        F.expr("bit div 64").cast("int").alias("w"),
        F.call_function("shiftleft", F.lit(1).cast("long"),
                        (F.col("bit") % 64).cast("int")).alias("m"))
        .groupBy("w").agg(F.expr("bit_or(m)").alias("bm"))
        .collect())
    arr = [0] * words
    for r in rows:
        arr[int(r.w)] = int(r.bm)
    return arr


def bloom_scan_filter(fact: DataFrame, fact_key: str, words: list[int],
                      n_bits: int = 262144, k: int = 3,
                      salt: str = "bloom") -> DataFrame:
    """Semi-join reduction BEFORE the shuffle: filter ``fact`` down to
    rows whose key tests positive against a driver-held bloom bitmap
    (``bloom_bitmap_words``) — ``(words[pos >> 6] >> (pos mod 64)) & 1``
    for each of the k xxhash64 positions. The bitmap rides a BROADCAST
    one-row array frame (the engine's standard scalar pattern), NOT an
    inline literal array: codegen re-materializes a CreateArray of
    thousands of literals per row per probe, which measured ~6× slower
    than the broadcast attribute reference. No shuffle of the fact, no
    Python: the filter fuses with the scan stage, so a later sort-merge
    join against a non-broadcastable dimension shuffles only the
    ~FP-rate survivors instead of the whole fact table (the
    runtime-filter/semi-join reduction shape). No false negatives —
    downstream joins stay exact; false positives just ride along and
    drop in the join."""
    spark = fact.sparkSession
    bm = spark.createDataFrame([(words,)], "__bloom_bm: array<bigint>")
    key = F.col(fact_key)
    cond = None
    for i in range(k):
        pos = _bloom_word_pos(key, i, n_bits, salt)
        word = F.element_at(F.col("__bloom_bm"),
                            (F.shiftright(pos.cast("int"), 6) + 1))
        hit = (F.call_function("shiftright", word,
                               (pos % 64).cast("int"))
               .bitwiseAND(F.lit(1)) == 1)
        cond = hit if cond is None else (cond & hit)
    return (fact.crossJoin(F.broadcast(bm))
            .where(cond).drop("__bloom_bm"))


def hll_set_ops(registers: DataFrame, group_col: str) -> DataFrame:
    """Pairwise HLL set algebra over grouped registers: for every
    unordered group pair (g1 < g2), the union estimate from the
    MIN-merged register table and the inclusion–exclusion intersection

        |A ∪ B| = E(min-merge(reg_A, reg_B))
        |A ∩ B| = max(|A| + |B| − |A ∪ B|, 0)

    plus the derived Jaccard ppm — the audience-overlap / shared-users
    report, at sketch cost. The merge law (union of sets == MIN of
    registers) is exactly the property the HLL merge tests pin; the
    whole computation is the same exact integer arithmetic as
    ``hll_estimate``, so the DuckDB oracle replays it bit-for-bit
    (inclusion–exclusion on a raw estimator can go negative — the
    estimate clamps at 0, deterministically).

    Scale shape: input is the (group, bucket, t) REGISTER table —
    ≤ |groups|·m rows however large the corpus — so every join here is
    sketch-sized; the group list broadcasts into the pair frame and the
    per-pair merge is one combining MIN aggregate over ≤ 2·m rows per
    pair. The single corpus-width pass happened upstream in
    ``hll_registers_grouped``."""
    from ..cache import transient_persist

    # the register table feeds SIX consumers (group list, two pair-join
    # sides, both single-estimate sides) — without a persist each one
    # re-runs the corpus-width register build upstream; eager because
    # the union sides first-touch the cache from concurrent stages of
    # one action (lazy = stampede re-runs, guide §5)
    registers = transient_persist(registers, eager=True)
    reg = registers.select(F.col(group_col).alias("g"), "bucket", "t")
    groups = reg.select("g").distinct()
    pairs = (groups.select(F.col("g").alias("g1"))
             .crossJoin(F.broadcast(groups.select(F.col("g").alias("g2"))))
             .where(F.col("g1") < F.col("g2")))
    merged = (pairs.join(reg, F.col("g") == F.col("g1"))
              .select("g1", "g2", "bucket", "t")
              .unionByName(
                  pairs.join(reg, F.col("g") == F.col("g2"))
                  .select("g1", "g2", "bucket", "t"))
              .groupBy("g1", "g2", "bucket")
              .agg(F.min("t").cast("long").alias("t")))
    # the union register table is just a grouped sketch keyed by the
    # pair — reuse the ONE estimator implementation so the pairwise
    # arithmetic can never drift from the single-group one
    union_est = (hll_estimate_grouped(merged, ["g1", "g2"])
                 .withColumnRenamed("est_distinct", "est_union"))
    single = hll_estimate_grouped(registers, [group_col])
    e1 = single.select(F.col(group_col).alias("g1"),
                       F.col("est_distinct").alias("est_a"))
    e2 = single.select(F.col(group_col).alias("g2"),
                       F.col("est_distinct").alias("est_b"))
    inter = F.greatest(
        F.col("est_a") + F.col("est_b") - F.col("est_union"), F.lit(0))
    return (union_est
            .join(F.broadcast(e1), "g1").join(F.broadcast(e2), "g2")
            .select("g1", "g2", "est_a", "est_b", "est_union",
                    inter.cast("long").alias("est_intersection"),
                    F.expr("(1000000 * greatest(est_a + est_b - est_union,"
                           " 0)) div est_union")
                    .cast("long").alias("jaccard_ppm")))
