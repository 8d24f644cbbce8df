"""Deterministic sampling / splitting / quantization for training-data
pipelines.

Everything here is **hash-deterministic, not RNG-based**: the same row gets
the same split/sample decision on any cluster, any partitioning, any run —
the property a reproducible training pipeline needs (and what makes these
operators oracle-checkable in SQL, unlike ``df.sample``'s
partition-dependent XORShift stream).

Scale notes: each operator is a narrow projection + filter over the scan —
no shuffle at all for split/sample (the md5 is computed scan-side and the
filter pushes into the same stage); the quantizer is one pass of
higher-order array functions (JVM codegen'd per element, no Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import h60

_BUCKETS = 10_000


def split_bucket(id_col: Column, salt: str = "split") -> Column:
    """Stable bucket in [0, 10000) from the row id: h60(salt|id) % 10000."""
    return h60(F.concat(F.lit(f"{salt}|"), id_col.cast("string"))) \
        % F.lit(_BUCKETS)


def hash_split(df: DataFrame, id_col: str,
               weights: dict[str, float] | None = None,
               salt: str = "split") -> DataFrame:
    """Assign every row to a named split with hash-proportional weights
    (default 90/5/5 train/val/test). Adds a ``split`` column; order of
    ``weights`` defines threshold order. Deterministic in the id alone."""
    weights = weights or {"train": 0.90, "val": 0.05, "test": 0.05}
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError("split weights must sum to 1")
    b = split_bucket(F.col(id_col), salt)
    expr = None
    acc = 0.0
    for name, w in weights.items():
        acc += w
        hi = int(round(acc * _BUCKETS))
        cond = b < F.lit(hi)
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
    return df.withColumn("split", expr)


def leakage_safe_split(docs: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       weights: dict[str, float] | None = None,
                       salt: str = "split") -> DataFrame:
    """Dedup-cluster-aware train/val/test split: the hash decision is made
    on the CLUSTER REPRESENTATIVE (min doc id of the normalized-dup
    cluster) and every member inherits it, so two re-punctuated copies of
    one document can never straddle train and test — the eval-leakage
    guard a plain per-id ``hash_split`` does not give (near-dups of an
    eval doc in the training set inflate benchmark scores; Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better").

    Scale shape: inherits ``normalized_dedup``'s single hash-shuffle
    (norm-hash aggregate + co-partitioned join back); the split itself is
    a scan-side expression on ``dup_of`` — no extra exchange. Returns
    ``(doc_id, dup_of, n_copies, split)``; filtering members to
    ``doc_id == dup_of`` afterwards yields a deduplicated split."""
    from .dedup import normalized_dedup

    clusters = normalized_dedup(docs, text_col, id_col)
    return hash_split(clusters.select("doc_id", "dup_of", "n_copies"),
                      "dup_of", weights, salt)


def _ipf_weights(w: dict, rows: list, cols: list, t_row: int, t_col: int,
                 iters: int) -> dict:
    """The raking loop itself, factored pure so the degenerate-marginal
    guard is directly testable. Natural inputs (positive counts, targets
    above the floor guard) self-correct — IPF rescales a starved cell
    back up on the next pass — but the floor arithmetic makes a zero
    marginal CONCEIVABLE, and dividing by it would surface as a cryptic
    ZeroDivisionError three frames deep (ADVICE r9); the guard names the
    fix instead."""
    for _ in range(iters):
        rs = {r: sum(w[k] for k in w if k[0] == r) for r in rows}
        _ipf_check_marginals(rs, "row")
        w = {k: (v * t_row * 1_000_000) // rs[k[0]]
             for k, v in w.items()}
        cs = {c: sum(w[k] for k in w if k[1] == c) for c in cols}
        _ipf_check_marginals(cs, "column")
        w = {k: (v * t_col * 1_000_000) // cs[k[1]]
             for k, v in w.items()}
    return w


def _ipf_check_marginals(marginals: dict, axis: str) -> None:
    zero = sorted((k for k, v in marginals.items() if v == 0),
                  key=lambda x: (x is None, x))
    if zero:
        raise ValueError(
            f"raked_mixture: {axis} marginal(s) {zero!r} floored to zero "
            f"mid-raking (extreme cell skew starved every cell of the "
            f"{axis}) — raise the budget, lower iters, or coarsen the "
            f"keys so no {axis} is vanishingly small next to the rest")


# Bound on the collected contingency table: the IPF loop is driver-side
# BY DESIGN (codebook-sized for lang × source), and this is what keeps a
# caller from feeding it a corpus-cardinality key — the same loud-guard
# mold as ks_drift's grid bound (operators/quality.py, r8).
_RAKE_MAX_CELLS = 10_000


def raked_mixture(docs: DataFrame, row_col: str = "lang",
                  col_col: str = "source", id_col: str = "doc_id",
                  budget_num: int = 6, budget_den: int = 10,
                  iters: int = 2, max_cells: int = _RAKE_MAX_CELLS,
                  salt: str = "rake") -> tuple[DataFrame, DataFrame]:
    """Two-way mixture balancing by iterative proportional fitting
    (raking / IPF, Deming & Stephan 1940): fit per-cell keep-rates so the
    sampled corpus's ROW marginals (languages) and COLUMN marginals
    (sources) both approach balanced targets of ``budget_num/budget_den``
    of the corpus — the standard answer to "downsample so no language or
    source dominates" when the two constraints interact (per-axis caps
    fight each other; IPF alternates row and column scalings).

    Everything is integer-exact and SQL-oracle-expressible: cell weights
    live in micro-docs (count × 1e6), each scaling step is
    ``floor(w · target·1e6 / marginal_sum)`` (floor on non-negative
    integers — truncating and flooring agree cross-engine), and the
    final keep-rate is ``min(w div n, 1e6)`` ppm, capped because a
    filter cannot upsample. Selection is the scan-side deterministic
    hash threshold every sampler here uses.

    Scale shape: the contingency table is |rows|×|cols| cells — the
    IPF loop runs on the COLLECTED table driver-side (bounded like a
    centroid codebook, never corpus-sized, and ENFORCED: more than
    ``max_cells`` cells raises with the coarsen-the-keys fix named
    before anything large reaches the driver); rates broadcast back
    onto one corpus scan. Returns ``(selected_docs, rates)`` where
    rates is (row, col, n_docs, rate_ppm)."""
    spark = docs.sparkSession
    # cardinality guard BEFORE the table reaches the driver: limit(N+1)
    # bounds the collect itself (a LIMIT past the true count returns the
    # whole table, so a passing collect IS the complete contingency) —
    # a high-cardinality key raises with the fix named instead of OOMing
    # the driver
    cell_rows = (docs.groupBy(F.col(row_col).alias("r"),
                              F.col(col_col).alias("c"))
                 .agg(F.count(F.lit(1)).alias("n"))
                 .limit(max_cells + 1).collect())
    if len(cell_rows) > max_cells:
        raise ValueError(
            f"raked_mixture: contingency table exceeds {max_cells} cells "
            f"({row_col} x {col_col}) — the IPF loop is driver-side by "
            f"design and sized for codebook-scale keys (lang x source); "
            f"coarsen the keys (bucket rare values into an 'other' "
            f"class) or raise max_cells if the table truly is bounded")
    cells = {(r.r, r.c): int(r.n) for r in cell_rows}
    total = sum(cells.values())
    # NULL keys sort behind real values (None breaks plain sorted());
    # their rate rows are computed like any cell, but note the final
    # equi-join is null-UNSAFE in both engines, so NULL-keyed docs are
    # never selected — bucket them upstream if they must participate
    nkey = (lambda x: (x is None, x))
    rows = sorted({r for r, _ in cells}, key=nkey)
    cols = sorted({c for _, c in cells}, key=nkey)
    t_row = (budget_num * total) // (budget_den * len(rows))
    t_col = (budget_num * total) // (budget_den * len(cols))
    if t_row == 0 or t_col == 0:
        raise ValueError(
            f"raked_mixture: integer marginal target floors to zero "
            f"(t_row={t_row}, t_col={t_col} from {total} docs over "
            f"{len(rows)}x{len(cols)} cells at budget "
            f"{budget_num}/{budget_den}) — every keep-rate would "
            f"collapse to 0; raise the budget or coarsen the keys")
    w = _ipf_weights({k: n * 1_000_000 for k, n in cells.items()},
                     rows, cols, t_row, t_col, iters)
    rate_rows = [(r, c, cells[(r, c)],
                  min(w[(r, c)] // cells[(r, c)], 1_000_000))
                 for (r, c) in sorted(cells, key=lambda k: (nkey(k[0]),
                                                            nkey(k[1])))]
    # the rates frame's key columns carry the INPUT's types — hardcoding
    # string broke createDataFrame for any non-string key (ADVICE r9)
    from pyspark.sql.types import LongType, StructField, StructType
    rates = spark.createDataFrame(
        rate_rows,
        StructType([
            StructField(row_col, docs.schema[row_col].dataType, True),
            StructField(col_col, docs.schema[col_col].dataType, True),
            StructField("n_docs", LongType(), False),
            StructField("rate_ppm", LongType(), False)]))
    bucket = h60(F.concat(F.lit(f"{salt}|"),
                          F.col(id_col).cast("string"))) % 1_000_000
    selected = (docs.join(F.broadcast(rates), [row_col, col_col])
                .where(bucket < F.col("rate_ppm")))
    return selected, rates


def stratified_sample(df: DataFrame, id_col: str, fraction: float,
                      salt: str = "sample") -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose hash bucket falls
    under the threshold. Per-stratum proportions follow automatically —
    the hash is independent of any column, so every stratum is thinned by
    the same rate (law of large numbers), with zero shuffles and full
    reproducibility. Nested samples compose: fraction 0.1 ⊇ fraction 0.05
    (same salt), the standard trick for growing-subset experiments."""
    thresh = int(round(fraction * _BUCKETS))
    return df.where(split_bucket(F.col(id_col), salt) < F.lit(thresh))


def per_group_cap(df: DataFrame, group_col: str, id_col: str, cap: int,
                  salt: str = "cap", oversample: int | None = 8) -> DataFrame:
    """Keep at most ``cap`` rows per group, chosen deterministically: the
    ``cap`` smallest ``h60(salt|id)`` values (ties broken by id). The
    per-domain/per-source document cap every crawl-derived corpus applies
    (a hot domain must not dominate the mixture).

    Scale design — the naive form (``row_number() OVER (PARTITION BY
    group)``) funnels a hot group's ENTIRE row set through one task; with a
    100 TB crawl where one domain is 5% of the corpus that task is 5 TB.
    Instead, when ``oversample`` is set:

    1. one count aggregate per group (map-side partial, tiny output),
    2. broadcast the counts back and keep only rows whose hash priority
       falls in the smallest ``oversample*cap/n`` fraction — a scan-side
       filter that cuts every big group to ~``oversample*cap`` candidate
       rows BEFORE the window,
    3. exact row_number cap over the survivors (now bounded per group),
    4. exactness guard: any group that produced fewer than ``min(cap, n)``
       rows lost a true top-``cap`` candidate to the prefilter
       (P ≈ exp(-Θ(cap·oversample)), never expected) — recompute just
       those groups without the prefilter.

    Groups with ``n ≤ 4·cap`` skip the prefilter entirely, so small groups
    are never at risk. ``oversample=None`` = plain single-window form (for
    group-count regimes where broadcasting counts is unattractive)."""
    from pyspark.sql import Window

    pri = h60(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string")))
    d = df.withColumn("__pri", pri)
    w = Window.partitionBy(group_col).orderBy("__pri", id_col)
    if oversample is None:
        return (d.withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") <= cap).drop("__pri", "__rn"))

    # NULL-safe count join: a NULL group is a real group (dirty domains);
    # a plain equi-join would silently drop its rows from the output
    counts = d.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    d2 = (d.join(F.broadcast(counts.withColumnRenamed(group_col, "__g")),
                 F.col(group_col).eqNullSafe(F.col("__g")))
          .drop("__g"))
    # priority is uniform in [0, 2^60); keep the smallest oversample*cap/n
    # fraction. Double math is fine: the threshold is heuristic — the
    # rescue pass below restores exactness if it ever bites.
    thresh = F.lit(float(2 ** 60)) * F.lit(float(oversample * cap)) \
        / F.col("__n")
    survivors = d2.where((F.col("__n") <= F.lit(4 * cap)) |
                         (F.col("__pri").cast("double") < thresh))
    capped = (survivors.withColumn("__rn", F.row_number().over(w))
              .where(F.col("__rn") <= cap))
    # exactness-rescue detection is anchored on the group-count frame, NOT
    # on the prefilter survivors: a group whose every row was prefiltered
    # out has NO row in `capped` and must still be rescued (absent → 0
    # survivors), otherwise it silently vanishes from the output.
    kcounts = (capped.groupBy(F.col(group_col).alias("__g2"))
               .agg(F.count(F.lit(1)).alias("__k")))
    short = (counts.join(kcounts,
                         F.col(group_col).eqNullSafe(F.col("__g2")), "left")
             .select(group_col, F.col("__n"),
                     F.coalesce(F.col("__k"), F.lit(0)).alias("__k"))
             .where((F.col("__k") < F.lit(cap)) &
                    (F.col("__k") < F.col("__n")))
             .select(group_col))
    short_r = F.broadcast(short.withColumnRenamed(group_col, "__g"))
    good = capped.join(short_r, F.col(group_col).eqNullSafe(F.col("__g")),
                       "left_anti")
    rescued = (d2.join(short_r, F.col(group_col).eqNullSafe(F.col("__g")))
               .drop("__g")
               .withColumn("__rn", F.row_number().over(w))
               .where(F.col("__rn") <= cap))
    return good.unionByName(rescued).drop("__pri", "__n", "__rn")


def quantize_int8(vec_col: str | Column,
                  out_prefix: str = "q") -> list[Column]:
    """Per-vector int8 scalar quantization (the standard embedding
    compression: 4x smaller than float32, ~1% recall loss): codes
    q_i = round((x_i - min) / scale) in [0, 255] with scale =
    (max - min)/255. Returns columns: codes array, min, scale.

    Constant vectors (scale 0) map to code 0. All math in float64 with the
    same element order on every engine, so codes are bit-reproducible —
    the integer code array is the strongest cheap equality check on a
    quantization pipeline."""
    vec = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    v = F.transform(vec, lambda x: x.cast("double"))
    mn = F.array_min(v)
    scale = (F.array_max(v) - mn) / F.lit(255.0)
    codes = F.transform(
        v, lambda x: F.when(scale == 0, F.lit(0)).otherwise(
            F.round((x - mn) / scale)).cast("int"))
    return [codes.alias(f"{out_prefix}_codes"),
            mn.alias(f"{out_prefix}_min"),
            scale.alias(f"{out_prefix}_scale")]


def mixture_sample(df: DataFrame, id_col: str, stratum_col: str,
                   rates: dict[str, float], default_rate: float = 0.0,
                   salt: str = "mixture") -> DataFrame:
    """Training-mixture rebalancing: keep each stratum (source, domain,
    language, ...) at its OWN hash-deterministic rate — the up/down-
    weighting step every multi-source pre-training mix needs (e.g. wiki
    x2 epochs, crawl x0.3). Strata absent from ``rates`` fall back to
    ``default_rate``.

    Same scale shape as the uniform sampler: the per-row threshold is a
    scan-side CASE over the stratum column, the hash is salted per
    operator, and the filter pushes into the scan stage — zero shuffles,
    reproducible on any partitioning. Nested-subset composition holds
    per stratum (raising one stratum's rate only ever ADDS its rows)."""
    b = split_bucket(F.col(id_col), salt)
    expr = None
    for name, rate in rates.items():
        cond = F.col(stratum_col) == name
        hi = F.lit(int(round(rate * _BUCKETS)))
        expr = F.when(cond, hi) if expr is None else expr.when(cond, hi)
    default = F.lit(int(round(default_rate * _BUCKETS)))
    thresh = default if expr is None else expr.otherwise(default)
    return df.where(b < thresh)


def temperature_sample(df: DataFrame, id_col: str, stratum_col: str,
                       alpha: float = 0.5,
                       salt: str = "temp") -> DataFrame:
    """Temperature-flattened mixture: downsample each stratum so kept
    counts are ∝ ``n_s^alpha`` (``alpha`` = 1/T; alpha<1 flattens a
    skewed source distribution — the multilingual/multi-source balancing
    rule from the mBERT/XLM-R recipes). The smallest stratum keeps 100%
    and larger strata keep ``(n_min/n_s)^(1-alpha)`` of their rows,
    hash-deterministically.

    Scale shape: one per-stratum count aggregate (tiny) broadcast back,
    a 1-row min broadcast, and a scan-side hash-threshold filter — no
    shuffle of the data itself, reproducible on any partitioning.

    Cross-engine exactness: with the default ``alpha=0.5`` the keep rate
    is ``sqrt(n_min/n_s)`` — int→double cast, division, sqrt and the
    final multiply are ALL correctly-rounded IEEE-754 ops, so Spark
    (JVM) and any C-libm engine agree bit-exactly. Other alphas go
    through ``pow``, which libms round differently — fine for
    production, not for a hash-compared oracle."""
    n = F.col("__n").cast("double")
    nmin = F.col("__nmin").cast("double")
    if alpha == 0.5:
        rate = F.sqrt(nmin / n)
    else:
        rate = F.pow(nmin / n, F.lit(1.0 - alpha))
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("__n"))
    low = counts.agg(F.min("__n").alias("__nmin"))
    d = (df.join(F.broadcast(counts.withColumnRenamed(stratum_col, "__g")),
                 F.col(stratum_col).eqNullSafe(F.col("__g")))
         .crossJoin(F.broadcast(low)))
    b = split_bucket(F.col(id_col), salt).cast("double")
    return (d.where(b < rate * F.lit(float(_BUCKETS)))
            .drop("__g", "__n", "__nmin"))


def epoch_upsample(df: DataFrame, id_col: str, stratum_col: str,
                   epochs: dict[str, float], default_epochs: float = 1.0,
                   salt: str = "epoch") -> DataFrame:
    """Epoch-aware mixture up/down-sampling: every row gets an integer
    ``repeat_count`` so each stratum is consumed for its configured
    (possibly fractional) number of epochs — the standard data-mixing
    primitive ("3.5 epochs of wiki, 0.5 of crawl"). Fractional epochs
    resolve per ROW by stable hash: floor(e) repeats plus one more for
    the hash-chosen frac(e) share — deterministic, shard-independent,
    and exact in expectation per stratum with zero coordination.

    repeat_count = floor(e) + (h60(salt|id) % 10000 < frac(e)·10000)

    Pure scan-side arithmetic: no shuffle, no state; downsampling is the
    e < 1 case (repeat 0 or 1). Materialize repeats with
    ``explode(sequence(1, repeat_count))`` where the consumer needs
    physical copies — kept separate so the count column stays cheap to
    audit."""
    cases = None
    for s, e in sorted(epochs.items()):
        whole, frac_bp = int(e), int(round((e - int(e)) * _BUCKETS))
        expr = (F.lit(whole)
                + F.when(split_bucket(F.col(id_col), salt) < frac_bp, 1)
                .otherwise(0))
        cases = F.when(F.col(stratum_col) == s, expr) if cases is None \
            else cases.when(F.col(stratum_col) == s, expr)
    dw, dfrac = int(default_epochs), \
        int(round((default_epochs - int(default_epochs)) * _BUCKETS))
    default = (F.lit(dw)
               + F.when(split_bucket(F.col(id_col), salt) < dfrac, 1)
               .otherwise(0))
    rc = (cases.otherwise(default) if cases is not None else default)
    return df.withColumn("repeat_count", rc.cast("long"))


def shuffle_shards(df: DataFrame, id_col: str, n_shards: int,
                   epoch: int = 0, salt: str = "shuffle") -> DataFrame:
    """Deterministic global training-order shuffle WITHOUT a global sort:
    every row gets (shard, pos) — shard = h60(salt|epoch|id) % n_shards,
    pos = dense position within the shard ordered by (hash, id). Reading
    shards 0..n-1 sequentially (each shard ordered by pos) visits the
    corpus in a pseudorandom order that is stable across runs, cluster
    sizes, and partitionings, and changes completely per epoch — the
    distributed analog of an epoch reshuffle.

    Scale shape (100 TB): ONE shuffle keyed by shard (the same exchange
    the per-shard sort rides on — Window.partitionBy(shard) sorts within
    partitions, never globally); n_shards is the parallelism dial, sized
    so one shard fits a task's sort buffer. No driver state, no total
    order, no skew (hash-uniform shards)."""
    h = h60(F.concat(F.lit(f"{salt}|{epoch}|"),
                     F.col(id_col).cast("string")))
    staged = df.select(F.col(id_col), h.alias("_h"),
                       (h % n_shards).cast("long").alias("shard"))
    w = Window.partitionBy("shard").orderBy("_h", id_col)
    return staged.select(
        id_col, "shard",
        (F.row_number().over(w) - 1).cast("long").alias("pos"))


def systematic_weighted_sample(df: DataFrame, weight_col: str, k: int,
                               id_col: str = "doc_id") -> DataFrame:
    """Weight-proportional systematic sampling: walk the id-ordered corpus
    with a fixed stride of ``total_weight div k`` and keep every row whose
    cumulative-weight interval contains a stride multiple — the classic
    systematic/pps design (each row's inclusion probability ∝ its weight,
    rows heavier than the stride are always kept).

    Deterministic and integer-exact: weights cast to long, the global
    prefix sum comes from ``ranged_running_sum`` (range-bucketed — NO
    single-partition sort at any scale, selection.py:130), and membership
    is two integer divisions: ``cum div step > (cum - w) div step`` counts
    the stride multiples inside ``(cum - w, cum]``. The only driver-side
    value is the 1-row total-weight aggregate.

    Returns (doc_id, w, cum_w) for the selected rows — ~k of them (heavy
    rows can land 2+ multiples; they appear once)."""
    from .selection import ranged_running_sum

    if k <= 0:
        raise ValueError("k must be positive")
    keyed = df.select(F.col(id_col).alias("doc_id"),
                      F.col(weight_col).cast("long").alias("w"))
    total = keyed.agg(F.sum("w").alias("t")).collect()[0].t or 0
    step = max(int(total) // k, 1)
    run = ranged_running_sum(keyed, "doc_id", "w", out_col="cum_w")
    # integer `div`, not float `/`: exact at any cumulative magnitude
    return (run.where(F.expr(f"(cum_w div {step}L) > "
                             f"((cum_w - w) div {step}L)"))
            .select("doc_id", "w", "cum_w"))
