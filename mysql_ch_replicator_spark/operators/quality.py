"""Declarative data-quality constraint checking — the Deequ/dbt-test
shape, Spark-first: a rule list compiles to the MINIMUM number of scans
and every verdict is an exact integer count, so the report is
oracle-comparable and identical on any engine.

A training-data pipeline gates ingestion on exactly these checks
(null-free keys, unique PKs, categorical domains, value ranges,
referential coverage between fact and dim); the reference engine has no
analog (it replicates what arrives) — this is the admission-control
layer in front of everything else this repo builds.

Rule algebra (each rule is a dict):

    {"rule": "not_null",        "col": c}
    {"rule": "unique",          "cols": [c, ...]}
    {"rule": "accepted_values", "col": c, "values": [...]}
    {"rule": "range",           "col": c, "lo": x, "hi": y}
    {"rule": "ref",             "col": c, "ref": DataFrame, "ref_col": rc}

Scale shape: ALL row-local rules (not_null / accepted_values / range)
and every ``unique`` rule fuse into ONE aggregate over a single scan —
count_distinct shares the pass with the conditional sums — so the table
is read once however many rules it carries; the 1-row aggregate frame
is cached and each rule's report row projects from it (no driver
round-trip, no re-aggregation). Each ``ref`` rule is one join against
the broadcast (deduplicated, dim-sized) key set of the referenced
table. Violation semantics: ``accepted_values`` and ``range`` fault
only NON-NULL out-of-domain values (nulls are ``not_null``'s job);
``unique`` counts rows beyond the first per key tuple.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..cache import transient_persist


def _report_row(base: DataFrame, table: str, rule_id: int, rule: str,
                target: str, v_col: str) -> DataFrame:
    return base.select(
        F.lit(table).alias("table"),
        F.lit(rule_id).cast("long").alias("rule_id"),
        F.lit(rule).alias("rule"),
        F.lit(target).alias("target"),
        F.col("__n").alias("n_rows"),
        F.col(v_col).alias("n_violations"),
        (F.col(v_col) == 0).alias("passed"))


def constraint_report(df: DataFrame, rules: list[dict],
                      table: str = "table") -> DataFrame:
    """One row per rule: (table, rule_id, rule, target, n_rows,
    n_violations, passed) — rule_id is the rule's position in the input
    list, so reports are deterministic and diffable across runs."""
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    meta: list[tuple[int, str, str]] = []
    ref_rules: list[tuple[int, dict]] = []
    for i, r in enumerate(rules):
        kind = r["rule"]
        if kind == "not_null":
            aggs.append(F.sum(F.when(F.col(r["col"]).isNull(), 1)
                              .otherwise(0)).cast("long").alias(f"__v{i}"))
            meta.append((i, kind, r["col"]))
        elif kind == "unique":
            cols = list(r["cols"])
            # distinct over the STRUCT, not the column list: countDistinct
            # with multiple args skips rows where ANY column is null, which
            # would count a unique null-bearing tuple as a violation; the
            # struct is never null itself, matching SQL row-value
            # count(DISTINCT (a, b)) semantics
            aggs.append((F.count(F.lit(1))
                         - F.countDistinct(F.struct(*[F.col(c)
                                                      for c in cols])))
                        .cast("long").alias(f"__v{i}"))
            meta.append((i, kind, ",".join(cols)))
        elif kind == "accepted_values":
            c = F.col(r["col"])
            aggs.append(F.sum(F.when(c.isNotNull()
                                     & ~c.isin(list(r["values"])), 1)
                              .otherwise(0)).cast("long").alias(f"__v{i}"))
            meta.append((i, kind, r["col"]))
        elif kind == "range":
            c = F.col(r["col"])
            aggs.append(F.sum(F.when(c.isNotNull()
                                     & ((c < F.lit(r["lo"]))
                                        | (c > F.lit(r["hi"]))), 1)
                              .otherwise(0)).cast("long").alias(f"__v{i}"))
            meta.append((i, kind, r["col"]))
        elif kind == "ref":
            ref_rules.append((i, r))
        else:
            raise ValueError(f"constraint_report: unknown rule {kind!r}")
    if not meta and not ref_rules:
        raise ValueError("constraint_report: empty rule list")

    frames: list[DataFrame] = []
    if meta:
        # ONE scan, 1-row frame — eager: every meta report row reads it
        # and the rows materialize as concurrent stages of one action
        # (lazy = one full scan per rule; cache stampede, guide §5)
        base = transient_persist(df.agg(*aggs), eager=True)
        frames += [_report_row(base, table, i, kind, target, f"__v{i}")
                   for i, kind, target in meta]
    for i, r in ref_rules:
        keys = r["ref"].select(F.col(r["ref_col"]).alias("__k")).distinct()
        stat = (df.select(F.col(r["col"]).alias("__c"))
                .join(F.broadcast(keys), F.col("__c") == F.col("__k"),
                      "left")
                .agg(F.count(F.lit(1)).cast("long").alias("__n"),
                     F.sum(F.when(F.col("__c").isNotNull()
                                  & F.col("__k").isNull(), 1).otherwise(0))
                     .cast("long").alias("__v")))
        frames.append(_report_row(stat, table, i, "ref",
                                  f"{r['col']}->{r['ref_col']}", "__v"))
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


def fd_profile(tables: dict[str, DataFrame],
               rules: list[tuple[str, list[str], str]]) -> DataFrame:
    """Functional-dependency / candidate-key DISCOVERY — the profiling
    twin of ``constraint_report`` (which VERIFIES declared rules): for
    each candidate dependency ``lhs → rhs``, measure how close it is to
    holding. Deequ's Uniqueness/Distinctness analyzers and the
    Metanome/HyFD profiling family compute exactly this shape; a
    pipeline uses it to discover join keys, pick dedup keys, and catch
    denormalization drift (an FD that held last release and broke).

    ``rules``: (table, [lhs cols], rhs col). Per rule the report row is

        (rule, n_groups, n_violating, holds)

    where ``n_violating`` counts lhs groups with more than one distinct
    rhs value and ``holds`` is the exact verdict (1 iff zero violating
    groups). NULL rhs values follow SQL count-distinct semantics
    (excluded); lhs tuples group null-safely via the groupBy.

    Scale shape: each rule is one combining aggregate on its lhs (the
    map side collapses per-group multiplicity before the shuffle) and a
    1-row summary — no joins, no row explosion; rules over the same
    table share its scan via the caller-provided frame. The final
    report is a union of 1-row frames, constant wire whatever the table
    sizes."""
    from functools import reduce

    out = []
    for table, lhs, rhs in rules:
        df = tables[table]
        label = f"{table}: {','.join(lhs)} -> {rhs}"
        grouped = (df.groupBy(*[F.col(c) for c in lhs])
                   .agg(F.countDistinct(rhs).alias("nd")))
        summary = grouped.agg(
            F.count(F.lit(1)).cast("long").alias("n_groups"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
             .cast("long").alias("n_violating"))
        out.append(summary.select(
            F.lit(label).alias("rule"), "n_groups", "n_violating",
            (F.col("n_violating") == 0).cast("int").alias("holds")))
    return reduce(DataFrame.unionByName, out)


def ks_drift(df: DataFrame, group_col: str = "source",
             value_col: str = "n_chars",
             max_grid_cells: int = 50_000_000) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov drift: each group's value
    distribution against the REST of the table (its complement), in pure
    integer arithmetic.

    For group s with n_s rows and complement r with n_r rows, the KS
    statistic is max_x |F_s(x) − F_r(x)|; cross-multiplied to integers,
    D_num = max_x |cum_s(x)·n_r − cum_r(x)·n_s| and the reported
    d_ppm = 10^6 · D_num div (n_s·n_r) — no float ECDF ever exists, so
    Spark and the SQL oracle agree bit-for-bit. This is the
    distribution-shift gate a training-data pipeline runs when a new
    source lands (the HDR-sketch drift monitor tracks quantiles over
    time; KS is the sharper per-source admission test).

    Scale shape: the table collapses ONCE to (group, value) counts —
    map-side combining, exchange width bounded by |groups|·|distinct
    values|, not rows. The ECDF grid is that aggregate crossed with the
    |groups|-row totals frame (broadcast NLJ — never the raw table), the
    per-group cumulative is a window on the group key, and the global
    cumulative at each x reuses the identity cum_g(x) = Σ_s cum_s(x) as
    a window partitioned by x — NO single-partition global sort
    anywhere. Products ride decimal(38,0) (cum·n can pass 2^63 at
    corpus scale; Spark's non-ANSI long product wraps silently).

    The grid is |groups|·|distinct values| rows: exact KS needs every
    group's ECDF evaluated at every observed value, so a HIGH-CARDINALITY
    value column (raw floats, ids) multiplies the grid by the group
    count. Rather than silently truncating (the repo's no-silent-caps
    rule), the operator measures both cardinalities on the already-
    persisted counts (one tiny agg) and raises past ``max_grid_cells``
    with the fix spelled out: bucket the values first (HDR-style
    ``value div width``), which keeps KS exact over the bucketed
    distribution.

    Returns one row per group with a nonempty complement:
    (group, n_s, n_r, d_num decimal-string, d_ppm long)."""
    from pyspark.sql import Window

    dec = "decimal(38,0)"
    counts = (df.groupBy(F.col(group_col).alias("g"),
                         F.col(value_col).alias("x"))
              .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    counts = transient_persist(counts)
    dims = counts.agg(
        F.countDistinct("g").cast("long").alias("gs"),
        F.countDistinct("x").cast("long").alias("xs")).first()
    if int(dims.gs) * int(dims.xs) > max_grid_cells:
        raise ValueError(
            f"ks_drift: ECDF grid would be {int(dims.gs)} groups × "
            f"{int(dims.xs)} distinct values = "
            f"{int(dims.gs) * int(dims.xs)} cells "
            f"(> max_grid_cells={max_grid_cells}). Bucket the value "
            f"column first (e.g. F.expr('{value_col} div W')) — KS over "
            f"bucketed values stays exact for the bucketed distribution "
            f"— or raise max_grid_cells explicitly.")
    xs = counts.select("x").distinct()
    srcs = counts.groupBy("g").agg(F.sum("cnt").cast("long").alias("n_s"))
    tot = srcs.agg(F.sum("n_s").cast("long").alias("n_g"))

    grid = xs.crossJoin(F.broadcast(srcs))
    filled = (grid.join(counts, ["g", "x"], "left")
              .select("g", "n_s", "x",
                      F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")))
    w_cum = (Window.partitionBy("g").orderBy("x")
             .rowsBetween(Window.unboundedPreceding, 0))
    cum = filled.withColumn("cum_s", F.sum("cnt").over(w_cum))
    w_x = Window.partitionBy("x")
    cg = cum.withColumn("cum_g", F.sum("cum_s").over(w_x))
    d = (cg.crossJoin(F.broadcast(tot))
         .select(
             "g", "n_s",
             (F.col("n_g") - F.col("n_s")).cast("long").alias("n_r"),
             F.abs(F.col("cum_s").cast(dec)
                   * (F.col("n_g") - F.col("n_s")).cast(dec)
                   - (F.col("cum_g") - F.col("cum_s")).cast(dec)
                   * F.col("n_s").cast(dec)).cast(dec).alias("dev")))
    return (d.where(F.col("n_r") > 0)
            .groupBy(F.col("g").alias(group_col), "n_s", "n_r")
            .agg(F.max("dev").cast(dec).cast("string").alias("d_num"),
                 F.expr("(1000000 * max(dev)) div (cast(n_s as "
                        "decimal(38,0)) * cast(n_r as decimal(38,0)))")
                  .cast("long").alias("d_ppm")))
