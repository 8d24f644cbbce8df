"""Skew mitigation utilities — the explicit tools for what AQE can't fix.

AQE's skew-join splitting (on in plans/session.py) handles skewed SORT-MERGE
JOIN partitions at runtime. Two cases remain manual at 100 TB:

- **Skewed aggregation**: one hot key (a null-ish default, a bot user)
  funnels into a single reducer. ``salted_agg`` does the standard two-phase
  rewrite: aggregate on (key, salt) first — spreading the hot key over
  ``salt_buckets`` reducers — then re-aggregate on the key. Works for any
  algebraic aggregate (sum/count/min/max); pass the merge expressions for
  phase 2.
- **Skewed broadcast-ineligible join**: replicate the small side per salt
  (``salted_join``) so the hot key's rows split across ``salt_buckets``
  tasks. Only worth it when the build side is too big to broadcast but
  small enough to replicate ``salt_buckets`` times.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_agg(df: DataFrame, keys: list[str],
               phase1: dict[str, Column], phase2: dict[str, Column],
               salt_buckets: int = 16) -> DataFrame:
    """Two-phase aggregation with a deterministic salt.

    ``phase1``: name → aggregate over the raw rows (per key+salt).
    ``phase2``: name → aggregate over the phase-1 partials (per key),
    referencing the phase-1 output names.

        salted_agg(df, ["k"],
                   {"cnt": F.count(F.lit(1)), "s": F.sum("v")},
                   {"cnt": F.sum("cnt"), "s": F.sum("s")})

    The salt is a hash of the whole row spread over ``salt_buckets``
    (pmod(hash(all cols), n)) — deterministic, no rand() (re-runs and
    retried tasks land rows in the same bucket)."""
    salt = F.pmod(F.hash(*[F.col(c) for c in df.columns]),
                  F.lit(salt_buckets))
    partial = (df.withColumn(SALT_COL, salt)
               .groupBy(*keys, SALT_COL)
               .agg(*[c.alias(n) for n, c in phase1.items()]))
    return partial.groupBy(*keys) \
        .agg(*[c.alias(n) for n, c in phase2.items()])


def salted_join(big: DataFrame, small: DataFrame, key: str,
                salt_buckets: int = 8, how: str = "inner") -> DataFrame:
    """Skew-resistant equi-join: salt the big side, replicate the small side
    once per salt value, join on (key, salt). The hot key's rows spread over
    ``salt_buckets`` tasks instead of one straggler."""
    salted_big = big.withColumn(
        SALT_COL, F.pmod(F.hash(*[F.col(c) for c in big.columns]),
                         F.lit(salt_buckets)))
    replicated = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))))
    return salted_big.join(replicated, on=[key, SALT_COL], how=how) \
        .drop(SALT_COL)


def skew_advisor(df: DataFrame, keys: list[str], n_partitions: int = 32,
                 top: int = 20) -> DataFrame:
    """Join/agg skew diagnosis: the pre-flight report a pipeline runs on a
    prospective shuffle key BEFORE committing to a plain groupBy/join at
    100 TB. For each of the ``top`` heaviest key values: its row count,
    its share of the table in parts-per-million, and the recommended salt
    factor — ``ceil(key_rows / (total_rows / n_partitions))``, i.e. how
    many buckets spread this key's rows back down to an average
    partition's worth. salt_factor 1 = harmless; 32 = this key alone
    fills every reducer.

    One map-side-combining aggregate on the candidate key + a top-k
    TakeOrderedAndProject; the total-count scalar rides a broadcast
    1-row frame (no driver round-trip). All arithmetic integer (ppm and
    ceil-by-(a + b - 1) div b), so any SQL engine reproduces the report
    bit-exactly.
    """
    counts = (df.groupBy(*keys)
              .agg(F.count(F.lit(1)).alias("key_rows")))
    total = df.select(F.count(F.lit(1)).alias("_total"))
    scored = (counts.join(F.broadcast(total))
              .withColumn("share_ppm",
                          F.expr("(1000000 * key_rows) div _total"))
              .withColumn(
                  "salt_factor",
                  F.expr(f"(key_rows * {n_partitions} + _total - 1) "
                         f"div _total"))
              .drop("_total"))
    order = [F.col("key_rows").desc()] + [F.col(k) for k in keys]
    # distributed top-N (TakeOrderedAndProject) FIRST; the rank window then
    # sees only ``top`` rows — never a corpus-wide SinglePartition sort
    shortlist = scored.orderBy(*order).limit(top)
    from pyspark.sql import Window
    w = Window.orderBy(*order)
    return shortlist.withColumn("rank", F.row_number().over(w))
