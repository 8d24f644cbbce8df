"""Point-in-time-correct feature engineering over the event stream.

The feature-store backfill problem: training a model on events requires,
for every (entity, label-time) pair, the feature values as they stood
STRICTLY BEFORE that time — joining today's aggregates onto yesterday's
labels leaks the future into training (the bug temporal feature stores
exist to prevent; see Feast/Tecton's "point-in-time join").

``feature_backfill`` materializes the training matrix for a list of
snapshot cutoffs: each event is fanned out to every cutoff it precedes
(one scan-side explode over the cutoff literals — |cutoffs| is a handful
of training dates, so the fan-out is a small constant factor), then ONE
(entity, cutoff)-keyed aggregate with map-side combine builds all
features. Strict ``ts < cutoff`` is the leakage guard.

Scale: cost = |events| x |cutoffs| rows into one combining aggregate —
the standard backfill trade. For hundreds of daily cutoffs the explode
constant matters and the incremental path is
``incremental_agg.delta_merge`` (maintain the aggregate forward per day)
— this operator is the batch/backfill half.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def feature_backfill(events: DataFrame, cutoffs: list[str],
                     entity_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """(entity, cutoff, n_events, n_purchase, spend, last_seen): per-entity
    features as of each cutoff, computed leak-free (events at or after a
    cutoff are invisible to it)."""
    cut = F.explode(F.array(
        *[F.lit(c).cast("timestamp") for c in cutoffs])).alias("cutoff")
    fanned = (events.select(entity_col, ts_col, "event_type", "value", cut)
              .where(F.col(ts_col) < F.col("cutoff")))
    is_purchase = F.col("event_type") == "purchase"
    return (fanned.groupBy(entity_col, "cutoff")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.count(F.when(is_purchase, 1)).alias("n_purchase"),
                 F.sum(F.when(is_purchase,
                              F.col("value").cast("decimal(18,2)")))
                  .cast("decimal(28,2)").alias("spend"),
                 F.max(ts_col).alias("last_seen")))
