from .replica import (
    VERSION_COL,
    stamp_version,
    dedup_final,
    dedup_final_agg,
    apply_deletes,
    collapse_batch,
    apply_cdc_batch,
)

__all__ = [
    "VERSION_COL",
    "stamp_version",
    "dedup_final",
    "dedup_final_agg",
    "apply_deletes",
    "collapse_batch",
    "apply_cdc_batch",
]


class UnsplittablePartition(ValueError):
    """A hot index partition no split can rebalance — an IVF cell of
    identical vectors, an empty cell behind a stale membership superset,
    or a lexical shard whose terms no salt separates (a single hot
    term). Typed so the load-factor policy (indexmaint.maybe_split) can
    skip it without string-matching error text, while genuine
    configuration errors still propagate."""


__all__.append("UnsplittablePartition")
