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
