"""MIN/MAX incremental view maintenance (operators/incremental_agg.
apply_minmax_batch): the non-invertible aggregate family — adds tighten
for free, retracting an extreme forces a bounded per-group rescan. Every
batch's result must equal the from-scratch view over the post-batch
state (the repair-path definition is the oracle)."""

from pyspark.sql import functions as F

from mysql_ch_replicator_spark.operators.incremental_agg import (
    apply_minmax_batch, checkpoint_pair, minmax_of,
)
from mysql_ch_replicator_spark.operators.replica import (
    OP_COL, SEQ_COL, collapse_batch,
)
from mysql_ch_replicator_spark.sources.event_log import (
    EVENT_TYPE_ADD, EVENT_TYPE_REMOVE,
)

SCHEMA = f"id bigint, grp string, val double, {SEQ_COL} long, {OP_COL} int"


def _batch(spark, rows):
    return collapse_batch(spark.createDataFrame(rows, SCHEMA), ["id"])


def _view(agg):
    return {r[0]: (r.n_rows, str(r.vmin), str(r.vmax))
            for r in agg.collect()}


def _check(state, agg, grp="grp", val="val"):
    # (callers checkpoint after each batch - the production per-batch
    # pattern - so this from-scratch oracle does not re-derive the
    # whole batch chain per assert)
    assert _view(agg) == _view(minmax_of(state, grp, val))


def test_minmax_maintenance_hard_cases(spark):
    state = spark.createDataFrame([], "id bigint, grp string, val double")
    agg = minmax_of(state, "grp", "val")

    # batch 1: two groups form from adds alone
    b1 = _batch(spark, [
        (1, "a", 5.0, 1, EVENT_TYPE_ADD),
        (2, "a", 9.0, 2, EVENT_TYPE_ADD),
        (3, "a", 5.0, 3, EVENT_TYPE_ADD),   # duplicate of the min
        (4, "b", 2.0, 4, EVENT_TYPE_ADD),
    ])
    state, agg = apply_minmax_batch(state, b1, agg, ["id"], "grp", "val")
    state, agg = checkpoint_pair(state, agg)
    assert _view(agg) == {"a": (3, "5.00", "9.00"), "b": (1, "2.00", "2.00")}

    # batch 2: retract ONE copy of a's min (update id=1 upward) — the
    # duplicate min must survive via rescan; delete b's only row → group
    # vanishes; add a fresh group c
    b2 = _batch(spark, [
        (1, "a", 7.0, 10, EVENT_TYPE_ADD),
        (4, None, None, 11, EVENT_TYPE_REMOVE),
        (5, "c", 1.0, 12, EVENT_TYPE_ADD),
    ])
    state, agg = apply_minmax_batch(state, b2, agg, ["id"], "grp", "val")
    state, agg = checkpoint_pair(state, agg)
    assert _view(agg) == {"a": (3, "5.00", "9.00"), "c": (1, "1.00", "1.00")}
    _check(state, agg)

    # batch 3: group MOVE — the max of a (id=2, 9.0) moves to group c;
    # a must rescan down to 7.00, c tightens up to 9.00
    b3 = _batch(spark, [(2, "c", 9.0, 20, EVENT_TYPE_ADD)])
    state, agg = apply_minmax_batch(state, b3, agg, ["id"], "grp", "val")
    state, agg = checkpoint_pair(state, agg)
    assert _view(agg) == {"a": (2, "5.00", "7.00"), "c": (2, "1.00", "9.00")}
    _check(state, agg)

    # batch 4: non-extreme churn (id=1: 7.0 -> 6.0, strictly inside) —
    # extremes unchanged
    b4 = _batch(spark, [(1, "a", 6.0, 30, EVENT_TYPE_ADD)])
    state, agg = apply_minmax_batch(state, b4, agg, ["id"], "grp", "val")
    state, agg = checkpoint_pair(state, agg)
    assert _view(agg) == {"a": (2, "5.00", "6.00"), "c": (2, "1.00", "9.00")}
    _check(state, agg)


def test_minmax_null_group_bucket(spark):
    """A NULL group key is a real bucket: it must maintain and rescan
    like any other (null-safe joins throughout)."""
    state = spark.createDataFrame([], "id bigint, grp string, val double")
    agg = minmax_of(state, "grp", "val")
    b1 = _batch(spark, [
        (1, None, 4.0, 1, EVENT_TYPE_ADD),
        (2, None, 8.0, 2, EVENT_TYPE_ADD),
    ])
    state, agg = apply_minmax_batch(state, b1, agg, ["id"], "grp", "val")
    state, agg = checkpoint_pair(state, agg)
    assert _view(agg) == {None: (2, "4.00", "8.00")}
    b2 = _batch(spark, [(1, None, 6.0, 10, EVENT_TYPE_ADD)])  # retract min
    state, agg = apply_minmax_batch(state, b2, agg, ["id"], "grp", "val")
    state, agg = checkpoint_pair(state, agg)
    assert _view(agg) == {None: (2, "6.00", "8.00")}
    _check(state, agg)
