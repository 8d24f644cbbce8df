"""Per-group TOP-K incremental view maintenance (operators/incremental_agg.
apply_topk_batch): the MIN/MAX asymmetry generalized to a leaderboard —
adds re-rank against the stored top-k for free; retracting/updating a
stored top-k row forces a bounded per-group rescan. Every batch's result
must equal the from-scratch view over the post-batch state."""

from mysql_ch_replicator_spark.operators.incremental_agg import (
    apply_topk_batch, checkpoint_pair, topk_of,
)
from mysql_ch_replicator_spark.operators.replica import (
    OP_COL, SEQ_COL, collapse_batch,
)
from mysql_ch_replicator_spark.sources.event_log import (
    EVENT_TYPE_ADD, EVENT_TYPE_REMOVE,
)

SCHEMA = f"id bigint, grp string, val double, {SEQ_COL} long, {OP_COL} int"
K = 2


def _batch(spark, rows):
    return collapse_batch(spark.createDataFrame(rows, SCHEMA), ["id"])


def _view(v):
    return {(r.grp, int(r.rnk)): (int(r.id), str(r.v)) for r in v.collect()}


def _check(state, view):
    assert _view(view) == _view(topk_of(state, "grp", "val", ["id"], K))


def _apply(state, view, batch):
    state, view = apply_topk_batch(
        state, batch, view, ["id"], "grp", "val", K)
    return checkpoint_pair(state, view)


def test_topk_maintenance_hard_cases(spark):
    state = spark.createDataFrame([], "id bigint, grp string, val double")
    view = topk_of(state, "grp", "val", ["id"], K)

    # batch 1: groups form from adds alone; a has MORE rows than k
    state, view = _apply(state, view, _batch(spark, [
        (1, "a", 5.0, 1, EVENT_TYPE_ADD),
        (2, "a", 9.0, 2, EVENT_TYPE_ADD),
        (3, "a", 7.0, 3, EVENT_TYPE_ADD),
        (4, "b", 2.0, 4, EVENT_TYPE_ADD),
    ]))
    assert _view(view) == {("a", 1): (2, "9.00"), ("a", 2): (3, "7.00"),
                           ("b", 1): (4, "2.00")}
    _check(state, view)

    # batch 2: FAST insertion — id=1 (below the board) rises to 8.0; its
    # pk is not in the view, so no rescan, yet it must displace rank 2
    state, view = _apply(state, view,
                         _batch(spark, [(1, "a", 8.0, 10, EVENT_TYPE_ADD)]))
    assert _view(view) == {("a", 1): (2, "9.00"), ("a", 2): (1, "8.00"),
                           ("b", 1): (4, "2.00")}
    _check(state, view)

    # batch 3: RESCAN — delete the leader; the runner-up-of-runner-up
    # (id=3, 7.0, long since evicted from the stored view) must resurface
    state, view = _apply(state, view,
                         _batch(spark, [(2, None, None, 20,
                                         EVENT_TYPE_REMOVE)]))
    assert _view(view) == {("a", 1): (1, "8.00"), ("a", 2): (3, "7.00"),
                           ("b", 1): (4, "2.00")}
    _check(state, view)

    # batch 4: group MOVE of a stored top-k row — id=3 jumps to group c:
    # a rescans (loses it), c gains it through the fast path
    state, view = _apply(state, view,
                         _batch(spark, [(3, "c", 7.0, 30, EVENT_TYPE_ADD)]))
    assert _view(view) == {("a", 1): (1, "8.00"), ("b", 1): (4, "2.00"),
                           ("c", 1): (3, "7.00")}
    _check(state, view)

    # batch 5: group vanishes; tie on value breaks by pk ascending
    state, view = _apply(state, view, _batch(spark, [
        (4, None, None, 40, EVENT_TYPE_REMOVE),
        (6, "c", 7.0, 41, EVENT_TYPE_ADD),
        (5, "c", 7.0, 42, EVENT_TYPE_ADD),
    ]))
    assert _view(view) == {("a", 1): (1, "8.00"),
                           ("c", 1): (3, "7.00"), ("c", 2): (5, "7.00")}
    _check(state, view)


def test_topk_update_of_board_row_rescans_exactly(spark):
    """An UPDATE to a pk already on the board routes through the rescan
    side (the fast union would otherwise hold the pk twice)."""
    state = spark.createDataFrame([], "id bigint, grp string, val double")
    view = topk_of(state, "grp", "val", ["id"], K)
    state, view = _apply(state, view, _batch(spark, [
        (1, "a", 9.0, 1, EVENT_TYPE_ADD),
        (2, "a", 8.0, 2, EVENT_TYPE_ADD),
        (3, "a", 7.0, 3, EVENT_TYPE_ADD),
    ]))
    # lower the leader below everyone: both remaining rows must surface
    state, view = _apply(state, view,
                         _batch(spark, [(1, "a", 1.0, 10, EVENT_TYPE_ADD)]))
    assert _view(view) == {("a", 1): (2, "8.00"), ("a", 2): (3, "7.00")}
    _check(state, view)


def test_topk_null_group_bucket(spark):
    state = spark.createDataFrame([], "id bigint, grp string, val double")
    view = topk_of(state, "grp", "val", ["id"], K)
    state, view = _apply(state, view, _batch(spark, [
        (1, None, 4.0, 1, EVENT_TYPE_ADD),
        (2, None, 8.0, 2, EVENT_TYPE_ADD),
        (3, None, 6.0, 3, EVENT_TYPE_ADD),
    ]))
    assert _view(view) == {(None, 1): (2, "8.00"), (None, 2): (3, "6.00")}
    state, view = _apply(state, view,
                         _batch(spark, [(2, None, None, 10,
                                         EVENT_TYPE_REMOVE)]))
    assert _view(view) == {(None, 1): (3, "6.00"), (None, 2): (1, "4.00")}
    _check(state, view)


def test_topk_batch_joins_all_broadcast(spark):
    """Every join in the maintenance step is broadcast-keyed (batch keys
    or rescan groups) — the full state must never sort-merge or shuffle
    for the view's sake; the only hash exchanges are the bounded
    candidate/rescan windows."""
    import contextlib
    import io

    state = spark.createDataFrame(
        [(i, "g", float(i)) for i in range(50)],
        "id bigint, grp string, val double")
    view = topk_of(state, "grp", "val", ["id"], K)
    b = _batch(spark, [(1, "g", 99.0, 1, EVENT_TYPE_ADD)])
    _, new_view = apply_topk_batch(state, b, view, ["id"], "grp", "val", K)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        new_view.explain("formatted")
    plan = buf.getvalue()
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
