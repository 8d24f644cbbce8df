"""Property-based CDC convergence: for ANY sequence of insert/update/
delete events — arbitrary key reuse, deletes of absent keys,
delete-then-reinsert churn, split across arbitrary batch boundaries —
the engine's dedup-final replica must equal a trivial sequential Python
replay of the same events. This generalizes the reference's hand-picked
e2e cases (tests/test_e2e_integration.py insert/update/delete loops) the
same way the DDL round-trip property test generalizes its parser cases.

Spark work per example is real (apply_batch jobs), so the example budget
is small and shapes are bounded; shrinking still produces a minimal
failing op-sequence if convergence ever breaks.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mysql_ch_replicator_spark.engine import ReplicaEngine
from mysql_ch_replicator_spark.sources.event_log import (
    EventLogWriter, read_event_log,
)

DDL = """CREATE TABLE kv (
  id int NOT NULL,
  val varchar(32),
  n int,
  PRIMARY KEY (id)
)"""

# (is_delete, key, value) over a small key space to force collisions
_event = st.tuples(st.booleans(), st.integers(0, 7), st.integers(-5, 5))
# up to 3 batches of 1–12 events each (an all-empty log has nothing to
# read — not a CDC scenario)
_batches = st.lists(st.lists(_event, min_size=1, max_size=12),
                    min_size=1, max_size=3)


def _replay(batches):
    state = {}
    for batch in batches:
        for is_del, k, v in batch:
            if is_del:
                state.pop(k, None)
            else:
                state[k] = (f"v{v}", v)
    return {(k, lab, n) for k, (lab, n) in state.items()}


@given(batches=_batches)
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_engine_converges_to_sequential_replay(spark, tmp_path_factory,
                                               batches):
    root = tmp_path_factory.mktemp("cdc_prop")
    engine = ReplicaEngine(spark, str(root / "replica"))
    engine.create_table("db", DDL)
    log = EventLogWriter(str(root / "log"))
    for batch in batches:
        for is_del, k, v in batch:
            if is_del:
                log.remove("db", "kv", [(k,)])
            else:
                log.add("db", "kv", [(k, f"v{v}", v)])
        log.rotate()
        # apply the FULL log every time: the per-table seq replay guard
        # must make the overlap idempotent (F3), so this property also
        # covers at-least-once redelivery, not just clean batching
        engine.apply_batch(read_event_log(spark, str(root / "log")))
    got = {tuple(r) for r in
           engine.read_final("db", "kv").drop("_version").collect()}
    assert got == _replay(batches)
