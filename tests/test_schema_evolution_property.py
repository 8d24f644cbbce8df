"""Property-based schema evolution: ANY interleaving of ALTER TABLE
(ADD [FIRST/AFTER] / DROP / RENAME COLUMN) with row inserts — applied
through the real batch path with its flush-before-DDL barriers — must
leave the replica equal to a plain Python model that evolves a column
list and a row dict. MySQL position semantics apply in full: ADD FIRST
puts the new column before the PRIMARY KEY column too, and every insert
payload is positional over the live column order of its moment.
Generalizes the hand-written D4–D10 cases (schema_evolution_e2e,
test_engine_cdc) the way the parser round-trip property generalizes the
DDL grammar cases."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mysql_ch_replicator_spark.engine import ReplicaEngine
from mysql_ch_replicator_spark.sources.event_log import (
    EVENT_SCHEMA, EVENT_TYPE_ADD, EVENT_TYPE_QUERY,
)

# abstract instructions; interpretation binds them to the live column set
_op = st.one_of(
    st.tuples(st.just("insert"), st.integers(0, 5), st.integers(-9, 9)),
    st.tuples(st.just("add"), st.integers(0, 4), st.integers(0, 10)),
    st.tuples(st.just("drop"), st.integers(0, 10), st.integers(0)),
    st.tuples(st.just("rename"), st.integers(0, 10), st.integers(0)),
)
_ops = st.lists(_op, min_size=1, max_size=10)


def _interpret(ops):
    """Turn abstract ops into events + a Python model.

    ``order`` is the FULL structural column order (id starts alone and can
    end up anywhere but first); ``rows`` maps id -> {col: value} over the
    non-PK columns. Inserts record their positional payload over the
    order at that moment, exactly like a binlog row image."""
    order = ["id"]
    rows: dict[int, dict] = {}
    fresh = 0
    events = []                   # ("ddl", sql) | ("row", rid, payload)
    for kind, p1, p2 in ops:
        if kind == "insert":
            vals = {c: (p2 + i) for i, c in enumerate(order) if c != "id"}
            rows[p1] = vals
            payload = [str(p1) if c == "id" else str(vals[c])
                       for c in order]
            events.append(("row", p1, payload))
        elif kind == "add":
            name = f"c{fresh}"
            fresh += 1
            pos = p2 % (len(order) + 2)   # 0=FIRST, 1..n=AFTER, last=END
            if pos == 0:
                sql = f"ADD COLUMN {name} int FIRST"
                order.insert(0, name)
            elif 1 <= pos <= len(order):
                sql = f"ADD COLUMN {name} int AFTER {order[pos - 1]}"
                order.insert(pos, name)
            else:
                sql = f"ADD COLUMN {name} int"
                order.append(name)
            events.append(("ddl", f"ALTER TABLE t {sql}"))
            for vals in rows.values():
                vals.setdefault(name, None)
        elif kind == "drop" and len(order) > 1:
            non_pk = [c for c in order if c != "id"]
            name = non_pk[p1 % len(non_pk)]
            order.remove(name)
            events.append(("ddl", f"ALTER TABLE t DROP COLUMN {name}"))
            for vals in rows.values():
                vals.pop(name, None)
        elif kind == "rename" and len(order) > 1:
            non_pk = [c for c in order if c != "id"]
            old = non_pk[p1 % len(non_pk)]
            new = f"c{fresh}"
            fresh += 1
            order[order.index(old)] = new
            events.append(("ddl",
                           f"ALTER TABLE t RENAME COLUMN {old} TO {new}"))
            for vals in rows.values():
                if old in vals:
                    vals[new] = vals.pop(old)
    return events, order, rows


@given(ops=_ops)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_any_alter_interleaving_matches_model(spark, tmp_path_factory, ops):
    events, order, rows = _interpret(ops)
    root = tmp_path_factory.mktemp("evolve_prop")
    engine = ReplicaEngine(spark, str(root))
    engine.create_table("db", "CREATE TABLE t (id int NOT NULL, "
                              "PRIMARY KEY (id))")

    batch = []
    for seq, ev in enumerate(events, start=1):
        if ev[0] == "ddl":
            batch.append(("f", seq, seq, "db", None, EVENT_TYPE_QUERY,
                          None, ev[1]))
        else:
            _, rid, payload = ev
            batch.append(("f", seq, seq, "db", "t", EVENT_TYPE_ADD,
                          [payload], None))
    engine.apply_batch(spark.createDataFrame(batch, EVENT_SCHEMA))

    st_final = engine.structure("db", "t")
    assert [f.name for f in st_final.fields] == order
    got = {tuple(r) for r in
           engine.read_final("db", "t").drop("_version").collect()}
    want = {tuple(rid if c == "id" else vals[c] for c in order)
            for rid, vals in rows.items()}
    assert got == want
