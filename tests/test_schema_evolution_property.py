"""Property-based schema evolution: ANY interleaving of ALTER TABLE
(ADD [FIRST/AFTER] / DROP / RENAME COLUMN) with row inserts — applied
through the real batch path with its flush-before-DDL barriers — must
leave the replica equal to a plain Python model that evolves a column
list and a row dict. Generalizes the hand-written D4–D10 cases
(schema_evolution_e2e, test_engine_cdc) the way the parser round-trip
property generalizes the DDL grammar cases."""

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
    """Turn abstract ops into (ddl_sql | insert) events + a Python model.

    Model: ``cols`` is the ordered non-PK column list, ``rows`` maps
    id -> {col: value}; inserts carry the CURRENT column set (positional
    payload, like a binlog row image)."""
    cols: list[str] = []          # non-PK columns, in structural order
    rows: dict[int, dict] = {}
    fresh = 0
    events = []                   # ("ddl", sql) | ("row", id, {col: val})
    for kind, p1, p2 in ops:
        if kind == "insert":
            vals = {c: (p2 + i) for i, c in enumerate(cols)}
            rows[p1] = vals
            events.append(("row", p1, dict(vals)))
        elif kind == "add":
            name = f"c{fresh}"
            fresh += 1
            pos = p2 % (len(cols) + 2)   # 0=FIRST, 1..n=AFTER, last=END
            if pos == 0 and cols:
                sql = f"ADD COLUMN {name} int FIRST"
                cols.insert(0, name)
            elif 1 <= pos <= len(cols):
                sql = f"ADD COLUMN {name} int AFTER {cols[pos - 1]}"
                cols.insert(pos, name)
            else:
                sql = f"ADD COLUMN {name} int"
                cols.append(name)
            events.append(("ddl", f"ALTER TABLE t {sql}"))
            for vals in rows.values():
                vals.setdefault(name, None)
        elif kind == "drop" and cols:
            name = cols.pop(p1 % len(cols))
            events.append(("ddl", f"ALTER TABLE t DROP COLUMN {name}"))
            for vals in rows.values():
                vals.pop(name, None)
        elif kind == "rename" and cols:
            old = cols[p1 % len(cols)]
            new = f"c{fresh}"
            fresh += 1
            cols[cols.index(old)] = new
            events.append(("ddl", f"ALTER TABLE t RENAME COLUMN {old} TO {new}"))
            for vals in rows.values():
                if old in vals:
                    vals[new] = vals.pop(old)
    return events, cols, rows


@given(ops=_ops)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_any_alter_interleaving_matches_model(spark, tmp_path_factory, ops):
    events, cols, rows = _interpret(ops)
    root = tmp_path_factory.mktemp("evolve_prop")
    engine = ReplicaEngine(spark, str(root))
    engine.create_table("db", "CREATE TABLE t (id int NOT NULL, "
                              "PRIMARY KEY (id))")

    # column set as of each event, for positional payloads
    live: list[str] = []
    batch = []
    for seq, ev in enumerate(events, start=1):
        if ev[0] == "ddl":
            batch.append(("f", seq, seq, "db", None, EVENT_TYPE_QUERY,
                          None, ev[1]))
            sql = ev[1]
            if " ADD COLUMN " in sql:
                name = sql.split(" ADD COLUMN ")[1].split()[0]
                if sql.endswith("FIRST"):
                    live.insert(0, name)
                elif " AFTER " in sql:
                    live.insert(live.index(sql.rsplit(" AFTER ", 1)[1]) + 1,
                                name)
                else:
                    live.append(name)
            elif " DROP COLUMN " in sql:
                live.remove(sql.rsplit(" DROP COLUMN ", 1)[1])
            elif " RENAME COLUMN " in sql:
                old, new = sql.rsplit(" RENAME COLUMN ", 1)[1].split(" TO ")
                live[live.index(old)] = new
        else:
            _, rid, vals = ev
            payload = [[str(rid)] + [
                None if vals[c] is None else str(vals[c]) for c in live]]
            batch.append(("f", seq, seq, "db", "t", EVENT_TYPE_ADD,
                          payload, None))
    engine.apply_batch(spark.createDataFrame(batch, EVENT_SCHEMA))

    st_final = engine.structure("db", "t")
    assert [f.name for f in st_final.fields] == ["id"] + cols
    got = {tuple(r) for r in
           engine.read_final("db", "t").drop("_version").collect()}
    want = {(rid, *[vals[c] for c in cols]) for rid, vals in rows.items()}
    assert got == want
