"""The driver's correctness harness records only the first ~50 entries of
``queries()`` in iteration order.  These tests pin the round-5 rotation
policy: window composition is COMPUTED from the driver's own
``CORRECTNESS_r*.json`` history (never-verified and stale queries rotate to
the front automatically) so a refactor can't silently strand a query
outside the verification gate."""

import pytest

from mysql_ch_replicator_spark.queries import (
    _DRIVER_WINDOW_PINNED,
    _REGISTRY,
    _ROTATION_BOOST,
    _latest_green_rounds,
    _ordered_names,
    oracle_queries,
    spark_queries,
)

DRIVER_WINDOW = 50

CORE_SMOKE = {
    "cdc_final_state",
    "versioned_insert",
    "keyed_delete",
    "schema_evolution_e2e",
}


def test_pinned_and_boost_names_all_registered():
    missing = [
        n
        for n in (*_DRIVER_WINDOW_PINNED, *_ROTATION_BOOST)
        if n not in _REGISTRY
    ]
    assert not missing


def test_core_smoke_set_leads_window():
    names = list(spark_queries())
    assert tuple(names[: len(_DRIVER_WINDOW_PINNED)]) == _DRIVER_WINDOW_PINNED
    assert CORE_SMOKE <= set(names[:DRIVER_WINDOW])


def test_boosted_queries_inside_window():
    """Boosts are self-retiring (r5 policy, flag-round form since r10):
    once a boosted query has a green row NEWER than the round it was
    flagged in it returns to ordinary staleness rotation, so only
    *unsatisfied* boosts are guaranteed in-window.  The retired set is
    computed exactly as ``_ordered_names`` computes it — asserting
    unconditional membership was the r5 verdict's one red (the test went
    stale the moment the driver wrote CORRECTNESS_r05.json)."""
    latest = _latest_green_rounds()
    active = {n for n, flagged in _ROTATION_BOOST.items()
              if latest.get(n, -1) <= flagged}
    window = set(list(spark_queries())[:DRIVER_WINDOW])
    assert active <= window


def test_rotation_prefers_stalest_rows():
    """Among VERIFIED queries (those with a green driver row), everyone
    in the window must be at least as stale as everyone outside it — the
    staleness-cap invariant the r4 verdict asked for, restated per-lane
    after r8 (r8 ADVICE): never-verified entrants have their own
    capped/overflow lanes whose FIFO order is pinned separately
    (test_new_query_wave_cannot_starve_stale_tail), so during a
    registration wave bigger than _NEW_QUERY_SLOT_CAP the overflow
    (latest = -1, nominally "stalest") legitimately sorts LAST — a
    global min/max over both populations would go red exactly when the
    cap does its job."""
    latest = _latest_green_rounds()
    names = _ordered_names()
    special = set(_DRIVER_WINDOW_PINNED) | set(_ROTATION_BOOST)
    inside = [n for n in names[:DRIVER_WINDOW]
              if n not in special and n in latest]
    outside = [n for n in names[DRIVER_WINDOW:]
               if n not in special and n in latest]
    if inside and outside:
        assert max(latest[n] for n in inside) <= min(
            latest[n] for n in outside
        )


def test_overdue_queries_always_in_window():
    """The anti-starvation backstop on the REAL history: any verified
    query whose newest green row is _OVERDUE_AGE+ rounds behind the
    newest recorded round must be inside the window, whatever else got
    registered this round."""
    from mysql_ch_replicator_spark.queries import _OVERDUE_AGE

    latest = _latest_green_rounds()
    newest = max(latest.values(), default=-1)
    overdue = {n for n in _REGISTRY
               if 0 <= latest.get(n, -1) <= newest - _OVERDUE_AGE}
    window = set(_ordered_names()[:DRIVER_WINDOW])
    assert overdue <= window


def test_never_verified_queries_lead_rotation():
    """Any registered query with no green driver row ever must be in the
    window (as long as the window has room beyond pinned+boost)."""
    latest = _latest_green_rounds()
    never = [n for n in _REGISTRY if n not in latest]
    room = DRIVER_WINDOW - len(_DRIVER_WINDOW_PINNED) - len(_ROTATION_BOOST)
    window = set(_ordered_names()[:DRIVER_WINDOW])
    assert set(never[:room]) <= window


def test_full_coverage_and_determinism():
    names = _ordered_names()
    assert set(names) == set(_REGISTRY)
    assert len(names) == len(_REGISTRY)
    assert names == _ordered_names()  # stable across calls


def test_oracle_order_matches_spark_order():
    names = list(spark_queries())
    oracle = oracle_queries()
    assert list(oracle) == [n for n in names if n in oracle]


def _synthetic_rotation(monkeypatch, latest: dict, n_new: int):
    """Run _ordered_names against a synthetic registry/history: the
    pinned names plus every name in ``latest`` plus ``n_new``
    never-verified entrants registered last."""
    import mysql_ch_replicator_spark.queries as q

    fake = {n: (None, None) for n in q._DRIVER_WINDOW_PINNED}
    for n in latest:
        fake.setdefault(n, (None, None))
    for i in range(n_new):
        fake[f"new_{i:03d}"] = (None, None)
    full = dict(latest)
    newest = max(latest.values(), default=-1)
    for n in q._DRIVER_WINDOW_PINNED:
        full.setdefault(n, newest)
    monkeypatch.setattr(q, "_REGISTRY", fake)
    monkeypatch.setattr(q, "_latest_green_rounds", lambda: full)
    # the lane dynamics under test are independent of whatever real
    # queries happen to be boosted this round
    monkeypatch.setattr(q, "_ROTATION_BOOST", {})
    return q._ordered_names()


def test_new_query_wave_cannot_starve_stale_tail(monkeypatch):
    """The r7 failure mode, pinned dead: 60 never-verified entrants in
    one round must NOT push queries already _OVERDUE_AGE rounds stale
    out of the 50-slot window (overdue lane preempts the new lane), and
    never-verified entrants are capped at _NEW_QUERY_SLOT_CAP."""
    import mysql_ch_replicator_spark.queries as q

    latest = {f"overdue_{i}": 3 for i in range(10)}
    latest.update({f"ok_{i}": 7 for i in range(100)})
    names = _synthetic_rotation(monkeypatch, latest, n_new=60)
    window = set(names[:DRIVER_WINDOW])
    # newest recorded = 7, overdue threshold 7-5=2... age of 3-rows = 4 <
    # _OVERDUE_AGE → NOT overdue: they queue behind the capped new lane
    # but the cap leaves room: 4 pins + 35 new + 10 stale ≤ 50
    assert {f"overdue_{i}" for i in range(10)} <= window
    assert sum(1 for n in window if n.startswith("new_")) \
        == q._NEW_QUERY_SLOT_CAP
    # overflow new entrants sort last, FIFO
    tail = names[-(60 - q._NEW_QUERY_SLOT_CAP):]
    assert all(n.startswith("new_") for n in tail)
    assert tail == sorted(tail)


def test_rotation_staleness_bounded_under_continuous_influx(monkeypatch):
    """Multi-round simulation of the r7 failure dynamics: starting from
    a 192-query registry with the real r8 staleness distribution and
    adding 10 new queries EVERY round, no verified query's newest green
    row ever falls more than _OVERDUE_AGE rounds behind — the overdue
    lane guarantees the tail always cycles back in, whatever the influx
    (the r7 policy let new waves starve it unboundedly). Never-verified
    entrants queue FIFO once the registry outgrows the window's
    arithmetic capacity — a physical limit of 50 slots, not a policy
    choice — so the oldest entrant is always next in line."""
    import mysql_ch_replicator_spark.queries as q

    latest = {}
    i = 0
    for rnd, count in [(3, 4), (4, 46), (5, 46), (6, 46), (7, 46)]:
        for _ in range(count):
            latest[f"q{i:03d}"] = rnd
            i += 1
    born = {}
    new_counter = [0]

    worst_lag = 0
    for rnd in range(8, 30):
        for _ in range(10):
            name = f"fresh_{new_counter[0]:03d}"
            latest.setdefault(name, -1)
            born[name] = rnd
            new_counter[0] += 1
        known = {k: v for k, v in latest.items() if v >= 0}
        names = _synthetic_rotation(
            monkeypatch, known,
            n_new=sum(1 for v in latest.values() if v < 0))
        # map synthetic never-verified names back: _synthetic_rotation
        # names them new_XXX in registration order == our fresh_XXX order
        fresh = sorted(k for k, v in latest.items() if v < 0)
        alias = {f"new_{j:03d}": fresh[j] for j in range(len(fresh))}
        window = [alias.get(n, n) for n in names[:DRIVER_WINDOW]]
        verified_new = [n for n in window if n.startswith("fresh_")
                        and latest[n] < 0]
        # FIFO: the entrants verified this round are exactly the oldest
        # waiting ones
        waiting = sorted(k for k, v in latest.items()
                         if k.startswith("fresh_") and v < 0)
        assert verified_new == waiting[:len(verified_new)]
        for n in window:          # the driver turns the window green
            if n in latest:
                latest[n] = rnd
        lag = max(rnd - v for k, v in latest.items()
                  if v >= 0 and not k.startswith("fresh_"))
        worst_lag = max(worst_lag, lag)
    assert worst_lag <= q._OVERDUE_AGE, worst_lag


def test_rotation_staleness_bounded_at_r10_scale(monkeypatch):
    """The r10 verdict's capacity question, answered by simulation: at
    the REAL post-r10 registry size and staleness distribution (215
    queries: 35@r6, 44@r7, 45@r8, 41@r9, 50@r10) with a bounded influx
    of 6 new queries EVERY round for 22 rounds (the r11 registration
    budget — new entrants must stay ≤ 50 − 4 pins − |stalest cohort|),
    no verified query's newest green row ever falls more than
    _OVERDUE_AGE rounds behind. At 46 free slots/round the steady-state
    cycle over ~345 queries is ~7.5 rounds of arithmetic capacity, so
    the bound holds ONLY because the overdue lane preempts the new
    lane — which is exactly what this pins."""
    import mysql_ch_replicator_spark.queries as q

    latest = {}
    i = 0
    for rnd, count in [(6, 35), (7, 44), (8, 45), (9, 41), (10, 50)]:
        for _ in range(count):
            latest[f"q{i:03d}"] = rnd
            i += 1
    new_counter = [0]
    worst_lag = 0
    for rnd in range(11, 33):
        for _ in range(6):
            latest.setdefault(f"fresh_{new_counter[0]:03d}", -1)
            new_counter[0] += 1
        known = {k: v for k, v in latest.items() if v >= 0}
        names = _synthetic_rotation(
            monkeypatch, known,
            n_new=sum(1 for v in latest.values() if v < 0))
        fresh = sorted(k for k, v in latest.items() if v < 0)
        alias = {f"new_{j:03d}": fresh[j] for j in range(len(fresh))}
        window = [alias.get(n, n) for n in names[:DRIVER_WINDOW]]
        for n in window:
            if n in latest:
                latest[n] = rnd
        lag = max(rnd - v for v in latest.values() if v >= 0)
        worst_lag = max(worst_lag, lag)
    assert worst_lag <= q._OVERDUE_AGE, worst_lag


def test_r11_window_covers_entire_r6_stale_cohort():
    """The r10 verdict's task #2, pinned on the REAL history: every
    query whose newest green row is round 6 (the 35-query cohort at the
    overdue bound) must be inside the round-11 window — the staleness
    lane must not be crowded out by this round's boosts + new
    registrations. Registration budget check: if this fails, retire a
    boost or fold a new query into an existing name."""
    latest = _latest_green_rounds()
    newest = max(latest.values(), default=-1)
    if newest != 10:      # only meaningful while r10 is the newest row
        pytest.skip("history has moved past round 10")
    r6 = {n for n in _REGISTRY if latest.get(n) == 6}
    window = set(_ordered_names()[:DRIVER_WINDOW])
    assert r6 <= window, sorted(r6 - window)


def test_r12_window_covers_entire_r7_stale_cohort():
    """The r11 verdict's task #1, pinned on the REAL history: every
    query whose newest green row is round 7 (the 43-query cohort, one
    round from the overdue bound) must be inside the round-12 window —
    with the budget EXACTLY full (4 pins + 2 boosts + 1 new
    registration + 43 = 50), a single extra boost or registration
    crowds one of them out. If this fails, retire a boost or fold the
    new query into an existing name."""
    latest = _latest_green_rounds()
    newest = max(latest.values(), default=-1)
    if newest != 11:      # only meaningful while r11 is the newest row
        pytest.skip("history has moved past round 11")
    r7 = {n for n in _REGISTRY if latest.get(n) == 7}
    window = set(_ordered_names()[:DRIVER_WINDOW])
    assert r7 <= window, sorted(r7 - window)
    # the never-verified new registration must also make the window
    never = {n for n in _REGISTRY if n not in latest}
    assert never <= window, sorted(never - window)


def test_overdue_lane_preempts_new_lane(monkeypatch):
    """A query whose newest green row is _OVERDUE_AGE+ rounds behind the
    newest recorded round outranks even never-verified entrants — the
    hard anti-starvation backstop."""
    latest = {f"ancient_{i}": 1 for i in range(8)}      # age 6 ≥ 5
    latest.update({f"ok_{i}": 7 for i in range(100)})
    names = _synthetic_rotation(monkeypatch, latest, n_new=60)
    import mysql_ch_replicator_spark.queries as q
    base = len(q._DRIVER_WINDOW_PINNED)
    assert set(names[base:base + 8]) == {f"ancient_{i}" for i in range(8)}


def test_r13_window_covers_entire_r8_stale_cohort():
    """The r12 verdict's task #1, pinned on the REAL history: every
    query whose newest green row is round 8 (the 45-query cohort, one
    round from the overdue bound) must be inside the round-13 window —
    with the budget EXACTLY full (4 pins + 1 new registration
    [lexical_index_compact] + 45 = 50), a single extra boost or
    registration crowds one of them out. If this fails, retire a boost
    or fold the new query into an existing name."""
    latest = _latest_green_rounds()
    newest = max(latest.values(), default=-1)
    if newest != 12:      # only meaningful while r12 is the newest row
        pytest.skip("history has moved past round 12")
    r8 = {n for n in _REGISTRY if latest.get(n) == 8}
    window = set(_ordered_names()[:DRIVER_WINDOW])
    assert r8 <= window, sorted(r8 - window)
    # the never-verified new registration must also make the window
    never = {n for n in _REGISTRY if n not in latest}
    assert "lexical_index_compact" in never
    assert never <= window, sorted(never - window)
