"""The driver's correctness harness records only the first ~50 entries of
``queries()`` in iteration order.  These tests pin the window composition so
a refactor can't silently rotate an unverified query out of the gate."""

from mysql_ch_replicator_spark.queries import (
    _DRIVER_WINDOW_PRIORITY,
    _REGISTRY,
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


def test_priority_names_all_registered():
    missing = [n for n in _DRIVER_WINDOW_PRIORITY if n not in _REGISTRY]
    assert not missing


def test_priority_has_no_duplicates():
    assert len(set(_DRIVER_WINDOW_PRIORITY)) == len(_DRIVER_WINDOW_PRIORITY)


def test_core_smoke_set_inside_window():
    window = list(spark_queries())[:DRIVER_WINDOW]
    assert CORE_SMOKE <= set(window)


def test_priority_list_fits_in_window():
    assert len(_DRIVER_WINDOW_PRIORITY) <= DRIVER_WINDOW


def test_priority_prefix_and_full_coverage():
    names = list(spark_queries())
    assert tuple(names[: len(_DRIVER_WINDOW_PRIORITY)]) == _DRIVER_WINDOW_PRIORITY
    assert set(names) == set(_REGISTRY)
    assert len(names) == len(_REGISTRY)


def test_oracle_order_matches_spark_order():
    names = list(spark_queries())
    oracle = oracle_queries()
    assert list(oracle) == [n for n in names if n in oracle]
