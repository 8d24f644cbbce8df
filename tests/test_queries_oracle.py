"""Every registered query must match its DuckDB oracle on the same data —
the same check the driver runs at sf0.01 (here at sf0.001 for speed;
set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 to run the real gate)."""

import pytest

from mysql_ch_replicator_spark.queries import _REGISTRY
from tests.oracle_compare import compare


@pytest.mark.parametrize("name", sorted(_REGISTRY))
def test_query_matches_oracle(spark, sf_dir, name):
    builder, oracle = _REGISTRY[name]
    df = builder(spark, sf_dir)
    assert df is not None
    if oracle is None:
        assert df.count() >= 0  # rows-only check, like the driver's
        return
    ok, msg = compare(df, oracle, sf_dir)
    assert ok, f"{name}: {msg}"
