"""Every registry query with an oracle must match DuckDB exactly — the
same gate the driver applies (rowcount + schema + order-insensitive
values), run at sf0.001 for speed (driver uses sf0.01)."""

import pytest

from stripe_sync_engine_spark.plans import REGISTRY
from tests.oracle import compare, run_oracle

WITH_ORACLE = sorted(name for name, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY = sorted(name for name, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, sf_dir, name):
    q = REGISTRY[name]
    spark_df = q.spark(spark, sf_dir)
    oracle_df = run_oracle(q.oracle, sf_dir)
    compare(spark_df, oracle_df, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    q = REGISTRY[name]
    df = q.spark(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    names = set(e.queries())
    assert set(e.oracle_sql()) <= names
    # r11 regression guard: a 51st registry entry silently fell out of the
    # driver's 50-row correctness gate. The entry module raises at import
    # when the registry exceeds the cap; pin the invariant here too so the
    # failure is attributable even if the driver imports differently.
    assert len(names) <= e.DRIVER_QUERY_CAP
