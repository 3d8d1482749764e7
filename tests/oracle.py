"""Mirror of the driver's correctness gate: run a registry query on Spark
and its oracle SQL on DuckDB over the same parquet tables, then compare
row count + column names + order-insensitive values (columns sorted by
name, rows sorted by all columns). Exact comparison — the engine's decimal
discipline is supposed to make values bit-identical."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from stripe_sync_engine_spark.tables import TESTDATA_TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TESTDATA_TABLES:
            path = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(path):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
        return con.execute(sql).df()
    finally:
        con.close()


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = pd.to_datetime(s).dt.tz_localize(None) if getattr(s.dt, "tz", None) is not None else s
        elif s.dtype == object:
            out[c] = s.map(lambda v: str(v) if v is not None and not (isinstance(v, float) and math.isnan(v)) else None)
    out = out.sort_values(by=list(out.columns), na_position="first").reset_index(drop=True)
    return out


def compare(spark_df, oracle_df: pd.DataFrame, name: str, float_exact: bool = True) -> None:
    got = canonicalize(spark_df.toPandas())
    want = canonicalize(oracle_df)
    assert list(got.columns) == list(want.columns), f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    assert len(got) == len(want), f"{name}: rowcount {len(got)} != {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        # The driver's value hash sees the concrete representation, so a
        # float64-vs-int64 dtype divergence (e.g. DuckDB HUGEINT -> float64)
        # is a real mismatch even when the numbers are equal. Catch it here.
        assert pd.api.types.is_float_dtype(g) == pd.api.types.is_float_dtype(w), (
            f"{name}.{c}: dtype kind mismatch spark={g.dtype} oracle={w.dtype} "
            "(cast the oracle aggregate, e.g. CAST(SUM(...) AS BIGINT))"
        )
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            ok = (g.isna() & w.isna()) | (g.astype("float64") == w.astype("float64"))
            if not float_exact:
                ok = ok | ((g - w).abs() <= 1e-9 * w.abs().clip(lower=1.0))
            bad = (~ok).to_numpy().nonzero()[0]
            assert len(bad) == 0, f"{name}.{c}: {len(bad)} mismatches, first at row {bad[0]}: {g.iloc[bad[0]]!r} != {w.iloc[bad[0]]!r}"
        else:
            pd.testing.assert_series_equal(g, w, check_names=False, check_dtype=False, obj=f"{name}.{c}")
