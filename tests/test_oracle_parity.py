"""Local replica of the driver's correctness gate: run every registered
query on Spark AND its oracle SQL on DuckDB over the same parquet, then
compare row count + column names + exact values (order-insensitive).

Stricter than the driver's value-hash (exact equality per cell), so a pass
here implies a hash match there.
"""

from __future__ import annotations

import datetime
import math

import pandas as pd
import pytest

import __spark_entry__ as entrymod

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        # normalize temporal dtypes to ns, tz-naive — comparing
        # datetime64 columns of MISMATCHED units (spark ns vs duckdb us)
        # makes assert_frame_equal diff the raw int64 representations
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = (
                pd.to_datetime(df[c]).dt.tz_localize(None).astype("datetime64[ns]")
            )
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: None if v is None or (isinstance(v, float) and math.isnan(v)) else v
            )
            non_null = df[c].dropna()
            if len(non_null) and isinstance(non_null.iloc[0], datetime.date):
                df[c] = pd.to_datetime(df[c])
    sort_cols = list(df.columns)
    df = df.sort_values(by=sort_cols, na_position="last", kind="mergesort")
    return df.reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    sdf = QUERIES[name](spark, sf_dir)
    got = _normalize(sdf.toPandas())
    want = _normalize(duck.execute(ORACLES[name]).df())

    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=True, obj=name
    )


def test_all_queries_have_callables():
    for name in ORACLES:
        assert name in QUERIES


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
