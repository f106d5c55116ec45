"""Local replica of the driver's correctness gate: run each QuerySpec
on Spark and its oracle SQL on DuckDB over the same parquet, then
compare row count + column names + order-insensitive values exactly.

Comparison is stricter than the driver's hash (exact string equality
of every normalized cell), so a pass here implies a hash match.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from pubg_data_pipeline_spark.plans import all_specs
from tests.conftest import SF_DIR

SPECS = all_specs()
ORACLE_SPECS = sorted(name for name, s in SPECS.items() if s.oracle)
ROWS_ONLY_SPECS = sorted(name for name, s in SPECS.items() if not s.oracle)


def _normalize_cell(v):
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<null>"
        # driver-style value normalization: repr of the double
        return repr(round(v, 9))
    return repr(v)


def _canonical(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_normalize_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


@pytest.mark.parametrize("name", ORACLE_SPECS)
def test_oracle_parity(spark, duck, name):
    spec = SPECS[name]
    got = spec.fn(spark, SF_DIR).toPandas()
    want = duck.sql(spec.oracle).df()

    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    got_rows, want_rows = _canonical(got), _canonical(want)
    mismatches = [
        (g, w) for g, w in zip(got_rows, want_rows) if g != w
    ]
    assert not mismatches, f"{name}: {len(mismatches)} mismatched rows; first: {mismatches[0]}"


@pytest.mark.parametrize("name", ROWS_ONLY_SPECS)
def test_rows_only_queries_run(spark, name):
    spec = SPECS[name]
    df = spec.fn(spark, SF_DIR)
    assert df.count() >= 0  # materializes without error, stable schema
    assert len(df.columns) > 0
