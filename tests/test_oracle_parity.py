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


# Spark simpleString dtype / DuckDB type name → one normalized family.
# Integer widths are grouped: the driver's round-1 schema check accepted
# Spark INT rank() vs DuckDB BIGINT rank() (player_ranking_top10 passed
# schema_match), so width drift is driver-safe; int-vs-float/string/
# timestamp drift is NOT and still fails here.
_DTYPE_NORM = {
    "tinyint": "int", "smallint": "int", "int": "int",
    "integer": "int", "bigint": "int", "hugeint": "int",
    "float": "float", "real": "float", "double": "float",
    "string": "string", "varchar": "string", "boolean": "bool",
    "date": "date", "timestamp": "timestamp",
    "timestamp with time zone": "timestamp", "timestamp_ntz": "timestamp",
}


def _norm_dtype(t: str) -> str:
    t = t.strip().lower()
    return _DTYPE_NORM.get(t, t)  # decimal(p,s), array<...> pass through


@pytest.mark.parametrize("name", ORACLE_SPECS)
def test_oracle_parity(spark, duck, name):
    spec = SPECS[name]
    sdf = spec.fn(spark, SF_DIR)
    got = sdf.toPandas()
    rel = duck.sql(spec.oracle)
    want = rel.df()

    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: column mismatch {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    spark_types = {c: _norm_dtype(t) for c, t in sdf.dtypes}
    duck_types = {c: _norm_dtype(str(t)) for c, t in zip(rel.columns, rel.types)}
    assert spark_types == duck_types, (
        f"{name}: dtype mismatch spark={spark_types} duck={duck_types}"
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
