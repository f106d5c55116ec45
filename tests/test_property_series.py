"""Hypothesis property tests for the series-repair operators: EWMA
against a naive per-row reference loop, and linear_interpolate against
pandas' index-based linear interpolation (the de-facto reference
semantics), on arbitrary gappy series."""

from __future__ import annotations

import math

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pubg_data_pipeline_spark.operators.timeseries import ewma, linear_interpolate

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_VALUES = st.lists(
    st.floats(min_value=-100, max_value=100, allow_nan=False, allow_infinity=False),
    min_size=1,
    max_size=25,
)


def _ewma_reference(values: list[float], alpha: float, span: int) -> list[float]:
    out = []
    for i in range(len(values)):
        lo = max(0, i - span + 1)
        window = values[lo : i + 1][::-1]  # most recent first
        num = sum(alpha * (1 - alpha) ** k * v for k, v in enumerate(window))
        den = sum(alpha * (1 - alpha) ** k for k in range(len(window)))
        out.append(num / den)
    return out


@given(values=_VALUES, alpha=st.sampled_from([0.1, 0.3, 0.9]), span=st.sampled_from([3, 10]))
@_SETTINGS
def test_ewma_matches_reference_loop(spark, values, alpha, span):
    rows = [("s", i, float(v)) for i, v in enumerate(values)]
    df = spark.createDataFrame(rows, "k string, i long, v double")
    got = {
        r["i"]: r["ewma"]
        for r in ewma(df, ["k"], ["i"], "v", alpha=alpha, span=span).collect()
    }
    want = _ewma_reference(values, alpha, span)
    for i, w in enumerate(want):
        assert math.isclose(got[i], w, rel_tol=1e-9, abs_tol=1e-9), (i, got[i], w)


@given(
    values=st.lists(
        st.one_of(
            st.none(),
            st.floats(min_value=-50, max_value=50, allow_nan=False, allow_infinity=False),
        ),
        min_size=1,
        max_size=25,
    ),
    xs_step=st.sampled_from([1, 3]),
)
@_SETTINGS
def test_linear_interpolate_matches_pandas(spark, values, xs_step):
    xs = [i * xs_step for i in range(len(values))]
    rows = [("s", x, v if v is None else float(v)) for x, v in zip(xs, values)]
    df = spark.createDataFrame(rows, "k string, x long, v double")
    got = {
        r["x"]: r["v_interp"]
        for r in linear_interpolate(df, ["k"], "x", "v").collect()
    }
    ser = pd.Series(
        [v for v in values], index=pd.Index(xs, dtype="float64"), dtype="float64"
    )
    want = ser.interpolate(method="index", limit_direction="both")
    for x in xs:
        w = want.loc[float(x)]
        g = got[x]
        if pd.isna(w):
            assert g is None  # all-null series stays null
        else:
            assert g is not None and math.isclose(g, w, rel_tol=1e-9, abs_tol=1e-9), (
                x,
                g,
                w,
            )


def test_ewma_null_series_head_yields_null_not_divide_by_zero(spark):
    # under Spark 4 ANSI mode a NULL value at a series head used to
    # fold den to 0.0 and raise DIVIDE_BY_ZERO, killing the query
    from pubg_data_pipeline_spark.operators import timeseries

    df = spark.createDataFrame(
        [(1, 1, None), (1, 2, 10.0), (1, 3, 20.0)],
        "k long, t long, v double",
    )
    out = {
        r["t"]: r["e"]
        for r in timeseries.ewma(df, ["k"], ["t"], "v", out_col="e").collect()
    }
    assert out[1] is None          # no in-span samples -> NULL, not error
    assert out[2] is not None and abs(out[2] - 10.0) < 1e-9
