#!/usr/bin/env python
"""Interleaved A/B of the round-9 profile_columns split (hash-friendly
distinct aggregate cross-joined with a sort-free keyless basic
aggregate) against the round-8 single combined aggregate (which
degraded to SortAggregate — two full sorts of the Expand's 6x rows —
because min/max(string) buffers disqualify hash aggregation).

Runs on the events profile projection at $SPARK_GRAFT_SF_DIR."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pubg_data_pipeline_spark.operators.profile import profile_columns
from pubg_data_pipeline_spark.session import get_spark
from pubg_data_pipeline_spark.sources.tables import load_table
from pyspark.sql import functions as F

COLS = ["event_id", "ts_s", "user_id", "event_type", "value"]


def profile_columns_old(df, cols):
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(
            F.coalesce(
                F.sum(F.col(c).isNull().cast("long")), F.lit(0).cast("long")
            ).alias(f"__nulls_{c}")
        )
        aggs.append(F.countDistinct(F.col(c)).alias(f"__nd_{c}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nulls_{c}, __nd_{c}, __min_{c}, __max_{c}" for c in cols
    )
    return wide.selectExpr(
        "__n",
        f"stack({len(cols)}, {stack_args}) AS "
        "(column_name, n_nulls, n_distinct, min_value, max_value)",
    ).select(
        "column_name",
        F.col("__n").alias("n_rows"),
        "n_nulls",
        F.round(
            F.when(F.col("__n") > 0, F.col("n_nulls") / F.col("__n")).otherwise(0.0), 6
        ).alias("null_frac"),
        "n_distinct",
        "min_value",
        "max_value",
    )


sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark(app_name="profile-ab")
spark.sparkContext.setLogLevel("ERROR")
ev = load_table(spark, sf_dir, "events").select(
    "event_id",
    F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
    "user_id",
    "event_type",
    "value",
)


def run(fn):
    t0 = time.perf_counter()
    fn(ev, COLS).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


for fn in (profile_columns_old, profile_columns):
    run(lambda d, c: fn(d, c))
    run(lambda d, c: fn(d, c))

N = 7
olds, news = [], []
for i in range(N):
    olds.append(run(profile_columns_old))
    news.append(run(profile_columns))
    print(f"pass {i}: old {olds[-1]:.3f}s  new {news[-1]:.3f}s")
olds.sort(), news.sort()
print(f"old min={olds[0]:.3f} med={olds[N // 2]:.3f}")
print(f"new min={news[0]:.3f} med={news[N // 2]:.3f}")
print(f"speedup med={olds[N // 2] / news[N // 2]:.2f}x")
o = sorted(tuple(r) for r in profile_columns_old(ev, COLS).collect())
n = sorted(tuple(r) for r in profile_columns(ev, COLS).collect())
print("rows equal:", o == n)
spark.stop()
