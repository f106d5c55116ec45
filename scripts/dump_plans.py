#!/usr/bin/env python
"""Dump .explain("formatted") for registered queries to a directory.

Usage: python scripts/dump_plans.py OUTDIR [name ...]
With no names, dumps every query in the bench headline lists; with
names, only those. Also writes a one-line-per-query summary TSV with
Exchange count, join node kinds, and Python-eval node presence so plan
regressions can be diffed quickly.
"""
from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pubg_data_pipeline_spark.plans import all_specs
from pubg_data_pipeline_spark.session import get_spark


def main() -> None:
    outdir = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    if not names:
        import bench

        names = bench.HEADLINE + bench.HEADLINE_V2_EXTRA
    rows = []
    for name in names:
        try:
            df = specs[name].fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR {type(exc).__name__}: {exc}"
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(plan)
        n_exch = len(re.findall(r"\bExchange\b", plan))
        joins = sorted(set(re.findall(r"(\w*Join\w*)", plan)))
        py = sorted(set(re.findall(
            r"(BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas|PythonMapInArrow)", plan)))
        rows.append((name, n_exch, "+".join(joins) or "-", "+".join(py) or "-"))
        print(f"{name}\t{n_exch}\t{'+'.join(joins) or '-'}\t{'+'.join(py) or '-'}")
    with open(os.path.join(outdir, "_summary.tsv"), "w") as f:
        for r in rows:
            f.write("\t".join(str(x) for x in r) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
