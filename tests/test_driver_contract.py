"""Driver-contract guard: the grading driver imports __spark_entry__
with ITS OWN plain SparkSession (none of the engine's confs preset), so
entry()/queries() must retrofit every required conf via
configure_session. This test replays that exact path in a SUBPROCESS —
the in-process test session is already configured and would mask a
regression (precisely how the round-2 nanos-flag class of bug slips
through suites)."""

from __future__ import annotations

import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_PROBE = """
import sys
sys.path.insert(0, %r)
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e
rows = e.entry(spark).collect()
assert len(rows) > 0, "entry() returned no rows"
qs, oracles = e.queries(), e.oracle_sql()
assert set(oracles) <= set(qs), f"orphan oracles: {set(oracles) - set(qs)}"
# one timestamp-sensitive query end-to-end: proves the ts-normalization
# fires on a session that did NOT preset any parquet/timezone confs
n = qs["hourly_event_aggregates"](spark, "/root/testdata/sf0.001").count()
assert n > 0
# the side-effecting queries (persisted IVF index, fingerprint index,
# bucketed catalog tables) must ALSO work from a bare fresh process —
# stale artifacts from earlier processes included
for q in ("embedding_ivf_index_topk", "incremental_ingest_dedup", "bucketed_segment_order_stats"):
    assert qs[q](spark, "/root/testdata/sf0.001").count() > 0, q
print("CONTRACT_OK", len(qs), len(oracles))
"""


def test_entry_contract_on_bare_foreign_session():
    proc = subprocess.run(
        [sys.executable, "-c", _PROBE % REPO_ROOT],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=REPO_ROOT,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-3000:]}"
    assert "CONTRACT_OK" in proc.stdout


def test_readme_counts_match_registry():
    # Round-3 lesson: hand-maintained README counts drift. Pin them to
    # the registry so any query/oracle/headline change that forgets the
    # README fails here.
    import re

    import bench
    from pubg_data_pipeline_spark.plans import all_specs

    specs = all_specs()
    n_queries = len(specs)
    n_oracles = sum(1 for s in specs.values() if s.oracle is not None)
    n_headline = len(bench.HEADLINE)

    with open(f"{REPO_ROOT}/README.md") as f:
        readme = f.read()
    claimed_q = re.search(r"(\d+) registered queries", readme)
    claimed_o = re.search(r"(\d+) with DuckDB\s+oracle", readme)
    claimed_h = re.search(r"(\d+) headline queries", readme)
    assert claimed_q and int(claimed_q.group(1)) == n_queries, (
        f"README says {claimed_q and claimed_q.group(1)} queries, registry has {n_queries}"
    )
    assert claimed_o and int(claimed_o.group(1)) == n_oracles, (
        f"README says {claimed_o and claimed_o.group(1)} oracles, registry has {n_oracles}"
    )
    assert claimed_h and int(claimed_h.group(1)) == n_headline, (
        f"README says {claimed_h and claimed_h.group(1)} headline, bench.HEADLINE has {n_headline}"
    )
    # Every headline query must exist in the registry.
    missing = [n for n in bench.HEADLINE if n not in specs]
    assert not missing, f"bench.HEADLINE references unknown queries: {missing}"
