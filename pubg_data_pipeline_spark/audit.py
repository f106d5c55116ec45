"""Physical-plan auditor: lint a DataFrame's executed plan for the
patterns that break at 100 TB.

The reference never inspects its plans — its worst scale hazard (a
global ``Window.orderBy`` funneling every row through one task at
spark_apps/advanced_analytics.py:129) would ship silently. This
module turns that class of review into code: the red-flag patterns
the repo's plan-shape tests assert query-by-query
(tests/test_plan_shapes.py, tests/test_scale_probe.py) are detected
generically, so ANY query — including future ones — can be gated with
one call before it reaches a cluster.

Rules (findings carry severity ``critical`` or ``info``):

- ``nested_loop_join``: CartesianProduct / BroadcastNestedLoopJoin,
  UNLESS either side is bounded by construction — it reduces to a
  scalar (zero-key aggregate: the "broadcast one aggregate row and
  compare everything against it" pattern) or is driver-literal data
  (LocalTableScan / parallelized collection — hand-declared band/dim
  lists, quantile probes). A genuine nested loop between two row SETS
  is the O(n*m) killer. Critical.
- ``single_partition_funnel``: an ``Exchange SinglePartition``
  feeding a Sort or Window with NO aggregate anywhere below the
  exchange — i.e., RAW rows are being funneled through one task (the
  reference's global-window antipattern). Critical. The same exchange
  over post-aggregation data (an aggregate exists in its subtree) is
  the normal "tiny reduced frame" idiom — reported as info so a human
  can confirm the reduced cardinality, never as critical. A
  SinglePartition exchange under a global final aggregate or limit is
  not reported at all.
- ``python_row_udf``: BatchEvalPython — row-at-a-time Python in the
  hot path (~10-100x slower than Arrow). Critical. Arrow nodes
  (ArrowEvalPython, FlatMapGroupsInPandas*, MapInPandas) pass;
  ``BatchEvalPythonUDTF`` is reported as info (``python_udtf``) —
  UDTFs are row-API by design and ours are designated extension
  points with expression twins.
- ``filter_not_pushed``: a Filter sits directly on a parquet scan
  whose PushedFilters is empty — the predicate didn't reach the
  reader. Info: many predicates are legitimately non-pushable
  (regex, derived columns).

Use ``assert_scale_safe(df)`` as the pre-flight gate; pass
``allow={rule}`` for documented exceptions (e.g. an exact all-pairs
oracle baseline whose scale twin is the production path).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


# Documented exceptions: exact all-pairs oracle baselines whose
# docstrings name the bucketed/LSH scale twin as the production path.
# Shared by the registry sweep test and the CLI so "known baseline"
# and "new regression" stay distinguishable everywhere.
KNOWN_EXACT_BASELINES: dict[str, frozenset[str]] = {
    "embedding_cosine_near_dups": frozenset({"nested_loop_join"}),
    "embedding_topk_cosine": frozenset({"nested_loop_join"}),
    "embedding_incremental_topk": frozenset({"nested_loop_join"}),
    # same brute-force family: the 5-row query set broadcasts into the
    # corpus scan (bounded build side); docstrings name the IVF/LSH
    # candidate join as the 100 TB path
    "embedding_hard_negatives": frozenset({"nested_loop_join"}),
    "doc_hybrid_search": frozenset({"nested_loop_join"}),
    # retrieve-wide/rerank-small: the candidate scan is brute-force
    # (same family as above) and the pairwise-sim join is k x k over
    # the 20-row shortlist — bounded by construction, both broadcast
    "embedding_mmr_rerank": frozenset({"nested_loop_join"}),
    # evaluation query: its exact leg IS the brute-force baseline (5
    # broadcast query vectors into the corpus scan, same family as
    # embedding_topk_cosine); the IVF leg under test is bucketed
    "embedding_ann_recall": frozenset({"nested_loop_join"}),
}


@dataclass(frozen=True)
class Finding:
    rule: str
    severity: str  # 'critical' | 'info'
    node: str      # the offending plan line (stripped), with context


# tree-drawing characters ONLY (':  ', '+- ', ':- ') — the codegen
# marker '*(n) ' is stripped from the TEXT, never counted as depth,
# so a starred parent keeps a smaller depth than its children with
# AQE disabled (plans under AQE print no stars pre-execution)
_TREE_PREFIX = re.compile(r"^[\s:+\-]*")
_CODEGEN_MARK = re.compile(r"^\*\(\d+\)\s*")
# physical aggregates; keys=[] / key=[] marks the zero-key (scalar) form
_AGG_NODE = re.compile(r"^(HashAggregate|SortAggregate|ObjectHashAggregate)\b")
_SCALAR_AGG = re.compile(
    r"^(?:HashAggregate\(keys=\[\]|SortAggregate\(key=\[\]|ObjectHashAggregate\(keys=\[\])"
)


def _parse(plan: str) -> list[tuple[int, str]]:
    """(depth, operator-text) per plan line; depth = indent prefix
    length (Spark draws ':  ', '+- ', ':- ', and codegen '*(n) ')."""
    out = []
    for ln in plan.splitlines():
        if not ln.strip():
            continue
        m = _TREE_PREFIX.match(ln)
        prefix = m.group(0) if m else ""
        text = _CODEGEN_MARK.sub("", ln[len(prefix):]).strip()
        if text:
            out.append((len(prefix), text))
    return out


def _parent(lines: list[tuple[int, str]], idx: int) -> str:
    d = lines[idx][0]
    for j in range(idx - 1, -1, -1):
        if lines[j][0] < d:
            return lines[j][1]
    return ""


def _subtree(lines: list[tuple[int, str]], idx: int) -> list[tuple[int, str]]:
    """All strictly-deeper lines below idx until depth returns."""
    d = lines[idx][0]
    out = []
    for j in range(idx + 1, len(lines)):
        if lines[j][0] <= d:
            break
        out.append(lines[j])
    return out


def _children_idx(lines: list[tuple[int, str]], idx: int) -> list[int]:
    """Indices of the immediate children of node idx (the minimal-depth
    lines of its subtree)."""
    d = lines[idx][0]
    sub = []
    j = idx + 1
    while j < len(lines) and lines[j][0] > d:
        sub.append(j)
        j += 1
    if not sub:
        return []
    min_d = min(lines[k][0] for k in sub)
    return [k for k in sub if lines[k][0] == min_d]


def _side_bounded(lines: list[tuple[int, str]], side: int) -> bool:
    """A join child is bounded by construction when it reduces to one
    row (shallowest aggregate is zero-key — the "broadcast a scalar
    and compare everything against it" idiom) or is driver-literal
    data (LocalTableScan / parallelized collection with no file/range
    source below — hand-declared band/dim lists, quantile probes)."""
    nodes = [lines[side]] + _subtree(lines, side)
    for _, t in nodes:
        if _AGG_NODE.match(t):
            return bool(_SCALAR_AGG.match(t))
    has_local = any(
        t.startswith(("LocalTableScan", "Scan ExistingRDD")) for _, t in nodes
    )
    has_source = any(
        t.startswith(("FileScan", "Range (")) or "Scan parquet" in t for _, t in nodes
    )
    return has_local and not has_source


def _join_boundedness(lines: list[tuple[int, str]], idx: int) -> tuple[bool, bool]:
    """(any side bounded, BUILD side bounded-or-absent). The first
    caps the loop's output; the second also rules out materializing an
    unbounded broadcast side."""
    text = lines[idx][1]
    kids = _children_idx(lines, idx)
    if len(kids) != 2:
        return False, False
    bounded = [_side_bounded(lines, k) for k in kids]
    if "BuildRight" in text or "BuildLeft" in text:
        build_ok = bounded[1] if "BuildRight" in text else bounded[0]
    else:
        build_ok = True  # CartesianProduct materializes neither side
    return any(bounded), build_ok


def audit_plan(
    df: DataFrame, allow: frozenset[str] | set[str] = frozenset()
) -> list[Finding]:
    """Lint ``df``'s physical plan; returns findings, critical first.

    Planning only — no job runs. Under AQE this audits the initial
    physical plan; AQE can only improve it at runtime (skew splits,
    partition coalescing) and never introduces a nested loop or a
    Python eval node that isn't already present, so a clean audit is
    conservative.
    """
    plan = df._jdf.queryExecution().executedPlan().toString()
    lines = _parse(plan)
    findings: list[Finding] = []

    for i, (_, text) in enumerate(lines):
        if text.startswith(("CartesianProduct", "BroadcastNestedLoopJoin")):
            any_bounded, build_ok = _join_boundedness(lines, i)
            if not any_bounded:
                findings.append(Finding("nested_loop_join", "critical", text))
            elif not build_ok:
                # loop output is bounded, but the plan still
                # materializes an UNBOUNDED broadcast/build side —
                # fine at dim scale, an executor-memory hazard at 100TB
                findings.append(Finding("unbounded_broadcast_build", "info", text))
        elif text.startswith("Exchange SinglePartition"):
            parent = _parent(lines, i)
            if parent.startswith(("Sort [", "Window ")):
                below = _subtree(lines, i)
                has_agg = any(_AGG_NODE.match(t) for _, t in below)
                findings.append(
                    Finding(
                        "single_partition_funnel",
                        "info" if has_agg else "critical",
                        f"{text} <- parent: {parent}",
                    )
                )
        elif text.startswith("BatchEvalPythonUDTF"):
            findings.append(Finding("python_udtf", "info", text))
        elif text.startswith("BatchEvalPython"):
            findings.append(Finding("python_row_udf", "critical", text))
        elif text.startswith("Filter") and i + 1 < len(lines):
            child = lines[i + 1][1]
            if child.startswith(("FileScan parquet", "Scan parquet")) and "PushedFilters: []" in child:
                findings.append(Finding("filter_not_pushed", "info", text))

    findings = [f for f in findings if f.rule not in allow]
    findings.sort(key=lambda f: (f.severity != "critical", f.rule))
    return findings


def assert_scale_safe(
    df: DataFrame, allow: frozenset[str] | set[str] = frozenset()
) -> None:
    """Raise AssertionError listing every CRITICAL finding in ``df``'s
    plan — the pre-flight gate before pointing a query at a cluster."""
    critical = [f for f in audit_plan(df, allow=allow) if f.severity == "critical"]
    if critical:
        detail = "\n".join(f"  [{f.rule}] {f.node}" for f in critical)
        raise AssertionError(f"plan is not scale-safe:\n{detail}")


def _main(argv: list[str]) -> int:
    """CLI: ``python -m pubg_data_pipeline_spark.audit <query> [...]``
    audits registered queries (default sf dir: /root/testdata/sf0.001)
    and prints findings; exits 1 if any non-allowlisted critical is
    found. ``--all`` sweeps the whole registry."""
    import os

    from pubg_data_pipeline_spark.plans import all_specs
    from pubg_data_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    specs = all_specs()
    names = sorted(specs) if "--all" in argv else [a for a in argv if not a.startswith("-")]
    if not names:
        print("usage: python -m pubg_data_pipeline_spark.audit <query>... | --all")
        return 2
    unknown = [n for n in names if n not in specs]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2
    spark = get_spark(app_name="plan-audit", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    rc = 0
    for name in names:
        findings = audit_plan(
            specs[name].fn(spark, sf_dir),
            allow=KNOWN_EXACT_BASELINES.get(name, frozenset()),
        )
        status = "clean" if not findings else (
            "CRITICAL" if any(f.severity == "critical" for f in findings) else "info"
        )
        print(f"{name}: {status}")
        for f in findings:
            print(f"  [{f.severity}] {f.rule}: {f.node[:160]}")
        if any(f.severity == "critical" for f in findings):
            rc = 1
    return rc


if __name__ == "__main__":
    import sys

    raise SystemExit(_main(sys.argv[1:]))
