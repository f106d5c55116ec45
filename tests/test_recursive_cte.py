"""Spark 4 recursive-CTE surface: the SQL front-end supports
WITH RECURSIVE (UNION ALL semantics — Spark 4.1 rejects UNION
DISTINCT recursion, so cyclic-graph closure stays on the iterative
operators/graph.connected_components path; these tests pin the
ACYCLIC recursions that are in scope and the documented limitation)."""

from __future__ import annotations

import pytest


def test_recursive_series(spark):
    out = spark.sql(
        "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 10) "
        "SELECT SUM(n) AS s, COUNT(*) AS c FROM t"
    ).collect()[0]
    assert (out["s"], out["c"]) == (55, 10)


def test_recursive_hierarchy_rollup(spark):
    """Org-chart style DAG walk: each node accumulates its depth and
    root — the BOM/hierarchy recursion shape."""
    spark.sql(
        "CREATE OR REPLACE TEMP VIEW org AS SELECT * FROM VALUES "
        "(1, NULL), (2, 1), (3, 1), (4, 2), (5, 4) AS t(id, mgr)"
    )
    rows = spark.sql(
        """
        WITH RECURSIVE chain(id, root, depth) AS (
          SELECT id, id, 0 FROM org WHERE mgr IS NULL
          UNION ALL
          SELECT o.id, c.root, c.depth + 1
          FROM org o JOIN chain c ON o.mgr = c.id
        )
        SELECT id, root, depth FROM chain ORDER BY id
        """
    ).collect()
    assert [(r["id"], r["root"], r["depth"]) for r in rows] == [
        (1, 1, 0), (2, 1, 1), (3, 1, 1), (4, 1, 2), (5, 1, 3)
    ]


def test_recursive_union_distinct_unsupported_documented(spark):
    """Spark 4.1 rejects UNION (distinct) recursion — the reason
    near-dup cluster closure ships as the iterative
    connected_components operator, not SQL. If this starts passing,
    a future Spark gained the feature and a SQL closure twin becomes
    possible."""
    from pyspark.sql.utils import AnalysisException

    spark.sql("CREATE OR REPLACE TEMP VIEW e2 AS SELECT * FROM VALUES (1,2),(2,1) AS t(a,b)")
    with pytest.raises(AnalysisException, match="UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE"):
        spark.sql(
            "WITH RECURSIVE r(n) AS (SELECT a FROM e2 UNION SELECT b FROM e2 JOIN r ON a = n) "
            "SELECT * FROM r"
        ).collect()


def test_parameterized_sql(spark):
    """Spark 4 parameterized SQL — named and positional binding (the
    injection-safe front-end for user-supplied literals)."""
    spark.range(10).createOrReplaceTempView("pt")
    named = spark.sql(
        "SELECT COUNT(*) AS n FROM pt WHERE id >= :lo AND id < :hi",
        args={"lo": 2, "hi": 7},
    ).collect()[0]
    assert named["n"] == 5
    positional = spark.sql(
        "SELECT COUNT(*) AS n FROM pt WHERE id BETWEEN ? AND ?", args=[1, 3]
    ).collect()[0]
    assert positional["n"] == 3
    # a string arg binds as a VALUE, not as SQL text — it round-trips
    bound = spark.sql("SELECT :s AS s", args={"s": "x' OR '1'='1"}).collect()[0]["s"]
    assert bound == "x' OR '1'='1"
