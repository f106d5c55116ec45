"""Distributed connected components over an edge list.

The reference has no graph operator at all; its dedup story stops at
"alert was already sent" set membership (reference:
monitoring/alert_manager.py:83-94). A corpus dedup pipeline needs the
next step: near-dup PAIRS (MinHash/SimHash/Jaccard candidates from
operators/dedup.py) must be closed into CLUSTERS so one canonical
document per duplicate group survives — pairs alone under-delete
(A~B, B~C but A!~C still means keep only one of {A,B,C}).

Algorithm: iterative min-label propagation with pointer DOUBLING
("hash-to-min", Rastogi et al. 2012, "Finding Connected Components in
Map-Reduce in Logarithmic Rounds"). Each round every node takes the
min component id over itself and its neighbors (fused into one
aggregate via per-node self-edges), then shortcuts through its
component pointer TWICE (label(label(label(n)))) — doubling cuts
chain depth ~4x per round, giving O(log d) rounds on diameter-d
components instead of O(d) for plain neighbor flooding.

Scale notes (100 TB): each round is one join+aggregate on the node id
plus two pointer self-joins, all over the *node/edge* tables — no
per-component serialization point, no driver-side graph. Rounds
localCheckpoint their result: iterative self-joins otherwise double
the Catalyst plan every round (analysis time goes exponential) and
replay the whole lineage on failure. Dedup graphs converge in 2-4
rounds (components are near-cliques of duplicates, diameter ~1-2).
Graphs that fit one loop partition compile their rounds without AQE
(one scheduler job per round instead of one per exchange); wider
graphs keep AQE for runtime skew-splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# DataFrame.unpersist() is a NO-OP for localCheckpoint blocks (they
# are registered at the RDD layer, not the Dataset cache manager —
# verified: the persistent-RDD count is unchanged after
# df.unpersist()), so superseded per-round checkpoints must be
# released through the block manager's own registry or they
# accumulate for the process lifetime. The helpers live in ckpt.py
# (shared with every plan-level barrier site).
from pubg_data_pipeline_spark.operators.ckpt import (
    persisted_rdd_ids as _persisted_rdd_ids,
    release_rdds as _release_rdds,
    reliable_checkpoint_dir,
)


def _ckpt_eager(df: DataFrame) -> DataFrame:
    """Eager lineage barrier honoring the cluster escape hatch: with
    SPARK_GRAFT_CHECKPOINT_DIR set, a reliable DataFrame.checkpoint
    (executor-loss tolerant); otherwise the fast executor-local one."""
    d = reliable_checkpoint_dir()
    if d is None:
        return df.localCheckpoint(eager=True)
    spark = df.sparkSession
    if spark.sparkContext._jsc.sc().getCheckpointDir().isEmpty():
        spark.sparkContext.setCheckpointDir(d)
    return df.checkpoint(eager=True)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` is the minimum node id in the node's connected
    component — a deterministic canonical cluster id.

    Edges are treated as undirected; self-loops and duplicates are
    fine (they collapse in the symmetrize-distinct step).

    ``checkpoint_dir``: by default rounds truncate lineage with
    ``localCheckpoint`` — executor-local blocks, right for local mode
    and fastest, but NOT executor-loss tolerant (a lost executor's
    cached blocks cannot be recomputed once lineage is truncated). On
    a real cluster pass a fault-tolerant directory (HDFS/S3) and each
    round checkpoints there via ``sparkContext.setCheckpointDir`` +
    ``DataFrame.checkpoint`` instead, surviving executor loss at the
    cost of one distributed write per round.
    """

    spark = edges.sparkSession
    if checkpoint_dir is None:
        # cluster escape hatch: a session-level reliable-checkpoint dir
        # (SPARK_GRAFT_CHECKPOINT_DIR) applies when no explicit dir is
        # passed, so deployments get executor-loss-tolerant rounds
        # without touching every call site
        checkpoint_dir = reliable_checkpoint_dir()
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def _ckpt(df: DataFrame, eager: bool) -> tuple[DataFrame, set[int]]:
        """Checkpoint + the set of RDD ids the checkpoint registered,
        so superseded rounds can be released (reliable-checkpoint mode
        registers nothing block-side; its ids set is simply empty)."""
        before = _persisted_rdd_ids(spark)
        out = df.checkpoint(eager=eager) if checkpoint_dir is not None else df.localCheckpoint(eager=eager)
        return out, _persisted_rdd_ids(spark) - before

    # Materialize the raw edge projection EAGERLY before symmetrizing:
    # union(e, e.swapped) duplicates the entire upstream subtree in the
    # logical plan, so an expensive pair-generation pipeline (shingle
    # explode + 3 aggregates for the Jaccard case) would be analyzed
    # and executed twice — measured 2x the whole-query cost at sf0.1.
    # After the checkpoint the union reads a cached RDD twice instead.
    e0, e0_ids = _ckpt(edges.select(F.col(src).alias("a"), F.col(dst).alias("b")), eager=True)
    # One fast count over the just-cached blocks sizes everything below
    # (the former separate symmetrize-checkpoint + count pass is folded
    # into the single edge-table build — one setup job saved).
    n_raw = e0.count()
    if n_raw == 0:
        # empty LOCAL relation with the contract schema — must not read
        # e0 (its checkpoint blocks are released and unrecomputable)
        schema = e0.select(
            F.col("a").alias("node"), F.col("a").alias("component")
        ).schema
        _release_rdds(spark, e0_ids)
        return spark.createDataFrame([], schema)
    # Size the loop's shuffle width to the edge count (~500k symmetrized
    # edges per partition), exactly as AQE would coalesce it: the
    # near-dup edge list is orders smaller than the corpus, and running
    # log-d rounds of 32-way shuffles over a few thousand edges spends
    # everything on task scheduling.
    n_parts = max(
        1, min(spark.sparkContext.defaultParallelism, (2 * n_raw) // 500_000)
    )
    # Loop-scoped execution mode: when the whole graph fits ONE loop
    # partition there is nothing for AQE to decide (no skew to split,
    # nothing to coalesce, every exchange is 1-way) — but AQE still
    # charges one stage-materialization JOB per exchange per round,
    # which at sf0.1 made a 600-edge / 3-round closure cost 40 driver
    # jobs (~2s of pure scheduling). Compiling the loop without AQE at
    # an explicit 1-way width turns each round into a single job. For
    # any graph wider than one partition AQE stays on: its runtime
    # skew-split/coalesce earns the constants at real scale, so the
    # switch is derived from data size, not from the local core count.
    loop_aqe_off = n_parts == 1
    conf_saved = {
        k: spark.conf.get(k)
        for k in ("spark.sql.adaptive.enabled", "spark.sql.shuffle.partitions")
    }
    try:
        if loop_aqe_off:
            spark.conf.set("spark.sql.adaptive.enabled", "false")
            spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
        # Symmetrize, then append one SELF-EDGE (n, n) per node: the
        # per-round neighbor-min over this table sees the node's own
        # label through its self-edge, so a round is ONE join + ONE
        # aggregate — the former least(own, nbr) LEFT JOIN against the
        # labels and the separate singleton-node union branch both fold
        # into the aggregate (guide §2.4: two exchanges per round
        # removed). Self-loop-only nodes ride the same self-edge path
        # and keep their singleton component.
        sym = (
            e0.union(e0.select(F.col("b").alias("a"), F.col("a").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )
        nodes = (
            e0.select("a").union(e0.select(F.col("b").alias("a"))).distinct()
        )
        # Partition by "b" — the loop's only join against e keys on b
        # (labels renamed node->b), so the edge side never reshuffles
        # inside the loop.
        e, _e_ids = _ckpt(
            sym.unionByName(nodes.select("a", F.col("a").alias("b"))).repartition(
                n_parts, "b"
            ),
            eager=True,
        )
        # Initialize at least(node, min_neighbor) — the first half of a
        # propagation round folded into the init aggregate (the
        # self-edge makes min(b) include the node itself). Dup graphs
        # are near-cliques, and a clique is already at fixpoint after
        # this, so the loop's first round detects convergence
        # immediately (one full round saved on the dominant shape).
        init = e.groupBy(F.col("a").alias("node")).agg(F.min("b").alias("comp"))
        # Convergence detection: labels only ever decrease. For NUMERIC
        # ids sum(comp) is strictly monotone until fixpoint — two equal
        # consecutive sums mean no label moved, one tiny aggregation per
        # round (which doubles as the action materializing the round's
        # checkpoint); decimal(38,0) keeps it exact under ANSI at any id
        # scale. Non-numeric ids (string doc keys) cannot be cast — ANSI
        # throws, and legacy NULL sums would fake instant convergence —
        # so they use an exact changed-row probe against the previous
        # labels (limit(1) short-circuits; one small join per round).
        labels, labels_ids = _ckpt(init, eager=False)
        numeric_comp = dict(labels.dtypes)["comp"] in (
            "tinyint", "smallint", "int", "bigint",
        ) or dict(labels.dtypes)["comp"].startswith("decimal")

        def _label_sum(frame: DataFrame):
            return frame.agg(
                F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")
            ).collect()[0]["s"]

        # Seed the convergence detector with the INIT labels' sum,
        # riding the very action that materializes the init checkpoint:
        # labels are monotone non-increasing, so round-1 sum == init sum
        # proves round 1 moved nothing and init was already the fixpoint.
        if numeric_comp:
            prev_sum = _label_sum(labels)
        else:
            prev_sum = None
            labels.count()  # materialize the lazy init checkpoint
        # e0 fed sym, nodes and e; dead weight once e materializes —
        # release its blocks so repeated CC calls in one session don't
        # accumulate checkpoint storage.
        _release_rdds(spark, e0_ids)

        def _jump(frame: DataFrame) -> DataFrame:
            """comp'(n) = comp(comp(n)) — one pointer-jump shortcut.
            comp is always some node's id and every node carries a
            label, so the left join's coalesce is pure safety."""
            ptr = frame.select(
                F.col("node").alias("comp"), F.col("comp").alias("comp2")
            )
            return frame.join(ptr, "comp", "left").select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("comp2"), F.col("comp"))
                ).alias("comp"),
            )

        for _ in range(max_iter):
            # 1. neighbor min fused with self: the self-edge contributes
            # the node's own label, so this single aggregate IS
            # least(comp(n), min_{m in N(n)} comp(m)) over every node.
            stepped = (
                e.join(labels.withColumnRenamed("node", "b"), "b")
                .groupBy(F.col("a").alias("node"))
                .agg(F.min("comp").alias("comp"))
            )
            # 2. POINTER DOUBLING: two jump passes per round (quarters
            # chain depth per round instead of halving it). Each jump
            # references its input twice (self-join); persisting the
            # input makes the diamond compute once — AQE in Spark 4.1.2
            # never emits ReusedExchange for duplicated subtrees (round-8
            # probes), and the two exchanges hash different columns so
            # even static planning cannot share them. Plain persist (not
            # localCheckpoint) keeps lineage intact, so reliable-
            # checkpoint deployments stay executor-loss recoverable and
            # the blocks are releasable via the Dataset cache manager.
            stepped.persist()
            j1 = _jump(stepped)
            j1.persist()
            jumped, jumped_ids = _ckpt(_jump(j1), eager=False)
            if numeric_comp:
                cur_sum = _label_sum(jumped)
                converged = cur_sum == prev_sum
                prev_sum = cur_sum
            else:
                converged = (
                    jumped.join(
                        labels.select("node", F.col("comp").alias("__prev")), "node"
                    )
                    .filter(F.col("comp") != F.col("__prev"))
                    .limit(1)
                    .count()
                    == 0
                )
            # the action above materialized `jumped`; the round's
            # intermediates and the superseded labels are now dead —
            # release before rebinding (the final round's checkpoint
            # blocks back the returned frame and stay)
            stepped.unpersist()
            j1.unpersist()
            _release_rdds(spark, labels_ids)
            labels, labels_ids = jumped, jumped_ids
            if converged:
                break
        # only the final labels blocks back the returned frame; the edge
        # table is loop-internal
        _release_rdds(spark, _e_ids)
    finally:
        for k, v in conf_saved.items():
            spark.conf.set(k, v)
    return labels.select("node", F.col("comp").alias("component"))


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    components: DataFrame | None = None,
) -> DataFrame:
    """Close near-dup pairs into clusters: (cluster_id, n_members,
    max_member). ``cluster_id`` = min member id = the canonical keeper
    under the keep-lowest-id policy (the same deterministic policy as
    ``dedup.exact_text_dedup``). Singletons (docs in no pair) are not
    emitted — they are trivially their own keeper.

    ``components``: pass a precomputed (node, component) closure of the
    SAME pair set to skip the iterative CC — the expensive half of
    every closure consumer, so pipelines running several of them share
    one materialized closure (same derived-artifact pattern as the
    pair table itself)."""
    comp = (
        components
        if components is not None
        else connected_components(pairs, src=id_a, dst=id_b)
    )
    return comp.groupBy(F.col("component").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.max("node").alias("max_member"),
    )


def deduped_corpus_by_quality(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    quality_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
    components: DataFrame | None = None,
) -> DataFrame:
    """Cluster dedup keeping the BEST-quality member per near-dup
    cluster (ties broken by min id) — what a real curation run wants:
    when a boilerplate-stripped page and its raw twin collide, keep
    the higher-quality one, not the lower doc id. One window over the
    (tiny) membership table picks keepers; the corpus-side removal is
    the same broadcast anti-join as ``deduped_corpus``. ``components``
    as in :func:`dedup_clusters`."""
    from pyspark.sql import Window

    comp = (
        components
        if components is not None
        else connected_components(pairs, src=id_a, dst=id_b)
    )
    members = comp.join(
        df.select(F.col(id_col).alias("node"), F.col(quality_col).alias("__q")), "node"
    )
    w = Window.partitionBy("component").orderBy(F.col("__q").desc(), F.col("node").asc())
    losers = (
        members.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") > 1)
        .select(F.col("node").alias(id_col))
    )
    return df.join(F.broadcast(losers), id_col, "left_anti")


def deduped_corpus(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
    components: DataFrame | None = None,
) -> DataFrame:
    """Apply cluster dedup to the corpus: drop every row whose id sits
    in a near-dup cluster but is not the cluster's minimum. One
    broadcast-able join against the (small) non-keeper set — at 100 TB
    the removal list is |duplicates|, orders below |corpus|.
    ``components`` as in :func:`dedup_clusters`."""
    comp = (
        components
        if components is not None
        else connected_components(pairs, src=id_a, dst=id_b)
    )
    losers = comp.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(F.broadcast(losers), id_col, "left_anti")


def triangles(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """All triangles in an undirected graph, one row per triangle with
    members sorted ``(id_a < id_b < id_c)``.

    Uses DEGREE ORIENTATION (each undirected edge directed from its
    lower-(degree, id) endpoint to the higher): the oriented graph is
    acyclic, every triangle appears exactly once as u->v, v->w, u->w,
    and — the scale property — out-degrees are bounded by O(sqrt(m)),
    so the wedge join materializes O(m^1.5) candidates worst-case
    instead of the O(sum deg^2) a naive id-orientation pays on skewed
    graphs (one celebrity node with degree d creates d^2/2 wedges
    under id-order; at most m under degree order). Two shuffles: one
    to attach degrees, one wedge equi-join + closing-edge semi pattern.

    The reference has no graph surface at all; this extends the
    near-dup pair/cluster layer (operators/dedup.py, graph.py) with
    the standard triangle primitive used for dup-cluster density and
    social-graph metrics.
    """
    # Materialize the edge projection EAGERLY: the oriented edge list is
    # referenced four times below (degree count + three join legs), and
    # an expensive upstream pair pipeline (e.g. Jaccard candidate
    # generation) would otherwise be re-executed once per reference —
    # measured 4x the whole-query cost on the near-dup graph. Same
    # rationale as connected_components' edge checkpoint above.
    spark = edges.sparkSession
    before = _persisted_rdd_ids(spark)
    e0 = _ckpt_eager(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
    )
    e0_ids = _persisted_rdd_ids(spark) - before
    und = e0.union(e0.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    with_deg = _degree_oriented(und)
    _release_rdds(spark, e0_ids)
    return _wedge_triangles(with_deg)


def _degree_oriented(und: DataFrame) -> DataFrame:
    """Degree-orient a symmetrized undirected edge list ``(u, v)``:
    attach both endpoint degrees, keep each undirected edge once,
    oriented low-(deg,id) -> high-(deg,id). Eagerly checkpointed — the
    wedge join reads it three times, and the caller may release the
    upstream edge blocks as soon as this returns."""
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    return _ckpt_eager(
        und.join(deg, "u")
        .join(
            deg.select(F.col("u").alias("v"), F.col("deg").alias("deg_v")),
            "v",
        )
        .filter(
            (F.col("deg") < F.col("deg_v"))
            | ((F.col("deg") == F.col("deg_v")) & (F.col("u") < F.col("v")))
        )
        .select("u", "v")
    )


def _wedge_triangles(with_deg: DataFrame) -> DataFrame:
    """The wedge equi-join + closing-edge pattern over an already
    degree-oriented (and materialized) edge list; one row per triangle,
    members sorted."""
    d1 = with_deg
    d2 = with_deg.select(F.col("u").alias("v"), F.col("v").alias("w"))
    d3 = with_deg.select(F.col("u").alias("u"), F.col("v").alias("w"))
    tri = d1.join(d2, "v").join(d3, ["u", "w"])
    sorted_ids = F.array_sort(F.array("u", "v", "w"))
    return tri.select(
        sorted_ids[0].alias("id_a"),
        sorted_ids[1].alias("id_b"),
        sorted_ids[2].alias("id_c"),
    )


def clustering_coefficients(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Local clustering coefficient per node: 2*T(v) / (deg(v) *
    (deg(v)-1)) where T(v) counts triangles through v — THE density
    diagnostic for near-dup clusters (a clique of true duplicates has
    coefficient 1.0 everywhere; chance shingle collisions produce
    star-ish subgraphs near 0.0), and the standard social-graph
    metric.

    Reuses the degree-oriented ``triangles`` wedge join, explodes each
    triangle to its three members (3 rows per triangle — bounded), and
    joins counts back onto the degree table: one extra shuffle over
    the TRIANGLE list, never the corpus. Nodes on no triangle get 0.0;
    degree-1 nodes have an undefined denominator and report 0.0.
    """
    # one eager checkpoint serves BOTH the degree table and the
    # triangle join's references — without it an expensive upstream
    # pair pipeline would re-execute per consumer (the same hazard
    # triangles() guards internally; see its comment)
    spark = edges.sparkSession
    before = _persisted_rdd_ids(spark)
    e0 = _ckpt_eager(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
    )
    e0_ids = _persisted_rdd_ids(spark) - before
    # Materialize the symmetrized edge list ONCE and share it between
    # the degree table and the orientation (previously this function
    # computed und/deg itself for the coefficient AND called the public
    # triangles(), which re-checkpointed e0 and recomputed und/deg from
    # scratch for the orientation — one whole union+distinct exchange,
    # one groupBy and one checkpoint materialization of pure double
    # work per execution).
    und = _ckpt_eager(
        e0.union(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
    )
    _release_rdds(spark, e0_ids)
    deg = und.groupBy(F.col("u").alias("node")).agg(F.count(F.lit(1)).alias("degree"))
    tri_nodes = (
        _wedge_triangles(_degree_oriented(und))
        .select(F.explode(F.array("id_a", "id_b", "id_c")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    joined = deg.join(tri_nodes, "node", "left").select(
        "node",
        "degree",
        F.coalesce(F.col("n_triangles"), F.lit(0)).alias("n_triangles"),
        F.when(
            F.col("degree") >= 2,
            F.round(
                F.coalesce(F.col("n_triangles"), F.lit(0))
                * 2.0
                / (F.col("degree") * (F.col("degree") - 1)),
                4,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("clustering_coef"),
    )
    return joined


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Fixed-iteration PageRank over an undirected graph — the
    centrality score that picks the most-representative member of a
    near-dup cluster (the "canonical doc" refinement over min-id /
    max-quality keepers) and completes the graph kit's iterative-
    dataflow trio (connected components, triangles, PageRank).

    Scale shape mirrors connected_components: the edge projection is
    checkpointed ONCE (an expensive upstream pair pipeline must not
    re-execute per iteration or per join leg), source degrees are
    attached once to that same cached edge list, and each iteration is
    a single equi-join on the source node + one aggregation keyed on
    the destination — O(m) per round, no growing lineage on the data
    path. Fixed iteration count keeps the plan finite (rank deltas
    converge geometrically at ``damping``^k; 5 rounds is the classic
    cluster-triage setting). The node count is one scalar driver agg,
    same justification as CC's convergence check.

    Nodes are the graph's vertices (isolated docs never enter the
    edge list); undirected edges contribute in both directions, so
    there are no dangling nodes and total rank mass stays 1.
    """
    spark = edges.sparkSession
    before = _persisted_rdd_ids(spark)
    e0 = _ckpt_eager(
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
    )
    e0_ids = _persisted_rdd_ids(spark) - before
    und = e0.union(e0.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    deg = und.groupBy("u").agg(F.count(F.lit(1)).alias("degree"))
    edges_deg = _ckpt_eager(und.join(deg, "u"))
    # e0's blocks fed the eager edges_deg materialization and are dead
    # weight afterwards — release them (via the block-manager registry;
    # DataFrame.unpersist() is a no-op for checkpoint blocks) so
    # repeated pagerank calls don't accumulate checkpoint storage.
    _release_rdds(spark, e0_ids)
    nodes = edges_deg.select(F.col("u").alias("node")).distinct()
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contrib = (
            edges_deg.join(ranks, edges_deg["u"] == ranks["node"])
            .select(
                F.col("v").alias("node"),
                (F.col("rank") / F.col("degree")).alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("c"))
        )
        # No re-join against `nodes`: the symmetrized edge list contains
        # every node as a destination (each undirected edge contributes
        # both directions, and every vertex has degree >= 1), so
        # `contrib` covers the node set exactly each iteration — the
        # former nodes.join(contrib, "left") + coalesce(c, 0) was an
        # identity that cost one join + one exchange per iteration
        # (plan: 10 joins -> 5 for 5 iterations). Dangling-node mass
        # redistribution is exactly the case this would matter for, and
        # the symmetrization rules it out by construction.
        ranks = contrib.select(
            "node",
            (F.lit(base) + F.lit(damping) * F.col("c")).alias("rank"),
        )
    return ranks
